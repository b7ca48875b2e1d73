package graft.operators

import org.apache.spark.sql.DataFrame

/** Convergence-check actions for the iterative operators (r17).
  *
  * Every fixpoint loop here materializes its round frame with
  * `localCheckpoint(true)` and then asks "how many rows / any rows?" to
  * decide termination. `df.count()` plans a two-stage partial/final
  * aggregate — one extra exchange and (under AQE) an extra scheduler job
  * PER ROUND, priced at wave cadence: a maintenance query runs hundreds of
  * rounds-with-checks, and on a cluster each check is a full stage
  * round-trip. For a frame that is ALREADY materialized (or a pure
  * filter/projection of one), counting the cached InternalRows directly is
  * the same number with ONE job, no exchange, and no row decode
  * (`toRdd` is the internal binary iterator, not the external Row view).
  *
  * ONLY safe on materialized frames or narrow (filter/project) views of
  * them: on anything with a join/agg in the plan, `toRdd` would execute
  * that plan WITHOUT adaptive planning — never call it there. */
private[graft] object Loops {

  /** Exact row count of a materialized frame (or a narrow view of one) as
    * one scheduler job over the cached partitions. */
  def matCount(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** Emptiness of a materialized frame (or a narrow view of one) as one
    * take(1)-style job over the cached partitions. */
  def matIsEmpty(df: DataFrame): Boolean = df.queryExecution.toRdd.isEmpty()
}
