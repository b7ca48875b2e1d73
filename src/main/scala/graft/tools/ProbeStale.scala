package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: planted-cluster staleness experiment. Base corpus = 8
  * axis-aligned clusters; drifted upsert = 8 clusters BETWEEN pairs of the
  * base axes (the distribution the frozen quantizer never saw). Measure
  * nProbe=1 recall fresh / stale / retrained(8) / retrained(16).
  *   sbt "runMain graft.tools.ProbeStale"
  */
object ProbeStale {
  def noise(id: Column, d: Column): Column =
    ((pmod(xxhash64(id * lit(64) + d), lit(1000)).cast("double") / 1000.0 - 0.5) * 0.04)

  def clustered(spark: SparkSession, n: Int, idBase: Long, nCl: Int,
      center: (Column, Column) => Column): DataFrame = {
    spark.range(n).select((col("id") + lit(idBase)).as("vec_id"),
        (col("id") % nCl).as("cl"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (center(col("cl"), d) + noise(col("vec_id"), d)).cast("float"))
          .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = 8)
    // base: cluster c points along axis c
    val base = clustered(spark, 512, 0L, 8,
      (c, d) => when(d === c, lit(1.0)).otherwise(lit(0.0)))
    // drift: cluster c points along (e_{2c} + e_{2c+1})/sqrt2 — between two
    // frozen centroids
    val drift = clustered(spark, 256, 10000L, 8,
      (c, d) => when(d === c * 2 || d === c * 2 + 1, lit(0.7071)).otherwise(lit(0.0)))

    val store = new graft.io.TableStore(spark,
      java.nio.file.Files.createTempDirectory("stale_planted").toString)
    graft.operators.AnnIndex.build(store, "emb", base, "vec_id", "embedding",
      nClusters = 8, iters = 3)

    def recall(phase: String, queries: DataFrame, nProbe: Int): Unit = {
      val approx = graft.operators.AnnIndex.query(store, "emb", queries,
        "vec_id", "embedding", k = 3, nProbe = nProbe).localCheckpoint(true)
      val exact = graft.operators.AnnIndex.query(store, "emb", queries,
        "vec_id", "embedding", k = 3, nProbe = 64).localCheckpoint(true)
      val nE = exact.count()
      val nH = exact.select("id", "neighbor_id")
        .join(approx.select("id", "neighbor_id"), Seq("id", "neighbor_id"), "left_semi")
        .count()
      println(f"STALE p$nProbe $phase%-12s n_exact=$nE%-6d n_hit=$nH%-6d recall=${nH.toDouble / nE}%.4f")
    }
    val qBase = base.filter(pmod(col("vec_id"), lit(8)) === 1)
    val qDrift = drift.filter(pmod(col("vec_id"), lit(4)) === 2)
    recall("fresh", qBase, 1)
    graft.operators.AnnIndex.upsert(store, "emb", drift, "vec_id", "embedding")
    recall("stale", qDrift, 1)
    graft.operators.AnnIndex.compact(store, "emb")
    graft.operators.AnnIndex.retrain(store, "emb", nClusters = 16, iters = 3)
    recall("retrained16", qDrift, 1)
    recall("retr16-base", qBase, 1)
    spark.stop()
  }
}
