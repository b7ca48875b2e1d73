package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: recall/cost sweep for the approximate ANN kernels against the
  * exact top-k on the real embeddings table.
  *
  *   sbt "runMain graft.tools.RecallProbe <sfDir> [cores]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cores = if (args.length > 1) args(1).toInt else 16
    val spark = graft.Sessions.local(cores = cores)
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val exact = graft.operators.Ann.blockTopK(emb, "vec_id", "embedding", k = 3)
      .select("id", "neighbor_id").persist()
    val nExact = exact.count()

    def recall(name: String, mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val approx = mk.select("id", "neighbor_id").persist()
      approx.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val hit = exact.join(approx, Seq("id", "neighbor_id"), "left_semi").count()
      println(f"PROBE $name%-44s recall=${hit.toDouble / nExact}%.3f wall=$wall%.2fs")
      approx.unpersist()
    }

    import graft.operators.{Ann, Ivf, Pq}
    recall("pq probe10 cb256 rr96 (cand)", Pq.ivfPqTopK(emb, "vec_id", "embedding", 3, 16, 10, 8, 256, 96))
    recall("pq probe10 cb256 rr0", Pq.ivfPqTopK(emb, "vec_id", "embedding", 3, 16, 10, 8, 256, 0))
    recall("pq probe4 cb256 rr96", Pq.ivfPqTopK(emb, "vec_id", "embedding", 3, 16, 4, 8, 256, 96))
    recall("pq probe10 cb16 rr96", Pq.ivfPqTopK(emb, "vec_id", "embedding", 3, 16, 10, 8, 16, 96))
    recall("ivf probe10", Ivf.ivfTopK(emb, "vec_id", "embedding", 3, 16, 10))
    spark.stop()
  }
}
