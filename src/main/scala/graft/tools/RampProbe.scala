package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: 10× corpus scaling ramp for the heaviest dedup-family kernels
  * (the q45/q50/q52/q72 shapes). The 10× corpus is the sf corpus replicated
  * with REPLICA-TAGGED tokens (every token of replica i>0 prefixed `r<i>`),
  * so cross-replica shingles/fingerprints never collide and each replica
  * keeps the original's internal duplication structure — output and true
  * work scale ~10×, not the ~45× pair blow-up a verbatim copy would cause.
  *
  *   sbt "runMain graft.tools.RampProbe <sfDir> [cores]"
  */
object RampProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.Sessions.local(cores = cores)
    val base = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text")

    def replicated(copies: Int): DataFrame =
      (0 until copies).map { i =>
        if (i == 0) base
        else base.select(
          (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
          concat_ws(" ", transform(graft.functions.Text.tokens(col("text")),
            t => concat(lit(s"r$i"), t))).as("text"))
      }.reduce(_ unionAll _)

    def time(name: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"RAMP $name%-28s rows=$n%-9d wall=$wall%.2fs")
      wall
    }

    import graft.operators.{Dedup, Decontamination, SpanDedup}
    def kernels(tag: String, df: DataFrame): Unit = {
      val d = df.persist(); d.count()
      time(s"q50-shape simhash $tag", Dedup.simhashNearDupPairs(d, "doc_id", "text", 2))
      time(s"q72-shape spanscrub $tag", SpanDedup.scrubSpans(d, "doc_id", "text", 8))
      time(s"q45-shape cc $tag", {
        val pairs = Dedup.lshJaccardPairs(d, "doc_id", "text",
          shingleSize = 3, k = 64, bands = 32, minJaccard = 0.5)
        Dedup.connectedComponentsLogRoundsStrict(pairs)
      })
      time(s"q52-shape decon $tag", {
        val split = d.select(col("doc_id"), col("text"),
          graft.functions.Curation.splitAssign(col("text")).as("split"))
        Decontamination.sharedShingleCounts(
          split.filter(col("split") === "train"),
          split.filter(col("split") =!= "train"),
          "doc_id", "text", n = graft.functions.Curation.DeconNgram,
          maxShingleDf = graft.functions.Curation.DeconMaxShingleDf)
      })
      time(s"q52-shape decon-bloom $tag", {
        val split = d.select(col("doc_id"), col("text"),
          graft.functions.Curation.splitAssign(col("text")).as("split"))
        Decontamination.sharedShingleCountsBloom(
          split.filter(col("split") === "train"),
          split.filter(col("split") =!= "train"),
          "doc_id", "text", n = graft.functions.Curation.DeconNgram,
          maxShingleDf = graft.functions.Curation.DeconMaxShingleDf)
      })
      time(s"q117-shape heavy exact $tag",
        graft.operators.HeavyHitters.frequentGrams(d, "text", 3, 5L))
      time(s"q118-shape heavy cms $tag",
        graft.operators.HeavyHitters.frequentGramsSketched(d, "text", 3, 5L))
      d.unpersist()
    }
    kernels("1x", replicated(1))
    kernels("10x", replicated(10))
    spark.stop()
  }
}
