package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: per-SF max |est/exact − 1| for the q200 xxhash KMV twin. */
object ProbeXx {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = 8)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val ev = graft.Tables.load(spark, dir, "events")
        .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("key"), col("user_id"))
      val sk = graft.operators.Kmv.sketch(ev, Seq("key"), "user_id", 64,
        graft.operators.Kmv.hashXx)
      val all = sk.select(col("key"), col("kmv"))
        .unionByName(graft.operators.Kmv.mergeAll(sk, 64)
          .select(lit(-1L).as("key"), col("kmv")))
      val exact = ev.groupBy("key")
        .agg(countDistinct("user_id").as("ex"))
        .unionByName(ev.agg(countDistinct("user_id").as("ex"))
          .select(lit(-1L).as("key"), col("ex")))
      val est = graft.operators.Kmv.estimate(col("kmv"), 64,
        graft.operators.Kmv.XxModulus)
      val rows = all.join(exact, Seq("key"))
        .select(col("key"), size(col("kmv")).as("nk"), est.as("est"), col("ex"))
        .collect()
      val sat = rows.filter(_.getInt(1) >= 64)
      val maxErr = if (sat.isEmpty) 0.0 else sat.map(r =>
        math.abs(r.getDouble(2) / r.getLong(3) - 1.0)).max
      val unsatBad = rows.filter(r => r.getInt(1) < 64 &&
        (r.getInt(1).toLong != r.getLong(3)))
      println(f"PROBEXX $sf rows=${rows.length} saturated=${sat.length} " +
        f"maxSatErr=$maxErr%.4f unsatMismatch=${unsatBad.length}")
    }
    spark.stop()
  }
}
