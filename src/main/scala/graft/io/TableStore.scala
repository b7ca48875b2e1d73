package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The curated-table catalog (S3-S6): named parquet tables under one root,
  * with idempotent overwrite, append, and existence probes.
  *
  * Capability source /root/reference/etl/gsheets.py:35-164 (ensure/clear/
  * overwrite/append on worksheet tabs). Parquet + overwrite mode gives the
  * same repeat-safe contract; existence goes through the Hadoop FileSystem
  * API so the store works identically on local disk, HDFS, or an object
  * store at cluster scale.
  */
final class TableStore(spark: SparkSession, root: String) {

  def path(name: String): String = s"$root/$name"

  /** S6: does the table exist (any prior successful write)? */
  def exists(name: String): Boolean = {
    val p = new Path(path(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(name: String): DataFrame = spark.read.parquet(path(name))

  /** S3/S4: idempotent full overwrite (clear + write in one atomic-per-dir
    * commit). */
  def overwrite(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(name))

  /** S5: append-only (etl_log); first run creates the table, header is
    * carried by the parquet schema. */
  def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(name))
}
