package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: checks ns-timestamp parquet readability and prints schemas. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      import org.apache.spark.sql.functions._
      ev.withColumn("ts2", expr("timestamp_micros(ts DIV 1000)")).show(3, false)
      println("EVENTS_OK")
    } catch {
      case e: Throwable => println(s"EVENTS_FAIL: ${e.getMessage}")
    }
    // Column-from-Expression API check
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
      import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
      import org.apache.spark.sql.types._
      case class PlusOne(child: Expression) extends UnaryExpression with CodegenFallback {
        override def dataType: DataType = LongType
        override def nullSafeEval(v: Any): Any = v.asInstanceOf[Long] + 1L
        override protected def withNewChildInternal(c: Expression): PlusOne = copy(c)
      }
      import org.apache.spark.sql.graftshim.ColumnGlue
      val df = spark.range(3).toDF("x")
      val c: Column = ColumnGlue.column(PlusOne(ColumnGlue.expression(col("x"))))
      df.select(c.as("y")).show()
      println("EXPR_OK")
    } catch {
      case e: Throwable => println(s"EXPR_FAIL: ${e}")
    }
    spark.stop()
  }
}
