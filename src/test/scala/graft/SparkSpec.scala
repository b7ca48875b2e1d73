package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, tests run
  * sequentially in sbt's forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(cores = 4)
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
