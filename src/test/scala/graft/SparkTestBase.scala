package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (reference analog:
  * LocalQueryRunner, `core/trino-main/.../testing/LocalQueryRunner.java:241`
  * — single-process engine driving the full planning path).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    s
  }
  val sfTiny = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sfTiny: String = SparkTestBase.sfTiny
}
