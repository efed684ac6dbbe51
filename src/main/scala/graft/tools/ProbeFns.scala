package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeFns {
  // dev tool: list reference scalar-function names (one per line, via file)
  // that do not resolve in a fully-registered session
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val names = scala.io.Source.fromFile("/tmp/ref_scalar.txt").getLines().toList
    val missing = names.filterNot(n => spark.catalog.functionExists(n))
    println("MISSING: " + missing.mkString(", "))
    spark.stop()
  }
}
