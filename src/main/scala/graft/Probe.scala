package graft

import org.apache.spark.sql.SparkSession

/** Scratch: plan inspection + entry smoke (driver checks rows>0). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    if (args.isEmpty) {
      val df = SparkEntry.entry(spark)
      println("entry rows=" + df.count())
    }
    spark.stop()
  }
}
