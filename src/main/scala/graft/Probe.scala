package graft

import org.apache.spark.sql.SparkSession

/** Scratch entry-point smoke: mirrors the driver's rows>0 check. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println("entry rows=" + df.count())
    spark.stop()
  }
}
