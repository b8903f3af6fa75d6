package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library facade: one call wires the engine into a session — table
  * views for an sf directory plus the custom function registry — so
  * `spark.sql(...)` works over everything the engine builds (SURVEY
  * §2.10: the reference has no SQL surface; ours is free once the
  * frames are registered).
  */
object Graft {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every testdata table as a temp view (events with the
    * epoch-micros `ts_us` convenience column) and the graft functions.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.VectorExpressions.register(spark)
    TableNames.foreach { t =>
      val df =
        if (t == "events")
          Tables.events(spark, dir)
            .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
        else Tables(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
  }

  /** Run a named engine query (SparkEntry surface). */
  def query(spark: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
