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

  /** Operator outputs exposed by [[registerQueryViews]] when no
    * explicit list is given — one representative per operator family
    * (windowed agg, as-of join, dedup, text quality, ANN graph), kept
    * deliberately small: a temp view is a lazy plan, but BUILDING some
    * query frames runs metadata actions (auto-knob counts, codebook
    * seeds), so registering the whole 165-query suite eagerly is the
    * caller's explicit choice, not the default. */
  val DefaultViewQueries: Seq[String] = Seq("ev_ohlcv_1h", "ev_asof_join",
    "doc_quality", "doc_dedup_exact", "emb_knn_graph")

  /** Register engine OPERATOR OUTPUTS as SQL views (SURVEY §2.10's
    * other half: not just the base tables — the operator results
    * compose in `spark.sql` too). Each named SparkEntry query's frame
    * becomes temp view `graft_<name>`, so e.g.
    * `SELECT * FROM graft_ev_ohlcv_1h JOIN events ...` round-trips
    * between the DataFrame-built operators and ad-hoc SQL. */
  def registerQueryViews(spark: SparkSession, dir: String,
      names: Seq[String] = DefaultViewQueries): Unit =
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir).createOrReplaceTempView(s"graft_$n")
    }
}
