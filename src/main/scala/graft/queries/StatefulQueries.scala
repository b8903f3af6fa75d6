package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.L2Book

/** Stateful-operator coverage: the L2 order-book replay driven by a
  * deterministic update stream derived from the `events` table (no L2
  * market data exists in the environment — FIXTURES.md §4). The fold is
  * not SQL-expressible → rows-only driver check; semantics are covered
  * by L2BookSpec goldens.
  */
object StatefulQueries {

  val defs: Map[String, QueryDef] = Map(

    // A4 order-book replay + P6 mid-price + P7 spread, sampled hourly.
    "l2_book_replay" -> QueryDef.noOracle { (s, dir) =>
      val updates = Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .select(
          col("event_type").as("instrument"),
          col("ts_us"),
          col("event_id").as("seq"),
          when(col("event_id") % 50 === 0, "SNAPSHOT")
            .when(col("event_id") % 3 === 0, "ADD")
            .when(col("event_id") % 3 === 1, "SET")
            .otherwise("SUB").as("update_type"),
          when(col("event_id") % 2 === 0, "bid").otherwise("ask").as("side"),
          round(col("value")).as("price"),
          (lit(1.0) + col("event_id") % 5).as("size"))
      val snaps = L2Book.replay(updates, depth = 5,
        samplingUs = Some(3600000000L)).toDF()
      snaps.select(
        col("instrument"), col("ts_us"),
        size(col("bids")).as("bid_depth"),
        size(col("asks")).as("ask_depth"),
        L2Book.midPrice(col("bids"), col("asks")).as("mid_price"),
        L2Book.relSpread(col("bids"), col("asks")).as("spread"))
    })
}
