package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, WindowOps}

/** Built-in feature definitions binding the operator library into the
  * declarative forest (the reference's `features/definitions` catalog
  * re-expressed as `FeatureDef`s). Params are string-typed as in the
  * reference's YAML config surface.
  *
  * Common params: `ts` (epoch-micros column), `seq` (total-order
  * tiebreak column), `by` (comma-separated key columns, optional).
  */
object BuiltinDefs {

  private def byCols(params: Map[String, String]): Seq[Column] =
    params.get("by").toSeq.flatMap(_.split(',').filter(_.nonEmpty)).map(col)

  private def byNames(params: Map[String, String]): Seq[String] =
    params.get("by").toSeq.flatMap(_.split(',').filter(_.nonEmpty))

  /** Total-order key: the `seq` tiebreak defaults to `ts` itself when a
    * config omits it (ties then resolve arbitrarily-but-deterministically
    * only if ts is unique — supply `tie` for duplicate timestamps). */
  private def okeyOf(params: Map[String, String]): Column =
    WindowOps.orderKey(col(params("ts")),
      col(params.getOrElse("seq", params("ts"))))

  /** A2: sliding population stddev of `value` over `lookback_us`.
    * The `seq` order key passes through the output so a downstream PIT
    * join can break equal-ts ties deterministically (pandas merge_asof
    * takes the last sorted right row; without the key, `last()` over
    * tie=0 rows would be partition-order-dependent). */
  object VolatilityDef extends FeatureDef {
    val name = "volatility"
    def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame = {
      val df = deps.head
      val okey = okeyOf(params)
      val seqCol = params.get("seq").filterNot(_ == params("ts")).map(col).toSeq
      df.select((byCols(params) ++ (col(params("ts")) +: seqCol) :+
        WindowOps.volatility(col(params("value")), byCols(params), okey,
          params("lookback_us").toLong).as("volatility")): _*)
    }
  }

  /** A1: OHLCV per tumbling `window_us` bucket. */
  object OhlcvDef extends FeatureDef {
    val name = "ohlcv"
    def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame = {
      val df = deps.head
      val okey = okeyOf(params)
      WindowOps.ohlcv(df, col(params("ts")), okey, col(params("price")),
        col(params("amount")), params("window_us").toLong, byCols(params))
    }
  }

  /** J3: lookahead label shift by `delta_us`. */
  object LookaheadLabelDef extends FeatureDef {
    val name = "lookahead_label"
    def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame =
      AsofJoin.lookaheadShift(deps.head, params("ts"),
        params("delta_us").toLong, byNames(params), "label",
        params.get("tie"))
  }

  /** J1 root: point-in-time join of feature frames onto the label
    * frame (deps.head). `names` = comma-separated feature prefixes for
    * deps.tail. */
  object PitJoinDef extends FeatureDef {
    val name = "pit_join"
    def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame = {
      val names = params("names").split(',').toSeq
      val joined = AsofJoin.pointInTimeJoin(deps.head, names.zip(deps.tail),
        params("ts"), byNames(params), params.get("tie"))
      // the tie column rode along through feature frames purely to
      // order equal-ts rows — drop its prefixed copies from the
      // user-facing FeatureLabelSet schema
      params.get("tie") match {
        case Some(t) => joined.drop(names.map(n => s"${n}_$t"): _*)
        case None => joined
      }
    }
  }
}
