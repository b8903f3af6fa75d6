package graft.consumers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** FeatureLabelSet consumption utilities (svoe `runner.py:113-145`):
  * label-column discovery by prefix and a leakage-safe time-ordered
  * train/test split (threshold on event time, not a random split —
  * future rows never leak into training).
  */
object TrainSplit {

  /** Columns produced by the lookahead label shift. */
  def labelCols(df: DataFrame, prefix: String = "label_"): Seq[String] =
    df.columns.filter(_.startsWith(prefix)).toSeq

  def featureCols(df: DataFrame, tsCol: String, prefix: String = "label_"): Seq[String] =
    df.columns.filterNot(c => c.startsWith(prefix) || c == tsCol).toSeq

  /** Split at the exact `trainFrac` quantile of the ts column:
    * train = rows with ts <= the k-th smallest ts (ties at the
    * threshold all land in train — leakage-safe direction), test = the
    * rest. Deterministic (exact ordered rank, not approxQuantile).
    * The rank path uses `limit`, bounded to Int range — beyond ~2B rows
    * compute the threshold via an ordered window rank instead. */
  def timeSplit(df: DataFrame, tsCol: String, trainFrac: Double)
      : (DataFrame, DataFrame) = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac in (0,1)")
    val n = df.count()
    val k = math.max(1L, (n * trainFrac).toLong)
    require(k <= Int.MaxValue,
      s"timeSplit rank $k exceeds Int range; use a window-rank threshold")
    val threshold = df.select(col(tsCol)).orderBy(col(tsCol).asc)
      .limit(k.toInt).agg(org.apache.spark.sql.functions.max(col(tsCol)))
      .collect()(0).getLong(0)
    (df.filter(col(tsCol) <= threshold), df.filter(col(tsCol) > threshold))
  }
}
