package graft.consumers

import org.apache.spark.sql.functions._
import graft.sources.BlockCatalog

/** Model registry over the versioned [[BlockCatalog]] — the
  * reproducibility surface the reference gets from MLflow
  * (svoe `trainer/svoe_mlflow_client.py`: register + version trained
  * models): a fitted model serializes to a small typed frame stored
  * as a catalog block under `definition = "__model__"`, `key = name`,
  * so model ARTIFACTS ride the same append-only versioned log as data
  * — a training run records (name, version) and re-loads the exact
  * artifact regardless of later re-registrations (time travel), and
  * the registry is disaster-trivial: it IS parquet + the catalog's
  * meta log.
  *
  * Catalog semantics note: catalog reads UNION live blocks, but a
  * registry wants one-artifact-per-version — so every row carries the
  * registration version (`__ver`, stamped to match the catalog's own
  * version counter) and a load filters to the highest `__ver` at or
  * below the requested version. Registrations are append-only; every
  * historical version stays loadable until a catalog vacuum (same
  * retention trade as data snapshots).
  *
  * Frame shape (one schema for every model kind; unused columns
  * null): `ts_us` = row ordinal (the catalog's required time axis —
  * meaningless for models), `kind` in ('feature', 'linear', 'tree').
  * 'feature' rows pin the feature-column ORDER (idx -> name);
  * 'linear' rows carry (idx, weight) with idx 0 = intercept; 'tree'
  * rows are [[Trainer.TreeModel.treeFrame]] rows verbatim. */
object ModelRegistry {

  private val Definition = "__model__"
  // ts bound far below any timestamp-range edge (year 2100); ordinals
  // are tiny, so scans always cover them
  private val TsBound = 4102444800000000L

  // private[graft], not private: Scala-private nested classes compile
  // to bytecode the encoder's generated Java cannot call (Janino
  // access error -> interpreted fallback); qualified private stays
  // public in bytecode
  private[graft] final case class RegRow(ts_us: Long, __ver: Long, kind: String,
      idx: Long, feature: Option[String], weight: Option[Double],
      node: Option[Long], depth: Option[Long], n: Option[Long],
      sum_y: Option[Long], sse: Option[Long],
      threshold: Option[Long], pred_micros: Option[Long])

  private def featureRows(ver: Long, cols: Seq[String],
      from: Int): Seq[RegRow] =
    cols.zipWithIndex.map { case (c, i) =>
      RegRow(from + i, ver, "feature", i, Some(c), None, None, None, None,
        None, None, None, None)
    }

  /** Register a fitted model under `name`; returns the catalog version
    * that now identifies it (pass to [[loadAsOf]] to re-load exactly
    * this artifact forever). */
  def register(cat: BlockCatalog, name: String, model: Trainer.Model): Long = {
    val spark = cat.spark
    import spark.implicits._
    val ver = cat.currentVersion(Definition, name) + 1
    val rows: Seq[RegRow] = model match {
      case lm: Trainer.LinearModel =>
        val w = RegRow(0, ver, "linear", 0, None, Some(lm.intercept), None,
          None, None, None, None, None, None) +:
          lm.weights.toSeq.zipWithIndex.map { case (v, i) =>
            RegRow(i + 1L, ver, "linear", i + 1L, None, Some(v), None, None,
              None, None, None, None, None)
          }
        w // linear models carry no feature names at fit time; the
          // caller binds columns at predict time (modelStrategy)
      case tm: Trainer.TreeModel =>
        val nodes = tm.nodes.values.toSeq.sortBy(_.node).zipWithIndex.map {
          case (r, i) =>
            RegRow(i.toLong, ver, "tree", i.toLong, r.feature, None,
              Some(r.node), Some(r.depth.toLong), Some(r.n), Some(r.sumY),
              Some(r.sse), r.threshold, Some(r.predMicros))
        }
        nodes ++ featureRows(ver, tm.featureCols, nodes.size)
      case other =>
        throw new IllegalArgumentException(
          s"unregistrable model kind: ${other.getClass.getName}")
    }
    val stored = cat.write(rows.toDF(), Definition, name, "ts_us")
    require(stored, s"registry write for $name@v$ver was skipped — " +
      "identical content already cataloged under a different version stamp")
    cat.currentVersion(Definition, name)
  }

  /** Latest registered model under `name`. */
  def load(cat: BlockCatalog, name: String): Trainer.Model =
    loadAsOf(cat, name, Long.MaxValue)

  /** The model as of catalog version `ver` — exact artifact time
    * travel. */
  def loadAsOf(cat: BlockCatalog, name: String, ver: Long): Trainer.Model = {
    val all = cat.scan(Definition, name, 0L, TsBound, "ts_us")
      .filter(col("__ver") <= ver)
    val rows = all.collect()
    require(rows.nonEmpty, s"no model registered as $name at or before v$ver")
    val vmax = rows.map(_.getLong(rows.head.fieldIndex("__ver"))).max
    val live = rows.filter(_.getLong(rows.head.fieldIndex("__ver")) == vmax)
    val byKind = live.groupBy(_.getString(rows.head.fieldIndex("kind")))
    if (byKind.contains("tree")) {
      val fcols = byKind("feature")
        .sortBy(_.getLong(rows.head.fieldIndex("idx")))
        .map(_.getString(rows.head.fieldIndex("feature"))).toSeq
      Trainer.treeFromRows(fcols, byKind("tree").toSeq)
    } else {
      val ws = byKind("linear")
        .sortBy(_.getLong(rows.head.fieldIndex("idx")))
        .map(_.getDouble(rows.head.fieldIndex("weight")))
      Trainer.LinearModel(ws.head, ws.tail)
    }
  }
}
