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
  * meaningless for models), `kind` in ('feature', 'linear', 'tree',
  * 'boost'). 'feature' rows pin the feature-column ORDER (idx ->
  * name); 'linear' rows carry (idx, weight) with idx 0 = intercept;
  * 'tree' rows are [[Trainer.TreeModel.treeFrame]] rows verbatim;
  * 'boost' rows (r16) are the base-mean row (round 0) plus per-round
  * tree nodes with `contrib` = leafUnit + round offset. */
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
      threshold: Option[Long], pred_micros: Option[Long],
      round: Option[Long] = None, contrib: Option[Long] = None)

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
      case bm: Trainer.BoostedModel =>
        // round 0 = the base-mean row (node 1, contrib = base); rounds
        // 1..R are tree nodes with contrib = leafUnit + round offset —
        // the offset is recoverable as contrib - sum_y/n on any row,
        // so the load path needs no extra column
        val baseRow = RegRow(0, ver, "boost", 0, None, None, Some(1L),
          Some(0L), Some(bm.baseN), Some(bm.baseSumY), Some(bm.baseSse),
          None, None, Some(0L), Some(bm.base))
        val nodes = bm.rounds.zipWithIndex.flatMap { case ((t, off), g) =>
          t.nodes.values.toSeq.sortBy(_.node).map { r =>
            RegRow(0, ver, "boost", 0, r.feature, None, Some(r.node),
              Some(r.depth.toLong), Some(r.n), Some(r.sumY), Some(r.sse),
              r.threshold, None, Some(g + 1L), Some(t.leafUnit(r.node) + off))
          }
        }
        val stamped = (baseRow +: nodes).zipWithIndex.map { case (r, i) =>
          r.copy(ts_us = i.toLong, idx = i.toLong)
        }
        stamped ++ featureRows(ver, bm.featureCols, stamped.size)
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
    def fi(s: String): Int = rows.head.fieldIndex(s)
    if (byKind.contains("boost")) {
      val fcols = byKind("feature").sortBy(_.getLong(fi("idx")))
        .map(_.getString(fi("feature"))).toSeq
      val byRound = byKind("boost").groupBy(_.getLong(fi("round")))
      val b = byRound(0L).head
      val trees = byRound.keys.filter(_ > 0L).toSeq.sorted.map { g =>
        val rs = byRound(g)
        val t = Trainer.treeFromRows(fcols, rs.toSeq)
        val r1 = rs.find(_.getLong(fi("node")) == 1L).get
        (t, r1.getLong(fi("contrib")) - t.leafUnit(1L))
      }
      Trainer.BoostedModel(fcols, b.getLong(fi("contrib")),
        b.getLong(fi("n")), b.getLong(fi("sum_y")), b.getLong(fi("sse")),
        trees)
    } else if (byKind.contains("tree")) {
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
