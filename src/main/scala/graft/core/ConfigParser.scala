package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import graft.time.TimeUtils
import scala.jdk.CollectionConverters._

/** Declarative-config front door (svoe `featurizer/config.py:11-30` +
  * `feature_tree.py:92-153`): a JSON config names parameterized
  * features, their dependency wiring, the label feature and lookahead;
  * the planner builds the Feature forest (content-key dedup included)
  * and returns the FeatureLabelSet frame. JSON is the YAML-subset the
  * reference uses; parsing is Jackson (ships with Spark).
  *
  * {{{
  * {"ts": "ts_us", "tie": "seq",
  *  "features": [
  *    {"name": "vol", "definition": "volatility", "deps": ["sine"],
  *     "params": {"value": "mid_price", "lookback": "1m"}}],
  *  "label": {"source": "sine", "lookahead": "5s"}}
  * }}}
  */
object ConfigParser {

  final case class FeatureSpec(name: String, definition: String,
      deps: Seq[String], params: Map[String, String])

  final case class GraftConfig(ts: String, tie: Option[String],
      features: Seq[FeatureSpec], labelSource: Option[String],
      lookaheadUs: Option[Long],
      startDate: Option[String] = None, endDate: Option[String] = None,
      featuresToStore: Seq[String] = Nil)

  /** Definition registry; user definitions can be added here. */
  val registry: Map[String, FeatureDef] = Map(
    "volatility" -> BuiltinDefs.VolatilityDef,
    "ohlcv" -> BuiltinDefs.OhlcvDef,
    "mid_price" -> BuiltinDefs.MidPriceDef,
    "rel_spread" -> BuiltinDefs.RelSpreadDef,
    "l2_snapshot" -> BuiltinDefs.L2SnapshotDef,
    "tvi" -> BuiltinDefs.TviDef,
    "diff" -> BuiltinDefs.DiffDef,
    "lookahead_label" -> BuiltinDefs.LookaheadLabelDef,
    "pit_join" -> BuiltinDefs.PitJoinDef)

  /** Resolve a definition name: the static registry first, then a
    * fully-qualified class name loaded reflectively from the session
    * classpath (user jars on `--jars` work the same way) — the
    * reference's dotted-name dynamic definition loading (svoe
    * `featurizer/featurizer_utils/definitions_loader.py:15-128`),
    * minus its remote-code fetch (a deployment concern, not an engine
    * one). Accepts a Scala `object ... extends FeatureDef` (with or
    * without the trailing '$') or a zero-arg class. */
  def resolve(name: String): FeatureDef =
    registry.get(name)
      .orElse(referenceAliases.get(name.split('.').last).flatMap(registry.get))
      .getOrElse(loadByName(name))

  private def loadByName(fqcn: String): FeatureDef = {
    def instantiate(cn: String): Option[Any] =
      try {
        val cls = Class.forName(cn)
        Some(
          if (cn.endsWith("$")) cls.getField("MODULE$").get(null)
          else cls.getDeclaredConstructor().newInstance())
      } catch {
        case _: ClassNotFoundException | _: NoSuchFieldException |
            _: NoSuchMethodException => None
      }
    // try the plain FQCN, then the '$' object form — and fall through
    // to the object form when the plain form loads but is not a
    // FeatureDef (a zero-arg companion class must not shadow its
    // FeatureDef companion object)
    instantiate(fqcn) match {
      case Some(d: FeatureDef) => d
      case plain =>
        instantiate(fqcn + "$") match {
          case Some(d: FeatureDef) => d
          case dollar => plain.orElse(dollar) match {
            case Some(other) => throw new IllegalArgumentException(
              s"'$fqcn' loaded but ${other.getClass.getName} is not a FeatureDef")
            case None => throw new IllegalArgumentException(
              s"unknown definition '$fqcn' (not in registry, not loadable as a class)")
          }
        }
    }
  }

  def parse(json: String): GraftConfig = {
    val root = new ObjectMapper().readTree(json)
    def str(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).map(_.asText())
    val features = Option(root.get("features")).toSeq
      .flatMap(_.elements().asScala)
      .map { f =>
        FeatureSpec(
          name = f.get("name").asText(),
          definition = f.get("definition").asText(),
          deps = Option(f.get("deps")).toSeq
            .flatMap(_.elements().asScala).map(_.asText()),
          params = Option(f.get("params")).map(p =>
            p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty))
      }
    val label = Option(root.get("label"))
    GraftConfig(
      ts = str(root, "ts").getOrElse("ts_us"),
      tie = str(root, "tie"),
      features = features,
      labelSource = label.flatMap(str(_, "source")),
      lookaheadUs = label.flatMap(str(_, "lookahead")).map(TimeUtils.parseMicros))
  }

  /** Dotted reference definition names → registry keys, so a reference
    * user's `feature_definition: volatility.volatility_stddev_fd` lines
    * resolve without edits (svoe `features/definitions` catalog). */
  private val referenceAliases: Map[String, String] = Map(
    "volatility_stddev_fd" -> "volatility",
    "ohlcv_fd" -> "ohlcv",
    "mid_price_fd" -> "mid_price",
    "relative_bid_ask_spread_fd" -> "rel_spread",
    "l2_snapshot_fd" -> "l2_snapshot",
    "trade_volume_imb_fd" -> "tvi",
    "diff" -> "diff")

  /** Reference-shaped YAML front door — parses the svoe
    * `FeaturizerConfig` schema verbatim (`featurizer/config.py:11-30`;
    * `featurizer/test_configs` for the concrete files): a
    * `feature_configs` list with dotted `feature_definition` names,
    * optional `name`/`deps`, nested `params`; `label_feature` by
    * index-or-name into the config list; `label_lookahead` in the
    * duration grammar; `start_date`/`end_date` surfaced on the config
    * (time-range selection belongs to the catalog scan —
    * `BlockCatalog.scan` — not the logical plan). Jackson's YAML
    * dataformat ships on the Spark classpath, so no new dependency.
    *
    * Mapping rules:
    *   - a `synthetic.*` definition declares the injected SOURCE's
    *     name (its data is a DataFrame handed to [[buildPlan]], exactly
    *     like the reference's synthetic data-source definitions);
    *   - features without explicit `deps` read the first declared
    *     source (the reference's implicit data_source binding);
    *   - graft param names sit under `params.feature` — an integer
    *     index level (the reference's per-dep keying) is descended
    *     through; non-scalar entries (`data_source`, `dep_schema`
    *     blocks) are deployment binding, not plan parameters;
    *   - graft extensions, both optional: top-level `ts`/`tie` column
    *     names (the reference hardcodes its timestamp column; graft
    *     defaults `ts_us` / no tie). */
  def parseYaml(yamlText: String): GraftConfig = {
    val root = new ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()).readTree(yamlText)
    def str(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).map(_.asText())
    val fcs = Option(root.get("feature_configs")).toSeq
      .flatMap(_.elements().asScala).toSeq
    def entryName(f: JsonNode): String =
      str(f, "name").getOrElse(
        f.get("feature_definition").asText().split('.').last)
    def isSource(f: JsonNode): Boolean =
      f.get("feature_definition").asText().startsWith("synthetic.")
    def featureParams(f: JsonNode): Map[String, String] = {
      def flat(n: JsonNode): Map[String, String] = {
        val fields = n.properties().asScala.toSeq
        if (fields.nonEmpty && fields.forall(_.getKey.forall(_.isDigit)))
          fields.map(e => flat(e.getValue)).fold(Map.empty)(_ ++ _)
        else fields.filter(_.getValue.isValueNode)
          .map(e => e.getKey -> e.getValue.asText()).toMap
      }
      Option(f.get("params")).flatMap(p => Option(p.get("feature")))
        .map(flat).getOrElse(Map.empty)
    }
    val orderedNames = fcs.map(entryName)
    val defaultDep = fcs.filter(isSource).map(entryName).headOption
    val features = fcs.filterNot(isSource).map { f =>
      val explicitDeps = Option(f.get("deps")).toSeq
        .flatMap(_.elements().asScala).map(_.asText())
      val dotted = f.get("feature_definition").asText()
      val defn =
        if (registry.contains(dotted)) dotted
        else referenceAliases.getOrElse(dotted.split('.').last, dotted)
      FeatureSpec(entryName(f), defn,
        if (explicitDeps.nonEmpty) explicitDeps else defaultDep.toSeq,
        featureParams(f))
    }
    val labelSource = Option(root.get("label_feature")).map { n =>
      if (n.isIntegralNumber) orderedNames(n.asInt()) else n.asText()
    }
    // features_to_store (index-or-name list): which features the
    // feature store persists — consumed by Forest.buildMemoized
    // callers; resolved to names here like label_feature
    val toStore = Option(root.get("features_to_store")).toSeq
      .flatMap(_.elements().asScala)
      .map(n => if (n.isIntegralNumber) orderedNames(n.asInt()) else n.asText())
    GraftConfig(
      ts = str(root, "ts").getOrElse("ts_us"),
      tie = str(root, "tie"),
      features = features,
      labelSource = labelSource,
      lookaheadUs = str(root, "label_lookahead").map(TimeUtils.parseMicros),
      startDate = str(root, "start_date"),
      endDate = str(root, "end_date"),
      featuresToStore = toStore)
  }

  /** Config → Feature forest → FeatureLabelSet frame. Duration-valued
    * params (`lookback`, `window`) accept the reference's duration
    * grammar and are normalized to micros. */
  def buildPlan(cfg: GraftConfig, sources: Map[String, DataFrame]): DataFrame = {
    val common = Map("ts" -> cfg.ts) ++ cfg.tie.map("seq" -> _) ++ cfg.tie.map("tie" -> _)

    def normalize(params: Map[String, String]): Map[String, String] =
      params.map {
        case ("lookback", v) => "lookback_us" -> TimeUtils.parseMicros(v).toString
        case ("window", v) => "window_us" -> TimeUtils.parseMicros(v).toString
        case ("sampling", v) => "sampling_us" -> TimeUtils.parseMicros(v).toString
        case kv => kv
      }

    val nodes = scala.collection.mutable.Map.empty[String, Feature]
    sources.keys.foreach(s => nodes(s) = Feature(SourceDef(s)))
    cfg.features.foreach { spec =>
      val defn = resolve(spec.definition)
      // a feature with no declared deps binds to the sole injected
      // source (the reference's implicit data_source binding — its
      // README configs never name deps); ambiguous with several sources
      val depNames =
        if (spec.deps.nonEmpty) spec.deps
        else {
          require(sources.size == 1,
            s"feature '${spec.name}' declares no deps; with ${sources.size} " +
              "sources the binding is ambiguous — name deps explicitly")
          Seq(sources.keys.head)
        }
      val deps = depNames.map(d => nodes.getOrElse(d,
        throw new IllegalArgumentException(s"unknown dep '$d' of '${spec.name}'")))
      nodes(spec.name) = Feature(defn, common ++ normalize(spec.params), deps)
    }

    val featureNodes = cfg.features.map(f => f.name -> nodes(f.name))
    val root = cfg.labelSource match {
      case Some(src) =>
        val labeled = Feature(BuiltinDefs.LookaheadLabelDef,
          common + ("delta_us" -> cfg.lookaheadUs.getOrElse(
            throw new IllegalArgumentException("label requires lookahead")).toString),
          Seq(nodes(src)))
        // `tie` flows into the root PIT join: feature frames that carry
        // the order key get a deterministic equal-ts winner (pandas
        // merge_asof last-sorted-row semantics); frames without it are
        // unique per (by, ts) by construction (aggregations).
        Feature(BuiltinDefs.PitJoinDef,
          Map("ts" -> cfg.ts, "names" -> featureNodes.map(_._1).mkString(","))
            ++ cfg.tie.map("tie" -> _),
          labeled +: featureNodes.map(_._2))
      case None =>
        require(featureNodes.nonEmpty, "config needs features or a label")
        require(featureNodes.size == 1,
          "config without a label must declare exactly one feature; to " +
            "combine several, add a label block (the PIT join aligns them)")
        featureNodes.head._2
    }
    Forest.build(Seq(root), sources)(root)
  }

  /** Parsed trainer configuration — the reference `TrainerConfig`
    * schema (svoe `trainer/trainer_manager.py:21-48`,
    * `trainer/trainer-config.yaml`): a trainer section
    * (`xgboost:`/`boost:`) with `num_boost_rounds` and
    * `train_valid_test_split`, plus an optional `tuner_config` with
    * `param_space.params` randint ranges, `num_samples`, `metric`,
    * `mode`. [[tunerSpec]] maps it onto the exact tuner surface:
    * `num_boost_rounds`/`max_depth` ranges come from the param space
    * when searched, else pin to the fixed config values. */
  final case class TrainerConf(numBoostRounds: Int,
      trainValidTestSplit: Seq[Double],
      paramSpace: Map[String, graft.consumers.Trainer.ParamRange],
      numSamples: Int, metric: String, mode: String) {
    def tunerSpec: graft.consumers.Trainer.TunerSpec =
      graft.consumers.Trainer.TunerSpec(
        rounds = paramSpace.getOrElse("num_boost_rounds",
          graft.consumers.Trainer.ParamRange(numBoostRounds, numBoostRounds)),
        maxDepth = paramSpace.getOrElse("max_depth",
          graft.consumers.Trainer.ParamRange(3, 3)),
        numSamples = numSamples, metric = metric, mode = mode)
  }

  /** Parse the reference-shaped trainer YAML. Only `randint` ranges
    * are supported in the param space (the reference's float samplers
    * — uniform/loguniform/… — parameterize float fitters; the exact
    * tuner searches integer knobs). Unknown sampler names are loud. */
  def parseTrainerYaml(yamlText: String): TrainerConf = {
    val root = new ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()).readTree(yamlText)
    val trainer = Option(root.get("boost")).orElse(Option(root.get("xgboost")))
      .getOrElse(throw new IllegalArgumentException(
        "trainer config needs a boost:/xgboost: section"))
    val split = Option(trainer.get("train_valid_test_split")).toSeq
      .flatMap(_.elements().asScala).map(_.asDouble()).toSeq
    val tuner = Option(root.get("tuner_config"))
    val space: Map[String, graft.consumers.Trainer.ParamRange] =
      tuner.flatMap(t => Option(t.get("param_space")))
        .flatMap(p => Option(p.get("params"))).toSeq
        .flatMap(_.properties().asScala)
        .map { e =>
          val samplers = e.getValue.properties().asScala.toSeq
          require(samplers.size == 1 && samplers.head.getKey == "randint",
            s"param ${e.getKey}: only randint is exactly replayable, " +
              s"got ${samplers.map(_.getKey).mkString(",")}")
          val r = samplers.head.getValue
          e.getKey -> graft.consumers.Trainer.ParamRange(
            r.get("lower").asInt(), r.get("upper").asInt())
        }.toMap
    TrainerConf(
      numBoostRounds = Option(trainer.get("num_boost_rounds"))
        .map(_.asInt()).getOrElse(3),
      trainValidTestSplit = split,
      paramSpace = space,
      numSamples = tuner.flatMap(t => Option(t.get("num_samples")))
        .map(_.asInt()).getOrElse(1),
      metric = tuner.flatMap(t => Option(t.get("metric")))
        .map(_.asText()).getOrElse("sse_valid"),
      mode = tuner.flatMap(t => Option(t.get("mode")))
        .map(_.asText()).getOrElse("min"))
  }
}
