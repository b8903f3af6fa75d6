package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.core.ConfigParser
import graft.sources.SyntheticSine

class ConfigParserSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val json =
    """{"ts": "ts_us", "tie": "seq",
      | "features": [
      |   {"name": "volatility", "definition": "volatility",
      |    "deps": ["sine"],
      |    "params": {"value": "mid_price", "lookback": "1m"}}],
      | "label": {"source": "sine", "lookahead": "5s"}}""".stripMargin

  test("JSON config parses to the expected spec") {
    val cfg = ConfigParser.parse(json)
    assert(cfg.ts == "ts_us")
    assert(cfg.features.map(_.name) == Seq("volatility"))
    assert(cfg.features.head.params("lookback") == "1m")
    assert(cfg.labelSource.contains("sine"))
    assert(cfg.lookaheadUs.contains(5000000L))
  }

  test("config-built plan equals the hand-built flagship pipeline") {
    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 3600L * 1000000L, 1000000L,
        freq = 0.05)
      .select(col("ts_us"), col("seq"), col("mid_price"))
    val fromConfig = ConfigParser.buildPlan(ConfigParser.parse(json),
        Map("sine" -> src))
      .select(col("ts_us"), col("label_mid_price"), col("mid_price"),
        col("volatility_volatility").as("volatility"))
    val handBuilt = SparkEntry.entry(spark)
    assert(fromConfig.orderBy("ts_us").collect().toSeq ==
      handBuilt.orderBy("ts_us").collect().toSeq)
  }

  test("reference-shaped YAML config builds the flagship plan") {
    // Verbatim svoe FeaturizerConfig shape (featurizer/config.py:11-30;
    // test_configs/synthetic-sine-data-config.yaml + the README
    // volatility entry): dotted feature_definition names, a synthetic
    // source entry, label_feature by index, label_lookahead duration.
    // `tie: seq` is the one graft extension line (documented).
    val yaml =
      """start_date: '2024-01-01 00:00:00'
        |end_date: '2024-01-01 01:00:00'
        |label_feature: 0
        |label_lookahead: '5s'
        |tie: seq
        |feature_configs:
        |  - feature_definition: synthetic.synthetic_sine_mid_price
        |    name: sine
        |    params:
        |      data_source:
        |        - exchange: BINANCE
        |          instrument_type: spot
        |          symbol: BTC-USDT
        |          step: 1
        |          amplitude: 2000
        |          mean: 10000
        |          freq: 0.05
        |  - feature_definition: volatility.volatility_stddev_fd
        |    name: volatility
        |    params:
        |      feature:
        |        value: mid_price
        |        lookback: 1m
        |""".stripMargin
    val cfg = ConfigParser.parseYaml(yaml)
    assert(cfg.ts == "ts_us" && cfg.tie.contains("seq"))
    assert(cfg.features.map(_.name) == Seq("volatility"))
    assert(cfg.features.head.definition == "volatility")
    assert(cfg.features.head.deps == Seq("sine")) // implicit source binding
    assert(cfg.labelSource.contains("sine")) // label_feature: 0 -> entry 0
    assert(cfg.lookaheadUs.contains(5000000L))
    assert(cfg.startDate.contains("2024-01-01 00:00:00"))

    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 3600L * 1000000L, 1000000L,
        freq = 0.05)
      .select(col("ts_us"), col("seq"), col("mid_price"))
    val fromYaml = ConfigParser.buildPlan(cfg, Map("sine" -> src))
      .select(col("ts_us"), col("label_mid_price"), col("mid_price"),
        col("volatility_volatility").as("volatility"))
    assert(fromYaml.orderBy("ts_us").collect().toSeq ==
      SparkEntry.entry(spark).orderBy("ts_us").collect().toSeq)
  }

  test("reference README quick-start shape: mid_price -> volatility chain") {
    // The README's actual config names price.mid_price_fd and
    // volatility.volatility_stddev_fd over an L2 data source, with no
    // deps on the first feature — it binds implicitly to the (sole)
    // injected source, and the dotted names resolve via the alias map.
    val spark0 = spark
    import spark0.implicits._
    val yaml =
      """tie: seq
        |label_feature: mid_price
        |label_lookahead: '2s'
        |feature_configs:
        |  - feature_definition: price.mid_price_fd
        |    name: mid_price
        |    params:
        |      data_source:
        |        - exchange: BINANCE
        |          instrument_type: spot
        |          symbol: BTC-USDT
        |  - feature_definition: volatility.volatility_stddev_fd
        |    name: volatility
        |    deps: [mid_price]
        |    params:
        |      feature:
        |        value: mid_price
        |        lookback: 10s
        |""".stripMargin
    val cfg = ConfigParser.parseYaml(yaml)
    assert(cfg.features.map(_.definition) == Seq("mid_price", "volatility"))
    assert(cfg.features.head.deps.isEmpty) // bound at build time
    val t0 = 1704067200000000L
    val snaps = (0 until 20).map { i =>
      (t0 + i * 1000000L, i.toLong,
        Seq(graft.operators.L2Book.Level(100.0 + i, 1.0)),
        Seq(graft.operators.L2Book.Level(102.0 + i, 1.0)))
    }.toDF("ts_us", "seq", "bids", "asks")
    val out = ConfigParser.buildPlan(cfg, Map("book" -> snaps))
    assert(out.columns.contains("label_mid_price"))
    assert(out.columns.toSeq.exists(_.startsWith("volatility_")))
    // 2s lookahead truncates the trailing 2 rows
    assert(out.count() == 18)
    val mids = out.orderBy("ts_us").select("mid_price").collect()
      .map(_.getDouble(0))
    assert(mids.head == 101.0 && mids.last == 118.0)
  }

  test("new builtin defs: rel_spread / tvi / diff / l2_snapshot resolve and run") {
    val spark0 = spark
    import spark0.implicits._
    val snaps = Seq(
      (0L, 0L, Seq(graft.operators.L2Book.Level(99.0, 1.0)),
        Seq(graft.operators.L2Book.Level(101.0, 2.0))))
      .toDF("ts_us", "seq", "bids", "asks")
    val spread = ConfigParser.resolve("spread.relative_bid_ask_spread_fd")
      .transform(Seq(snaps), Map("ts" -> "ts_us", "seq" -> "seq"))
    assert(spread.select("spread").collect().head.getDouble(0) == 2.0 * 2 / 200.0)

    val trades = Seq((0L, 1L, 100.0, true), (5L, 2L, 50.0, false))
      .toDF("ts_us", "seq", "notional", "is_buy")
    val tvi = ConfigParser.resolve("tvi.trade_volume_imb_fd")
      .transform(Seq(trades), Map("ts" -> "ts_us", "seq" -> "seq",
        "notional" -> "notional", "is_buy" -> "is_buy",
        "lookback_us" -> "10"))
    val tviVals = tvi.orderBy("ts_us").select("tvi").collect().map(_.getDouble(0))
    assert(tviVals(0) == 2.0 && math.abs(tviVals(1) - 2.0 * 50 / 150) < 1e-15)

    val series = Seq((0L, 1L, 10.0), (5L, 2L, 12.0))
      .toDF("ts_us", "seq", "value")
    val diff = ConfigParser.resolve("transforms.diff")
      .transform(Seq(series), Map("ts" -> "ts_us", "seq" -> "seq",
        "value" -> "value", "lookback_us" -> "10"))
    val dv = diff.orderBy("ts_us").select("diff").collect().map(_.getDouble(0))
    assert(dv(0) == 0.0 && dv(1) == 0.2)

    val updates = Seq(
      ("BTC", 0L, 1L, "SET", "bid", 99.0, 1.0),
      ("BTC", 0L, 2L, "SET", "ask", 101.0, 2.0))
      .toDF("instrument", "ts_us", "seq", "update_type", "side", "price", "size")
    val book = ConfigParser.resolve("l2_book.l2_snapshot_fd")
      .transform(Seq(updates), Map("depth" -> "5"))
    val snap = book.collect().head
    assert(snap.getAs[scala.collection.Seq[_]]("bids").length == 1)
  }

  test("YAML: explicit deps, name-based label, and the per-dep index level") {
    val yaml =
      """label_feature: vol
        |label_lookahead: 1s
        |features_to_store: [0, vol]
        |feature_configs:
        |  - feature_definition: synthetic.synthetic_sine_mid_price
        |  - feature_definition: volatility.volatility_stddev_fd
        |    name: vol
        |    deps: [synthetic_sine_mid_price]
        |    params:
        |      feature:
        |        0:
        |          value: mid_price
        |          lookback: 30s
        |""".stripMargin
    val cfg = ConfigParser.parseYaml(yaml)
    assert(cfg.features.head.deps == Seq("synthetic_sine_mid_price"))
    assert(cfg.features.head.params ==
      Map("value" -> "mid_price", "lookback" -> "30s"))
    assert(cfg.labelSource.contains("vol"))
    assert(cfg.lookaheadUs.contains(1000000L))
    // features_to_store resolves indices and names like label_feature
    assert(cfg.featuresToStore == Seq("synthetic_sine_mid_price", "vol"))
  }

  test("unknown definition and unknown dep fail clearly") {
    val bad = """{"features":[{"name":"x","definition":"nope","deps":[]}]}"""
    val e = intercept[IllegalArgumentException] {
      ConfigParser.buildPlan(ConfigParser.parse(bad), Map.empty)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("config without tie builds (seq defaults to ts)") {
    val noTie =
      """{"ts": "ts_us",
        | "features": [{"name": "vol", "definition": "volatility",
        |   "deps": ["sine"], "params": {"value": "mid_price", "lookback": "1m"}}]}""".stripMargin
    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 60000000L, 1000000L, freq = 0.05)
      .select(col("ts_us"), col("mid_price"))
    val out = ConfigParser.buildPlan(ConfigParser.parse(noTie), Map("sine" -> src))
    assert(out.count() == 60)
    assert(out.columns.contains("volatility"))
  }

  test("dynamic definition loading: FQCN class and object forms resolve") {
    val byClass = ConfigParser.resolve("graft.UserScaleDef")
    assert(byClass.name == "user_scale")
    val byObject = ConfigParser.resolve("graft.UserScaleObjDef")
    assert(byObject.name == "user_scale_obj")
    val byObjectDollar = ConfigParser.resolve("graft.UserScaleObjDef$")
    assert(byObjectDollar.name == "user_scale_obj")
    // end-to-end: a config naming the FQCN builds and runs
    val cfgJson =
      """{"ts": "ts_us",
        | "features": [{"name": "s", "definition": "graft.UserScaleDef",
        |   "deps": ["sine"], "params": {"value": "mid_price"}}]}""".stripMargin
    val t0 = 1704067200000000L
    val src = SyntheticSine(spark, t0, t0 + 10000000L, 1000000L, freq = 0.05)
      .select(col("ts_us"), col("mid_price"))
    val out = ConfigParser.buildPlan(ConfigParser.parse(cfgJson), Map("sine" -> src))
    assert(out.columns.contains("scaled") && out.count() == 10)
    val e = intercept[IllegalArgumentException] {
      ConfigParser.resolve("graft.Tables") // real class, not a FeatureDef
    }
    assert(e.getMessage.contains("not a FeatureDef"))
    // a zero-arg companion class must not shadow its FeatureDef object
    assert(ConfigParser.resolve("graft.ShadowedDef").name == "shadowed")
  }

  test("config root PIT join breaks equal-ts feature ties via the order key") {
    // Duplicate-microsecond feature rows: the config-built root join
    // must pick the same (max-seq) winner as an explicit
    // rightTieBreak — pandas merge_asof last-sorted-row semantics —
    // not a partition-order-dependent last().
    val spark0 = spark
    import spark0.implicits._
    val t0 = 1704067200000000L
    val src = Seq(
      (t0, 1L, 10.0), (t0, 2L, 20.0), // tie at t0
      (t0 + 1000000L, 3L, 30.0),
      (t0 + 2000000L, 4L, 40.0),
      (t0 + 3000000L, 5L, 50.0))
      .toDF("ts_us", "seq", "mid_price")
    val cfgJson =
      """{"ts": "ts_us", "tie": "seq",
        | "features": [{"name": "vol", "definition": "volatility",
        |   "deps": ["sine"], "params": {"value": "mid_price", "lookback": "2s"}}],
        | "label": {"source": "sine", "lookahead": "1s"}}""".stripMargin
    val fromConfig = ConfigParser.buildPlan(ConfigParser.parse(cfgJson),
      Map("sine" -> src))
    // hand-built equivalent with the tie-break explicit
    val vol = graft.core.BuiltinDefs.VolatilityDef.transform(Seq(src),
      Map("ts" -> "ts_us", "seq" -> "seq", "value" -> "mid_price",
        "lookback_us" -> "2000000"))
    val labeled = graft.operators.AsofJoin.lookaheadShift(src, "ts_us",
      1000000L, Nil, "label", Some("seq"))
    val expected = graft.operators.AsofJoin.pointInTimeJoin(labeled,
        Seq(("vol", vol)), "ts_us", Nil, Some("seq"))
      .drop("vol_seq") // PitJoinDef drops the prefixed tie plumbing
    assert(fromConfig.orderBy("ts_us", "seq").collect().toSeq ==
      expected.orderBy("ts_us", "seq").collect().toSeq)
    // the tie column is join plumbing — it must not leak as vol_seq
    assert(!fromConfig.columns.contains("vol_seq"))
    // and the tie at t0 resolved to the seq=2 row's running volatility
    val atT0 = fromConfig.filter(col("ts_us") === t0 && col("seq") === 1)
      .select("vol_volatility").collect()
    assert(atT0.nonEmpty && atT0.head.getDouble(0) == 5.0) // stddev_pop(10,20)
  }

  test("multiple features without a label is rejected, not silently truncated") {
    val two =
      """{"ts": "ts_us",
        | "features": [
        |  {"name": "a", "definition": "volatility", "deps": ["sine"],
        |   "params": {"value": "mid_price", "lookback": "1m"}},
        |  {"name": "b", "definition": "volatility", "deps": ["sine"],
        |   "params": {"value": "mid_price", "lookback": "2m"}}]}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      ConfigParser.buildPlan(ConfigParser.parse(two),
        Map("sine" -> spark.range(1).toDF()))
    }
    assert(e.getMessage.contains("label"))
  }

  test("trainer config: the reference TrainerConfig/TunerConfig yaml parses") {
    // the svoe trainer-config.yaml shape verbatim (trainer_manager.py
    // :21-48): xgboost section + tuner_config with randint param space
    val yaml =
      """xgboost:
        |  params:
        |    tree_method: 'approx'
        |    objective: 'reg:linear'
        |  num_boost_rounds: 10
        |  train_valid_test_split: [0.5, 0.3]
        |num_workers: 3
        |tuner_config:
        |  param_space:
        |    params:
        |      max_depth:
        |        randint: {lower: 2, upper: 8}
        |  num_samples: 8
        |  metric: 'train-logloss'
        |  mode: 'min'
        |""".stripMargin
    val conf = ConfigParser.parseTrainerYaml(yaml)
    assert(conf.numBoostRounds == 10)
    assert(conf.trainValidTestSplit == Seq(0.5, 0.3))
    assert(conf.paramSpace("max_depth") ==
      graft.consumers.Trainer.ParamRange(2, 8))
    assert(conf.numSamples == 8 && conf.mode == "min")
    // the spec maps onto the exact tuner: un-searched rounds pin to
    // the fixed config value, searched max_depth keeps its range
    val spec = conf.tunerSpec
    assert(spec.rounds == graft.consumers.Trainer.ParamRange(10, 10))
    assert(spec.maxDepth == graft.consumers.Trainer.ParamRange(2, 8))
    // float samplers are rejected loudly, not silently quantized
    val bad = yaml.replace("randint", "loguniform")
    val e2 = intercept[IllegalArgumentException] {
      ConfigParser.parseTrainerYaml(bad)
    }
    assert(e2.getMessage.contains("randint"))
  }

  test("tuner: deterministic candidates, one winner, min (sse, trial) rule") {
    import graft.consumers.Trainer
    val spark0 = spark
    import spark0.implicits._
    val spec = Trainer.TunerSpec(Trainer.ParamRange(1, 3),
      Trainer.ParamRange(1, 3), numSamples = 3)
    // the sampling is the shared metadata contract with the oracle:
    // pinned so a hash change cannot silently re-run different trials
    assert(Trainer.sampleCandidates(spec) ==
      Seq((0, 1, 2), (1, 3, 1), (2, 3, 2)))
    val rows = (0 until 400).map { i =>
      (i % 11L, i % 5L, (i % 11L) * 9 + (i % 5L) * 2,
        i % 4 != 0, i % 4 == 0) // 75% train, 25% valid
    }.toDF("f1", "f2", "y", "is_train", "is_valid")
    val (best, trials) = Trainer.tune(rows, Seq("f1", "f2"), "y",
      "is_train", "is_valid", spec)
    assert(trials.count(_.isBest) == 1)
    val winner = trials.find(_.isBest).get
    assert(trials.forall(t => winner.sseValid < t.sseValid ||
      (winner.sseValid == t.sseValid && winner.trial <= t.trial)))
    assert(best.rounds.size == winner.rounds)
    // deeper/more-rounds candidates can only fit this separable-ish
    // target better: the winner is the (3, 2) candidate
    assert(winner.rounds == 3 && winner.maxDepth == 2)
    intercept[IllegalArgumentException] {
      Trainer.tune(rows, Seq("f1", "f2"), "y", "is_train", "is_valid",
        spec.copy(metric = "train-logloss"))
    }
  }
}
