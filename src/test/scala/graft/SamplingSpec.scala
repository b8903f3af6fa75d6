package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables.documents(spark, dir)

  test("hash sample: deterministic, repartition-invariant, near-fraction") {
    val s1 = Sampling.hashSample(docs, col("text"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs.repartition(7), col("text"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val n = docs.count().toDouble
    // md5 is uniform; duplicate texts share survival, widening variance
    assert(s1.size > 0.05 * n && s1.size < 0.5 * n,
      s"sample ${s1.size} of $n at fraction 0.2")
    // monotone: a smaller fraction is a subset
    val smaller = Sampling.hashSample(docs, col("text"), 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(s1))
  }

  test("balanced sample: exactly n per group, deterministic") {
    val out = Sampling.balancedSample(docs, col("lang"), col("text"),
      col("doc_id"), 5)
    val perGroup = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val groupSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groupSizes.foreach { case (g, sz) =>
      assert(perGroup(g) == math.min(5L, sz), s"group $g: ${perGroup(g)}")
    }
    val again = Sampling.balancedSample(docs.repartition(5), col("lang"),
      col("text"), col("doc_id"), 5)
    assert(out.orderBy("lang", "rn").collect().toSeq ==
      again.orderBy("lang", "rn").collect().toSeq)
  }

  test("greedy packing: capacity respected, order preserved, bins dense") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      ("a", 1L, 200L), ("a", 2L, 200L), ("a", 3L, 200L), // 200+200 | 200
      ("a", 4L, 600L),                                   // oversize: own bin
      ("a", 5L, 100L),
      ("b", 6L, 512L), ("b", 7L, 1L))
      .toDF("k", "okey", "n_tokens")
    val out = Sampling.packGreedy(rows, "n_tokens", 512L, Seq("k"), "okey")
      .select("k", "okey", "bin", "bin_fill")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("a", 1L, 0L, 200L), ("a", 2L, 0L, 400L), ("a", 3L, 1L, 200L),
      ("a", 4L, 2L, 600L), ("a", 5L, 3L, 100L),
      ("b", 6L, 0L, 512L), ("b", 7L, 1L, 1L)))
    // within-capacity bins never exceed capacity (only oversize rows do)
    val over = out.filter(t => t._4 > 512L)
    assert(over.forall(t => t._4 == 600L))
  }

  test("greedy packing with empty by: one global sequential fold") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1L to 10L).map(i => (i, 200L)).toDF("okey", "n_tokens")
      .repartition(4) // scattered input must still pack globally
    val out = Sampling.packGreedy(rows, "n_tokens", 512L, Nil, "okey")
      .select("okey", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    // 200+200 fit, third overflows: bins of 2 docs each
    assert(out == (1L to 10L).map(i => i -> ((i - 1) / 2)))
  }

  test("mixture sample: whole weights repeat, zero drops, fractions are the hashSample subset") {
    import org.apache.spark.sql.functions.col
    val out = Sampling.mixtureSample(docs.select(col("doc_id"), col("lang"), col("text")),
      col("lang"), col("text"), Map("en" -> 1.5, "de" -> 2.0, "es" -> 0.0))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 2 * inLang("de"), "whole weight 2.0 must exactly double")
    assert(!byLang.contains("es"), "zero weight must drop the group")
    assert(byLang("fr") == inLang("fr") && byLang("zh") == inLang("zh"),
      "default weight 1.0 must pass through")
    // union property: the copy=1 rows of weight 1.5 are EXACTLY the
    // rows hashSample(0.5) keeps among that group
    val extra = out.filter(col("lang") === "en" && col("copy") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = Sampling.hashSample(docs.filter(col("lang") === "en"),
        col("text"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(extra == half)
    // every copy index is dense 0..n-1 per doc
    val copies = out.filter(col("lang") === "de").groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.collect_list("copy").as("cs"))
      .collect().map(_.getSeq[Long](1).sorted)
    assert(copies.forall(_ == Seq(0L, 1L)))
  }

  test("shard shuffle: a permutation, balanced, repartition-invariant") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val out = Sampling.shuffleShards(docs, col("text"), col("doc_id"), 8)
    // exactly one (shard, pos) per row, positions dense 1..size per shard
    assert(out.count() == n)
    val sizes = out.groupBy("shard").agg(
        count(lit(1)).as("c"), max("shard_pos").as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    assert(sizes.forall { case (_, c, mx) => c == mx }, "positions not dense")
    assert(sizes.map(_._1).toSet.subsetOf((0 until 8).toSet))
    // balanced within 3x of ideal on this small corpus
    assert(sizes.map(_._2).max <= 3 * (n / 8 + 1),
      s"shards badly skewed: ${sizes.mkString(",")}")
    // deterministic under physical layout changes
    val re = Sampling.shuffleShards(docs.repartition(13), col("text"),
      col("doc_id"), 8)
    assert(re.select("doc_id", "shard", "shard_pos").except(
      out.select("doc_id", "shard", "shard_pos")).isEmpty)
  }

  test("hashSplit: partition-invariant, near-proportional, stratified per lang") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sampling.hashSplit(docs, col("text"), 0.8, 0.1)
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = frac.values.sum.toDouble
    assert(frac.keySet == Set("train", "val", "test"))
    assert(math.abs(frac("train") / n - 0.8) < 0.06, s"$frac")
    assert(math.abs(frac("val") / n - 0.1) < 0.05, s"$frac")
    // stratification: every lang has train as its dominant split
    val byLang = out.groupBy("lang", "split").count().collect()
      .groupBy(_.getString(0))
    byLang.values.foreach { rows =>
      val m = rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(m.getOrElse("train", 0L) > m.getOrElse("test", 0L),
        s"stratum not train-dominant: $m")
    }
    // determinism under physical layout
    val re = Sampling.hashSplit(docs.repartition(9), col("text"), 0.8, 0.1)
      .select("doc_id", "split")
    assert(re.except(out.select("doc_id", "split")).isEmpty)
  }

  test("token budget == naive global-window formulation on seeded random frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 5 + rnd.nextInt(60)
      val qVals = Array(0.1, 0.25, 0.25, 0.5, 0.7, 0.9) // duplicates on purpose
      val rows = (1 to n).map(i =>
        (i.toLong, qVals(rnd.nextInt(qVals.length)), 1L + rnd.nextInt(20)))
        .toDF("doc_id", "q", "n_tokens")
      val budget = 1L + rnd.nextInt(n * 12)
      val naive = rows
        .withColumn("cum_tokens", sum("n_tokens").over(
          Window.orderBy(col("q").desc, col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_tokens") <= budget)
        .select("doc_id", "q", "n_tokens", "cum_tokens")
        .collect().map(_.toSeq).toSet
      val bucketed = Sampling.tokenBudgetSelect(rows, budget)
        .collect().map(_.toSeq).toSet
      assert(bucketed == naive,
        s"trial $trial budget $budget: histogram path diverged from the global window")
    }
  }

  test("token budget: boundary bucket cut mid-way, cum identical to global window") {
    import spark.implicits._
    // quality buckets: q=0.9 {d1:5, d2:5}, q=0.5 {d3:4, d4:4}, q=0.1 {d5:1}
    // budget 15 -> all of 0.9 (cum 5,10), then d3 (cum 14); d4 would
    // hit 18 > 15; d5 never reached (prefix semantics)
    val rows = Seq(
      (1L, 0.9, 5L), (2L, 0.9, 5L), (3L, 0.5, 4L), (4L, 0.5, 4L),
      (5L, 0.1, 1L)).toDF("doc_id", "q", "n_tokens")
    val out = Sampling.tokenBudgetSelect(rows, 15L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 5L, 2L -> 10L, 3L -> 14L))
    // budget below the first doc: empty (first bucket IS the boundary)
    assert(Sampling.tokenBudgetSelect(rows, 4L).count() == 0)
    // budget covering everything: every row, full global cum
    val all = Sampling.tokenBudgetSelect(rows, 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(all == Map(1L -> 5L, 2L -> 10L, 3L -> 14L, 4L -> 18L, 5L -> 19L))
    // exact-fit edge: budget lands on a bucket border
    assert(Sampling.tokenBudgetSelect(rows, 10L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // repartition invariance
    val re = Sampling.tokenBudgetSelect(rows.repartition(4), 15L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(re == out)
  }

  test("temperature weights: hand-checked integer isqrt rule, cap binds") {
    // N=101, r=(10,1), S=11: a -> 1e6*101*10/(11*100), b -> 1e6*101/11
    val w = Sampling.temperatureWeightsMicros(Map("a" -> 100L, "b" -> 1L))
    assert(w == Map("a" -> 918181L, "b" -> 9181818L))
    // b uncapped would be 1e6*10001*1/101 = 99019801 -> cap 10 epochs
    val c = Sampling.temperatureWeightsMicros(Map("a" -> 10000L, "b" -> 1L))
    assert(c == Map("a" -> 990198L, "b" -> 10000000L))
    // uniform counts -> every weight exactly 1 epoch (mass-preserving)
    val u = Sampling.temperatureWeightsMicros(Map("a" -> 49L, "b" -> 49L))
    assert(u.values.forall(_ == 1000000L))
  }

  test("mixtureSampleMicros equals mixtureSample on representable weights") {
    val d = docs.select(col("doc_id"), col("lang"), col("text"))
    val dbl = Sampling.mixtureSample(d, col("lang"), col("text"),
        Map("en" -> 0.5, "de" -> 2.0, "fr" -> 1.25, "es" -> 0.0))
      .select("doc_id", "lang", "copy")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val mic = Sampling.mixtureSampleMicros(d, col("lang"), col("text"),
        Map("en" -> 500000L, "de" -> 2000000L, "fr" -> 1250000L, "es" -> 0L))
      .select("doc_id", "lang", "copy")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(dbl == mic)
  }

  test("temperatureMixture flattens lang skew, repartition-invariant") {
    val d = docs.select(col("doc_id"), col("lang"), col("text"))
    def ratio(counts: Map[String, Long]): Double =
      counts.values.max.toDouble / counts.values.min
    val in = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.temperatureMixture(d, col("lang"), col("text"))
    val oc = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oc.keySet == in.keySet)
    assert(ratio(oc) < ratio(in),
      s"temperature did not flatten: in=$in out=$oc")
    // alpha=0.5 preserves total mass up to integer-floor slack
    val n = in.values.sum
    assert(math.abs(oc.values.sum - n) < 0.2 * n,
      s"mass drifted: ${oc.values.sum} vs $n")
    val r1 = out.select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = Sampling.temperatureMixture(d.repartition(7), col("lang"),
        col("text")).select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2)
  }

  test("sourceCap == single-window top-k for every salt count") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.expressions.Window
    // planted: hot group with ties and a null score, tiny group under cap
    val rows = (1L to 200L).map(i => ("hot", i, if (i % 7 == 0) null
      else java.lang.Long.valueOf(i % 13))) ++
      Seq(("cold", 900L, java.lang.Long.valueOf(5L)),
        ("cold", 901L, null.asInstanceOf[java.lang.Long]))
    val df = rows.toDF("src", "id", "score")
    val w = Window.partitionBy(col("src"))
      .orderBy(coalesce(col("score"), lit(-1L)).desc, col("id").asc)
    val naive = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("src", "id", "rn").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    for (salts <- Seq(1, 3, 16, 64)) {
      val capped = Sampling.sourceCap(df, col("src"), col("score"),
          col("id"), cap = 10, salts = salts)
        .select("src", "id", "rn").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(capped == naive, s"salts=$salts diverged")
    }
    // under-cap group survives whole, null score ranks last
    assert(naive.exists(_ == ("cold", 900L, 1)))
    assert(naive.exists(_ == ("cold", 901L, 2)))
  }

  test("paddingReport: hand-checked truncation/pad math, exact ppm") {
    val spark0 = spark
    import spark0.implicits._
    // token counts under the regex tokenizer: "a b" -> 2, "a" x5 -> 5
    val df = Seq((0L, "one two"), (1L, "one two three four five")).toDF("doc_id", "text")
    val out = graft.operators.Sampling.paddingReport(df, col("text"), Seq(4L))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    // L=4: doc0 tok=2 (pad 2), doc1 tok=5 (truncate 1)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 7L && r.getLong(4) == 1L && r.getLong(5) == 2L)
    // util = (7-1) * 1e6 div (2*4) = 750000
    assert(r.getLong(6) == 750000L)
  }

  test("sourceCap repartition-invariant on real docs") {
    val score = length(col("text")).cast("long")
    val a = Sampling.sourceCap(docs, col("source"), score, col("doc_id"), 15)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Sampling.sourceCap(docs.repartition(7), col("source"), score,
        col("doc_id"), 15, salts = 5)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
