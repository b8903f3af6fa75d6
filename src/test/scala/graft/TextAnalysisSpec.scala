package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis => TA}

/** Unit goldens for the text-analysis operators whose main coverage is
  * the DuckDB oracles (doc_langid/quality/tokens/repetition) — these
  * pin the JVM-side semantics on hand-computable inputs. */
class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("repetitionStats: duplicate trigrams and top-word fraction") {
    // "a b a b a b" -> words=6, trigrams=4: "a b a","b a b","a b a","b a b"
    // -> distinct=2, dup_frac=0.5; top word "a" count 3/6 = 0.5
    // "x y z" -> 3 words, 1 trigram, distinct 1, dup 0; top 1/3 = 0.3333
    // "w" -> 1 word, 0 trigrams -> dup_frac null
    val df = Seq((1L, "a b a b a b"), (2L, "x y z"), (3L, "w"))
      .toDF("doc_id", "text")
    val out = TA.repetitionStats(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(out(1L) == ((6, 4, 2, Some(0.5), Some(0.5))))
    assert(out(2L) == ((3, 1, 1, Some(0.0), Some(0.3333))))
    assert(out(3L) == ((1, 0, 0, None, Some(1.0))))
  }

  test("scrubPii: redacts all emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "mail a@b.io and c.d+x@e.org now"),
      (2L, "call +12025550199 or +4930123456"),
      (3L, "clean text with no pii at all")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TA.scrubPii(col("text")).as("s"),
        TA.emailCount(col("text")).as("ne"), TA.phoneCount(col("text")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == (("mail <EMAIL> and <EMAIL> now", 2, 0)))
    assert(out(2L) == (("call <PHONE> or <PHONE>", 0, 2)))
    assert(out(3L) == (("clean text with no pii at all", 0, 0)))
  }

  test("chunkWords: stride windows with partial tail, word-exact") {
    // 8 words, size 4, stride 3 -> starts 0,3,6: [w0..w3],[w3..w6],[w6,w7]
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = TA.chunkWords(df, col("text"), col("doc_id"), size = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq((0, 4, "a b c d"), (1, 4, "d e f g"), (2, 2, "g h")))
  }

  test("chunkWords invariants on real docs: full coverage, exact reconstruction") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (size, stride) = (32, 24)
    val chunks = TA.chunkWords(docs, col("text"), col("doc_id"), size, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    val originals = docs.select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == originals.keySet)
    originals.foreach { case (id, t) =>
      val ws = t.split(" ", -1)
      val cs = chunks(id).sortBy(_._2)
      // indices contiguous from 0; n_tokens matches the chunk text
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      cs.foreach { case (_, _, n, text) =>
        assert(text.split(" ", -1).length == n)
      }
      // de-striding the chunks reproduces the document exactly
      val rebuilt = cs.map(_._4.split(" ", -1)).zipWithIndex.flatMap {
        case (cws, i) => if (i == 0) cws else cws.drop(size - stride)
      }
      assert(rebuilt.toSeq == ws.toSeq, s"doc $id reconstruction")
    }
  }

  test("decontaminate output is a subset of the corpus with its benchmark removed") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val flagged = Dedup.decontaminate(corpus, bench, col("text"), col("doc_id"), 3, 1)
      .collect().map(_.getLong(0)).toSet
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(corpusIds))
    assert(flagged.forall(_ % 97 != 0))
    // a benchmark doc fed back as corpus must always flag itself
    val self = Dedup.decontaminate(bench, bench, col("text"), col("doc_id"), 3, 1)
      .count()
    assert(self == bench.count())
  }

  test("repetitionStats bounds on real docs") {
    val out = TA.repetitionStats(Tables.documents(spark, "/root/testdata/sf0.001"),
      col("text"), col("doc_id")).collect()
    out.foreach { r =>
      val (nw, nt, nd) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(nw >= 1 && nt == math.max(nw - 2, 0) && nd <= nt)
      if (nt > 0) {
        val dup = r.getDouble(4)
        assert(dup >= 0.0 && dup < 1.0)
      }
      val twf = r.getDouble(5)
      assert(twf > 0.0 && twf <= 1.0)
    }
  }

  test("repetitionStats: case folding and empty-word split parity") {
    // "A  a" single-space-splits (keeping empties) to ["a", "", "a"]:
    // 3 words, top word "a" x2 -> 0.6667; one trigram, distinct
    val df = Seq((1L, "A  a")).toDF("doc_id", "text")
    val r = TA.repetitionStats(df, col("text"), col("doc_id")).collect()(0)
    assert(r.getInt(1) == 3 && r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getDouble(5) == 0.6667)
  }

  test("vocabSizeApprox: HLL lands well inside the 3*rsd bound, non-vacuously") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the bound frame itself: every group true, every group present
    val frame = TA.vocabSizeApprox(docs, col("text"), col("lang"), 0.05)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(frame.size == 5 && frame.values.forall(identity))
    // non-vacuous: pin the ACTUAL relative error, not just the verdict
    val raw = docs.select(col("lang"),
        explode(array_distinct(split(lower(col("text")), " "))).as("w"))
      .groupBy("lang")
      .agg(count_distinct(col("w")).as("exact"),
        approx_count_distinct(col("w"), 0.05).as("approx"))
      .collect()
    raw.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(e > 20, s"vacuous fixture for ${r.getString(0)}: $e words")
      val rel = math.abs(a - e).toDouble / e
      assert(rel <= 0.15, s"${r.getString(0)}: rel err $rel")
    }
  }

  test("bpeTrain golden: the classic low/lower/newest merge sequence") {
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    val got = TA.bpeTrain(docs, col("text"), 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r0: (l,o)=5 ties (o,w)=5, lex wins; r1: (lo,w)=5; r2: (e,r)=2
    // ties (low,e)=2, lex wins; r3: (low,er)=2
    assert(got.toSeq == Seq((0, "l", "o", 5L), (1, "lo", "w", 5L),
      (2, "e", "r", 2L), (3, "low", "er", 2L)))
    // exhaustion: asking for more merges than pairs exist stops early
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(TA.bpeTrain(tiny, col("text"), 10).count() == 1)
    // determinism under physical layout
    val re = TA.bpeTrain(docs.repartition(7), col("text"), 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(re.toSeq == got.toSeq)
  }

  test("bpeEncodeStats golden: learned merges compress the corpus words") {
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    // 4 merges learn l+o, lo+w, e+r, low+er (pinned by the bpeTrain
    // golden): "low" -> 1 token, "lower" -> 1 token; "newest" contains
    // no adjacent learned pair and stays 6 char tokens.
    val out = TA.bpeEncodeStats(docs, col("text"), col("doc_id"), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (3L, 9L, 3L), s"'low'x3 must encode to 1 token each: $out")
    assert(out(2L) == (2L, 10L, 2L), s"'lower'x2 must encode to 1 token each: $out")
    assert(out(3L) == (1L, 6L, 6L), s"'newest' has no learned merge: $out")
    // partition invariance
    val re = TA.bpeEncodeStats(docs.repartition(3), col("text"), col("doc_id"), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(re == out)
  }

  test("bpeMergeLoop incremental == naive full-recount, bit-identical") {
    def cps(w: String): Array[String] = w.map(_.toString).toArray
    // goldens incl. overlap runs ("aaaa": (a,a)=3 overlapping), a pair
    // recurrence shape, and singleton/empty words
    val hand: Array[(Array[String], Long)] = Array(
      (cps("low"), 5L), (cps("lower"), 2L), (cps("newest"), 1L),
      (cps("aaaa"), 7L), (cps("aab"), 3L), (cps("abab"), 2L),
      (cps("x"), 9L), (Array.empty[String], 4L))
    for (n <- Seq(0, 1, 3, 8, 50))
      assert(TA.bpeMergeLoop(hand.map(t => (t._1.clone(), t._2)), n) ==
        TA.bpeMergeLoopNaive(hand, n), s"hand corpus diverged at nMerges=$n")
    // a generated corpus: deterministic LCG words over a 4-letter
    // alphabet — dense pair collisions, heavy ties, deep exhaustion
    var seed = 12345L
    def nxt(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 4).toInt }
    val gen: Array[(Array[String], Long)] = Array.tabulate(300) { i =>
      val len = 1 + (i % 7)
      (Array.fill(len)(('a' + nxt()).toChar.toString), 1L + (i % 5))
    }
    for (n <- Seq(5, 40, 1000))   // 1000 >> distinct pairs: exhaustion path
      assert(TA.bpeMergeLoop(gen.map(t => (t._1.clone(), t._2)), n) ==
        TA.bpeMergeLoopNaive(gen, n), s"generated corpus diverged at nMerges=$n")
  }

  test("bpeApply: greedy non-overlapping, resumes after the merge") {
    assert(TA.bpeApply(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(TA.bpeApply(Array("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    assert(TA.bpeApply(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("lmScore golden: mean conditional bigram probability, exact") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "solo"))
      .toDF("doc_id", "text")
    // corpus bigrams: (a,b) x2, (a,c) x1 -> c1(a)=3, p(a,b)=2/3, p(a,c)=1/3
    val out = TA.lmScore(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (1L, 0.6667) && out(3L) == (1L, 0.6667))
    assert(out(2L) == (1L, 0.3333))
    assert(!out.contains(4L), "a 1-token doc has no bigrams")
    // fluent-vs-noise ordering on real docs: a doc made of the corpus's
    // two most common words must outscore one made of two hapaxes
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val scored = TA.lmScore(real, col("text"), col("doc_id"))
    assert(scored.count() > 0)
    assert(scored.agg(min("lm_score"), max("lm_score"))
      .collect().map(r => r.getDouble(1) > r.getDouble(0)).head,
      "vacuous fixture: all docs score identically")
  }

  test("filterChain: every rule fires on its planted doc, precedence respected") {
    val stops = TA.Stopwords
    // rotated stopwords: high quality (stop-rich) WITHOUT any single
    // token dominating — the healthy-doc shape
    def healthy(n: Int, tag: String) =
      (1 to n).map(i => s"${stops(i % stops.length)} $tag$i").mkString(" ")
    val docs = Seq(
      (1L, "tiny doc"),                                   // too_short
      (2L, (1 to 30).map(i => s"junk$i").mkString(" ")),  // no stopwords -> low_quality
      (3L, ("the spam " * 50).trim),                      // repeated trigrams
      (4L, (1 to 50).map(i => s"the w$i").mkString(" ")), // 'the' = 50%, trigrams all distinct
      (5L, healthy(40, "p") + " reach someone@site.example now"),
      (6L, healthy(40, "k")))                             // keep
      .toDF("doc_id", "text")
    val out = TA.filterChain(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out(1L) == "too_short", s"$out")
    assert(out(2L) == "low_quality", s"$out")
    assert(out(3L) == "repetitive", s"$out")
    assert(out(4L) == "top_word", s"$out")
    assert(out(5L) == "has_pii", s"$out")
    assert(out(6L) == "keep", s"$out")
  }

  test("postingLists golden: df ranking, doc_id-ordered truncated postings") {
    val docs = Seq((3L, "b a"), (1L, "a a c"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = TA.postingLists(docs, col("text"), col("doc_id"),
        kWords = 2, kPostings = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    // df: a=3, b=2, c=1 -> top-2 words a, b; postings by doc_id asc,
    // truncated to 2; tf rides along (doc 1 has "a" twice)
    assert(out == Map(
      ("a", 1) -> (3L, 1L, 2L), ("a", 2) -> (3L, 2L, 1L),
      ("b", 1) -> (2L, 2L, 1L), ("b", 2) -> (2L, 3L, 1L)))
    // real corpus invariants: dense ranks from 1, postings ordered
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = TA.postingLists(real, col("text"), col("doc_id"), 10, 5)
      .collect().groupBy(_.getString(0))
    assert(p.size == 10)
    p.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to rows.length))
      assert(sorted.map(_.getLong(3)).toSeq ==
        sorted.map(_.getLong(3)).sorted.toSeq)
    }
  }

  test("importanceWeights golden: exact ratios, target slice outweighs the rest") {
    val docs = Seq((1L, "a b", "en"), (2L, "a c", "de"))
      .toDF("doc_id", "text", "lang")
    // ccnt: a=2 b=1 c=1; tcnt(en): a=1 b=1 c=0; ctot=4 ttot=2
    // r(a)=(1*4)/(2*2)=1.0, r(b)=(1*4)/(2*1)=2.0, r(c)=0
    val out = TA.importanceWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (2L, 1.5) && out(2L) == (2L, 0.5))
    // real corpus: the en slice must outweigh de on average (its own
    // marker words drive the ratio), and the global mean importance
    // is ~1 by construction (weights re-normalize the corpus)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val iw = TA.importanceWeights(real, col("text"), col("doc_id"),
        col("lang") === "en")
      .join(real.select("doc_id", "lang"), "doc_id")
    val means = iw.groupBy("lang").agg(avg("importance").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") > means("de"),
      s"en slice must outweigh de: $means")
    // partition invariance
    val re = TA.importanceWeights(real.repartition(7), col("text"),
        col("doc_id"), col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val base = TA.importanceWeights(real, col("text"), col("doc_id"),
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == base)
  }

  test("heavyHittersCms: verdicts all true, ranks exact, non-vacuous bound") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TA.heavyHittersCms(real, col("text"), 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(out.length == 10)
    assert(out.forall(_._4), s"CMS estimate out of bound: ${out.mkString(",")}")
    // ranks are the exact ranking (count desc, word asc), 1..10 dense
    assert(out.map(_._3).sorted.toSeq == (1 to 10))
    val sorted = out.sortBy(_._3)
    assert(sorted.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    // non-vacuous (the HLL-spec rule): pin the ACTUAL estimates. Build
    // the same sketch directly at a crowded width (eps=0.25 -> 8 cells)
    // and show collisions genuinely overestimate some word — the
    // estimate path is live, not an echo of the exact counts — while
    // never underestimating (the CMS one-sided guarantee).
    val w = real.select(explode(split(lower(col("text")), " ")).as("word"))
    val skBytes = w.agg(expr("count_min_sketch(word, 0.25d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val exact = w.groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.forall { case (word, cnt) => sk.estimateCount(word) >= cnt },
      "CMS underestimated — guarantee broken")
    assert(exact.exists { case (word, cnt) => sk.estimateCount(word) > cnt },
      "8-cell sketch shows zero collisions on a diverse vocab — vacuous")
    // partition invariance (commutative merges, fixed seed)
    val re = TA.heavyHittersCms(real.repartition(7), col("text"), 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(re.sortBy(_._3).toSeq == sorted.toSeq)
  }

  test("bm25TopK golden: idf ordering, length normalization, tf saturation") {
    // df(rare)=1, df(common)=3 of n=4 docs; doc 4 is long (dilutes tf).
    val docs = Seq(
      (1L, "rare common x y"),
      (2L, "common a b c"),
      (3L, "common common d e"),
      (4L, "common f g h i j k l m n o p q r s t u v w z a2 b2 c2"))
      .toDF("doc_id", "text")
    val out = TA.bm25TopK(docs, col("text"), col("doc_id"),
      Seq(0 -> "rare", 1 -> "common"), 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    // query 0: only doc 1 contains "rare"
    assert(out.keySet.filter(_._1 == 0) == Set(0 -> 1L))
    // query 1 ranking: doc 3 (tf=2, short) > docs 1,2 (tf=1, short,
    // same length -> identical score, doc_id tiebreak) > doc 4 (tf=1,
    // long -> length-normalized down)
    val q1 = out.collect { case ((1, d), (s, _, rnk)) => (rnk, d, s) }.toSeq.sorted
    assert(q1.map(_._2) == Seq(1L, 2L, 3L, 4L).sortBy(d => out((1, d))._3))
    assert(q1(0)._2 == 3L, s"tf=2 doc must rank first: $q1")
    assert(q1.last._2 == 4L, s"long doc must rank last: $q1")
    assert(out((1, 1L))._1 == out((1, 2L))._1, "equal-length tf=1 docs tie")
    // every hit reports terms_hit=1 (single-term queries)
    assert(out.values.forall(_._2 == 1L))
    // determinism under physical layout
    val re = TA.bm25TopK(docs.repartition(5), col("text"), col("doc_id"),
      Seq(0 -> "rare", 1 -> "common"), 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(re == out)
  }

  test("corpusDrift: hand-checked ppm, floor division, repartition invariance") {
    val spark0 = spark
    import spark0.implicits._
    // old snapshot: 4 words (a a b c); new snapshot: 3 words (a c c)
    val docs = Seq(
      (1L, "a a b c", false),
      (2L, "a c c", true)
    ).toDF("doc_id", "text", "is_new")
    val out = TA.corpusDrift(docs, col("text"), col("is_new"), topK = 10)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // a: old 2/4 = 500000, new 1/3 = 333333 (floor) -> drift 166667
    assert(out("a") == (2L, 1L, 500000L, 333333L, 166667L))
    // b: old 1/4 = 250000, new 0 -> drift 250000
    assert(out("b") == (1L, 0L, 250000L, 0L, 250000L))
    // c: old 1/4 = 250000, new 2/3 = 666666 (floor) -> drift 416666
    assert(out("c") == (1L, 2L, 250000L, 666666L, 416666L))
    val re = TA.corpusDrift(docs.repartition(7), col("text"), col("is_new"),
        topK = 10)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(re == out)
  }

  test("htmlExtract: blocks die with contents, entities decode in safe order") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "<script>var x = 1 < 2;</script>after"),
      (3L, "a &amp;lt; b &lt; c"),        // &amp;lt; -> literal &lt;
      (4L, "  spaced \t out  "),
      (5L, "<div class=\"k > v\">body</div>")) // attr without entities: regex
      .toDF("doc_id", "html")               // stops at FIRST '>', 'v">' leaks
    val out = df.select(col("doc_id"), TA.htmlExtract(col("html")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "after", s"script contents leaked: ${out(2L)}")
    assert(out(3L) == "a &lt; b < c")
    assert(out(4L) == "spaced out")
    // documented limit: a raw '>' inside an attribute ends the tag
    // early (real extractors tokenize; entities avoid it in practice)
    assert(out(5L) == "v\">body")
  }

  test("luhn-gated CC scrubbing: valid redacted, invalid and short runs kept") {
    // 4111111111111111 is the canonical Luhn-valid test PAN; flipping
    // the check digit breaks it; 15-digit runs never match the regex
    val df = Seq(
      (1L, "pay 4111111111111111 now"),
      (2L, "ref 4111111111111112 id"),
      (3L, "both 4111111111111111 and 4111111111111112"),
      (4L, "short 411111111111111 run"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TA.ccCandidateCount(col("text")).as("nc"),
        TA.ccValidCount(col("text")).as("nv"),
        TA.scrubCc(col("text")).as("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((1, 1, "pay <CC> now")))
    assert(out(2L) == ((1, 0, "ref 4111111111111112 id")))
    assert(out(3L) == ((2, 1, "both <CC> and 4111111111111112")))
    assert(out(4L) == ((0, 0, "short 411111111111111 run")))
  }

  test("unigram tokenizer: frequent word compresses, chars always covered, invariant") {
    val docs = Seq.tabulate(40)(i => (i.toLong, "hello hello hello")) ++
      Seq((100L, "abc xyz"), (101L, "hello there"))
    val df = docs.toDF("doc_id", "text")
    val vocab = TA.unigramTrain(df, col("text"), maxPieceLen = 4,
        seedSize = 16, vocabSize = 8, emRounds = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // the fallback alphabet survives every prune
    "abcxyzhelotr".foreach(c => assert(vocab.contains(c.toString), s"char $c"))
    // "hell" (or another 4-piece of hello) dominates the counts
    assert(vocab.keys.exists(_.length == 4), s"no 4-piece in ${vocab.keys}")
    val enc = TA.unigramEncodeStats(df, col("text"), col("doc_id"),
        maxPieceLen = 4, seedSize = 16, vocabSize = 8, emRounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "hello hello hello": 15 cps -> 2 pieces per word = 6 tokens
    assert(enc(0L) == ((3L, 15L, 6L)), s"got ${enc(0L)}")
    // tokens never exceed code points; never beat ceil(cps/maxLen)
    enc.values.foreach { case (_, cps, tok) =>
      assert(tok <= cps && tok >= (cps + 3) / 4)
    }
    // bit-identical under repartition (integer scores, total tie order)
    val again = TA.unigramTrain(df.repartition(7), col("text"), 4, 16, 8, 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(vocab == again)
  }

  test("unigramEncodeStats: OOV code point falls back per-cp, never crashes") {
    import spark.implicits._
    // maxVocab = 3 truncates the word table to the three frequent words;
    // "qxz" (rare, unique code points) never reaches training, so its
    // chars are absent from the vocabulary — pre-guard this NPE'd the
    // whole encode job (ADVICE r7). The fallback counts it per-cp.
    val df = Seq(
      (0L, "aa bb cc aa bb cc aa bb cc"),
      (1L, "aa bb cc qxz")).toDF("doc_id", "text")
    val enc = TA.unigramEncodeStats(df, col("text"), col("doc_id"),
        maxPieceLen = 4, seedSize = 16, vocabSize = 8, emRounds = 1,
        maxVocab = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 4 words, 9 cps; "qxz" contributes exactly 3 fallback tokens
    val (w1, c1, t1) = enc(1L)
    assert(w1 == 4L && c1 == 9L)
    val (_, c0, t0) = enc(0L)
    // covered words tokenize identically across docs; doc1 = doc0's
    // per-word tokens/3 (one "aa bb cc" group) + 3 fallback tokens
    assert(t1 == t0 / 3 + 3, s"got t0=$t0 t1=$t1 c0=$c0")
  }

  test("unigramSegment: local tie rule is (score, count, lexicographic)") {
    // vocab: "ab" and "ba" same weight; word "aba" has two 2-piece
    // segmentations of equal score: ["ab","a"] vs ["a","ba"] — the
    // forward-lexicographic rule picks ["a","ba"]
    val w = Map("a" -> 3L, "b" -> 3L, "ab" -> 5L, "ba" -> 5L)
    val seg = TA.unigramSegment(Array("a", "b", "a"), w, 6L, 4)
    assert(seg == Vector("a", "ba"), s"got $seg")
    // empty word -> empty path
    assert(TA.unigramSegment(Array.empty[String], w, 6L, 4).isEmpty)
  }

  test("modelQualityScores: trained filter is exact, affine, partition-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TA.modelQualityScores(docs, col("text"), col("doc_id"),
        (col("lang") === "en").cast("long"),
        seedBound = graft.operators.Sampling.hashBound(0.6))
      .collect()
    assert(out.length == docs.count())
    // keep is exactly the threshold compare
    assert(out.forall(r => r.getBoolean(6) == (r.getLong(5) >= 500000L)))
    // the filter is non-degenerate on this corpus
    assert(out.exists(_.getBoolean(6)) && out.exists(!_.getBoolean(6)))
    // identical feature vectors score identically (affine form)
    val byFeat = out.groupBy(r => (r.getLong(1), r.getLong(2)))
    assert(byFeat.values.forall(_.map(_.getLong(5)).distinct.length == 1))
    // bit-identical under repartition (exact integer fit + score)
    val again = TA.modelQualityScores(docs.repartition(7), col("text"),
        col("doc_id"), (col("lang") === "en").cast("long"),
        seedBound = graft.operators.Sampling.hashBound(0.6))
      .collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("NfcNormalize / StripAccents: composition, idempotence, nulls, codegen") {
    val spark = TestSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextExpressions
    TextExpressions.register(spark)
    // decomposed e + U+0301 composes to U+00E9; ligature survives NFC
    // (compatibility folding is NFKC territory); space + combining
    // mark has no precomposed form and must pass through unchanged
    val rows = Seq(
      (1L, "caf\u0065\u0301"), (2L, "caf\u00e9"), (3L, " \u0301x"),
      (4L, "\ufb01sh"), (5L, null.asInstanceOf[String]), (6L, ""))
      .toDF("id", "s")
    val out = rows.select(col("id"),
        TextExpressions.nfc_normalize(col("s")).as("n"),
        TextExpressions.strip_accents(col("s")).as("f"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(out(1L)._1.get == "caf\u00e9", "NFC must compose e+0301")
    assert(out(1L)._1 == out(2L)._1, "decomposed == precomposed after NFC")
    assert(out(1L)._2.get == "cafe" && out(2L)._2.get == "cafe",
      "accent folding strips the acute from both forms")
    assert(out(3L)._1.get == " \u0301x", "non-composing pair passes through")
    assert(out(3L)._2.get == " x", "the bare combining mark still folds away")
    assert(out(4L)._1.get == "\ufb01sh", "NFC never folds ligatures")
    assert(out(5L)._1.isEmpty && out(5L)._2.isEmpty, "null in, null out")
    assert(out(6L)._1.get == "" && out(6L)._2.get == "")
    // idempotence over the whole fixture
    val twice = rows.select(col("id"), TextExpressions.nfc_normalize(
        TextExpressions.nfc_normalize(col("s"))).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(twice == out.map { case (k, (n, _)) => k -> n })
  }

  test("StripAccents strips Mn+Mc+Me like utf8proc; CodepointLower is simple 1:1") {
    val spark = TestSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextExpressions
    TextExpressions.register(spark)
    // Expected values are PINNED FROM DUCKDB (strip_accents /
    // lower, measured 2026-08, r15): the r14 ADVICE claimed utf8proc
    // strips only Mn — measurably false; STRIPMARK drops Mc
    // (Devanagari vowel sign U+093E) and Me (enclosing circle
    // U+20DD) too, and this expression must keep matching it.
    val rows = Seq(
      // क ा(Mc) ग ज ़(Mn): DuckDB -> 915 917 91C (Mc AND Mn gone)
      (1L, "\u0915\u093E\u0917\u091C\u093C"),
      (2L, "a\u20DDb"), // Me enclosing mark: DuckDB -> "ab"
      (3L, "\u0130stanbul"), // dotted capital I
      (4L, "\u03A3\u0399\u0393\u039C\u0391"), // SIGMA IOTA GAMMA MU ALPHA
      (5L, "STRASSE \u00DF"), // sharp s: no simple-lowercase change
      (6L, "A\uA7C7B") // U+A7C7: JDK maps, utf8proc passes through
    ).toDF("id", "s")
    val out = rows.select(col("id"),
        TextExpressions.strip_accents(
          TextExpressions.nfc_normalize(col("s"))).as("f"),
        TextExpressions.codepoint_lower(col("s")).as("l"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._1 == "\u0915\u0917\u091C",
      "Mc vowel sign + Mn nukta both stripped (utf8proc STRIPMARK)")
    assert(out(2L)._1 == "ab", "Me enclosing mark stripped")
    // strip of dotted-I: NFD = I + 0307(Mn) -> drop -> "I" (DuckDB
    // agrees)
    assert(out(3L)._1 == "Istanbul")
    // simple lowercase: dotted-I -> SINGLE i (DuckDB lower agrees;
    // Spark's builtin lower gives i + U+0307 via String.toLowerCase
    // — the trap CodepointLower exists to avoid)
    assert(out(3L)._2 == "istanbul")
    assert(out(3L)._2 !=
      "\u0130stanbul".toLowerCase(java.util.Locale.ROOT),
      "full-mapping toLowerCase diverges on dotted-I — builtin path differs")
    assert(out(4L)._2 == "\u03C3\u03B9\u03B3\u03BC\u03B1",
      "Greek simple lowercase (final-sigma is a FULL-mapping rule; " +
        "simple keeps medial sigma)")
    assert(out(5L)._2 == "strasse \u00DF",
      "sharp s unchanged under simple lower")
    // the ONE pinned divergence class vs DuckDB (Unicode-13 skew,
    // tools/case_differential.py): JDK lowers U+A7C7 -> U+A7C8
    assert(out(6L)._2 == "a\uA7C8b")
  }
}
