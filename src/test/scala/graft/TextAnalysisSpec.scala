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
}
