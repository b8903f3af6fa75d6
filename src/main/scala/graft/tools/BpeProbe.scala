package graft.tools

/** Measured-bound probe for the BPE merge loop at a production-trainer
  * configuration (SCALE.md "32k merges / 1M vocab" row): synthesizes a
  * deterministic 1M-word Zipf-frequency vocabulary (LCG letters, word
  * lengths 3-12 — denser pair collisions than natural text, i.e. a
  * conservative bound) and times [[graft.operators.TextAnalysis.bpeMergeLoop]]
  * for 32,768 merges. Pure JVM — no SparkSession; the distributed
  * harvest phase is benched separately by the doc_bpe_* queries.
  *
  * Usage: `SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.BpeProbe [nWords] [nMerges]"`
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toInt else 1000000
    val nMerges = if (args.length > 1) args(1).toInt else 32768
    var seed = 987654321L
    def nxt(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod).toInt + mod) % mod
    }
    val seen = new java.util.HashSet[String](nWords * 2)
    val tbl = new Array[(Array[String], Long)](nWords)
    var i = 0
    while (i < nWords) {
      val len = 3 + nxt(10)
      val sb = new StringBuilder(len)
      var j = 0
      while (j < len) { sb.append(('a' + nxt(26)).toChar); j += 1 }
      val w = sb.toString
      if (seen.add(w)) {                    // distinct words, Zipf freq
        tbl(i) = (w.map(_.toString).toArray, 1L + nWords.toLong / (i + 1))
        i += 1
      }
    }
    val naive = args.length > 2 && args(2) == "naive"
    val t0 = System.nanoTime()
    val merges =
      if (naive) graft.operators.TextAnalysis.bpeMergeLoopNaive(tbl, nMerges)
      else graft.operators.TextAnalysis.bpeMergeLoop(tbl, nMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    val m = if (naive) "bpe_merge_loop_naive" else "bpe_merge_loop"
    println(f"""{"metric":"$m%s","n_words":$nWords,"n_merges":${merges.size},"value":$sec%.1f,"unit":"sec"}""")
  }
}
