package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch: where does doc_ngram_jaccard time go at sf0.1? */
object ProbeJac {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Dedup.explodeShingles(docs, col("text"), col("doc_id"), 3)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val plan = sh.queryExecution.optimizedPlan.toString
    println("  split occurrences in optimized plan: " +
      "split".r.findAllIn(plan).length)
    time("shingle explode+hash count")(println("  sh=" + sh.count()))
    val tokDf = sh.groupBy("s").agg(count(lit(1)).as("tok_df"))
    time("tokDf")(println("  toks=" + tokDf.count()))
    // candidate count through the prefix+length filters
    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("tok_df").asc, col("s").asc)
    val prefix = sh.join(tokDf, "s")
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("rn") <= col("sz") - floor((col("sz") * 4 + 4) / 5) + 1)
      .select("doc_id", "s", "sz")
    time("prefix")(println("  prefix rows=" + prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * 5 >= col("b.sz") * 4 && col("b.sz") * 5 >= col("a.sz") * 4)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("candidates")(println("  cand=" + cand.count()))
    time("full pairs")(println("  pairs=" +
      Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.8).count()))
    time("full pairs again (warm)")(println("  pairs=" +
      Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.8).count()))
    spark.stop()
  }
}
