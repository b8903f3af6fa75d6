package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.Dedup

/** Flat-vs-two-level cluster-assignment probe (SCALE.md
  * emb_centroid_drift diagnosis): times `semanticClusters` (n*k dots)
  * against `semanticClustersTwoLevel` (~2*sqrt(k)*n dots) on the same
  * corpus with the same auto-sized k, and reports the reroute fraction
  * (the approximation's divergence surface).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.ClusterProbe"`
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val k = Dedup.autoClusters(n)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the scan cache so both paths pay only assignment cost
    emb.foreach(_ => ())
    val (_, tFlat) = time {
      Dedup.semanticClusters(emb, col("vec_id"), col("embedding"), k)
        .foreach(_ => ())
    }
    val (_, tTwo) = time {
      Dedup.semanticClustersTwoLevel(emb, col("vec_id"), col("embedding"), k)
        .foreach(_ => ())
    }
    val flat = Dedup.semanticClusters(emb, col("vec_id"), col("embedding"), k)
    val two = Dedup.semanticClustersTwoLevel(emb, col("vec_id"),
      col("embedding"), k)
    val rerouted = two.withColumnRenamed("lst", "l2").join(flat, "vec_id")
      .filter(col("l2") =!= col("lst")).count()
    println(f"""{"n":$n,"k":$k,"flat_s":$tFlat%.2f,"twolevel_s":$tTwo%.2f,""" +
      f""""speedup":${tFlat / tTwo}%.2f,"rerouted":$rerouted,""" +
      f""""reroute_frac":${rerouted.toDouble / n}%.4f}""")
    spark.stop()
  }
}
