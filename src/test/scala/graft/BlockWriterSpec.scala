package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BlockCatalog
import graft.streaming.BlockWriter

class BlockWriterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("foreachBatch block sink: micro-batches land as cataloged blocks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_bw").toString
    val cat = new BlockCatalog(spark, root)
    val day0 = 1704067200000000L

    val input = MemoryStream[(Long, Double)]
    val q = BlockWriter.start(
      input.toDS().toDF("ts_us", "v"), cat, "feat", "K", "ts_us",
      triggerMs = 0L)
    try {
      input.addData((day0, 1.0), (day0 + 1000000L, 2.0))
      q.processAllAvailable()
      input.addData((day0 + 2000000L, 3.0))
      q.processAllAvailable()
      assert(cat.meta.count() == 2) // one block per non-empty micro-batch
      val all = cat.scan("feat", "K", day0, day0 + 3000000L)
      assert(all.count() == 3)
    } finally q.stop()
  }
}
