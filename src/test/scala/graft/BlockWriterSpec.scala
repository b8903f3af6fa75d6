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

  test("minRowsPerBlock buffers micro-batches into compacted blocks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_bw_compact").toString
    val cat = new BlockCatalog(spark, root)
    val day0 = 1704067200000000L

    val input = MemoryStream[(Long, Double)]
    val q = BlockWriter.start(
      input.toDS().toDF("ts_us", "v"), cat, "feat", "K", "ts_us",
      triggerMs = 0L, minRowsPerBlock = 5L)
    try {
      input.addData((day0, 1.0), (day0 + 1000000L, 2.0))
      q.processAllAvailable()
      assert(cat.meta.count() == 0) // 2 rows buffered, below target
      input.addData((day0 + 2000000L, 3.0), (day0 + 3000000L, 4.0))
      q.processAllAvailable()
      assert(cat.meta.count() == 0) // still 4 < 5
      input.addData((day0 + 4000000L, 5.0))
      q.processAllAvailable()
      assert(cat.meta.count() == 1) // one compacted 5-row block
      assert(cat.meta.select("num_rows").collect()(0).getLong(0) == 5L)
      assert(cat.scanAll("feat", "K").count() == 5)
    } finally q.stop()
  }
}
