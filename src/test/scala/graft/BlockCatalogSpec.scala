package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.BlockCatalog

class BlockCatalogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val day0 = 1704067200000000L // 2024-01-01T00Z

  test("write + range scan + content-hash idempotency") {
    val root = Files.createTempDirectory("graft_catalog").toString
    val cat = new BlockCatalog(spark, root)
    val df = (0 until 100).map(i => (day0 + i * 3600000000L, i.toDouble))
      .toDF("ts_us", "v")

    assert(cat.write(df, "trades", "BTC", "ts_us"))
    // identical content → skipped
    assert(!cat.write(df, "trades", "BTC", "ts_us"))
    assert(cat.meta.count() == 1)

    // day-pruned + exact-bounded scan: hours 24..47 = day 2
    val got = cat.scan("trades", "BTC",
      day0 + 24 * 3600000000L, day0 + 47 * 3600000000L)
    assert(got.count() == 24)
    assert(got.agg(org.apache.spark.sql.functions.min(col("v"))).collect()(0)
      .getDouble(0) == 24.0)

    // different content under same key → stored
    assert(cat.write(df.withColumn("v", col("v") * 2), "trades", "BTC", "ts_us"))
    assert(cat.meta.count() == 2)
  }

  test("crash between data and meta writes: replay does not duplicate rows") {
    val root = Files.createTempDirectory("graft_crash").toString
    val cat = new BlockCatalog(spark, root)
    val df = (0 until 50).map(i => (day0 + i * 1000000L, i.toDouble))
      .toDF("ts_us", "v")
    assert(cat.write(df, "feat", "K", "ts_us"))
    val before = cat.scanAll("feat", "K").count()

    // simulate a crash that lost the meta append but kept the data
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$root/_meta")).deleteRecursively()
    assert(cat.meta.columns.isEmpty || cat.meta.count() == 0)

    // at-least-once replay of the same content: block dir is overwritten
    // (deterministic block=<hash> path), meta re-recorded once
    assert(cat.write(df, "feat", "K", "ts_us"))
    assert(cat.scanAll("feat", "K").count() == before)
    assert(cat.meta.count() == 1)
  }
}
