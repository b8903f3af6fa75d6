package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BlockCatalog, Ingest}

class IngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val day0 = 1704067200000000L

  test("csv -> normalize -> range-split blocks -> catalog, idempotent") {
    // raw CSV with reference-style columns to rename (cryptotick
    // taker_side/base_amount shape, FIXTURES.md trades)
    val csvDir = Files.createTempDirectory("graft_csv").toString
    val rows = (0 until 500).map { i =>
      // duplicate ts runs every 10 rows to exercise split integrity
      val ts = day0 + (i / 10) * 1000000L
      s"$ts,${if (i % 2 == 0) "BUY" else "SELL"},${1.0 + i % 3},${100.0 + i % 7},t$i"
    }
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/trades.csv"),
      "ts_us,taker_side,base_amount,price,guid\n" + rows.mkString("\n"))

    val schema = StructType(Seq(
      StructField("ts_us", LongType), StructField("taker_side", StringType),
      StructField("base_amount", DoubleType), StructField("price", DoubleType),
      StructField("guid", StringType)))

    val root = Files.createTempDirectory("graft_ingest").toString
    val cat = new BlockCatalog(spark, root)
    val normalize = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumnRenamed("taker_side", "side")
        .withColumnRenamed("base_amount", "amount")
        .withColumnRenamed("guid", "id")

    val rep = Ingest.ingestCsv(spark, s"$csvDir/trades.csv", schema,
      normalize, cat, "trades", "BTC", "ts_us", rowsPerBlock = 100L)
    assert(rep.rows == 500 && rep.stored)

    // read back: all rows, normalized schema, ts-sorted scan works
    val back = cat.scan("trades", "BTC", day0, day0 + 60L * 1000000L)
    assert(back.count() == 500)
    assert(back.columns.contains("side") && back.columns.contains("amount"))

    // equal-ts runs are never split across files (O5 invariant)
    val fileRanges = back
      .withColumn("file", input_file_name())
      .groupBy("file").agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fileRanges.length > 1) // actually split
    fileRanges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"equal-ts run split across files: $hi1 >= $lo2")
      case _ =>
    }

    // idempotent re-ingest
    val rep2 = Ingest.ingestCsv(spark, s"$csvDir/trades.csv", schema,
      normalize, cat, "trades", "BTC", "ts_us", rowsPerBlock = 100L)
    assert(!rep2.stored)
    assert(cat.meta.count() == 1)
  }

  test("readJsonl: clean rows parse, malformed lines quarantine, schema enforced") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "hello \"world\"\nline2", "lang": "en"}""",
        """{"doc_id": 2, "text": null, "lang": "de"}""",
        """{"doc_id": 3 "text": "missing comma"}""", // malformed
        """not json at all""", // malformed
        """{"doc_id": 4, "text": "ok", "lang": "fr", "extra": 9}"""
      ).mkString("\n"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = Ingest.readJsonl(spark, dir, schema)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "_corrupt_record"))
    // materialize once, then split — a corrupt-only query over the raw
    // scan is disallowed by Spark (see readJsonl scaladoc)
    val rows = df.collect()
    val ci = df.schema.fieldIndex("_corrupt_record")
    val (bad, clean) = rows.partition(r => !r.isNullAt(ci))
    assert(clean.length == 3)
    assert(bad.length == 2)
    // quarantined rows carry the raw line; data fields are null
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("doc_id"))))
    assert(bad.map(_.getString(ci)).exists(_.contains("missing comma")))
    // escapes round-trip: embedded quote + newline survive parsing
    val byId = clean.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "hello \"world\"\nline2")
    // null field stays null; extra field is dropped by the schema
    assert(byId(2L).isNullAt(1))
    assert(byId(4L).getString(2) == "fr")
  }
}
