package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal plumbing exercised with document text bytes standing in
  * for media payloads (ASCII → byte ops == char ops, so the typed
  * JVM pipeline can still be oracle-checked in SQL: histogram entropy,
  * mean byte, stub dimensions, md5 frame ids are all reproducible).
  */
object MultimodalQueries {

  private def media(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[MediaRow]
  }

  val defs: Map[String, QueryDef] = Map(

    // Typed batch feature extraction over binary payloads. Entropy is
    // rounded 4dp (fp log sums; engines bin in different orders).
    "mm_media_features" -> QueryDef(
      """SELECT id, modality, n_bytes, mean_byte, round(entropy, 4) AS entropy,
        |  64 + (n_bytes % 512) AS width,
        |  64 + ((n_bytes // 2) % 512) AS height
        |FROM (
        |  SELECT doc_id AS id,
        |    ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
        |    length(text) AS n_bytes,
        |    coalesce((SELECT sum(unicode(c))*1.0/length(d.text)
        |     FROM unnest(string_split(d.text,'')) AS u(c)
        |     WHERE length(d.text) > 0), 0.0) AS mean_byte,
        |    coalesce((SELECT -sum(p * log2(p)) FROM (
        |       SELECT count(*)*1.0/length(d.text) AS p
        |       FROM unnest(string_split(d.text,'')) AS u(c)
        |       WHERE length(d.text) > 0 GROUP BY c)), 0.0) + 0.0 AS entropy
        |  FROM documents d) t""".stripMargin) { (s, dir) =>
      Multimodal.extractFeatures(media(s, dir)).toDF()
        .withColumn("entropy", round(col("entropy"), 4))
        .select("id", "modality", "n_bytes", "mean_byte", "entropy",
          "width", "height")
    },

    // Audio-style hop/window framing: 32-byte windows every 24 bytes,
    // exact integer features (mean as one division, peak) — no
    // rounding anywhere.
    "mm_payload_windows" -> QueryDef(
      """SELECT doc_id AS id, w AS win_idx, w * 24 AS win_start,
        |  (SELECT sum(unicode(c)) * 1.0 / 32
        |   FROM unnest(string_split(substr(d.text, 1 + (w*24)::INT, 32), '')) AS u(c))
        |    AS mean_byte,
        |  (SELECT max(unicode(c))
        |   FROM unnest(string_split(substr(d.text, 1 + (w*24)::INT, 32), '')) AS u(c))
        |    AS peak
        |FROM documents d,
        |  unnest(range(0, (length(text) - 32) // 24 + 1)) AS r(w)
        |WHERE length(text) >= 32""".stripMargin) { (s, dir) =>
      Multimodal.windowFeatures(media(s, dir), windowLen = 32, hop = 24).toDF()
        .withColumn("peak", col("peak").cast("int"))
    },

    // Frame sampling: 4 evenly-spaced 16-byte windows, md5-identified.
    "mm_frame_sample" -> QueryDef(
      """SELECT doc_id AS id, i AS frame_idx,
        |  md5(substr(text, 1 + (i * (length(text) - 16) // 3)::INT, 16)) AS frame_md5
        |FROM documents, unnest([0,1,2,3]) AS u(i)
        |WHERE length(text) >= 16""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(media(s, dir), nFrames = 4, frameLen = 16).toDF()
    })
}
