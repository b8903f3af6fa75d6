package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.BlockCatalog

/** K2 streaming block sink (svoe `block_writer/block_writer.py:25-123`):
  * the reference buffers events per feature and flushes compacted
  * blocks + catalog rows every 5s on a hand-rolled loop; here it is
  * `writeStream.foreachBatch` into the BlockCatalog on a processing-time
  * trigger. Content-hash idempotency makes at-least-once micro-batch
  * delivery safe (replayed batches are skipped), replacing the
  * reference's hash-exists check at store time.
  */
object BlockWriter {

  def start(df: DataFrame, catalog: BlockCatalog, definition: String,
      key: String, tsUs: String, triggerMs: Long = 5000L,
      checkpoint: Option[String] = None): StreamingQuery = {
    val base = df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { catalog.write(batch, definition, key, tsUs); () }
      }
    checkpoint.fold(base)(cp => base.option("checkpointLocation", cp)).start()
  }
}
