package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for document streams — the streaming face
  * of [[graft.ops.Dedup.exact]]: emit only the first occurrence of each
  * distinct text, keyed by the same (xxhash64, md5, length) triple so the
  * state store carries a fixed ~44-byte key per distinct doc and NEVER the
  * text itself (state size is what kills streaming dedup at corpus scale,
  * exactly like shuffle size kills the batch variant).
  *
  * State is bounded by `dropDuplicatesWithinWatermark`: two copies arriving
  * within the watermark delay dedup exactly; state older than the watermark
  * is dropped, so an infinite stream runs in bounded memory. That is the
  * semantics large pipelines actually want — re-crawls of the same URL land
  * within hours, while a plain `dropDuplicates` would accumulate state
  * forever.
  */
object StreamingDedup {

  /** First occurrence per distinct text within the watermark window.
    * `tsCol` must be an event-time timestamp column. */
  def exactStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("h64", xxhash64(col(textCol)))
      .withColumn("h128", md5(col(textCol)))
      .withColumn("text_len", length(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h64", "h128", "text_len")
      .drop("h64", "h128", "text_len")
}
