package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.Dedup
import graft.sources.Jsonl

/** Streaming ingestion for LLM training corpora (SURVEY.md §2.C/D
  * bridge): the continuous-ingest twin of the batch D-track, so the
  * same engine that batch-dedups a 100 TB corpus also dedups the
  * daily drop-zone feed as it lands.
  *
  * Shape: jsonl files land in a directory (crawler/CDC drop zone) →
  * permissive parse with quarantine ([[Jsonl.readStream]] — same
  * parser expression as the batch reader) → content-hash exact dedup
  * with WATERMARK-BOUNDED state: `dropDuplicatesWithinWatermark` keys
  * the state store on [[Dedup.contentHash]], so a duplicate arriving
  * within the watermark delay is dropped and the per-key state ages
  * out afterwards — state is bounded by the ingest rate × delay, not
  * by corpus size (the only viable form at 100 TB/day; exact
  * cross-history dedup stays a batch job over the landed corpus,
  * which [[Dedup.exact]] already is).
  *
  * The hash column is the SAME expression batch dedup groups on, so
  * stream-kept docs and batch keepers agree on document identity —
  * spec-pinned parity (DocStreamSpec) between the streamed survivors
  * and `Dedup.exact` over the identical input.
  */
object DocStream {

  /** Append the canonical content address to a (streaming or batch)
    * document frame. */
  def withContentHash(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", Dedup.contentHash(col("text")))

  /** Streaming exact dedup: first doc per content hash within the
    * watermark wins; later copies are dropped, and each hash's state
    * entry is discarded once the watermark passes it. `tsCol` is the
    * event-time column (ingest/crawl timestamp). */
  def dedupDocs(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    withContentHash(docs)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** End-to-end drop-zone pipeline: tail a jsonl landing directory,
    * quarantine malformed lines, dedup the clean docs on content
    * hash. Returns the deduped stream (write it with `writeStream`
    * Append to the corpus sink). */
  def ingestJsonl(spark: SparkSession, path: String, schema: StructType,
      tsCol: String, delay: String): DataFrame =
    dedupDocs(Jsonl.clean(Jsonl.readStream(spark, path, schema)),
      tsCol, delay)
}
