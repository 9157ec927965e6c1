package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity

/** C28 streaming ANN index maintenance — the continuous-ingest twin
  * of E9: embedding vectors land as a stream (crawler output, CDC
  * feed) and each micro-batch is encoded against the FROZEN persisted
  * IVF-PQ model and appended into the index's cell partitions, so the
  * served index (E8/E11 read path) trails the stream by one trigger
  * without ever retraining or rewriting existing codes.
  *
  * Replay semantics: `foreachBatch` re-delivers a batch after a crash,
  * and a blind re-append would duplicate code rows (top-k could then
  * return a vector twice). Each applied batch therefore writes a
  * marker under `_stream_batches/` AFTER its append commits, and a
  * replayed batchId with a marker present is skipped. This narrows
  * at-least-once to the append→marker crash window; closing that last
  * window needs manifest-gated visibility — the repo's minimal
  * primitive is [[graft.sources.Lake.Manifest]] (orphaned part-files
  * invisible until a manifest names them, pointer swapped atomically),
  * kept separate here because the served index relies on hive
  * `cell=` partition pruning that a flat manifest file-list bypasses;
  * a production deployment lands the code table in a real table
  * format (same caveat as [[graft.sources.Lake.mergeIntoPartitioned]]).
  *
  * Compaction: pass `maxFiles` to run E9's crash-safe
  * `compactIvfPqIndex` after each applied batch — the file count stays
  * bounded across an unbounded stream (the A24 state-compaction
  * posture). At 100 TB/day the per-trigger cost is encode(delta) +
  * one append; the corpus is never re-read.
  */
object VecStream {

  /** Apply ONE micro-batch exactly once (marker-gated): returns true
    * if the batch was applied, false if it was a replay skip. */
  def streamAppendBatch(dir: String, batch: DataFrame,
      batchId: Long): Boolean = {
    val markers = new java.io.File(s"$dir/_stream_batches")
    markers.mkdirs()
    val marker = new java.io.File(markers, batchId.toString)
    if (marker.exists()) false
    else {
      Similarity.appendIvfPqIndex(dir, batch)
      marker.createNewFile()
      true
    }
  }

  /** Continuous index maintenance: encode-and-append every trigger,
    * compacting when the cell dirs fragment past `maxFiles`. */
  def appendToIndex(vecs: DataFrame, dir: String, checkpoint: String,
      maxFiles: Int = 64): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (streamAppendBatch(dir, batch, batchId) && maxFiles > 0)
          Similarity.compactIvfPqIndex(batch.sparkSession, dir, maxFiles)
      }
      .start()
}
