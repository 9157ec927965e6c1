package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import graft.operators.Dedup
import graft.sources.Jsonl
import graft.streaming.DocStream

/** Top-level so the Dataset encoder's generated code can reach it. */
case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** Streaming document-ingest dedup (the D-track ↔ C-track bridge):
  * the streamed survivors must agree with batch [[Dedup.exact]] on
  * document identity over the same input — same normalization, same
  * hash, first-arrival-wins within the watermark. */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming exact dedup across micro-batches matches Dedup.exact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = Seq(
      StreamDoc(1L, "Hello  World", ts(0)),
      StreamDoc(2L, "other text entirely", ts(1)),
      StreamDoc(3L, "hello world", ts(2)),   // same-batch dup of 1 (normalized)
      StreamDoc(4L, "a third document", ts(3)))
    val b2 = Seq(
      StreamDoc(5L, "OTHER text  entirely", ts(10)), // cross-batch dup of 2
      StreamDoc(6L, "fresh in batch two", ts(11)),
      StreamDoc(7L, "hello world", ts(12)))          // cross-batch dup of 1
    val in = MemoryStream[StreamDoc]
    val q = DocStream.dedupDocs(in.toDF(), "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("doc_dedup").start()
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val kept = spark.table("doc_dedup")
        .select($"doc_id", $"content_hash").as[(Long, String)].collect()
      // one survivor per distinct content, cross- and within-batch
      assert(kept.map(_._2).distinct.length == kept.length)
      // batch twin on the identical input: same identity partition
      val all = (b1 ++ b2).toDF()
      val exact = Dedup.exact(all)
        .select($"content_hash", $"n_copies").as[(String, Long)].collect()
      assert(kept.map(_._2).toSet == exact.map(_._1).toSet,
        "streamed survivors and batch keepers disagree on content identity")
      assert(kept.length == exact.length)
      // cross-batch duplicates never survive; batch-2's genuine new doc does
      val ids = kept.map(_._1).toSet
      assert(!ids.contains(5L) && !ids.contains(7L))
      assert(ids.contains(6L) && ids.contains(2L) && ids.contains(4L))
      // exactly one of the same-batch pair (1, 3) survived
      assert(ids.contains(1L) ^ ids.contains(3L))
    } finally q.stop()
  }

  test("jsonl drop zone -> quarantine -> streaming dedup, file-source twin parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING, ts TIMESTAMP")
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p,
        String.join("\n", lines: _*).getBytes("UTF-8"))
    }
    writeFile("drop1.jsonl", Seq(
      """{"doc_id": 1, "text": "spark merge window", "ts": "2024-01-01 10:00:00"}""",
      """{"doc_id": 2, "text": "join the big table", "ts": "2024-01-01 10:01:00"}""",
      """this line is not json at all""",
      """{"doc_id": 3, "text": "SPARK  merge   window", "ts": "2024-01-01 10:02:00"}"""))
    val q = DocStream.ingestJsonl(spark, dir, schema, "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("jsonl_dedup").start()
    try {
      q.processAllAvailable()
      // second drop arrives as its own micro-batch
      writeFile("drop2.jsonl", Seq(
        """{"doc_id": 4, "text": "spark merge window", "ts": "2024-01-01 10:10:00"}""",
        """{"doc_id": 5, "text": "brand new content here", "ts": "2024-01-01 10:11:00"}"""))
      q.processAllAvailable()
      val kept = spark.table("jsonl_dedup")
        .select($"doc_id", $"content_hash").as[(Long, String)].collect()
      // batch twin over the same landed files (clean rows only)
      val batch = Jsonl.clean(Jsonl.read(spark, dir, schema))
      val exact = Dedup.exact(batch)
        .select($"content_hash").as[String].collect()
      assert(kept.map(_._2).toSet == exact.toSet,
        "file-source stream and batch reader disagree on content identity")
      assert(kept.length == exact.length)
      val ids = kept.map(_._1).toSet
      // doc 3 (case/whitespace variant of 1) and doc 4 (cross-batch
      // copy) are duplicates; the corrupt line was quarantined out
      assert(ids == Set(1L, 2L, 5L), s"unexpected survivors: $ids")
    } finally q.stop()
  }
}
