package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Skew
import graft.sources.Tables

/** Skew-salting equivalence + streaming dedup (C9). */
class SkewStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  test("saltedJoin returns exactly the plain join result") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0))
      .toDF("event_type", "weight")
    val plain = ev.join(dim, Seq("event_type"))
      .agg(round(sum($"value" * $"weight"), 2)).as[Double].head()
    val salted = Skew.saltedJoin(ev, dim, "event_type", $"event_id", 8)
      .agg(round(sum($"value" * $"weight"), 2)).as[Double].head()
    assert(plain == salted)
  }

  test("saltedSum equals plain groupBy sum") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy($"event_type").agg(sum($"value").as("s"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .toMap
    val salted = Skew.saltedSum(ev, "event_type", "value", $"event_id", 8)
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .toMap
    assert(plain == salted)
  }

  test("C16 stream-stream interval join attributes purchases to clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = graft.streaming.CdcStream.intervalJoin(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts", "amount"),
      "user", "click_ts", "buy_ts", "30 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib").start()
    try {
      clicks.addData((1L, t(0)), (2L, t(5)))
      buys.addData((1L, t(10), 9.99),   // within 30m of click → match
        (2L, t(50), 5.0),               // 45m after click → no match
        (3L, t(12), 1.0))               // no click at all → no match
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user", "amount").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 9.99)))
    } finally q.stop()
  }

  test("C29 left-outer interval join emits unmatched clicks null-padded after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def late(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = graft.streaming.CdcStream.intervalJoinLeftOuter(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts", "amount"),
      "user", "click_ts", "buy_ts", "30 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_outer").start()
    try {
      clicks.addData((1L, t(0)), (2L, t(5)))
      buys.addData((1L, t(10), 9.99)) // converts; user 2 never buys
      q.processAllAvailable()
      // matched row emits promptly; the unmatched click CANNOT yet
      // (a buy might still arrive inside its interval)
      val early = spark.table("attrib_outer")
        .select("user").as[Long].collect().toSet
      assert(early == Set(1L), s"premature outer emission: $early")
      // advance both watermarks far past user 2's interval
      clicks.addData((9L, late(13)))
      buys.addData((9L, late(13), 0.0))
      q.processAllAvailable()
      clicks.addData((10L, late(14))); buys.addData((10L, late(14), 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("user", "amount").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toSet
      assert(rows.contains((1L, Some(9.99))), s"lost the match: $rows")
      assert(rows.contains((2L, None)),
        s"unmatched click never emitted null-padded: $rows")
    } finally q.stop()
  }

  test("C30 snapshotDiff: null<->value transitions are updates; unchanged rows vanish") {
    import spark.implicits._
    val oldS = Seq((1L, Some("a")), (2L, None), (3L, Some("c")),
      (4L, Some("d")), (6L, None)).toDF("id", "v")
    val newS = Seq((1L, None), (2L, Some("b")), (3L, Some("c")),
      (5L, Some("e")), (6L, None)).toDF("id", "v")
    val got = graft.operators.Cdc.snapshotDiff(oldS, newS, Seq("id"), Seq("v"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1: a→null = u; 2: null→b = u; 3 unchanged → absent;
    // 4 deleted; 5 inserted; 6: null→null unchanged → absent
    assert(got == Seq((1L, "u"), (2L, "u"), (4L, "d"), (5L, "i")), s"got $got")
  }

  test("generic applyChanges materializes latest non-deleted row per key") {
    import spark.implicits._
    val changes = Seq(
      (1L, 1L, "c", 10.0), (1L, 3L, "u", 11.0), (1L, 2L, "u", 99.0),
      (2L, 1L, "c", 20.0), (2L, 2L, "d", 0.0),
      (3L, 5L, "c", 30.0)
    ).toDF("id", "lsn", "op", "v")
    val got = graft.operators.Cdc.applyChanges(
      changes, Seq("id"), Seq($"lsn"), "op", deleteOp = "d")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 11.0), (3L, 5L, 30.0)))
  }

  test("C9 dedupStream drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("k", "ts", "v")
    val q = graft.streaming.CdcStream.dedupStream(df, Seq("k"), "ts", "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      in.addData((1L, t(0), 1.0), (2L, t(1), 2.0), (1L, t(2), 99.0))
      q.processAllAvailable()
      in.addData((1L, t(3), 98.0), (3L, t(4), 3.0)) // k=1 still a dup
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("k").as[Long]
        .collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
