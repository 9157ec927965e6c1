package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Change, UserState}

/** Production state-store posture: the CDC latest-state query on the
  * RocksDB state store, killed and restarted from its checkpoint —
  * state must survive the restart (the 100 TB/day operational
  * requirement). File source + foreachBatch sink because those are
  * the recoverable pair (MemoryStream can't restore offsets). */
class StateStoreSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("latest-state survives a query restart on the RocksDB state store") {
    import spark.implicits._
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory("graft_rocks").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def startQuery() = {
      val src = spark.readStream
        .schema(Seq.empty[Change].toDS().schema)
        .parquet(s"$base/in").as[Change]
      CdcStream.latestState(src)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[UserState], _: Long) =>
          df.write.mode("append").parquet(s"$base/out")
        }
        .start()
    }
    try {
      Seq(Change(1L, 1L, t(10), "I", 10.0)).toDS()
        .write.mode("append").parquet(s"$base/in")
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // simulate driver loss

      // a change OLDER than the stored state: only a RESTORED state
      // can reject it — if state were lost, ev2 would win
      Seq(Change(1L, 2L, t(5), "U", 99.0),
          Change(2L, 3L, t(6), "I", 20.0)).toDS()
        .write.mode("append").parquet(s"$base/in")
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()

      val out = spark.read.parquet(s"$base/out").as[UserState].collect()
      val u1 = out.filter(_.user_id == 1L)
        .maxBy(s => (s.last_ts.getTime, s.last_event_id))
      assert(u1.last_event_id == 1L && u1.last_value == 10.0,
        s"restored state must beat the older change, got $u1")
      assert(out.exists(_.user_id == 2L))
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("GDPR forget is DURABLE across restart: erased state stays erased") {
    import spark.implicits._
    // the legal claim under test: after an erasure request commits,
    // a crash + restart must NOT resurrect the subject's data from
    // the checkpoint — and a late pre-forget change must be treated
    // as a fresh insert (no tombstone survives to block it, and no
    // old value survives to win the max)
    val base = java.nio.file.Files.createTempDirectory("graft_forget").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def startQuery() = {
      val src = spark.readStream
        .schema(Seq.empty[Change].toDS().schema)
        .parquet(s"$base/in").as[Change]
      CdcStream.forgetStream(src)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[UserState], _: Long) =>
          df.write.mode("append").parquet(s"$base/out")
        }
        .start()
    }
    // batch 1: data; batch 2: forget; crash; batch 3 after restart:
    // an event OLDER than the erased one arrives
    Seq(Change(1L, 1L, t(10), "I", 10.0)).toDS()
      .write.mode("append").parquet(s"$base/in")
    val q1 = startQuery(); q1.processAllAvailable()
    Seq(Change(1L, 2L, t(20), "F", 0.0)).toDS()
      .write.mode("append").parquet(s"$base/in")
    q1.processAllAvailable(); q1.stop() // crash after the erasure
    Seq(Change(1L, 3L, t(5), "U", 7.0)).toDS()
      .write.mode("append").parquet(s"$base/in")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$base/out").as[UserState].collect()
    val afterForget = out.filter(_.last_event_id == 3L)
    assert(afterForget.nonEmpty, "post-restart change must emit")
    // the restored store held NOTHING for user 1: the older change
    // wins as a fresh insert — had the pre-forget state survived the
    // checkpoint, event 1 (t=10, newer) would have won instead
    assert(afterForget.head.last_value == 7.0 &&
      !afterForget.head.deleted, s"resurrected state: ${afterForget.head}")
    assert(!out.exists(s => s.last_event_id == 3L && s.last_value == 10.0),
      "pre-forget value leaked through the restart")
  }
}
