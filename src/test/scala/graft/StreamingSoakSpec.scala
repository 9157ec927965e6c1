package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** Streaming soak (SURVEY §7 round-2 item 1 / VERDICT item 8): a 20×
  * event stream (200k events, 20 files) through the watermarked
  * windowed aggregation on the RocksDB state store, killed mid-stream
  * and restarted from the checkpoint. Exactly-once is verified the way
  * production would: the parquet file sink's metadata log makes the
  * output transactional across restarts, and the final contents must
  * equal a batch aggregation of the full input — no lost windows, no
  * double-counted windows.
  *
  * `value` is generated in exact binary quarters (n/4.0) so the
  * batch/stream double sums are bit-identical regardless of partial-
  * aggregation order.
  */
object CrashOnce {
  @volatile var armed = true
}

class StreamingSoakSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("idempotent foreachBatch sink survives an injected MID-BATCH crash") {
    import spark.implicits._
    // the hard exactly-once case: the sink has already written batch 1
    // when the query dies, the checkpoint has NOT committed it, and the
    // restart replays the same batch. An idempotent sink (overwrite by
    // batchId) makes the replay harmless — the pattern a production
    // foreachBatch sink must follow.
    val base = java.nio.file.Files.createTempDirectory("graft_crash").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def writeFile(i: Int): Unit =
      Seq.tabulate(100)(j => (i.toLong * 100 + j, t(i * 2)))
        .toDF("event_id", "ts")
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    def startQuery() = spark.readStream
      .schema("event_id long, ts timestamp").parquet(s"$base/in")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$base/out/batch=$batchId")
        if (batchId >= 1 && CrashOnce.armed) {
          CrashOnce.armed = false
          throw new RuntimeException("injected mid-batch crash")
        }
      }
      .start()
    CrashOnce.armed = true
    writeFile(0)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    writeFile(1) // this batch's sink write lands, then the query dies
    val q2 = startQuery()
    intercept[Exception] { q2.processAllAvailable(); q2.awaitTermination() }
    assert(!CrashOnce.armed, "crash must have fired inside the sink")
    val q3 = startQuery() // recovery: replays the uncommitted batch
    q3.processAllAvailable(); q3.stop()
    val out = spark.read.parquet(s"$base/out").select("event_id")
      .as[Long].collect().sorted
    assert(out.length == 200 && out.toSeq == (0L until 200L),
      s"exactly-once violated after mid-batch crash: ${out.length} rows")
  }

  test("20x windowed-agg stream survives kill/restart with exactly-once output (RocksDB)") {
    import spark.implicits._
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val baseSec = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val perFile = 10000L

    // file i covers hour i with deterministic ±1h jitter: bounded
    // disorder, always above the 2h watermark at the restart boundary
    def writeFile(i: Int): Unit =
      spark.range(i * perFile, (i + 1) * perFile).select(
        concat(lit("t"), col("id") % 5).as("event_type"),
        timestamp_seconds(lit(baseSec) + lit(i * 3600L) +
          xxhash64(col("id")) % 3600L).as("ts"),
        ((col("id") % 100).cast("double") / 4.0).as("value")
      ).coalesce(1).write.mode("append").parquet(s"$base/in")

    def startQuery() = {
      val src = spark.readStream
        .schema("event_type string, ts timestamp, value double")
        .parquet(s"$base/in")
      CdcStream.hourlyCounts(src)
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
    }

    try {
      (0 until 10).foreach(writeFile)
      val q1 = startQuery()
      q1.processAllAvailable()
      val ops1 = q1.lastProgress.stateOperators
      assert(ops1.nonEmpty && ops1(0).numRowsTotal > 0,
        "state store must hold open windows before the kill")
      info(s"pre-kill state rows=${ops1(0).numRowsTotal} " +
        s"mem=${ops1(0).memoryUsedBytes}B " +
        s"rocksdb=${ops1(0).customMetrics.keySet.toString.contains("rocksdb")}")
      assert(ops1(0).customMetrics.keySet.toArray.mkString(",").contains("rocksdb"),
        "state-store metrics must come from the RocksDB provider")
      // restart boundary: 10 of 21 files processed, checkpoint at a
      // batch boundary (processAllAvailable drained, then stop). A
      // mid-BATCH crash — task dying between sink file write and
      // commit-log append — is the file sink's own guarantee (readers
      // only see files recorded in _spark_metadata); what THIS spec
      // proves is no loss/duplication across query incarnations.
      q1.stop()

      (10 until 20).foreach(writeFile)
      // sentinel far in the future closes every real window via watermark
      Seq(("sentinel", new java.sql.Timestamp((baseSec + 720 * 3600L) * 1000), 0.0))
        .toDF("event_type", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$base/in")
      val q2 = startQuery()
      q2.processAllAvailable()
      val ops2 = q2.lastProgress.stateOperators
      info(s"post-restart state rows=${ops2(0).numRowsTotal} " +
        s"updated=${ops2(0).numRowsUpdated} mem=${ops2(0).memoryUsedBytes}B")
      q2.stop()

      // batch reads of a streaming sink honor the _spark_metadata
      // commit log — only transactionally committed files count
      val got = spark.read.parquet(s"$base/out")
        .collect().map(_.toSeq).toSet
      val expected = spark.read.parquet(s"$base/in")
        .where($"event_type" =!= "sentinel")
        .groupBy(window($"ts", "1 hour").as("win"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .select(unix_micros($"win.start").as("hour_us"), $"event_type",
          $"n", $"sum_value")
        .collect().map(_.toSeq).toSet
      assert(expected.size > 100, s"soak must close >100 windows, got ${expected.size}")
      assert(got == expected,
        s"exactly-once violated: ${(got -- expected).size} extra, " +
          s"${(expected -- got).size} missing of ${expected.size} windows")
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
