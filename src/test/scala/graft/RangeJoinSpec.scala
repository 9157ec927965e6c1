package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.RangeJoin
import graft.sources.Tables

/** Custom range-join operator (LogicalPlan + Strategy + Exec):
  * correctness vs. the built-in BETWEEN join, plan-shape, and
  * overlap/edge handling. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private def sessions() = graft.operators.Cdc
    .sessionize(graft.sources.Tables.events(spark, sf))
    .select(col("user_id").as("s_user"), col("session_seq"),
      col("start_us"), col("end_us"))

  private def points() = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("p_us"))
  }

  test("range join equals the built-in BETWEEN join result") {
    // columns must come from the SAME frame instances (resolved ids)
    val pts = points(); val ses = sessions()
    val viaOp = RangeJoin.join(pts, ses, pts("p_us"), ses("start_us"), ses("end_us"))
      .select("event_id", "s_user", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBuiltin = pts.join(ses,
        pts("p_us") >= ses("start_us") && pts("p_us") <= ses("end_us"))
      .select("event_id", "s_user", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOp == viaBuiltin)
    assert(viaOp.nonEmpty)
  }

  test("physical plan uses BroadcastRangeJoinExec, not a nested loop") {
    val pts = points(); val ses = sessions()
    val df = RangeJoin.join(pts, ses, pts("p_us"), ses("start_us"), ses("end_us"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("keyed range join equals the built-in key+BETWEEN join result") {
    val pts = {
      import spark.implicits._
      Tables.events(spark, sf)
        .select($"user_id", $"event_id", unix_micros($"ts").as("p_us"))
    }
    val ses = sessions()
    val viaOp = RangeJoin.joinKeyed(pts, ses, pts("user_id"), ses("s_user"),
        pts("p_us"), ses("start_us"), ses("end_us"))
      .select("event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBuiltin = pts.join(ses,
        pts("user_id") === ses("s_user") &&
          pts("p_us") >= ses("start_us") && pts("p_us") <= ses("end_us"))
      .select("event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOp == viaBuiltin)
    assert(viaOp.nonEmpty)
  }

  test("keyed plan is ShuffledRangeJoin over shuffles — no broadcast, no BNLJ") {
    val pts = points().withColumn("k", col("event_id") % 10)
    val ses = {
      import spark.implicits._
      Seq((0L, 0L, 100L)).toDF("k2", "lo", "hi")
    }
    val df = RangeJoin.joinKeyed(pts, ses, pts("k"), ses("k2"),
      pts("p_us"), ses("lo"), ses("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledRangeJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("BroadcastRangeJoin"))
    assert(plan.contains("Exchange"), "keyed variant must cluster by key")
  }

  test("broadcast variant fails fast when the interval side exceeds the guard") {
    import spark.implicits._
    val iv = spark.range(200)
      .select($"id".as("iv_id"), ($"id" * 10).as("lo"), ($"id" * 10 + 5).as("hi"))
    val pts = Seq((1L, 42L)).toDF("pid", "p")
    spark.conf.set(RangeJoin.BroadcastRowLimitKey, "100")
    try {
      val ex = intercept[Exception] {
        RangeJoin.join(pts, iv, pts("p"), iv("lo"), iv("hi")).collect()
      }
      assert(ex.getMessage.contains("broadcastRowLimit") ||
        Option(ex.getCause).exists(_.getMessage.contains("broadcastRowLimit")),
        s"unexpected error: $ex")
    } finally spark.conf.unset(RangeJoin.BroadcastRowLimitKey)
  }

  test("null points, null bounds, and null keys match nothing (SQL BETWEEN)") {
    import spark.implicits._
    val iv = Seq(
      (1L, Option(0L), Option(100L)),
      (2L, Option.empty[Long], Option(100L)),  // null lo: dropped at build
      (3L, Option(0L), Option.empty[Long])     // null hi: dropped at build
    ).toDF("iv_id", "lo", "hi")
    val pts = Seq((10L, Option(50L)), (11L, Option.empty[Long]))
      .toDF("pid", "p")
    val got = RangeJoin.join(pts, iv, pts("p"), iv("lo"), iv("hi"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L)))
    // keyed variant: same plus null keys
    val ivK = Seq(
      (Option(1L), 1L, Option(0L), Option(100L)),
      (Option.empty[Long], 2L, Option(0L), Option(100L)),
      (Option(1L), 3L, Option.empty[Long], Option(100L))
    ).toDF("k", "iv_id", "lo", "hi")
    val ptsK = Seq(
      (Option(1L), 10L, Option(50L)),
      (Option(1L), 11L, Option.empty[Long]),
      (Option.empty[Long], 12L, Option(50L))
    ).toDF("k2", "pid", "p")
    val gotK = RangeJoin.joinKeyed(ptsK, ivK, ptsK("k2"), ivK("k"),
        ptsK("p"), ivK("lo"), ivK("hi"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotK == Set((10L, 1L)))
  }

  test("keyed range join works with string keys") {
    import spark.implicits._
    val iv = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "iv_id", "lo", "hi")
    val pts = Seq(("a", 10L, 50L), ("b", 11L, 500L), ("c", 12L, 50L))
      .toDF("k2", "pid", "p")
    val got = RangeJoin.joinKeyed(pts, iv, pts("k2"), iv("k"),
        pts("p"), iv("lo"), iv("hi"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L)))
  }

  test("overlapping and point intervals all match (leftward sweep)") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 100L),    // wide
      (2L, 10L, 20L),    // nested
      (3L, 15L, 15L),    // degenerate point
      (4L, 200L, 300L)   // disjoint
    ).toDF("iv_id", "lo", "hi")
    val pts = Seq((100L, 15L), (101L, 50L), (102L, 250L), (103L, 999L))
      .toDF("pid", "p")
    val got = RangeJoin.join(pts, iv, pts("p"), iv("lo"), iv("hi"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (100L, 1L), (100L, 2L), (100L, 3L), // p=15 in all three overlapping
      (101L, 1L),                         // p=50 only in the wide one
      (102L, 4L)))                        // p=999 matches nothing
  }
}
