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
