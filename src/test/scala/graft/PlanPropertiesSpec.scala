package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards (SURVEY.md §5): these properties are
  * what keep the operators viable at 100 TB — if a refactor loses a
  * broadcast, a pushdown, or the TakeOrdered path, this fails before
  * any benchmark does. */
class PlanPropertiesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dimension joins broadcast (no shuffle of the fact side for dims)") {
    for (q <- Seq("q_clean_real", "q_join_agg", "q_drawdown", "dedup_ngram_jaccard"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast")
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_topk", "q_join_agg", "q_worst_drawdown"))
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q sorts globally")
  }

  test("scans push filters and prune columns") {
    val p = plan("q_agg")
    assert(p.contains("PushedFilters"))
    // Q1 shape reads 5 of 11 lineitem columns; ReadSchema must not
    // contain the unused ship/date/key columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "column pruning lost")
  }

  test("no accidental cartesian products anywhere") {
    for ((name, _) <- SparkEntry.queries) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian join")
    }
  }

  test("ann/dedup vector paths have no nested-loop joins left") {
    // IVF assignment is a literal argmax projection; embedding dedup is
    // LSH-blocked. (ann_bruteforce intentionally broadcasts the query
    // set against the full corpus — that one IS a scan by design.)
    for (q <- Seq("ann_ivf", "ann_lsh", "ann_ivf_kmeans", "dedup_embedding"))
      assert(!plan(q).contains("BroadcastNestedLoopJoin"),
        s"$q regressed to a nested-loop join")
  }

  test("windowed operators partition by key (no global window)") {
    for (q <- Seq("cdc_latest_state", "cdc_scd2", "q_running_sum")) {
      val p = plan(q)
      // a Window with an empty partition spec would serialize all rows
      // through one task; ours must carry the key
      assert(!p.contains("Window [") || p.contains("windowspecdefinition(user_id")
        || p.contains("windowspecdefinition(o_custkey"), s"$q: $p")
    }
  }
}
