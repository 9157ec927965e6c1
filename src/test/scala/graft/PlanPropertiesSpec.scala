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

  test("no hard broadcast hint on SF-scaling tables (customer/supplier)") {
    // customer (150k × SF) and supplier (10k × SF) grow with the data;
    // a hard broadcast() hint overrides the size threshold, so at
    // 100 TB the job FAILS on the 8 GB broadcast limit instead of
    // degrading to a shuffle join. Hints are reserved for fixed-size
    // dims (nation/region/brand) and bounded derived frames (query
    // sets, thresholds). This pins the absence of the hint in the
    // LOGICAL plan — the physical join may still be BHJ at test scale
    // via the threshold, which is exactly the desired behavior.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for ((name, fn) <- SparkEntry.queries) {
      val analyzed = fn(spark, sf).queryExecution.analyzed
      analyzed.collect { case h: ResolvedHint => h }.foreach { h =>
        val cols = h.child.output.map(_.name).toSet
        assert(!cols.contains("c_custkey") && !cols.contains("s_suppkey"),
          s"$name hard-broadcasts an SF-scaling table: ${h.child.output.map(_.name)}")
      }
    }
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

  test("ann_ivfpq hot path is a broadcast cell equi-join") {
    // the IVFADC scan shape: probed (query, cell) rows broadcast, code
    // rows joined on cell — never a corpus-wide scoring pass
    val p = plan("ann_ivfpq")
    assert("BroadcastHashJoin \\[cell#\\d+\\]".r.findFirstIn(p).isDefined,
      s"cell equi-join lost:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ann_ivfpq degraded to an all-pairs join")
  }

  test("no accidental cartesian products anywhere") {
    for ((name, _) <- SparkEntry.queries) {
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian join")
    }
  }

  test("dedup_lines reads the corpus exactly twice (offending set + reassembly)") {
    // the first cut had a third scan for per-doc totals; the totals now
    // ride the reassembly aggregate — a regression here is +50% scan IO
    // at 100 TB
    val p = plan("dedup_lines")
    assert("Scan parquet".r.findAllIn(p).size == 2,
      s"dedup_lines should scan the corpus exactly twice:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_hw_forecast folds in one keyed aggregate — no join, no window, one scan") {
    val p = plan("q_hw_forecast")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"extra scans:\n$p")
    assert(!p.contains("Join"), s"HW fold grew a join:\n$p")
    assert(!p.contains("Window"), s"HW fold grew a window:\n$p")
  }

  test("q_seasonal_decompose joins only driver-scale frames (broadcast both ways)") {
    val p = plan("q_seasonal_decompose")
    // corpus-sized work is the two daily-count aggs; the trend ⋈
    // seasonal recombination must stay a broadcast of (types × days)-
    // sized frames, never a shuffled corpus join
    assert(p.contains("BroadcastHashJoin"), s"recombination lost broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"seasonal recombination shuffles:\n$p")
  }

  test("cdc_parse_envelope is one scan and zero joins before the presentation sort") {
    val p = plan("cdc_parse_envelope")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"), s"envelope parse grew a join:\n$p")
  }

  test("ann/dedup vector paths have no nested-loop joins left") {
    // IVF assignment is a literal argmax projection; embedding dedup is
    // LSH-blocked. (ann_bruteforce intentionally broadcasts the query
    // set against the full corpus — that one IS a scan by design.)
    for (q <- Seq("ann_ivf", "ann_lsh", "ann_ivf_kmeans", "dedup_embedding"))
      assert(!plan(q).contains("BroadcastNestedLoopJoin"),
        s"$q regressed to a nested-loop join")
  }

  test("runtime bloom filter prunes the probe side of a selective fact-fact join") {
    // at 100 TB a selective dimension-side predicate should reach the
    // fact scan as an injected runtime bloom filter (Spark 3.3+) so
    // non-matching row groups never leave the scan. Thresholds are
    // production-sized, so shrink them to test scale here.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the injector skips joins it predicts will broadcast; the test
      // tables are tiny, so force the shuffle-join prediction too
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val li = graft.sources.Tables.lineitem(spark, sf)
      val ords = graft.sources.Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
      // disable broadcast so the join is genuinely shuffle-shaped (the
      // regime where a runtime filter pays at scale)
      val p = li.hint("shuffle_hash").join(ords,
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").count()
        .queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n${p.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no single-task window over an unbounded frame (the r7 fixed four)") {
    // q_basket_lift / text_collocations: top-k must ride orderBy+limit
    // (TakeOrderedAndProject) with the rank window running on the
    // k-row result ONLY; q_lorenz / q_abc: rank/cumsum must be the
    // two-level bucket decomposition (in-bucket partitioned window +
    // broadcast offsets) with NO unpartitioned window at all. Checked
    // on the optimized logical plan (stable under AQE): every Window
    // with an empty partitionSpec must sit above a GlobalLimit —
    // i.e. its input frame is bounded to k rows, never corpus-sized.
    import org.apache.spark.sql.catalyst.plans.logical.{
      GlobalLimit, LogicalPlan, Window => LWindow}
    def bounded(p: LogicalPlan): Boolean =
      p.collectFirst { case _: GlobalLimit => true }.isDefined
    for (q <- Seq("q_basket_lift", "text_collocations", "q_lorenz", "q_abc")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val unpart = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      unpart.foreach { w =>
        assert(bounded(w.child),
          s"$q runs an unpartitioned Window over an unbounded frame:\n$w")
      }
    }
    // and the two ranked-list queries must keep the TakeOrdered path
    for (q <- Seq("q_basket_lift", "text_collocations"))
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q sorts globally")
    // the two decomposed queries must have NO unpartitioned window left
    for (q <- Seq("q_lorenz", "q_abc")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      assert(lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
        s"$q still has an unpartitioned Window")
    }
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

  test("round-10 header walks: one scan, zero joins, zero pre-sort Exchange") {
    // the container walks are row-local byte math — the ONLY shuffle
    // allowed in the plan is the final presentation sort; a join or
    // aggregate Exchange here would mean the walk stopped being
    // per-row (the 100 TB posture: one ranged header read per asset,
    // embarrassingly parallel)
    for (q <- Seq("mm_mp4_fragments", "mm_ogg_pages", "mm_mkv_tracks")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, // rangepartitioning for the sort (+AQE read)
        s"$q has $exchanges Exchanges — the walk is shuffling:\n$p")
      assert("HashAggregate".r.findAllIn(p).isEmpty,
        s"$q grew an aggregate:\n$p")
    }
    // the round-10 stats additions must keep their windows partitioned
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("q_fisher_exact", "q_hodges_lehmann", "q_pinball",
        "cdc_msprt")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val unpart = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(unpart.isEmpty, s"$q runs an unpartitioned Window")
    }
  }
}
