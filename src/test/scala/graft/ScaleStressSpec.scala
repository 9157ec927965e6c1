package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dedup correctness under heavy duplication: a synthetic corpus with
  * a known duplicate structure (each base doc replicated k times with
  * fresh ids) — the exact shape a crawl corpus has at scale. */
class ScaleStressSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("exact dedup recovers the known duplicate structure at 20x corpus") {
    import spark.implicits._
    val base = Tables.documents(spark, GraftTestSession.sf)
    val n = base.count()
    val k = 20
    // replicate every doc k times with distinct ids (id + copy*n)
    val big = base.crossJoin(
        spark.range(k).select($"id".as("copy")))
      .select(($"doc_id" + $"copy" * n).as("doc_id"), $"text",
        $"lang", $"source", $"n_chars")
    assert(big.count() == n * k)
    val groups = Dedup.exact(big)
    // every content hash now has exactly k copies (base corpus has no
    // exact dups), keeper = the lowest id (the original)
    assert(groups.count() == n)
    assert(groups.filter($"n_copies" =!= k).count() == 0)
    assert(groups.filter($"keeper_doc_id" >= n).count() == 0)
    // and the deduped corpus is exactly the original size
    assert(Dedup.dedupedCorpus(big).count() == n)
  }

  test("keyed range join handles 10^6 intervals with zero driver materialization") {
    import spark.implicits._
    // 100k keys × 10 intervals each = 10^6 intervals — far past the
    // broadcast guard; only the shuffled per-key variant can run this.
    val nKeys = 100000L
    val iv = spark.range(nKeys * 10).select(
      ($"id" / 10).cast("long").as("k"),
      ($"id" % 10 * 100).as("lo"),
      ($"id" % 10 * 100 + 50).as("hi"))
    // one probe per key at t=125 → falls only in interval j=1 [100,150]
    val pts = spark.range(nKeys).select($"id".as("k2"), lit(125L).as("p"))
    // guard set far below the interval count: a broadcast path would
    // refuse outright, so a green run proves the shuffled exec never
    // takes the interval side to the driver
    spark.conf.set(graft.plans.RangeJoin.BroadcastRowLimitKey, "1000")
    try {
      val joined = graft.plans.RangeJoin.joinKeyed(pts, iv,
        pts("k2"), iv("k"), pts("p"), iv("lo"), iv("hi"))
      assert(joined.count() == nKeys) // exactly one matching interval/key
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledRangeJoin"), plan.take(800))
    } finally spark.conf.unset(graft.plans.RangeJoin.BroadcastRowLimitKey)
  }

  test("minhash LSH finds replicated near-identical docs in the 20x corpus") {
    import spark.implicits._
    val base = Tables.documents(spark, GraftTestSession.sf).limit(50)
    // two copies of each doc under different ids → 50 known dup pairs
    val big = base.select($"doc_id", $"text")
      .unionByName(base.select(($"doc_id" + 1000).as("doc_id"), $"text"))
    val pairs = Dedup.minhashLsh(big)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (d, d+1000) identical pair must be found (jaccard = 1.0)
    (0L until 50L).foreach { d =>
      assert(pairs.contains((d, d + 1000)), s"missing identical pair $d")
    }
  }
}
