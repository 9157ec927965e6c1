package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graph}

class GraphSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("connectedComponents: chain, pair, singleton") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L), (10L, 11L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val got = Graph.connectedComponents(edges, verts)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("both algorithms collapse duplicate vertices and label edge-only endpoints") {
    import spark.implicits._
    // vertex list with a duplicate (1), a missing endpoint (2), and an
    // isolated vertex (3) — the documented contract must hold anyway
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val verts = Seq(1L, 1L, 3L).toDF("id")
    for (algo <- Seq(
        Graph.connectedComponents(edges, verts),
        Graph.connectedComponentsAltStar(edges, verts))) {
      val got = algo.as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((1L, 1L), (2L, 1L), (3L, 3L)), s"got $got")
    }
  }

  test("reliable checkpoint dir: same components, files cleaned up by truncate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val edges = Seq((1L, 2L), (3L, 2L), (10L, 11L)).toDF("src", "dst")
      val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
      val got = Graph.connectedComponents(edges, verts)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L))
    } finally spark.sparkContext.setCheckpointDir(null) // local mode: resets
  }

  test("alt-star solves a 100k-node path (diameter label-prop cannot touch)") {
    import spark.implicits._
    val n = 100000L
    val edges = spark.range(n - 1).select($"id".as("src"), ($"id" + 1).as("dst"))
    val verts = spark.range(n).select($"id")
    val t0 = System.nanoTime()
    val bad = Graph.connectedComponentsAltStar(edges, verts)
      .filter($"component" =!= 0L).count()
    info(f"100k-path solved in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    assert(bad == 0, s"$bad nodes not labeled 0 on a single path")
  }

  test("alt-star equals label propagation on random graphs") {
    import spark.implicits._
    val n = 2000L
    val verts = spark.range(n).select($"id")
    // deterministic random edges, sparse enough to leave many components
    val edges = spark.range(1500)
      .select((org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.xxhash64($"id")) % n).as("src"),
        (org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.xxhash64($"id", $"id")) % n).as("dst"))
    val a = Graph.connectedComponentsAltStar(edges, verts)
      .as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(edges, verts)
      .as[(Long, Long)].collect().toMap
    assert(a == b, s"${a.count { case (k, v) => b(k) != v }} nodes disagree")
  }

  test("nearDupClusters groups every jaccard pair and keeps min as canonical") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, GraftTestSession.sf)
    val clusters = Dedup.nearDupClusters(docs)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = clusters.map(c => c._1 -> c._2).toMap
    assert(byDoc.size == docs.count(), "one row per document")
    // every verified near-dup pair lands in the same cluster
    val pairs = Dedup.ngramJaccard(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "test corpus must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the min member; exactly one canonical per cluster
    val members = clusters.groupBy(_._2)
    members.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid id is not its min member")
      assert(ms.count(_._3 == 1L) == 1, s"cluster $cid canonical count != 1")
      assert(ms.forall(_._4 == ms.length), s"cluster $cid n_members wrong")
    }
  }
}
