package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graph}

class GraphSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("I9 LPA communities: two bridged triangles split exactly, modularity hand-checked") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by bridge (3,4): 3 sync
    // sweeps with the min-label tie rule converge to labels 1 and 3;
    // m = 7, each community has e_in = 3, d_sum = 7 →
    // contrib = (2·14·3 − 49)/196 = 35/196, Q = 70/196
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    def run() = Graph.labelPropagation(edges, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val c = 0.178571 // round(35/196, 6)
    val q = 0.357143 // round(70/196, 6)
    val want = Seq((1L, 3L, 3L, 7L, c, q), (3L, 3L, 3L, 7L, c, q))
    val got = run()
    assert(got == want, s"got $got")
    assert(run() == got, "sync LPA must be run-to-run deterministic")
  }

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

  test("pageRank: hand-folded two fixed-point iterations, dangling source at reset") {
    import spark.implicits._
    // a→b, a→c, b→c: a has no in-links (rank locks to the 0.15 reset
    // = 15·10¹⁰ after one iteration); the spec replays the identical
    // integer recurrence driver-side
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = Graph.pageRank(edges, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val R = 150000000000L
    def step(s: Long) = R + s * 17 / 20
    val r1 = Map("a" -> R,
      "b" -> step(1000000000000L / 2),
      "c" -> step(1000000000000L / 2 + 1000000000000L / 1))
    val r2 = Map("a" -> R,
      "b" -> step(r1("a") / 2),
      "c" -> step(r1("a") / 2 + r1("b") / 1))
    for ((k, v) <- r2) assert(got(k) == v, s"$k: ${got(k)} vs $v")
  }

  test("I18 personalized pageRank: mass flows only from the seed cone, off-graph seeds ignored") {
    import spark.implicits._
    // a→b, a→c, b→c seeded at {a}: only a carries teleport mass, so
    // b and c hold pure flow-through rank and a node OUTSIDE the
    // seed cone would stay at exactly 0; the off-graph seed "zz"
    // must be ignored (seed set intersects graph nodes)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a", "zz").toDF("node")
    val got = Graph.personalizedPageRank(edges, seeds, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val R = 150000000000L
    def flow(s: Long) = s * 17 / 20
    val r1 = Map("a" -> R,
      "b" -> flow(1000000000000L / 2),
      "c" -> flow(1000000000000L / 2))
    val r2 = Map("a" -> R,
      "b" -> flow(r1("a") / 2),
      "c" -> flow(r1("a") / 2 + r1("b") / 1))
    assert(got.keySet == Set("a", "b", "c"), s"nodes ${got.keySet}")
    for ((k, v) <- r2) assert(got(k) == v, s"$k: ${got(k)} vs $v")
    // an isolated non-seed component stays at exactly zero
    val edges2 = Seq(("a", "b"), ("x", "y")).toDF("src", "dst")
    val got2 = Graph.personalizedPageRank(edges2,
        Seq("a").toDF("node"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2("x") == 0L && got2("y") == 0L,
      s"non-cone nodes must hold 0: $got2")
    assert(got2("a") == R && got2("b") == flow(R),
      s"seed cone: $got2")
  }

  test("pageRank collapses duplicate edges; disconnected node holds reset") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "b"), ("x", "y")).toDF("src", "dst")
    val got = Graph.pageRank(edges, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val R = 150000000000L
    // a→b deduped: outdeg(a) = 1, so b's fixpoint is R + (R·17) div 20
    assert(got("b") == R + R * 17 / 20, s"b: ${got("b")}")
    assert(got("b") == got("y"), "identical structure, identical rank")
    assert(got("a") == R && got("x") == R)
  }

  test("triangleCounts: K4 minus an edge, orientation-independent input") {
    import spark.implicits._
    // edges 12,13,14,23,24 (some reversed, one duplicated, one loop):
    // triangles {1,2,3} and {1,2,4} → counts 1:2 2:2 3:1 4:1
    val edges = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (2L, 1L), (3L, 3L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"got $got")
  }

  test("triangleCounts: triangle-free star and path report zeros") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (5L, 6L), (6L, 7L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 0L), s"got $got")
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("bfsHops: path radius budget, isolated seed, multi-seed min-fold") {
    import spark.implicits._
    // path 1-2-3-4-5-6; radius 3 from seed 1 reaches 1..4 ONLY, and an
    // isolated seed (99, no edges) still surfaces at hop 0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val one = Graph.bfsHops(path, Seq(1L, 99L).toDF("node"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 99L -> 0L),
      s"got $one")
    // seeds at both ends: every hop is the MIN over sources
    val both = Graph.bfsHops(path, Seq(1L, 6L).toDF("node"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(both == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 2L, 5L -> 1L, 6L -> 0L), s"got $both")
  }

  test("I19 path counts: diamond multiplies, closer seed overrides, frontier-only sums") {
    import spark.implicits._
    // a−b, a−c, b−d, c−d, d−e seeded at {a}: the diamond gives d two
    // shortest paths (σ=2) which propagate to e
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e")).toDF("src", "dst")
    val got = Graph.pathCounts(edges, Seq("a").toDF("node"), 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("a" -> ((0L, 1L)), "b" -> ((1L, 1L)),
      "c" -> ((1L, 1L)), "d" -> ((2L, 2L)), "e" -> ((3L, 2L))),
      s"got $got")
    // a second seed z adjacent to d: d settles at hop 1 with σ=1
    // (the closer seed's single path REPLACES the diamond's two —
    // σ counts SHORTEST paths only), and e inherits σ=1 at hop 2
    val edges2 = edges.union(Seq(("z", "d")).toDF("src", "dst"))
    val got2 = Graph.pathCounts(edges2,
        Seq("a", "z").toDF("node"), 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got2("d") == ((1L, 1L)) && got2("e") == ((2L, 1L)),
      s"got2 $got2")
    assert(got2("b") == ((1L, 1L)) && got2("z") == ((0L, 1L)))
    // parallel/duplicate edges must not double-count paths
    val got3 = Graph.pathCounts(edges.union(edges),
        Seq("a").toDF("node"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got3("d") == 2L, s"dupes double-counted: $got3")
  }

  test("I12 harmonic: path reciprocals exact, two landmarks sum, seeds excluded at 0") {
    import spark.implicits._
    // path a-b-c-d; one seed at a: H_ppm(b)=10^6, (c)=5*10^5,
    // (d)=333333 (exact floor), n_reached 1 each; a itself only has
    // its hop-0 label, which the hop>=1 filter drops
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val one = Graph.harmonicFromSeeds(path, Seq("a").toDF("node"), 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(one == Map("b" -> ((1L, 1000000L)), "c" -> ((1L, 500000L)),
      "d" -> ((1L, 333333L))), s"got $one")
    // landmarks at both ends: every node sums 1/d over BOTH seeds,
    // and each seed is reached by the other
    val both = Graph.harmonicFromSeeds(path, Seq("a", "d").toDF("node"), 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(both == Map(
      "a" -> ((1L, 333333L)), "b" -> ((2L, 1500000L)),
      "c" -> ((2L, 1500000L)), "d" -> ((1L, 333333L))), s"got $both")
  }

  test("I13 boruvka MSF: planted structure exact, random graphs equal driver Kruskal") {
    import spark.implicits._
    // planted: two triangles bridged by a heavy edge + an isolated
    // pair — MSF = the two cheap edges of each triangle, the bridge,
    // and the pair edge (forest across components)
    val planted = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 10L),
      (4L, 5L, 1L), (5L, 6L, 2L), (4L, 6L, 10L),
      (3L, 4L, 50L),          // bridge: must be kept (only connector)
      (7L, 8L, 5L))
      .toDF("src", "dst", "w")
    val got = Graph.boruvkaMst(planted).as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (4L, 5L, 1L),
      (5L, 6L, 2L), (3L, 4L, 50L), (7L, 8L, 5L)), s"got $got")

    // random: 120 nodes, ~700 edges, formula weights made STRICTLY
    // distinct per pair — exact equality with a driver Kruskal
    val es = (0 until 700).map { i =>
      val a = math.abs((i * 7919 + 13) % 120).toLong
      val b = math.abs((i * 104729 + 57) % 120).toLong
      (a, b, ((a * 131 + b * 17 + i) % 100000).toLong)
    }.filter(t => t._1 != t._2)
    val gotR = Graph.boruvkaMst(es.toDF("src", "dst", "w"))
      .as[(Long, Long, Long)].collect().toSet
    // driver Kruskal under the SAME (w, a, b) total order
    val canon = es.map { case (s, d, w) =>
      (math.min(s, d), math.max(s, d), w) }
      .groupBy(t => (t._1, t._2))
      .map { case ((a, b), v) => (a, b, v.map(_._3).min) }.toSeq
      .sortBy(t => (t._3, t._1, t._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = canon.flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet
    assert(gotR == kruskal,
      s"diff +${(gotR -- kruskal).take(5)} -${(kruskal -- gotR).take(5)}")
  }

  test("kCorePeel: pendant chain peels off K4; extra rounds are a no-op") {
    import spark.implicits._
    // K4 on 1..4 plus pendant chain 4-5-6: the 3-core is exactly the
    // K4 (6 peels first as deg-1, exposing 5) — two passes needed
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core = Graph.kCorePeel(edges, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core")
    // past convergence the peel is a fixpoint: more rounds change nothing
    val more = Graph.kCorePeel(edges, k = 3, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(more == core, s"got $more")
    // k above the max core degree empties the graph
    assert(Graph.kCorePeel(edges, k = 4, rounds = 4).isEmpty)
  }

  test("I5 link prediction: 4-cycle diagonals score cn=2 jacc=1e6, pendant wedges cn=1, adjacency excluded") {
    import spark.implicits._
    // square 1-2-3-4 plus pendant 5 attached to 1:
    //   diagonals (1,3) and (2,4) share two neighbors, Jaccard 1;
    //   (2,5) and (4,5) share only vertex 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a", "b")
    val got = Graph.linkPrediction(edges, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val m = got.toMap
    assert(m.keySet == Set((1L, 3L), (2L, 4L), (2L, 5L), (4L, 5L)),
      s"candidate pairs: ${m.keySet}")
    assert(m((1L, 3L)) == ((2L, 3L, 2L, 666666L)), s"${m((1L, 3L))}")
    assert(m((2L, 4L)) == ((2L, 2L, 2L, 1000000L)), s"${m((2L, 4L))}")
    assert(m((2L, 5L)) == ((1L, 2L, 1L, 500000L)), s"${m((2L, 5L))}")
    assert(m((4L, 5L)) == ((1L, 2L, 1L, 500000L)), s"${m((4L, 5L))}")
    // ordering: cn desc first, then jaccard desc breaks the cn tie
    assert(got.map(_._1).toSeq ==
      Seq((2L, 4L), (1L, 3L), (2L, 5L), (4L, 5L)))
  }

  test("I7 clustering coefficient: K4 all 1.0, pendant and path nulls/zeros exact") {
    import spark.implicits._
    // K4 on 1-4 plus pendant 5 hung off 4 plus path edge 5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.clusteringCoeff(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // nodes 1-3: K4 members, d=3, 3 triangles → cc = 2·3/(3·2) = 1
    for (v <- Seq(1L, 2L, 3L))
      assert(got(v) == ((3L, 3L, 1000000L)), s"node $v: ${got(v)}")
    // node 4: d=4, still only the 3 K4 triangles → 6/12 = 0.5
    assert(got(4L) == ((4L, 3L, 500000L)), s"node 4: ${got(4L)}")
    // node 5: d=2, no triangle → 0; node 6: d=1 → null by definition
    assert(got(5L) == ((2L, 0L, 0L)), s"node 5: ${got(5L)}")
    assert(got(6L) == ((1L, 0L, -1L)), s"node 6: ${got(6L)}")
  }

  test("I8 power-law fit: star-graph MLE matches the closed form") {
    import spark.implicits._
    // S5: hub degree 5, five leaves at degree 1 → tail = {hub}
    val edges = (2L to 6L).map(l => (1L, l)).toDF("src", "dst")
    val r = Graph.powerlawFit(edges).collect()(0)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 1L, 5L, 166666L)), s"got $r")
    assert(r.getDouble(4) == r4(1.0 + 1.0 / math.log(5.0 / 1.5)), s"got $r")
  }

  test("I6 assortativity: star -1, path -0.5, regular cycle null") {
    import spark.implicits._
    def r(edges: Seq[(Long, Long)]): (Long, Long, Option[Double]) = {
      val row = Graph.assortativity(edges.toDF("a", "b")).collect()(0)
      (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))
    }
    // star S3: every edge joins the deg-3 hub to a deg-1 leaf → -1
    assert(r(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == ((4L, 3L, Some(-1.0))))
    // path P4: hand-computed r = (6·16-100)/(6·18-100) = -0.5
    assert(r(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, Some(-0.5))))
    // 4-cycle: 2-regular, zero degree variance → explicit null
    assert(r(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) == ((4L, 4L, None)))
  }

  test("I10 SSSP: cheaper 2-hop path beats the direct edge, rounds bound path length") {
    import spark.implicits._
    // 1→2→3 costs 20 vs direct 1→3 at 100; 4 hangs one more hop away
    val e = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    def dists(rounds: Int) = Graph.sssp(e, seeds, rounds)
      .as[(Long, Long)].collect().toMap
    // 1 round: only direct edges — the heavy 1→3 wins for now
    assert(dists(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 100L))
    // 2 rounds: the relay relaxes 3 to 20; 4 appears via the heavy path
    assert(dists(2) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 101L))
    // 3 rounds: converged — 4 rides the cheap relay
    assert(dists(3) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 21L))
  }

  test("I11 k-truss: pendant triangle and lone edge peel, K4 survives at support 2") {
    import spark.implicits._
    // K4 on 1..4, a triangle (1,2,5) hanging off the (1,2) edge, and
    // an isolated edge (8,9). 4-truss: the pendant triangle's edges
    // carry support 1 and peel in round 1 (taking (1,2)'s third
    // triangle with them); the lone edge has support 0; K4 is stable
    // with every edge in exactly 2 surviving triangles.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L), (8L, 9L)).toDF("src", "dst")
    val got = Graph.ktruss(e, 4, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)), s"got ${got.toSeq}")
  }
  test("I14 rich club: star+triangle thresholds exact, degenerate club nulls") {
    import spark.implicits._
    // a-b, a-c, a-d, b-c: deg a=3, b=2, c=2, d=1;
    // min-endpoint degrees: ab=2, ac=2, ad=1, bc=2
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"))
      .toDF("src", "dst")
    val got = Graph.richClub(edges, Seq(1L, 2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // k=1: club {a,b,c} carries all of ab, ac, bc -> phi = 6/6 = 1
    // k=2: club {a} alone -> phi undefined (null)
    assert(got.toSeq == Seq((1L, 3L, 3L, 1000000L), (2L, 1L, 0L, -1L)),
      s"got ${got.toSeq}")
  }

  test("I15 incremental components: base+deltas == full recompute, " +
      "including cross-batch merge chains and a dethroning new min") {
    import spark.implicits._
    def cc(df: org.apache.spark.sql.DataFrame) =
      Graph.connectedComponentsAltStar(df,
          df.select($"src".as("id")).union(df.select($"dst".as("id"))))
        .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_icc").toString
    // base: {5,6}, {9,10}, {20,21} — three components, minima 5/9/20
    val base = Seq((5L, 6L), (9L, 10L), (20L, 21L)).toDF("src", "dst")
    Graph.publishComponents(base,
      base.select($"src".as("id")).union(base.select($"dst".as("id"))), dir)
    // delta 1: merge {5,6} with {9,10} (remap 9→5), attach new node 30
    // to {20,21} (new-node label through the merge map)
    val d1 = Seq((6L, 10L), (30L, 20L)).toDF("src", "dst")
    val (m1, n1) = Graph.appendComponentDelta(spark, dir, d1)
    assert(m1 == 1L && n1 == 1L, s"delta1 counts ($m1, $n1)")
    // delta 2: new node 3 bridges the merged {5,6,9,10} — the NEW
    // min dethrones 5, chaining 9→5→3 through two log entries; plus
    // an intra-component no-op edge
    val d2 = Seq((3L, 10L), (20L, 30L)).toDF("src", "dst")
    val (m2, n2) = Graph.appendComponentDelta(spark, dir, d2)
    assert(m2 == 1L && n2 == 1L, s"delta2 counts ($m2, $n2)")
    val all = base.union(d1).union(d2)
    val want = cc(all)
    val got = Graph.readComponents(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"incremental $got\nfull $want")
    assert(got(9L) == 3L && got(30L) == 20L, s"chain resolution: $got")
    // compaction folds the log and is read-invariant
    Graph.compactComponents(spark, dir)
    val gotC = Graph.readComponents(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(gotC == want, "compaction changed the labeling")
    assert(graft.sources.Lake.Manifest.readPublished(spark, s"$dir/remaps")
      .count() == 0L, "compaction should reset the remap log")
  }

  test("I17 incremental triangles: base+deltas == full recompute, " +
      "multi-new-edge triangles dedup, new nodes carry zeros, replay commits nothing") {
    import spark.implicits._
    def full(df: org.apache.spark.sql.DataFrame) =
      Graph.triangleCounts(df).as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_itr").toString
    // base: triangle {1,2,3} + pendant 3-4 + disjoint edge 5-6
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    Graph.publishTriangles(base, dir)
    assert(Graph.readTriangles(spark, dir).as[(Long, Long)]
      .collect().toMap == full(base), "published state != full counts")
    // delta 1: (2,4) closes {2,3,4}; (4,1) closes BOTH {1,2,4} (via
    // the other NEW edge — the dedup case) and {1,3,4}; plus a new
    // node 7 hanging off 5 (zero triangles, must still appear) and a
    // replayed duplicate of an existing edge (no-op)
    val d1 = Seq((2L, 4L), (4L, 1L), (7L, 5L), (1L, 2L)).toDF("src", "dst")
    assert(Graph.appendTriangleDelta(spark, dir, d1) > 0L)
    val all1 = base.union(d1)
    val want1 = full(all1)
    val got1 = Graph.readTriangles(spark, dir)
      .as[(Long, Long)].collect()
    assert(got1.length == got1.map(_._1).distinct.length, "dup node rows")
    assert(got1.toMap == want1, s"delta1 ${got1.toMap}\nfull $want1")
    assert(got1.toMap.apply(7L) == 0L, "new pendant node must carry 0")
    // delta 2: an ALL-NEW triangle {10,11,12} (three delta edges
    // must dedup to ONE triangle) + (5,7), which closes nothing
    // (6-7 absent) but duplicates an edge delta 1 already added —
    // the anti-join must drop it
    val d2 = Seq((10L, 11L), (11L, 12L), (10L, 12L), (5L, 7L))
      .toDF("src", "dst")
    assert(Graph.appendTriangleDelta(spark, dir, d2) > 0L)
    val all2 = all1.union(d2)
    val want2 = full(all2)
    assert(Graph.readTriangles(spark, dir).as[(Long, Long)]
      .collect().toMap == want2, "delta 2 diverged")
    assert(want2(10L) == 1L && want2(11L) == 1L && want2(12L) == 1L)
    // replaying an applied batch commits nothing
    val vE = graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/edges")
    val vP = graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/tpatch")
    assert(Graph.appendTriangleDelta(spark, dir, d2) == 0L)
    assert(graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/edges") == vE)
    assert(graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/tpatch") == vP)
    // compaction folds the log read-invariantly
    Graph.compactTriangles(spark, dir)
    assert(Graph.readTriangles(spark, dir).as[(Long, Long)]
      .collect().toMap == want2, "compaction changed the counts")
    assert(graft.sources.Lake.Manifest.readPublished(spark, s"$dir/tpatch")
      .count() == 0L)
  }

  test("I16 incremental PageRank: base+deltas BIT-EQUAL to the full recompute; replay commits nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    def pr(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, 5).as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_ipr").toString
    // base: a cycle with a chord and a dangling sink — outdegs 1 and 2,
    // a node with no in-edges after the delta cannot exist (cycle)
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
      .toDF("src", "dst")
    Graph.publishPageRank(base, dir)
    assert(Graph.readPageRank(spark, dir).as[(Long, Long)]
      .collect().toMap == pr(base), "published state != full PR")
    // delta 1: new node 9 -> 2 (new endpoint + outdeg-0 source),
    // plus 4 -> 1 (the sink gains an out-edge: outdeg change ripples)
    val d1 = Seq((9L, 2L), (4L, 1L)).toDF("src", "dst")
    val n1 = Graph.appendPageRankDelta(spark, dir, d1)
    assert(n1 > 0)
    val all1 = base.union(d1)
    assert(Graph.readPageRank(spark, dir).as[(Long, Long)]
      .collect().toMap == pr(all1), "delta 1 diverged")
    // delta 2: existing-nodes edge that changes 2's outdeg (2 -> 4):
    // node 2 contributes less everywhere downstream
    val d2 = Seq((2L, 4L)).toDF("src", "dst")
    assert(Graph.appendPageRankDelta(spark, dir, d2) > 0)
    val all2 = all1.union(d2)
    val want = pr(all2)
    assert(Graph.readPageRank(spark, dir).as[(Long, Long)]
      .collect().toMap == want, "delta 2 diverged")
    // every intermediate iteration matches the full recompute too
    val fullIters = Graph.pageRankAllIters(all2, 5)
      .as[(Long, Long, Long)].collect().toSet
    val gotIters = (1L to 5L).flatMap(k =>
      Graph.readPageRankIter(spark, dir, k)
        .select(lit(k).as("iter"), $"node", $"r")
        .as[(Long, Long, Long)].collect()).toSet
    assert(gotIters == fullIters, "an intermediate iteration diverged")
    // replaying an applied batch is a no-op: nothing committed
    val vE = graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/edges")
    val vP = graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/rpatch")
    assert(Graph.appendPageRankDelta(spark, dir, d2) == 0L)
    assert(graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/edges") == vE)
    assert(graft.sources.Lake.Manifest.latestVersion(spark, s"$dir/rpatch") == vP)
    // compaction folds the log read-invariantly
    Graph.compactPageRank(spark, dir)
    assert(Graph.readPageRank(spark, dir).as[(Long, Long)]
      .collect().toMap == want, "compaction changed the ranks")
    assert(graft.sources.Lake.Manifest.readPublished(spark, s"$dir/rpatch")
      .count() == 0L)
  }

  test("I21 SCC closure: cycles fuse, bridges don't, singletons covered") {
    import spark.implicits._
    // 1→2→3→1 (cycle), 3→4→5 (bridge chain), 5→6→5 (2-cycle),
    // 7→1 (feeder: its own singleton SCC)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L), (7L, 1L)).toDF("src", "dst")
    val got = Graph.stronglyConnected(edges, 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 2L), (6L, 5L, 2L), (7L, 7L, 1L)), got)
    // doubling radius covers the diameter: a directed 6-cycle needs
    // paths of length 5 — 3 doublings (radius 8) fuse it whole
    val six = (1L to 6L).map(i => (i, i % 6 + 1)).toDF("src", "dst")
    val full = Graph.stronglyConnected(six, 3)
      .as[(Long, Long, Long)].collect()
    assert(full.forall(r => r._2 == 1L && r._3 == 6L), full.toSeq)
  }

  test("I24 landmark betweenness: diamond dependencies exact, multi-seed sums") {
    import spark.implicits._
    // diamond + tail: s-a, s-b, a-c, b-c, c-d. From seed s:
    // σ = [s:1, a:1, b:1, c:2, d:2]; Brandes backward:
    // δ(d)=0 (radius cut), δ(c)=(2/2)(1+0)=1,
    // δ(a)=δ(b)=(1/2)(1+1)=1. Seed row s is an endpoint: excluded.
    val edges = Seq(("s", "a"), ("s", "b"), ("a", "c"), ("b", "c"),
      ("c", "d")).toDF("src", "dst")
    val got = Graph.landmarkBetweenness(edges,
        Seq("s").toDF("seed"), 3)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 1.0), ("b", 1L, 1.0), ("c", 1L, 1.0),
      ("d", 1L, 0.0)), got)
    // two landmarks sum: from d the chain d-c-{a,b} gives δ_d(c) =
    // (1/1)(1+1) + (1/1)(1+1)... c's successors from d are a AND b:
    // σ_d = [d:1, c:1, a:1, b:1, s:2]; δ_d(s)=0 (radius),
    // δ_d(a)=δ_d(b)=(1/2)(1+0)=0.5 each... a's successor is s:
    // δ_d(a)=(1/2)(1+0)=0.5; δ_d(c)=(1/1)(1+0.5)·2=3.0
    val got2 = Graph.landmarkBetweenness(edges,
        Seq("s", "d").toDF("seed"), 3)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val m = got2.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("c") == ((2L, 1.0 + 3.0)), m)   // both seeds reach c
    assert(m("a") == ((2L, 1.0 + 0.5)), m)
    assert(m("s") == ((1L, 0.0)), m)         // only d's BFS scores s
    assert(m("d") == ((1L, 0.0)), m)
  }
}
