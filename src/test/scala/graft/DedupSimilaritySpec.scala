package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Property checks for the approximate dedup/ANN operators whose
  * results have no SQL oracle (SURVEY.md §6). */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH finds the high-jaccard pairs (recall at 0.5 threshold)") {
    val exact = pairSet(Dedup.ngramJaccard(Tables.documents(spark, sf)))
    val lsh = pairSet(Dedup.minhashLsh(Tables.documents(spark, sf)))
    // LSH output is verified, so it's a subset of the exact pairs…
    assert(lsh.subsetOf(exact))
    // …and with 8 bands × 4 rows at j≥0.5 collision prob per pair is
    // ≥ 1-(1-0.5^4)^8 ≈ 0.40; the injected near-dups are j≈0.99 where
    // it's ≈ 1. Require we catch most of the exact set.
    if (exact.nonEmpty)
      assert(lsh.size >= math.max(1, (0.8 * exact.size).toInt),
        s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("ivfpq rerank emits true cosines in descending order over the ADC shortlist") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.annIvfPqRerank(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // per query: exactly top-3, ranks 1..3, scores non-increasing
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L), s"q=$q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq,
        s"q=$q scores not descending")
    }
    // scores are TRUE cosines (quantization error gone): recompute
    // independently from the raw vectors
    val vm = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    got.foreach { case (q, _, id, cos) =>
      val expect = dot(vm(q), vm(id)) /
        (math.sqrt(dot(vm(q), vm(q))) * math.sqrt(dot(vm(id), vm(id))))
      // emitted score is rounded to 6 dp; half an ulp of slack
      assert(math.abs(cos - expect) < 6e-7, s"($q,$id): $cos vs $expect")
    }
  }

  test("containment catches a short doc embedded in a long one that jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, short),                  // 4 shingles
      (2L, short + " " + filler),   // contains all 4, plus ~64 of its own
      (3L, "unrelated text pile one two three four five six")
    ).toDF("doc_id", "text")
    val c = Dedup.ngramContainment(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(c.keySet == Set((1L, 2L)), s"got ${c.keySet}")
    assert(c((1L, 2L)) == 1.0, "full inclusion must score containment 1.0")
    // symmetric jaccard on the same pair: 4 / (4 + 64 - 4) << 0.5
    assert(pairSet(Dedup.ngramJaccard(docs)).isEmpty,
      "jaccard at 0.5 must miss the quote-inclusion pair")
  }

  test("D17 dup spans: per-doc repeated-window fraction, hand-computed") {
    import spark.implicits._
    val shared = "one two three four five"          // one shared 5-gram
    val docs = Seq(
      (1L, shared),                                  // 1 window, repeated
      (2L, shared + " six seven eight nine"),        // 5 windows, 1 hot
      (3L, "totally different words here now ok"),   // 2 windows, 0 hot
      (4L, "tiny doc")                               // < 5 words: 0 windows
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(r(0) == ((1L, 1L, 1L, 1000000L, true)), s"got ${r(0)}")
    assert(r(1) == ((2L, 5L, 1L, 200000L, false)), s"got ${r(1)}")
    assert(r(2) == ((3L, 2L, 0L, 0L, false)), s"got ${r(2)}")
    assert(r(3) == ((4L, 0L, 0L, 0L, false)), s"got ${r(3)}")
  }

  test("decontaminate flags eval copies, passes clean and shingle-less docs") {
    import spark.implicits._
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta"),      // eval copy
      (11L, "one two three four five six seven eight nine"), // clean
      (12L, "tiny")                                          // < 5 words
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalSet).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out(10L)._3 == 1.0 && out(10L)._4 == 1L)
    assert(out(11L) == ((5L, 0L, 0.0, 0L)))
    assert(out(12L) == ((0L, 0L, 0.0, 0L)))
  }

  test("D14 bloom decontam == exact decontam; corpus reads sf parquet both ways") {
    import spark.implicits._
    // crafted equality incl. the D9 edge cases
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta"),
      (11L, "one two three four five six seven eight nine"),
      (12L, "tiny")).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(train, evalSet).collect().toSeq.map(_.toSeq)
    val bloom = Dedup.decontaminateBloom(train, evalSet).collect().toSeq.map(_.toSeq)
    assert(bloom == exact, "bloom prefilter must be output-invariant")
    // real-corpus equality at the graded split
    val d = Tables.documents(spark, sf)
    val t2 = d.filter($"doc_id" % 50 =!= 0); val e2 = d.filter($"doc_id" % 50 === 0)
    val a = Dedup.decontaminate(t2, e2).collect().toSeq.map(_.toSeq)
    val b = Dedup.decontaminateBloom(t2, e2).collect().toSeq.map(_.toSeq)
    assert(b == a, "bloom path must match exact path on the corpus")
  }

  test("F17 chunking: empty/short/overlap edges and lossless coverage") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                   // empty → one empty chunk
      (2L, (1 to 50).map("t" + _).mkString(" ")), // exactly one window
      (3L, (1 to 51).map("t" + _).mkString(" ")), // one over → 2 chunks
      (4L, (1 to 130).map("t" + _).mkString(" "))) // 1+ceil(80/40) = 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out((1L, 0L)) == ((0L, 0L, "")), s"empty doc: ${out((1L, 0L))}")
    assert(out.keys.count(_._1 == 2L) == 1 && out((2L, 0L))._2 == 50L)
    assert(out.keys.count(_._1 == 3L) == 2, "51 tokens → 2 chunks")
    assert(out((3L, 1L)) == ((40L, 11L,
      (41 to 51).map("t" + _).mkString(" "))), s"tail chunk: ${out((3L, 1L))}")
    assert(out.keys.count(_._1 == 4L) == 3, "130 tokens → 3 chunks")
    // every token of doc 4 is covered: union of [start, start+len) = [0, 130)
    val covered = out.keys.filter(_._1 == 4L).toSeq.map(out)
      .flatMap { case (s, l, _) => s until (s + l) }.toSet
    assert(covered == (0L until 130L).toSet, "chunks must cover every token")
  }

  test("E16 hybrid RRF fuses dense and lexical ranks deterministically") {
    import spark.implicits._
    val out = Similarity.hybridRrf(
      Tables.embeddings(spark, sf), Tables.documents(spark, sf))
    val rows = out.collect()
    assert(rows.nonEmpty, "hybrid must produce fused rankings")
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 10, s"query $q: at most k fused rows")
      val rrfs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
        s"query $q: rrf non-increasing in rank")
      // a doc ranked on BOTH arms must outscore one ranked on a
      // single arm at the same positions by construction
      rs.foreach { r =>
        val (v, l) = (Option(r.get(4)), Option(r.get(5)))
        assert(v.nonEmpty || l.nonEmpty, "fused row must come from an arm")
      }
    }
  }

  test("D15 tf-cosine separates repetition factors where set-jaccard ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common rare"),
      (3L, "totally different words here"),
      (4L, "alpha beta"),
      (5L, "alpha alpha alpha alpha beta")) // same SET as 4, diff tf
      .toDF("doc_id", "text")
    val out = Dedup.tfCosine(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // (1,2): dot = 1·1 + 2·1 = 3, norms √5·√2 → 3/√10
    val c12 = 3.0 / (math.sqrt(5.0) * math.sqrt(2.0))
    assert(out.contains((1L, 2L)) &&
      out((1L, 2L)) == ((3L, math.rint(c12 * 1e6) / 1e6)), s"got ${out.get((1L, 2L))}")
    // (4,5): identical term SET (jaccard would say 1.0) but cosine
    // 5/(√2·√17) ≈ 0.857 — repetition factor separates them
    val c45 = 5.0 / (math.sqrt(2.0) * math.sqrt(17.0))
    assert(out((4L, 5L))._2 == math.rint(c45 * 1e6) / 1e6, s"got ${out((4L, 5L))}")
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L },
      "no shared terms → no pair")
  }

  test("F18 char entropy: zero for runs, ln 2 for a balanced pair") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "aabb"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((4L, 1L, 0.0)), s"single-char run: ${got(1L)}")
    val ln2r = math.rint(math.log(2.0) * 1e4) / 1e4
    assert(got(2L) == ((2L, 2L, ln2r)), s"balanced pair: ${got(2L)}")
    assert(got(3L)._3 == ln2r, "entropy depends on distribution, not length")
  }

  test("E20 random projection: recall beats chance, projected angles track true cosines") {
    import spark.implicits._
    val exact = Similarity.bruteforce(Tables.embeddings(spark, sf))
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rp = Similarity.annRp(Tables.embeddings(spark, sf))
    val approx = rp.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0
      else exact.count(approx.contains).toDouble / exact.size
    // random corpus = weak neighbors (cos≈0.4): a 4× projection keeps
    // enough angle signal to beat chance (3/500 ≈ 0.006) ~20×, but
    // weak-neighbor rankings are inherently distorted — the planted-
    // duplicate check below is the strong-neighbor guarantee
    assert(recall >= 0.1, s"recall=$recall")
    // planted exact duplicates MUST come back at rank 1: identical
    // vectors project identically, so projected cosine is exactly 1
    val base = Tables.embeddings(spark, sf)
    val dups = base.filter($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val withDups = base.unionByName(dups)
    val top1 = Similarity.annRp(withDups)
      .filter($"rank" === 1).select("q_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) == q + 1000000L,
        s"query $q must retrieve its planted clone first, got ${top1(q)}")
    }
    // retrieval must be INFORMATIVE in true-cosine terms: the mean
    // TRUE cosine of retrieved pairs beats the all-pairs mean (a
    // correlation test over retrieved pairs would be selection-biased
    // — pairs are chosen BY projected score, which truncates the
    // range; the planted-duplicate check below is the strong regime)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def trueCos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a).map(_.toDouble), vecs(b).map(_.toDouble))
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    val retrieved = rp.select("q_id", "vec_id").collect()
      .map(r => trueCos(r.getLong(0), r.getLong(1)))
    val allMean = {
      val qs = vecs.keys.filter(_ < 5)
      val cs = for (q <- qs.toSeq; v <- vecs.keys if v != q)
        yield trueCos(q, v)
      cs.sum / cs.size
    }
    val retMean = retrieved.sum / retrieved.length
    assert(retMean > allMean + 0.05,
      s"retrieved true-cos mean $retMean must beat corpus mean $allMean")
  }

  test("E22 silhouette: tight separated clusters near 1, degenerate identical corpus 0") {
    import spark.implicits._
    def v(base: Float, i: Int): Array[Float] = {
      val a = new Array[Float](4); a(0) = base + i * 0.01f; a(1) = base; a
    }
    // cluster A around 0, cluster B around 100 — far apart, tight
    val two = ((0 until 10).map(i => (i.toLong, v(0f, i), 0)) ++
      (0 until 10).map(i => (100L + i, v(100f, i), 1)))
      .toDF("vec_id", "embedding", "label")
    val s2 = Similarity.kmeansSilhouette(two, k = 2, iters = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(s2.map(_._1).sum == 20L)
    assert(s2.forall(_._2 > 0.9), s"tight clusters must score near 1: ${s2.toSeq}")
    // identical vectors: a = b = 0 everywhere → silhouette exactly 0
    val same = (0 until 8).map(i => (i.toLong, v(5f, 0), 0))
      .toDF("vec_id", "embedding", "label")
    val s1 = Similarity.kmeansSilhouette(same, k = 2, iters = 1).collect()
    assert(s1.forall(_.getDouble(2) == 0.0), s"degenerate: ${s1.toSeq}")
  }

  test("E21 NDCG: full agreement 1.0, rank-2-only hit exact, no relevant null") {
    import spark.implicits._
    def axis(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i) = 1f; a
    }
    val vecs = (Seq(
      (0L, axis(0), 100), (1L, axis(1), 101), (2L, axis(2), 102),
      (3L, axis(3), 103), (4L, axis(4), 104),
      (10L, axis(0), 100), (11L, axis(0), 100), (12L, axis(0), 999),
      (13L, axis(1), 999), (14L, axis(1), 999), (15L, axis(1), 999),
      (16L, axis(2), 999), (17L, axis(2), 102), (18L, axis(2), 999)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.annNdcg(vecs).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(0L) == Some(1.0), s"got ${got(0L)}")     // rel (1,1,0)
    assert(got(1L) == None, s"got ${got(1L)}")          // no relevant hit
    assert(got(2L) == Some(0.63093), s"got ${got(2L)}") // hit at rank 2 only
    assert(got(3L) == None && got(4L) == None)
  }

  test("simhash: near-identical docs collide at small hamming distance") {
    val nearDup = pairSet(Dedup.ngramJaccard(Tables.documents(spark, sf))
      .filter(col("jaccard") >= 0.95))
    val sim = pairSet(Dedup.simhash(Tables.documents(spark, sf)))
    // simhash is approximate: short docs (few shingle features) have
    // noisy fingerprints, so require high recall, not totality
    val found = nearDup.count(sim.contains)
    assert(nearDup.isEmpty || found >= (0.8 * nearDup.size).toInt,
      s"recall $found/${nearDup.size}")
  }

  test("simhash pairs respect the hamming threshold") {
    val bad = Dedup.simhash(Tables.documents(spark, sf)).filter(col("hamming") > 7)
    assert(bad.count() == 0)
  }

  test("ann_lsh recall vs brute force is nontrivial and candidates are bounded") {
    val exact = Similarity.bruteforce(Tables.embeddings(spark, sf))
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLsh(Tables.embeddings(spark, sf))
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0
      else exact.count(approx.contains).toDouble / exact.size
    // random gaussian corpus: neighbors are weak (cos≈0.4), so LSH
    // recall is inherently modest; it must still beat random chance
    // (3 of 500 ≈ 0.006) by a wide margin.
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("ann_ivf returns top-k per query from probed cells") {
    val df = Similarity.annIvf(Tables.embeddings(spark, sf))
    assert(df.groupBy("q_id").count().filter(col("count") > 3).count() == 0)
    assert(df.count() > 0)
  }

  test("kmeans assigns every vector, deterministically, into <= k cells") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val a3 = Similarity.kmeans(Tables.embeddings(spark, sf), k = 8, iters = 3)
    assert(a3.count() == e.count())
    assert(a3.select("cell").distinct().count() <= 8)
    assert(a3.collect().toSeq == Similarity.kmeans(Tables.embeddings(spark, sf), 8, 3).collect().toSeq)
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    import spark.implicits._
    val out = TextAnalysis.tfidf(Tables.documents(spark, sf))
    assert(out.groupBy("doc_id").count().filter($"count" > 3).count() == 0)
    // a term present in EVERY doc has idf=0 → can never be a top term
    // unless everything ties at 0; require positive top-1 scores
    assert(out.filter($"rank" === 1 && $"score" <= 0).count() == 0)
  }

  test("stratified sampling is seed-deterministic and respects strata") {
    val docs = Tables.documents(spark, sf)
    val fr = Map("en" -> 0.5, "fr" -> 0.1, "es" -> 0.0,
      "de" -> 1.0, "zh" -> 0.2)
    val a = TextAnalysis.stratifiedSample(docs, "lang", fr, seed = 7L)
    val b = TextAnalysis.stratifiedSample(docs, "lang", fr, seed = 7L)
    assert(a.select("doc_id").collect().toSeq ==
      b.select("doc_id").collect().toSeq) // same seed → same sample
    val counts = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("es"))                  // fraction 0 → none
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("de") == total("de"))             // fraction 1 → all
  }

  test("ann_pq: a PQ-coded duplicate of the query is always retrieved") {
    import spark.implicits._
    val vecs = Seq.tabulate(100) { i =>
      val src = if (i == 50) 0 else i // vec 50 = exact copy of query 0
      (i.toLong, Array.tabulate(64)(d =>
        (((src * 2654435761L + d * 40503L) % 1000L) / 250.0f) - 2.0f))
    }.toDF("vec_id", "embedding")
    val res = Similarity.annPq(vecs)
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // identical vector → identical codes → per-subspace minimum of
    // every ADC table → minimal total distance: must be in the top-k
    assert(byQ(0L).map(_.getLong(2)).contains(50L))
    // adc is non-decreasing with rank within each query
    byQ.values.foreach { rows =>
      val adcs = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ann_rr_pq: the rotation is orthogonal and the chain is annPq over the rotated view") {
    import spark.implicits._
    val vecs = Seq.tabulate(100) { i =>
      val src = if (i == 50) 0 else i
      (i.toLong, Array.tabulate(64)(d =>
        (((src * 2654435761L + d * 40503L) % 1000L) / 250.0f) - 2.0f))
    }.toDF("vec_id", "embedding")
    // orthogonality: a permutation + sign flips preserves norms and
    // pairwise dot products EXACTLY (same multiset of ±products)
    def rot(v: Array[Double]): Array[Double] =
      Array.tabulate(64)(j =>
        v((j * 29) % 64) * (if ((j * 13) % 5 == 0) -1.0 else 1.0))
    val sample = vecs.limit(3).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // per-lane products are EXACTLY preserved (the two sign flips
    // cancel; the permutation only reorders them), so the sorted
    // product multiset is bit-equal — the float-safe orthogonality
    // statement (a summed comparison would reorder the fold)
    def prods(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sorted.toSeq
    for (a <- sample; b <- sample)
      assert(prods(rot(a), rot(b)) == prods(a, b),
        "rotation must preserve the product multiset exactly")
    // the operator == the plain PQ chain over the pre-rotated frame
    val got = Similarity.annRrPq(vecs).collect().map(_.toString).toSeq
    val pre = vecs.select($"vec_id",
      org.apache.spark.sql.functions.expr(
        """transform(sequence(0, 63), j ->
          |  element_at(cast(embedding as array<double>),
          |    (j * 29) % 64 + 1)
          |  * (CASE WHEN (j * 13) % 5 = 0 THEN -1.0 ELSE 1.0
          |     END))""".stripMargin).as("embedding"))
    val want = Similarity.annPq(pre).collect().map(_.toString).toSeq
    assert(got == want, "annRrPq must equal annPq on the rotated view")
    // the coded duplicate still surfaces (rotation-invariant recall)
    val byQ = Similarity.annRrPq(vecs).collect().groupBy(_.getLong(0))
    assert(byQ(0L).map(_.getLong(2)).contains(50L))
  }

  test("D22 cdc chunking: insertion locality — a prepended edit leaves the tail chunks intact") {
    import spark.implicits._
    // deterministic ~1200-char text; B = a 37-char insertion + A.
    // Content-defined cuts re-synchronize at the first boundary past
    // the edit, so all later chunks keep their identity — the
    // property fixed-size blocking lacks (every block shifts).
    val rng = Iterator.iterate(42L)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
    val a = rng.take(1200).map(s =>
      if (s % 7 == 0) ' ' else ('a' + (s % 26)).toChar).mkString
    val b = "the quick brown fox jumps over it " + a
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs)
      .select($"doc_id", $"chunk").as[(Long, String)].collect()
    val ca = chunks.filter(_._1 == 1L).map(_._2).toSeq
    val cb = chunks.filter(_._1 == 2L).map(_._2).toSet
    assert(ca.size >= 5, s"corpus too short to chunk: ${ca.size}")
    val surviving = ca.count(cb.contains)
    assert(surviving >= ca.size - 2,
      s"only $surviving of ${ca.size} chunks survived a prepend")
    // the report prices it: doc 1's chunks are nearly all shared
    val rep = Dedup.cdcChunkReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep(1L)._2 >= rep(1L)._1 - 2, s"report: $rep")
    // identical docs dedup at exactly 1e6 ppm
    val twin = Dedup.cdcChunkReport(
        Seq((1L, a), (2L, a)).toDF("doc_id", "text"))
      .select($"doc_id", $"dedup_ppm").as[(Long, Long)].collect().toMap
    assert(twin(1L) == 1000000L && twin(2L) == 1000000L, s"twin $twin")
  }

  test("dedup_embedding is symmetric-free and thresholded") {
    val df = Dedup.embeddingCosine(Tables.embeddings(spark, sf))
    assert(df.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(df.filter(col("cos") < 0.5).count() == 0)
  }

  test("LSH-blocked embedding dedup recovers every exact pair at test scale") {
    val vecs = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = pairs(Dedup.embeddingCosine(vecs))
    val exact = pairs(Dedup.embeddingCosineExactSmallBlock(vecs))
    // blocked ⊆ exact by construction; equality = full recall on this
    // corpus (deterministic planes — this is a fixed fact, not a
    // probabilistic one)
    assert(blocked == exact)
  }

  test("semantic dedup drops the cloned vector, keeps the original, skips distinct ones") {
    import spark.implicits._
    // 0 and 5 identical (cos 1.0); 1 = 0 scaled (cos 1.0 — scale-
    // invariant); the rest orthogonal-ish
    val rows = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(2f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0f, 0f, 1f, 0f),
      4L -> Array(0f, 0f, 0f, 1f),
      5L -> Array(1f, 0f, 0f, 0f))
    val vecs = rows.toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, k = 2, iters = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // clones of 0 must both be dropped with 0 as the kept neighbor —
    // IF clustering co-locates them (identical direction ⇒ same cell)
    assert(got == List((1L, 0L, 1.0), (5L, 0L, 1.0)), s"got $got")
  }

  test("semantic dedup: a zero vector neither absorbs cell-mates nor is dropped") {
    import spark.implicits._
    // vec 0 is all-zero; cos(0, x) = 0/0 = NaN, which sorts ABOVE every
    // double in Spark and DuckDB — an unguarded `cos >= t` would drop
    // EVERY vector sharing a cell with vec 0, with vec 0 as "keeper".
    // k = 1 forces everything into one cell, the worst case.
    val rows = Seq(
      0L -> Array(0f, 0f, 0f, 0f),
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(1f, 0f, 0f, 0f))
    val vecs = rows.toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, k = 1, iters = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // only the genuine clone pair (3 dups 1) survives; vec 0 appears on
    // neither side of any pair
    assert(got == List((3L, 1L, 1.0)), s"got $got")
  }

  test("exact quantiles: crafted uniform and tied groups hit the type-1 definition") {
    import spark.implicits._
    // group u: cents 1..100 → p25/p50/p90/p99 = 25/50/90/99
    // group t: fifty 7s then fifty 11s → p25/p50 = 7, p90/p99 = 11
    val u = (1 to 100).map(i => ("u", i.toLong / 100.0))
    val t = (Seq.fill(50)(0.07) ++ Seq.fill(50)(0.11)).map(("t", _))
    val df = (u ++ t).toDF("o_orderpriority", "o_totalprice")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q").toString
    df.select($"o_orderpriority", $"o_totalprice").write
      .parquet(s"$tmp/orders.parquet")
    val got = graft.operators.Relational.quantiles(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("u") == ((100L, 25L, 50L, 90L, 99L)), s"got ${got("u")}")
    assert(got("t") == ((100L, 7L, 7L, 11L, 11L)), s"got ${got("t")}")
  }

  test("E17 MMR: a clone of the top pick is displaced by the diverse candidate") {
    import spark.implicits._
    // query 0 = x̂. Candidates 10 and 11 are IDENTICAL vectors at
    // rel ≈ .9397; 12 mirrors them across x at the same relevance.
    // Plain top-3 is (10, 11, 12) by the id tie rule; MMR's second
    // pick must skip the clone: score(11) = .5(.9397−1) < 0 <
    // .5(.9397−.766) = score(12).
    val rows = Seq(
      0L -> Array(1.0, 0.0, 0.0), 1L -> Array(0.0, 0.0, 1.0),
      2L -> Array(0.0, 1.0, 0.0), 3L -> Array(0.5, 0.5, 0.7),
      4L -> Array(0.3, 0.4, 0.5),
      10L -> Array(0.9397, 0.342, 0.0), 11L -> Array(0.9397, 0.342, 0.0),
      12L -> Array(0.9397, -0.342, 0.0))
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.mmr(df)
      .filter($"q_id" === 0L).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 10L, s"first pick is plain argmax: $got")
    assert(got(2L) == 12L, s"diverse candidate must beat the clone: $got")
    // 3rd: the irrelevant-but-orthogonal ẑ (rel 0, maxsim 0, score 0)
    // still beats the clone's .5(.9397−1) < 0; the clone only
    // re-enters 4th, once every zero-redundancy candidate is gone
    assert(got(3L) == 1L && got(4L) == 11L, s"greedy order: $got")
  }

  test("E18 centroid outliers: hand-computed integer distances, vec_id tie rule") {
    import spark.implicits._
    // label 1: two vectors at (1,1), one at (4,5) — centroid micros
    // = floor(6e6/3, 7e6/3) = (2000000, 2333333); label 2: a lone
    // vector is its own centroid, dist 0
    val vecs = Seq(
      (10L, 1, Array(1.0f, 1.0f)), (11L, 1, Array(1.0f, 1.0f)),
      (12L, 1, Array(4.0f, 5.0f)), (20L, 2, Array(9.0f, 9.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.Similarity.embedOutliers(vecs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val c = Array(6000000L / 3, 7000000L / 3)
    def d2(x: Long, y: Long) = (x - c(0)) * (x - c(0)) + (y - c(1)) * (y - c(1))
    val d12 = d2(4000000L, 5000000L)
    val d10 = d2(1000000L, 1000000L)
    assert(got((1L, 1L)) == ((12L, d12)), s"${got((1L, 1L))} vs $d12")
    // equal distances: vec_id ascending breaks the tie
    assert(got((1L, 2L)) == ((10L, d10)) && got((1L, 3L)) == ((11L, d10)))
    assert(got((2L, 1L)) == ((20L, 0L)), "singleton label centers on itself")
  }

  test("E19 Hamming codes: clone at distance 0, every distance matches the replicated packing") {
    import spark.implicits._
    // replicate the operator's sign-bit packing (plane family t=100,
    // sequential double fold — the DotProduct order) independently
    def code(v: Array[Float]): Long = (0 until 64).map { j =>
      val p = Similarity.planeArray(100, j)
      var d = 0.0
      var i = 0
      while (i < 64) { d += v(i).toDouble * p(i); i += 1 }
      if (d > 0) 1L << j else 0L
    }.reduce(_ | _)
    val base = Array.tabulate(64)(i => (i + 1).toFloat)
    val vs = Map(
      0L -> base, 1L -> base.clone(),
      2L -> base.map(-_),
      3L -> base.map(x => 65f - x))
    val df = vs.toSeq.map { case (id, v) => (id, v, "x") }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.annHamming(df)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    def want(a: Long, b: Long) =
      java.lang.Long.bitCount(code(vs(a)) ^ code(vs(b)))
    assert(got((0L, 1L)) == 0L, "clone must sit at Hamming 0")
    got.foreach { case ((q, v), h) =>
      assert(h == want(q, v), s"($q,$v): got $h want ${want(q, v)}")
    }
    // all 4 vectors are queries and each sees all 3 others (TopK = 3)
    assert(got.size == 12, s"rows: ${got.size}")
  }

  test("E32 residual quantization: distributed == sequential replica, stage 2 shrinks seed reconstruction error") {
    import spark.implicits._
    // synthetic 40×8 corpus, fully deterministic floats, all 40
    // vectors DISTINCT (a periodic formula would alias sample rows
    // into stage-1 seeds and void the reconstruction property)
    def elem(i: Int, j: Int): Float =
      ((i * i * 7 + i * 31 + j * 17 + j * j * i) % 97 - 48).toFloat / 8.0f
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => elem(i, j)))
    }.toDF("vec_id", "embedding")
    val got = Similarity.annRq(vecs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // sequential replica of the exact same algorithm (same sample
    // strides, same tie rules, same fold orders)
    val ev = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => elem(i, j).toDouble).toArray)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k) * b(k); k += 1 }; s
    }
    val c1 = ev.filter { case (id, _) => (id * 7) % 101 < 16 }
      .take(16).map(_._2)
    val c2 = ev.filter { case (id, _) => (id * 13) % 103 < 16 }
      .take(16).map(_._2).map { sv =>
        val best = c1.zipWithIndex.minBy { case (c, cid) =>
          (dot(c, c) - 2.0 * dot(sv, c), cid) }._1
        sv.zip(best).map { case (x, y) => x - y }
      }
    def enc(v: Array[Double]): (Int, Int) = {
      val k1 = c1.zipWithIndex.minBy { case (c, cid) =>
        (dot(c, c) - 2.0 * dot(v, c), cid) }._2
      val k2 = c2.zipWithIndex.minBy { case (d, did) =>
        ((dot(d, d) - 2.0 * dot(v, d)) + 2.0 * dot(c1(k1), d), did) }._2
      (k1, k2)
    }
    val codes = ev.map { case (id, v) => (id, enc(v)) }
    val want = (0L until 5L).flatMap { qid =>
      val qv = ev(qid.toInt)._2
      val qq = dot(qv, qv)
      codes.filter(_._1 != qid).map { case (id, (k1, k2)) =>
        val w = (dot(c1(k1), c1(k1)) + 2.0 * dot(c1(k1), c2(k2))) +
          dot(c2(k2), c2(k2))
        val adc = ((qq + -2.0 * dot(qv, c1(k1))) +
          -2.0 * dot(qv, c2(k2))) + w
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }.take(3).zipWithIndex
        .map { case ((id, adc), r) => (qid, (r + 1).toLong, id, adc) }
    }
    assert(got == want, s"got $got\nwant $want")
    // the two-stage code reconstructs every stage-2 SAMPLE row
    // EXACTLY (its own residual is in the codebook and the argmin
    // lands on it), and strictly improves on stage 1 alone for every
    // sample row that is not itself a stage-1 seed (ids 0, 1, 16
    // sit in both sample strides here, so 5 of 8 improve strictly)
    val sample = ev.filter { case (id, _) => (id * 13) % 103 < 16 }
      .take(16).map(_._2)
    assert(sample.length == 8)
    val recon = sample.map { v =>
      val (k1, k2) = enc(v)
      val e1 = v.zip(c1(k1)).map { case (a, b) => a - b }
      val r2 = e1.zip(c2(k2)).map { case (a, b) => a - b }
      (dot(r2, r2), dot(e1, e1))
    }
    assert(recon.forall(_._1 == 0.0),
      s"a sample row failed exact reconstruction: $recon")
    assert(recon.count { case (r2, e1) => r2 < e1 } == 5,
      s"strict improvements: $recon")
  }

  test("E31 matryoshka: full-width prefix is perfect recall, ambiguous prefix degrades exactly") {
    import spark.implicits._
    // 8 vectors, dim 16: a SHARED 4-dim prefix [1,0,0,0] (so prefix-4
    // cosines all tie at 1.0 and the id rule picks the lowest ids)
    // and a parity-keyed tail (e_{i%2}), so full-dim cosine is 1.0
    // for same-parity pairs, 0.5 across — both exact in 6dp.
    val vecs = (0 until 8).map { i =>
      val v = Array.fill(16)(0.0f)
      v(0) = 1.0f
      v(4 + (i % 2)) = 1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Similarity.annMatryoshka(vecs, Seq(4, 16))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // m=16 IS the full vector: every query recalls its exact top-3
    val full = got.filter(_._1 == 16L)
    assert(full.length == 5 && full.forall(r =>
      r._3 == 3L && r._4 == 3L && r._5 == 1000000L && r._6 == 1000000L),
      s"full-width rows: $full")
    // m=4: every prefix cosine ties at 1.0, so the prefix top-3 is
    // the 3 lowest non-self ids; the exact top-3 is the 3 lowest
    // SAME-PARITY ids. Hand-folded overlaps: q0..q3 → 1, q4 → 2
    // (exact {0,2,6} vs prefix {0,1,2}); macro = 6/15.
    val p4 = got.filter(_._1 == 4L)
    assert(p4.map(_._4) == Seq(1L, 1L, 1L, 1L, 2L), s"prefix hits: $p4")
    assert(p4.forall(_._3 == 3L))
    assert(p4.map(_._5) == Seq(333333L, 333333L, 333333L, 333333L, 666666L))
    assert(p4.forall(_._6 == 400000L), s"macro: ${p4.map(_._6)}")
  }

  test("E24 knn classify: majority wins, vote tie prefers the smaller label") {
    import spark.implicits._
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    // query 0 (true label 2): 3 near label-2s, 2 farther label-1s,
    // distant label-9 noise excluded by k=5
    val maj = (Seq((0L, v(0f, 0f), 2),
      (10L, v(1f, 0f), 2), (11L, v(0f, 1f), 2), (12L, v(1f, 1f), 2),
      (13L, v(3f, 0f), 1), (14L, v(0f, 3f), 1), (15L, v(100f, 0f), 9)))
      .toDF("vec_id", "embedding", "label")
    val g1 = Similarity.knnClassify(maj).collect()
    assert(g1.length == 1)
    assert((g1(0).getLong(1), g1(0).getLong(2), g1(0).getLong(3),
      g1(0).getLong(4)) == ((2L, 2L, 3L, 1L)))
    // 2-2-1 vote among labels {5,4,6} → tie resolves to label 4
    val tie = (Seq((0L, v(0f, 0f), 9),
      (10L, v(1f, 0f), 5), (11L, v(2f, 0f), 5),
      (12L, v(3f, 0f), 4), (13L, v(4f, 0f), 4),
      (14L, v(5f, 0f), 6), (15L, v(100f, 0f), 7)))
      .toDF("vec_id", "embedding", "label")
    val g2 = Similarity.knnClassify(tie).collect()
    assert((g2(0).getLong(1), g2(0).getLong(2), g2(0).getLong(3),
      g2(0).getLong(4)) == ((9L, 4L, 2L, 0L)))
  }

  test("D20 prefix dups: shared normalized heads cluster, unique and short docs drop") {
    import spark.implicits._
    val head = "Cookie   Notice\twe VALUE your privacy on this site " +
      "please accept our totally reasonable tracking terms today"
    val docs = Seq(
      (5L, head + " — article about owls"),
      (3L, head.toLowerCase + " — article about trains"), // norm-equal
      (9L, "a completely different document body with its own text"),
      (11L, "short"))                                     // < 20 chars
      .toDF("doc_id", "text")
    val got = Dedup.prefixDups(docs).collect()
    assert(got.length == 1, s"expected one cluster: ${got.toSeq}")
    assert(got(0).getLong(2) == 2L && got(0).getLong(3) == 3L)
    assert(got(0).getString(1).startsWith("cookie notice we value"))
  }

  test("D21 suffix dups: shared footers cluster even when heads differ, shorts drop") {
    import spark.implicits._
    val footer = "© example corp all rights reserved terms privacy " +
      "cookie settings contact support careers sitemap accessibility help"
    val docs = Seq(
      (4L, "article about owls and their many virtues " + footer),
      (2L, "COMPLETELY different piece on trains\t" + footer), // norm-equal tail
      (8L, "unique document with its own ending entirely here"),
      (9L, "short"))
      .toDF("doc_id", "text")
    val got = Dedup.suffixDups(docs).collect()
    assert(got.length == 1, s"expected one footer cluster: ${got.toSeq}")
    assert(got(0).getLong(2) == 2L && got(0).getLong(3) == 2L)
  }

  test("F41 length profile: power-of-two boundaries bucket exactly, shares floor") {
    import spark.implicits._
    val docs = Seq((1L, "s1", 7L), (2L, "s1", 8L), (3L, "s1", 1023L),
      (4L, "s1", 1024L), (5L, "s2", 64L))
      .map { case (id, src, n) => (id, "x", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.lengthProfile(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    // 7 -> bucket 2, 8 -> 3, 1023 -> 9, 1024 -> 10, 64 -> 6
    assert(got.keySet == Set(("s1", 2L), ("s1", 3L), ("s1", 9L),
      ("s1", 10L), ("s2", 6L)), s"buckets: ${got.keySet}")
    assert(got(("s1", 2L)) == ((1L, 250000L)))
    assert(got(("s2", 6L)) == ((1L, 1000000L)))
  }

  test("F45 sample-k: deterministic under repartition, equals the single-window rank") {
    import spark.implicits._
    val docs = (0L until 500L)
      .map(id => (id, s"doc $id", s"s${id % 3}"))
      .toDF("doc_id", "text", "source")
    def rows(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.sampleK(d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val a = rows(docs)
    assert(a == rows(docs.repartition(13)), "sample must not depend on layout")
    assert(a.groupBy(_._1).forall(_._2.size == 5), "k per source")
    // the two-level rank equals one brute-force per-source sort
    val expect = (0L until 500L).map(id =>
        (s"s${id % 3}", id, (id * 2654435761L) % 2147483648L))
      .groupBy(_._1).toSeq.flatMap { case (src, v) =>
        v.sortBy(t => (t._3, t._2)).take(5).zipWithIndex
          .map { case (t, i) => (src, i + 1L, t._2) }
      }.sortBy(t => (t._1, t._2))
    assert(a == expect, s"got ${a.take(6)}")
  }

  test("F42 code-switch: pure text silent, a 50/50 mix flags, sparse markers never flag") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat of a hat the a end"),        // pure en: 5 markers
      (2L, "the the the und der die river bank"), // en 3 / de 3 mix
      (3L, "und la"),                             // 2 markers < 5 floor
      (4L, "zzz qqq www"))                        // no markers -> und
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeSwitch(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == (("en", 5L, 0L, 0L)))
    assert(got(2L)._2 == 6L && got(2L)._3 == 500000L && got(2L)._4 == 1L)
    assert(got(3L)._4 == 0L, "below the 5-marker floor")
    assert(got(4L) == (("und", 0L, -1L, 0L)), "no markers: und, null ppm")
  }

  test("F40 mojibake: double-decode pairs, U+FFFD, and controls each fire; clean text is silent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafÃ© menu âtis broken"), // Ã© + â€™
      (2L, "lost �� bytes"),
      (3L, "binary bleed"),
      (4L, "perfectly clean text with café and tabs\tand newlines\n"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.mojibake(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))).toMap
    // doc 1: Ã+cont and â+cont (the € in â€™ is also a lead byte
    // artifact pair-start? no — only the defined three leads count)
    assert(got(1L)._1 == 2L && got(1L)._4 == 1L, s"doc1: ${got(1L)}")
    assert(got(2L) == ((0L, 2L, 0L, 1L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 3L, 1L)), s"doc3: ${got(3L)}")
    // real é (U+00E9), tabs, newlines: all legitimate
    assert(got(4L) == ((0L, 0L, 0L, 0L)), s"doc4: ${got(4L)}")
  }

  test("F36 DSIR: target-vocabulary doc outranks crawl-only doc, flag tracks sign") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha beta"), (50L, "alpha beta"), // target side
      (1L, "alpha beta"), (2L, "zzz qqq zzz qqq"), (3L, "alpha qqq"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    // target docs are scored-out (they are the target, not the crawl)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 > got(3L)._1 && got(3L)._1 > got(2L)._1,
      s"ordering: $got")
    assert(got(1L)._2 == 1L && got(2L)._2 == 0L, s"flags: $got")
  }

  test("D19 cross-corpus: only cross pairs emitted, within-side clones stay silent") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val a = Seq(
      (1L, shared),                                  // crosses to 11
      (2L, shared + " extra"),                       // also crosses
      (3L, "one two three four five six seven"),     // A-only text
      (4L, "one two three four five six seven"))     // clone WITHIN A
      .toDF("doc_id", "text")
    val b = Seq(
      (11L, shared),
      (12L, "totally different content nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val got = Dedup.crossCorpusDups(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // exact cross clone scores 1.0; the prefixed variant still clears
    // 0.5 (6 shared of 6+7 shingles = 6/7); the within-A clone pair
    // (3,4) and the B-only doc never appear
    assert(got.keySet == Set((1L, 11L), (2L, 11L)), s"pairs: ${got.keySet}")
    assert(got((1L, 11L)) == 1.0)
    assert(got((2L, 11L)) == 6.0 / 7.0, s"j: ${got((2L, 11L))}")
  }

  test("E28 maxsim: all-facet match outranks single-facet, facet maxes are per-slice") {
    import spark.implicits._
    // 64-dim vectors, 4 slices of 16; in window-local coordinates:
    // q0's facet i = e_i; doc 10 mirrors q0 (every facet finds its
    // slice: maxsim 4); doc 11 matches facet 0 only, other slices
    // sit on e_15 which no facet of q0 uses (maxsim 1); queries 1-4
    // live on e_10 so they perturb nothing
    def vec(f: Int => Int): Seq[Float] =
      (0 until 64).map(d => if (d % 16 == f(d / 16)) 1.0f else 0.0f)
    val rows = Seq(
      (0L, vec(i => i)),
      (1L, vec(_ => 10)), (2L, vec(_ => 10)),
      (3L, vec(_ => 10)), (4L, vec(_ => 10)),
      (10L, vec(i => i)),
      (11L, vec(i => if (i == 0) 0 else 15)))
      .toDF("vec_id", "embedding")
    val got = Similarity.maxSim(rows).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.take(2).toSeq == Seq((1L, 10L, 4.0), (2L, 11L, 1.0)),
      s"got ${got.toSeq}")
  }

  test("E26 hamming cascade: exact top-3 of the binary shortlist, scores descend") {
    import spark.implicits._
    val got = Similarity.hammingRerank(Tables.embeddings(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L), s"q=$q ranks")
      assert(sorted.map(_._4).toSeq ==
        sorted.map(_._4).sortBy(-(_: Double)).toSeq, s"q=$q order")
    }
  }

  test("E25 hard negatives: same-label excluded, distance-ranked, capped at k") {
    import spark.implicits._
    def v(x: Float) = Array(x, 0f, 0f, 0f)
    // query 0 (label 1); nearest corpus vec 10 shares the label and
    // must be skipped; 7 other-label vecs at increasing distance
    val vecs = (Seq((0L, v(0f), 1)) ++ Seq((10L, v(1f), 1)) ++
      (1 to 7).map(i => (10L + i, v((i + 1).toFloat), 1 + i)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs).collect()
    assert(got.length == 5, s"rows: ${got.length}")
    assert(got.map(_.getLong(3)).toSeq == Seq(11L, 12L, 13L, 14L, 15L),
      s"ids: ${got.map(_.getLong(3)).toSeq}")
    assert(got.forall(_.getLong(4) != 1L), "same-label leak")
    assert(got.map(_.getLong(2)).toSeq == (1L to 5L), "rank order")
    assert(got.map(_.getLong(5)).toSeq == got.map(_.getLong(5)).sorted.toSeq)
  }

  test("F38 NB quality: class-exclusive vocab makes the student match the teacher") {
    import spark.implicits._
    // stopword-rich prose (teacher label 1) vs punctuation junk
    // (label 0) with disjoint vocabularies — NB must agree everywhere
    val docs = (Seq(
      (1L, "the cat and the dog of the house is here to stay in peace"),
      (2L, "the sun and the moon of the sky is there to shine in june"),
      (3L, "the old man and the sea of grass is said to wave in wind"),
      (4L, "%%% ### !!!"), (5L, "%%% !!! ###"), (6L, "### %%% !!!")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.nbQuality(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    (1L to 3L).foreach { d =>
      assert(got(d)._1 == 1L && got(d)._2 > 0 && got(d)._3 == 1L &&
        got(d)._4 == 1L, s"doc $d: ${got(d)}") }
    (4L to 6L).foreach { d =>
      assert(got(d)._1 == 0L && got(d)._2 < 0 && got(d)._3 == 0L &&
        got(d)._4 == 1L, s"doc $d: ${got(d)}") }
  }

  test("F37 novelty: clone scores 0, first owner 10^6, half-overlap 500000") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "b c d e f g"), (4L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.novelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1000000L)),   // both 5-grams first appear here
      2L -> ((2L, 0L, 0L)),         // exact clone — nothing novel
      3L -> ((2L, 1L, 500000L))))   // shares "b c d e f", adds "c d e f g"
    // doc 4 (< 5 words) carries no shingles and is absent by design
  }
  test("E29 binary quantization: full-shortlist BQ equals brute force; signs are scale-invariant") {
    import spark.implicits._
    import graft.sources.Tables
    // shortlist covering the whole corpus makes the cascade's rerank
    // stage a brute-force scan: results must match E1 row-for-row
    val bq = Similarity.annBq(Tables.embeddings(spark, sf),
      shortlist = 600).collect().map(_.toSeq)
    val bf = Similarity.bruteforce(Tables.embeddings(spark, sf))
      .collect().map(_.toSeq)
    assert(bq.toSeq == bf.toSeq,
      s"full-shortlist BQ must equal brute force (${bq.length} rows)")
    // planted: the positive-scaled twin shares the code AND wins the
    // rerank with cosine exactly 1
    val dim = 64
    def vec(f: Int => Float): Array[Float] = Array.tabulate(dim)(f)
    val base = vec(j => if (j % 3 == 0) 1.5f else -0.5f)
    val vecs = Seq(
      (0L, base, 0),
      (1L, base.map(_ * 0.5f), 0),               // scaled twin
      (2L, base.map(x => -x), 0),                 // antipode
      (3L, vec(j => if (j % 2 == 0) 2f else -1f), 0))
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.annBq(vecs, shortlist = 1).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(2), r.getDouble(3)))
    assert(top.toSeq == Seq((1L, 1.0)), s"got ${top.toSeq}")
  }

  test("E36 NN-descent converges where geometry permits (planted clusters)") {
    import spark.implicits._
    // 20 well-separated clusters x 50 members: cluster c's center is
    // the one-hot 3c..3c+2 block; members jitter deterministically.
    // Intra-cluster cosine >> inter-cluster, so "a neighbor of a
    // neighbor is a neighbor" actually holds — the regime the
    // algorithm is FOR (the graded corpus is near-isotropic, its
    // documented worst case).
    val dim = 64
    val vecs = spark.range(1000L).select($"id".as("vec_id"),
      org.apache.spark.sql.functions.expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast(CASE
           |    WHEN j = 3 * (id div 50) THEN 10.0
           |    WHEN j = 3 * (id div 50) + 1 THEN double(id % 50) / 50.0
           |    WHEN j = 3 * (id div 50) + 2 THEN double(id % 7) / 10.0
           |    ELSE 0.0 END as float))""".stripMargin).as("embedding"),
      ($"id" / 50).cast("int").as("label"))
    val exact = Similarity.knnGraph(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val nd = Similarity.nnDescent(vecs, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(nd).size.toDouble / exact.size
    info(f"planted-cluster recall after 4 rounds: $recall%.3f")
    assert(recall >= 0.9, f"NN-descent failed to converge: $recall%.3f")
    // cost bound: candidates per round are O(n*k^2), never all-pairs
    // (structural: the candidate frame is built from sym-join of the
    // k-bounded neighbor lists — asserted by construction; here we
    // just pin the output shape)
    assert(nd.size == 1000 * 5)
  }

  test("E37 cell-pruned kNN graph: near-exact recall when cells align") {
    import spark.implicits._
    // INTERLEAVED cluster ids (id % 20) so the first-20-by-id Lloyd's
    // seeds land one per cluster; cells then coincide with clusters
    // and the same-cell graph should recover the exact graph
    val dim = 64
    val vecs = spark.range(1000L).select($"id".as("vec_id"),
      org.apache.spark.sql.functions.expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast(CASE
           |    WHEN j = 3 * (id % 20) THEN 10.0
           |    WHEN j = 3 * (id % 20) + 1 THEN double(id div 20) / 50.0
           |    WHEN j = 3 * (id % 20) + 2 THEN double(id % 7) / 10.0
           |    ELSE 0.0 END as float))""".stripMargin).as("embedding"),
      ($"id" % 20).cast("int").as("label"))
    val exact = Similarity.knnGraph(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.knnGraphIvf(vecs, cells = 20).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(f"cell-pruned recall (aligned clusters): $recall%.3f")
    assert(recall >= 0.95, f"cell pruning lost the graph: $recall%.3f")
  }
}
