package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant checks for every SparkEntry query (the oracle gate does
  * the exact-value compare; these specs pin structural properties and
  * run fast at sf0.001). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("every declared query executes and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("text_quality_prune keeps >= 70% of every source, minimally") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("text_quality_prune")
    val keptBy = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (s, n) =>
      val k = keptBy.getOrElse(s, 0L)
      assert(k * 10 >= 7 * n, s"$s kept $k of $n")
    }
    // minimal over-keep: dropping the threshold-score docs of a source
    // must fall below the 70% target (the threshold is the max
    // qualifying score, so the layer below it cannot also qualify)
    val atThr = kept.filter(col("score_ppm") === col("threshold_ppm"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (s, n) =>
      val without = keptBy.getOrElse(s, 0L) - atThr.getOrElse(s, 0L)
      assert(without * 10 < 7 * n, s"$s over-keeps: $without of $n")
    }
  }

  test("text_sample_mix downsamples over-weighted sources, drops weight-0") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = n.values.sum
    val sampled = run("text_sample_mix").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weight-0 sources are absent entirely
    (n.keySet -- Set("src0", "src1", "src2", "src3", "src4", "src5"))
      .foreach(s => assert(!sampled.contains(s), s"weight-0 source kept: $s"))
    // a weighted source never exceeds its own row count and the keep
    // rule is deterministic across runs
    val again = run("text_sample_mix").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled == again)
    // target tenths: kept(s) approximates min(n_s, w/10 * total)
    val w = Map("src0" -> 3L, "src1" -> 2L, "src2" -> 2L,
      "src3" -> 1L, "src4" -> 1L, "src5" -> 1L)
    w.foreach { case (s, t) =>
      val target = math.min(n(s), t * total / 10)
      val k = sampled.getOrElse(s, 0L)
      assert(math.abs(k - target) <= math.max(5, target / 3),
        s"$s kept $k target $target")
    }
  }

  test("q_melt triples the measure rows") {
    val n = run("q_melt").count()
    val base = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(n == 3 * base)
  }

  test("q_pivot has one row per user and 6 columns") {
    val df = run("q_pivot")
    assert(df.columns.toSeq == Seq("user_id", "click", "error", "purchase", "signup", "view"))
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("q_clean_real stays within the year range and computes real value") {
    val df = run("q_clean_real")
    assert(df.filter(col("yr") < 1995 || col("yr") > 2000).count() == 0)
    assert(df.filter(col("real_value").isNull).count() == 0)
  }

  test("q_topk returns exactly 10 in non-increasing order") {
    val rows = run("q_topk").collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getAs[Double]("c_acctbal"))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("q_drawdown covers all nations present in base year") {
    assert(run("q_drawdown").count() == 25)
  }

  test("q_recovery values are positive year offsets or null") {
    val bad = run("q_recovery")
      .filter(col("recovered_years").isNotNull && col("recovered_years") <= 0)
    assert(bad.count() == 0)
  }

  test("cdc_latest_state has exactly one row per user") {
    val df = run("cdc_latest_state")
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("cdc_scd2 intervals chain: exactly one open version per user") {
    val df = run("cdc_scd2")
    val open = df.filter(col("is_current")).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).count() == 0)
  }

  test("cdc_sessionize: session bounds ordered, gaps respected") {
    val df = run("cdc_sessionize")
    assert(df.filter(col("start_us") > col("end_us")).count() == 0)
    assert(df.count() > 0)
  }

  test("dedup_exact: keepers unique, copies >= 1") {
    val df = run("dedup_exact")
    assert(df.filter(col("n_copies") < 1).count() == 0)
    assert(df.select("keeper_doc_id").distinct().count() == df.count())
  }

  test("text_quality ppm scores bounded") {
    val df = run("text_quality")
    assert(df.filter(col("stop_ppm") > 1000000L || col("punct_ppm") > 1000000L).count() == 0)
  }

  test("text_langid predicts a language for every doc") {
    val df = run("text_langid")
    assert(df.filter(col("lang_pred").isNull).count() == 0)
  }

  test("text_langid zh profile: CJK char-class counts, crafted texts") {
    // the synthetic corpus's zh docs are Latin word soup, so the zh
    // path never fires in the oracle run — pin it on real text here.
    // `\b`-marker profiles are blind to unsegmented scripts; the CJK
    // ideograph class is what must carry zh.
    import spark.implicits._
    val crafted = Seq(
      (1L, "机器学习模型在大规模数据上训练", "zh"),  // pure zh
      (2L, "the model of the data", "en"),            // pure en
      (3L, "la la el de los la", "es"),               // pure es
      (4L, "the training corpus 包含中文文本 of course", "zh"), // mixed: 6 CJK > 3 en markers
      (5L, "12345 !!!", "und"))                        // no markers at all
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.langId(crafted)
      .select("doc_id", "lang_pred", "s_zh").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "zh" && out(1L)._2 == 15L)
    assert(out(2L)._1 == "en" && out(2L)._2 == 0L)
    assert(out(3L)._1 == "es")
    assert(out(4L)._1 == "zh" && out(4L)._2 == 6L)
    assert(out(5L)._1 == "und")
  }

  test("ann_bruteforce: top-k per query, cos within [-1,1]") {
    val df = run("ann_bruteforce")
    assert(df.groupBy("q_id").count().filter(col("count") > 3).count() == 0)
    assert(df.filter(abs(col("cos")) > 1.0).count() == 0)
  }

  test("q_sketches: HLL within rsd bound of exact distinct, p50 sane") {
    val rows = run("q_sketches").collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL off by >10%: $approx vs $exact")
      assert(r.getAs[Double]("approx_p50_price") > 0)
    }
  }

  test("mm_binary_meta: hex payload round-trips length") {
    val df = run("mm_binary_meta")
    assert(df.filter(length(col("payload_hex")) =!= col("n_bytes") * 2).count() == 0)
  }

  test("text_pii_scrub: crafted text redacts and counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob@example.com or 555-123-4567 from 10.0.0.1 ok"),
      (2L, "no pii in this one 123.456")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.piiScrub(docs)
      .as[(Long, Long, Long, Long, String)].collect()
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(r(0) == ((1L, 1L, 1L, 1L,
      fp("mail [EMAIL] or [PHONE] from [IP] ok"))), s"got ${r(0)}")
    assert(r(1) == ((2L, 0L, 0L, 0L,
      fp("no pii in this one 123.456"))), s"got ${r(1)}")
  }

  test("F32 compression ratio: repetition compresses, noise doesn't, partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (1L, "abc " * 500),                       // heavy repetition
      (2L, Seq.fill(2000)(rnd.nextPrintableChar()).mkString), // noise
      (3L, "")                                  // empty: ratio floor 1e6
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.compressionRatio(docs)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(3), x.getBoolean(4)))).toMap
    assert(r(1L)._1 < 50000L && r(1L)._2,
      s"repetitive doc must compress hard and flag: ${r(1L)}")
    assert(r(2L)._1 > 500000L, s"noise must resist: ${r(2L)}")
    assert(r(3L) == ((1000000L, true)), s"empty doc: ${r(3L)}")
    // determinism under repartitioning: same ratios from 7 partitions
    val r7 = graft.operators.TextAnalysis.compressionRatio(
        docs.repartition(7))
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r7 == r.map { case (k, v) => k -> v._1 })
  }

  test("F33 kappa: chance-level crossed raters score 0, perfect agreement scores 1") {
    import spark.implicits._
    // one doc per cell: po = 1/2 but the margins predict exactly 1/2
    // by chance → kappa = 0 (the imbalance raw agreement hides)
    val crossed = Seq(
      (1L, ("w " * 130)),   // long chars AND many tokens   → n11
      (2L, "x" * 260),      // long chars, one token        → n10
      (3L, ("a " * 50)),    // 100 chars, 50 tokens         → n01
      (4L, "short")         //                              → n00
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.raterKappa(crossed).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 1L, 1L, 1L, 1L)), s"cells: $r")
    assert(r.getLong(5) == 500000L && r.getDouble(6) == 0.0, s"got $r")
    val agree = Seq(
      (1L, ("w " * 130)), (2L, ("w " * 130)), (3L, ("w " * 130)),
      (4L, "short")).toDF("doc_id", "text")
    val r2 = graft.operators.TextAnalysis.raterKappa(agree).collect()(0)
    assert(r2.getLong(5) == 1000000L && r2.getDouble(6) == 1.0, s"got $r2")
  }

  test("F34 BPE: hand-traced merge sequence, greedy no-remerge, lexicographic ties") {
    import spark.implicits._
    // words: aaab ×2, cab ×1 → round 1 picks (a,a) with count 4
    // (every adjacent position counts), and the greedy fold merges
    // "aaab" to [aa, a, b] — the fresh "aa" never re-merges in-round
    val docs = Seq((1L, "aaab aaab cab")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeTrain(docs, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L), (4L, "c", "ab", 1L)), s"got $got")
    // tie: (b,a) and (a,b) both count 1 → lexicographic min wins
    val tie = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val t = graft.operators.TextAnalysis.bpeTrain(tie, rounds = 1)
      .collect()(0)
    assert((t.getString(1), t.getString(2), t.getLong(3)) ==
      (("a", "b", 1L)), s"got $t")
  }

  test("F34/F35 fast path: driver-side merge loop == the distributed loop") {
    import spark.implicits._
    // the graded corpus shape: multi-word docs, sources, repeats,
    // in-round greedy edges ("aaa"), and cross-round staleness (the
    // candidate index may hold words whose adjacency a later round
    // already destroyed — the lazy-deletion path must rescan)
    val docs = Seq(
      (1L, "aaab aaab cab the quick fox", "web"),
      (2L, "aaa the the quick quick fox banana", "web"),
      (3L, "ban ana banana aab aab ab", "books"),
      (4L, "xyzzy plugh xyzzy cab aaab", "books"),
      (5L, "the fox the fox the fox", "wiki"))
      .toDF("doc_id", "text", "source")
    for (rounds <- Seq(1, 4, 8)) {
      val slow = graft.operators.TextAnalysis.bpeTrain(docs, rounds)
        .collect().map(_.toString).toSeq
      val fast = graft.operators.TextAnalysis.bpeTrainFast(docs, rounds)
        .collect().map(_.toString).toSeq
      assert(fast == slow, s"rounds=$rounds diverged:\n$fast\nvs\n$slow")
    }
    val slowF = graft.operators.TextAnalysis.bpeFertility(docs, 4)
      .collect().map(_.toString).toSeq
    val fastF = graft.operators.TextAnalysis.bpeFertilityFast(docs, 4)
      .collect().map(_.toString).toSeq
    assert(fastF == slowF, s"fertility diverged:\n$fastF\nvs\n$slowF")
    // the cap routes oversized vocabularies to the distributed loop
    val viaFallback = graft.operators.TextAnalysis
      .bpeTrainFast(docs, 4, localVocabCap = 1L)
      .collect().map(_.toString).toSeq
    assert(viaFallback == graft.operators.TextAnalysis.bpeTrain(docs, 4)
      .collect().map(_.toString).toSeq, "fallback path diverged")
  }

  test("D18 phrase mining: shared 5-gram surfaces once, in-doc repeats don't inflate df") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps far"),
      (3L, "something completely different here now"),
      (4L, "a b c d e a b c d e a b c d e")) // 11 in-doc repeats, df 1
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.phraseMine(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("the quick brown fox jumps", 2L, 1L)), s"got $got")
  }

  test("A60 odds ratio: hand-computed 2x2, CI spanning 0 is not significant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("or").toString
    // segment X: a=2 returned, b=1 kept; Y: a=1, b=6 → X's OR = 12
    Seq((1L, "X"), (2L, "Y")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (Seq.fill(2)((10L, "R")) ++ Seq.fill(1)((10L, "N")) ++
      Seq.fill(1)((20L, "R")) ++ Seq.fill(6)((20L, "N")))
      .toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lnor = math.log(12.0 / 1.0)
    val se = math.sqrt(1.0 / 2 + 1.0 / 1 + 1.0 / 1 + 1.0 / 6)
    val got = graft.operators.Relational.oddsRatio(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6),
        x.getDouble(7), x.getBoolean(8)))).toMap
    assert(got("X") == ((2L, 1L, 1L, 6L, 12.0, r(lnor - 1.96 * se, 4),
      r(lnor + 1.96 * se, 4), false)), s"got ${got("X")}")
    // Y mirrors X: cells (1, 6, 2, 1) → OR = 1/12
    assert(got("Y")._1 == 1L && got("Y")._5 == r(1.0 / 12.0, 6),
      s"got ${got("Y")}")
  }

  test("A59 qcut: ties stay in one bucket, populations skew with the data") {
    import spark.implicits._
    // cents [1×4, 2×2, 3, 10]: edges q25=1 q50=1 q75=2 → the four 1s
    // all land in bucket 1 (ntile would split them 2/2), bucket 2 is
    // EMPTY, 2s → bucket 3, 3 and 10 → bucket 4
    val dir = java.nio.file.Files.createTempDirectory("qcut").toString
    Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 10L).zipWithIndex
      .map { case (c, i) => (i.toLong, "A", c / 100.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.qcut(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == Seq((1L, 4L, 1L, 1L, 500000L),
      (3L, 2L, 2L, 2L, 250000L), (4L, 2L, 3L, 10L, 250000L)),
      s"got $got")
  }

  test("A69 power analysis: closed form exact at 20% baseline, saturated target nulls") {
    import graft.operators.Relational
    // 10 users, 2 purchasers -> p1 = 0.2
    val ev = dailyEvents("view" -> Seq(10))
      .union(dailyEvents("purchase" -> Seq(2)))
      .withColumn("user_id",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN event_type = 'purchase' THEN event_id % 2" +
          " ELSE event_id % 10 END"))
    val dir = java.nio.file.Files.createTempDirectory("pw").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.powerAnalysis(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    def expected(lift: Double): Long = {
      val p1 = 0.2; val p2 = p1 * (1.0 + lift / 100.0)
      val pbar = (p1 + p2) / 2.0
      val q = 1.9599639845400545 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        0.8416212335729143 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
      math.ceil((q * q) / ((p2 - p1) * (p2 - p1))).toLong
    }
    assert(got(5L) == ((0.2, expected(5))), s"got ${got(5L)}")
    assert(got(10L) == ((0.2, expected(10))))
    assert(got(20L) == ((0.2, expected(20))))
    // smaller lifts need more samples, and a lot more
    assert(got(5L)._2 > 3 * got(10L)._2 && got(10L)._2 > 3 * got(20L)._2)
  }

  test("A68 trimmed mean: one order statistic cut each side, outlier gap shows") {
    import spark.implicits._
    // cents 1..9 + 1000: g = 1 -> keep ranks 2..9 (values 2..9):
    // trimmed = 44/8 = 5.5 while the raw mean is dragged to 104.5
    val dir = java.nio.file.Files.createTempDirectory("trim").toString
    ((1L to 9L) :+ 1000L).zipWithIndex
      .map { case (c, i) => (i.toLong, "A", c / 100.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.operators.Relational.trimmedMean(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5)) == ((10L, 1L, 8L, 5.5, 104.5)),
      s"got $r")
  }

  test("C63 gap detect: in-bucket and cross-bucket holes, empty buckets fold in") {
    import spark.implicits._
    // ids 1,2,3,7,8 then a jump across many empty 10^4-buckets to
    // 100001: gaps 3->7 (3 missing) and 8->100001 (99992 missing)
    val df = Seq(1L, 2L, 3L, 7L, 8L, 100001L)
      .map(id => (id, 1L, "a"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", expr("to_timestamp('2024-01-01')"))
    val r = graft.operators.Cdc.gapDetect(df).collect()(0)
    assert(r.toSeq == Seq(6L, 1L, 100001L, 2L, 99995L, 99992L), s"got $r")
    // a dense sequence reports zero everywhere
    val dense = (10L to 20L).map(id => (id, 1L, "a"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", expr("to_timestamp('2024-01-01')"))
    val d = graft.operators.Cdc.gapDetect(dense).collect()(0)
    assert(d.toSeq == Seq(11L, 10L, 20L, 0L, 0L, 0L), s"got $d")
  }

  test("F43 url density: spam flag needs both count and share, prose is silent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "perfectly ordinary prose with no links at all"),
      (2L, "http://a.com https://b.com https://c.org click here"),
      (3L, ("w " * 48) + "see https://one.example only"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.urlDensity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((0L, 8L, 0L, 0L)))
    // 3 urls / 5 tokens: 600000 ppm, >= 3 urls and >= 5% -> spam
    assert(got(2L) == ((3L, 5L, 600000L, 1L)), s"got ${got(2L)}")
    // 1 url / 51 tokens: density fine, count floor unmet
    assert(got(3L)._1 == 1L && got(3L)._4 == 0L)
  }

  test("A67 tukey fences: planted outliers counted, fences never float") {
    import spark.implicits._
    // cents [10,20,30,40,100]: type-1 q1 = 20 (ceil(1.25)=2nd), q3 =
    // 40 (ceil(3.75)=4th); low fence 2v < 5*20-3*40 = -20 -> none;
    // high 2v > 5*40-3*20 = 140 i.e. v > 70 -> the 100
    val dir = java.nio.file.Files.createTempDirectory("tukey").toString
    Seq(10L, 20L, 30L, 40L, 100L).zipWithIndex
      .map { case (c, i) => (i.toLong, "A", c / 100.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.operators.Relational.tukeyFences(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((5L, 20L, 40L, 0L, 1L, 200000L)),
      s"got $r")
  }

  test("F35 BPE fertility: per-source tokens-per-word after 2 hand-traced merges") {
    import spark.implicits._
    // global words: aaab×2 (s1), cab×3 (s1:1, s2:2) → merge 1 = (a,b)
    // count 5, merge 2 = (c,ab) count 3; segmentation: aaab→[a,a,ab]
    // (3 tokens), cab→[cab] (1) → s1: 7 tokens / 3 words, s2: 2/2
    val docs = Seq(
      (1L, "aaab aaab cab", "s1"),
      (2L, "cab cab", "s2")).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis.bpeFertility(docs, rounds = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("s1") == ((3L, 7L, 2333333L)), s"got ${got("s1")}")
    assert(got("s2") == ((2L, 2L, 1000000L)), s"got ${got("s2")}")
  }

  test("F31 burstiness: bursty token beats spread token, VMR hand-exact") {
    import spark.implicits._
    // 'burst' appears 10x in ONE of 5 docs; 'even' appears 2x in each
    val docs = Seq(
      (1L, ("burst " * 10) + ("even " * 2)),
      (2L, "even even filler"), (3L, "even even filler"),
      (4L, "even even filler"), (5L, "even even filler"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.burstiness(docs, minTf = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // burst: N=5, tf=10, s2=100 → (500-100)·1e6/50 = 8e6 (VMR 8)
    assert(got("burst") == ((1L, 10L, 8000000L)), s"got ${got("burst")}")
    // even: tf=10, s2=20 → (100-100)·1e6/50 = 0 (zero variance)
    assert(got("even") == ((5L, 10L, 0L)), s"got ${got("even")}")
  }

  test("F28 readability: hand-computed Flesch scores on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran!"), // 5 words, 5 syllables, 2 sentences
      (2L, "xyzzy 42"),             // y-vowel groups ×2 + vowel-free "42"
      (3L, "")                      // empty doc: sentence floor at 1
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.readability(docs)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(r(0) == ((1L, 5L, 5L, 2L, 119.6975, -2.815)), s"got ${r(0)}")
    assert(r(1) == ((2L, 2L, 3L, 1L, 77.905, 2.89)), s"got ${r(1)}")
    assert(r(2) == ((3L, 0L, 0L, 1L, 206.835, -15.59)), s"got ${r(2)}")
  }

  test("F29 code detection: structural signals separate code from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "def f(x):\n  return x;\nint y = 3;\n  while (y) { y = y - 1; }"),
      (2L, "It was a quiet morning and the cats slept.")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.codeDetect(docs)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val (_, stmt1, ind1, sym1, kw1, flag1) = r(0)
    assert(stmt1 == 750000L && ind1 == 500000L, s"got ${r(0)}")
    assert(sym1 > 0L && kw1 > 0L && flag1, s"got ${r(0)}")
    assert(r(1) == ((2L, 0L, 0L, 0L, 0L, false)), s"got ${r(1)}")
  }

  test("text_repetition: hand-computed ppm on a known doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),          // 4 toks, 2 distinct, top 'a'=3; bigrams: 'a a'x2 of 3
      (2L, "x y"),              // no repetition: all ppm at their floors
      (3L, "w")                 // single token: no bigrams -> 0
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.repetition(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 4L, 500000L, 750000L, 666666L)), s"got ${r(0)}")
    assert(r(1) == ((2L, 2L, 1000000L, 500000L, 1000000L)), s"got ${r(1)}")
    assert(r(2) == ((3L, 1L, 1000000L, 1000000L, 0L)), s"got ${r(2)}")
  }

  test("dedup_lines: crafted boilerplate removed, order kept, blanks immune") {
    import spark.implicits._
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\n\ncookie banner"), // banner case-folds; blank kept
      (2L, "cookie banner\nunique beta"),
      (3L, "all original here")
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.lineDedup(docs)
      .as[(Long, Long, Long, String)].collect()
    // 'cookie banner' (normalized) is in docs 1+2 -> dropped everywhere,
    // incl. BOTH its occurrences in doc 1; the blank line survives
    assert(r(0) == ((1L, 4L, 2L, "unique alpha\n")), s"got ${r(0)}")
    assert(r(1) == ((2L, 2L, 1L, "unique beta")), s"got ${r(1)}")
    assert(r(2) == ((3L, 1L, 0L, "all original here")), s"got ${r(2)}")
  }

  test("dedup_lines: doc losing every line stays with empty text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared one\nshared two"),
      (2L, "shared one\nshared two"),
      (3L, "keeps this")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.lineDedup(docs)
      .as[(Long, Long, Long, String)].collect()
    assert(r(0) == ((1L, 2L, 2L, "")), s"got ${r(0)}")
    assert(r(1) == ((2L, 2L, 2L, "")), s"got ${r(1)}")
    assert(r(2) == ((3L, 1L, 0L, "keeps this")), s"got ${r(2)}")
  }

  test("q_range_window: frame admits by time distance, 7-day boundary inclusive") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        + day.toLong * 86400000L)
    val ev = Seq(
      (1L, t(0), 1L, "view", 1.0),
      (2L, t(3), 1L, "view", 2.0),
      (3L, t(7), 1L, "view", 4.0),   // exactly 7d after ev1: still in frame
      (4L, t(8), 1L, "view", 8.0))   // ev1 aged out, ev2/ev3 in
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Resilience.rangeWindow(ev)
      .select("event_id", "n_7d", "sum_cents_7d")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 1L, 100L), (2L, 2L, 300L),
      (3L, 3L, 700L), (4L, 3L, 1400L)), s"got ${r.toSeq}")
  }

  test("text_pack_blocks: hand-computed spans across a block boundary") {
    import spark.implicits._
    // block = 4 tokens, bucket = 2 docs (so doc 2 needs a cross-bucket
    // offset); each doc contributes n_tok + 1 (EOS)
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h i j"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .packBlocks(docs, blockTokens = 4, bucketSize = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((0L, 3L, 0L, 4L, 0L, 0L, 1L)), s"got ${r(0)}")
    assert(r(1) == ((1L, 2L, 4L, 7L, 1L, 1L, 1L)), s"got ${r(1)}")
    // 5 tokens + EOS: spans blocks 1..3 (crosses two boundaries)
    assert(r(2) == ((2L, 5L, 7L, 13L, 1L, 3L, 3L)), s"got ${r(2)}")
  }

  test("text_pack_blocks: bucketed decomposition invariant under bucket size") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = graft.operators.TextAnalysis.packBlocks(docs, bucketSize = 7L)
      .collect().toSeq
    val b = graft.operators.TextAnalysis.packBlocks(docs, bucketSize = 1000000L)
      .collect().toSeq
    assert(a == b, "global token offsets must not depend on bucketing")
  }

  test("cdc_parse_envelope: tombstone reads before-image; corrupt envelope nulls out") {
    import spark.implicits._
    val envs = Seq(
      (1L, """{"op":"I","ts_ms":1000,"after":{"user_id":7,"value":1.5}}"""),
      (2L, """{"op":"D","ts_ms":2000,"before":{"user_id":8,"value":2.25}}"""),
      (3L, """not json at all""")
    ).toDF("event_id", "env")
    val r = graft.operators.Cdc.parseEnvelope(envs).collect()
    assert(r(0).getString(1) == "I" && r(0).getLong(2) == 7L &&
      r(0).getDouble(3) == 1.5 && r(0).getLong(4) == 1000L)
    assert(r(1).getString(1) == "D" && r(1).getLong(2) == 8L &&
      r(1).getDouble(3) == 2.25 && r(1).getLong(4) == 2000L)
    // permissive: corrupt row survives with null fields, no exception
    assert(r(2).isNullAt(1) && r(2).isNullAt(2) && r(2).isNullAt(3))
  }

  test("D13 urlCanonical applies every rule on crafted URLs") {
    import spark.implicits._
    val cases = Seq(
      "https://Example.COM/a/7?b=2&a=1" ->
        "https://example.com/a/7?a=1&b=2",      // case + param sort
      "https://example.com:443/a/7?a=1&b=2" ->
        "https://example.com/a/7?a=1&b=2",      // default https port
      "https://www.example.com/a/7/?a=1&b=2&utm_source=x" ->
        "https://example.com/a/7?a=1&b=2",      // www + slash + utm
      "HTTPS://example.com/a/7#sec" ->
        "https://example.com/a/7",              // scheme case + fragment
      "http://example.com:80/a/7?utm_campaign=y&a=1&b=2" ->
        "http://example.com/a/7?a=1&b=2",       // default http port
      "http://example.com:8080/a/7" ->
        "http://example.com:8080/a/7",          // NON-default port kept
      "http://example.com/a/7" ->
        "http://example.com/a/7")               // already canonical
    val got = cases.map(_._1).toDF("url")
      .select(graft.operators.Dedup.urlCanonical(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("C32 asofInterp: interior interpolation exact, edges null, same-ts ref wins") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000) // s in millis here
    val rows = Seq(
      // user 1: views at t=0 (v=10) and t=100s (v=30); purchases at
      // t=25s (interp 15), t=100s sharing a view's ts (exactly 30)
      (1L, 10L, t(0), "view", 10.0),
      (2L, 11L, t(100000), "view", 30.0),
      (3L, 1L, t(25000), "purchase", 999.0),
      (4L, 2L, t(100000), "purchase", 999.0),
      // user 2: purchase BEFORE any view -> null (no left bracket);
      // purchase AFTER the last view -> null (no right bracket)
      (5L, 20L, t(50000), "view", 5.0),
      (6L, 3L, t(10000), "purchase", 999.0),
      (7L, 4L, t(90000), "purchase", 999.0)
    ).map { case (eid, _, ts, et, v) => (eid, eid, ts, et, v) }
      // user id: events 1-4 -> user 1, 5-7 -> user 2
      .map { case (eid, _, ts, et, v) =>
        (eid, if (eid <= 4) 1L else 2L, ts, et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = graft.operators.Cdc.asofInterp(rows)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(3L) == Some(15.0), s"25% of [10,30]: ${got(3L)}")
    assert(got(4L) == Some(30.0), "ref at the same ts is the prev bracket")
    assert(got(6L).isEmpty && got(7L).isEmpty, "strict interior only")
  }

  test("A32 interpolated quantiles hit pandas' type-7 values on crafted groups") {
    import spark.implicits._
    // group u: cents 1..100 -> type-7 p25/p50/p90/p99 =
    // 25.75 / 50.5 / 90.1 / 99.01 (pandas quantile defaults)
    val u = (1 to 100).map(i => ("u", i.toLong / 100.0))
    // group t: two values -> p50 interpolates halfway
    val t = Seq(("t", 0.10), ("t", 0.30))
    val tmp = java.nio.file.Files.createTempDirectory("graft_qi").toString
    (u ++ t).toDF("o_orderpriority", "o_totalprice")
      .write.parquet(s"$tmp/orders.parquet")
    val got = graft.operators.Relational.quantilesInterp(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("u") == ((25.75, 50.5, 90.1, 99.01)), s"got ${got("u")}")
    assert(got("t")._2 == 20.0, s"two-point median: ${got("t")}")
  }

  test("B25 cusum: sustained shift accumulates, constant series scores zero") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s)
    // user 1: 4 x 1.00 then 4 x 3.00 (mean 2.00) — sustained up-shift;
    // user 2: constant 5.00 — drift must be exactly zero
    val rows = (0 until 4).map(i => (1L, i.toLong, t(i), 1.0)) ++
      (4 until 8).map(i => (1L, i.toLong, t(i), 3.0)) ++
      (0 until 6).map(i => (2L, 100L + i, t(i), 5.0))
    val got = graft.operators.Resilience.cusumDrift(
        rows.toDF("user_id", "event_id", "ts", "value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // replicate the closed form: d_i = n*c_i - sum, S+ = P - min(0, runmin P)
    val c = Seq(100L, 100, 100, 100, 300, 300, 300, 300)
    val n = c.size; val s = c.sum
    val p = c.map(n * _ - s).scanLeft(0L)(_ + _).tail
    val up = p.zipWithIndex.map { case (pi, i) =>
      pi - math.min(0L, p.take(i + 1).min) }.max
    val down = p.zipWithIndex.map { case (pi, i) =>
      math.max(0L, p.take(i + 1).max) - pi }.max
    assert(got(1L) == ((up, down)), s"got ${got(1L)}, want ($up,$down)")
    assert(got(1L)._1 > 0, "up-shift must accumulate")
    assert(got(2L) == ((0L, 0L)), s"constant series: ${got(2L)}")
  }

  test("B78 xicor: monotone series scores 1 - 3/(n+1), oscillation collapses, ranks tie by <=") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2020-01-$day%02d").getTime + 7200000L)
    // "inc": daily counts 1..5 (strictly increasing: ranks walk by 1,
    // S = n-1, xi = 1 - 3/(n+1) = 0.5); "osc": counts 1,3,2,5,4
    // (ranks 1,3,2,5,4 -> S = 7, xi = 1 - 21/24 = 0.125)
    val rows =
      (1 to 5).flatMap(d => Seq.fill(d)(("inc", t(d)))) ++
        Seq(1, 3, 2, 5, 4).zipWithIndex.flatMap { case (c, i) =>
          Seq.fill(c)(("osc", t(i + 1))) }
    val df = rows.zipWithIndex
      .map { case ((et, ts), i) => (i.toLong, et, ts, 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = graft.operators.Resilience.xicor(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("inc") == ((5L, 4L, 0.5)), s"inc: ${got("inc")}")
    assert(got("osc") == ((5L, 7L, 0.125)), s"osc: ${got("osc")}")
    assert(got("inc")._3 > got("osc")._3,
      "functional dependence must outscore oscillation")
  }

  test("B77 bootstrap CI: fixed-design resamples replayed driver-side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bci").toString
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "X")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1.0, java.sql.Date.valueOf("1995-06-01")),
      (1L, 2.0, java.sql.Date.valueOf("1996-06-01")),
      (1L, 3.0, java.sql.Date.valueOf("1997-06-01")))
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Resilience.bootstrapCi(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // driver replica of the fixed design over cents {100, 200, 300}
    val cents = Array(100L, 200L, 300L)
    val sums = (0 until 200).map(b =>
      (0 until 3).map(j => cents(((31 * b + 17 * j) % 3).toInt)).sum)
      .sorted
    assert(got == Seq(("X", 3L, 200L, sums(4) / 3, sums(195) / 3)),
      s"got $got, want lo=${sums(4) / 3} hi=${sums(195) / 3}")
    // the CI must bracket the mean
    assert(got.head._4 <= 200L && got.head._5 >= 200L)
  }

  test("C75 reorder depth: straggler displacement exact, in-order key reports zero") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // user 1: event 3 belongs FIRST by time but arrived third
    // (depth 2); user 2 fully in-order
    val rows = Seq((1L, 1L, t(10)), (1L, 2L, t(20)), (1L, 3L, t(5)),
      (1L, 4L, t(30)),
      (2L, 10L, t(1)), (2L, 11L, t(2)), (2L, 12L, t(3)))
    val got = graft.operators.Cdc.reorderDepth(
        rows.toDF("user_id", "event_id", "ts"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((4L, 2L, 3L, 4L)), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 0L, 0L, 0L)), s"got ${got(2L)}")
  }

  test("F48 cooc: window pairs hand-counted, distance recorded, deterministic top-k") {
    import spark.implicits._
    // "a b a": offsets give (a,b,1), (b,a,1), (a,a,2); "b b" adds
    // (b,b,1) — four pairs, each counted once, tie-broken by term
    val docs = Seq((1L, "a b a"), (2L, "b b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.cooc(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, "a", "a", 1L, 2L), (2L, "a", "b", 1L, 1L),
      (3L, "b", "a", 1L, 1L), (4L, "b", "b", 1L, 1L)), s"got $got")
  }

  test("B76 page-hinkley: drift onset localized, tolerance suppresses small shifts") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s)
    // user 1: 4 x 1.00 then 4 x 30.00 — the shift must alarm and the
    // first crossing replays from the closed form; user 2 constant —
    // never alarms; user 3: tiny oscillation within the tolerance
    val rows = (0 until 4).map(i => (1L, i.toLong, t(i), 1.0)) ++
      (4 until 8).map(i => (1L, i.toLong, t(i), 30.0)) ++
      (0 until 6).map(i => (2L, 100L + i, t(i), 5.0)) ++
      (0 until 6).map(i => (3L, 200L + i, t(i), 5.0 + 0.01 * (i % 2)))
    val got = graft.operators.Resilience.pageHinkley(
        rows.toDF("user_id", "event_id", "ts", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // closed-form replica for user 1: d_i = n·c_i − S − 5n
    val c = Seq(100L, 100, 100, 100, 3000, 3000, 3000, 3000)
    val n = c.size.toLong; val s = c.sum
    val m = c.map(n * _ - s - 5 * n).scanLeft(0L)(_ + _).tail
    val ph = m.zipWithIndex.map { case (mi, i) =>
      mi - math.min(0L, m.take(i + 1).min) }
    val alarm = ph.indexWhere(_ > 1000 * n) + 1
    assert(got(1L) == ((n, ph.max, 1L, alarm.toLong)), s"got ${got(1L)}")
    assert(alarm >= 5, "alarm must localize inside the shifted tail")
    assert(got(2L)._3 == 0L && got(2L)._4 == -1L,
      s"constant series alarmed: ${got(2L)}")
    assert(got(3L)._3 == 0L,
      s"within-tolerance oscillation alarmed: ${got(3L)}")
  }

  test("B29 cross-correlation: perfect 1-day lead gives ccf exactly 1.0") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2020-01-$day%02d").getTime + 3600000L)
    // clicks day1×1, day2×4; views day2×3, day3×6: lag-1 pairs
    // (1,3),(4,6) have dxn=dyn=num=9 → ccf = 9/(3·3) = 1.0 EXACTLY
    // (dxn a perfect square so sqrt is exact); lag-0/2 have n=1 → null
    val rows =
      Seq.fill(1)(("click", 1)) ++ Seq.fill(4)(("click", 2)) ++
      Seq.fill(3)(("view", 2)) ++ Seq.fill(6)(("view", 3))
    val df = rows.zipWithIndex.map { case ((et, d), i) =>
      (i.toLong, t(d), 1L, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ccf").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Resilience.crossCorr(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(5)) Double.NaN else r.getDouble(5))))
      .toMap
    assert(got(1L) == ((2L, 1.0)), s"lag 1 must be exactly 1.0: ${got(1L)}")
    assert(got(0L)._2.isNaN && got(2L)._2.isNaN,
      s"degenerate lags must be null: $got")
  }

  test("A35 weighted median: weight mass picks the value, lower-median ties") {
    import spark.implicits._
    val rows = Seq(
      ("A", 1.00, 1L), ("A", 2.00, 2L), ("A", 3.00, 100L), // mass at 3.00
      ("B", 1.00, 5L), ("B", 2.00, 5L))                    // tie → lower
    val df = rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("wmed").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.weightedMedian(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("A") == ((103L, 300L)), s"mass: ${got("A")}")
    assert(got("B") == ((10L, 100L)), s"lower-median tie: ${got("B")}")
  }

  test("C40 offset islands: holes split islands, gaps and runs measured") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // user 8 → shard 0: ids 1,2,3 | 7,8 | 100 → 3 islands,
    // longest run 3, widest gap 100−8−1 = 91
    val df = Seq(1L, 2L, 3L, 7L, 8L, 100L)
      .map(e => (e, t(e * 1000), 8L, "x", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Cdc.offsetIslands(df).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((6L, 1L, 100L, 91L, 3L, 3L)),
      s"got ${r.mkString(",")}")
  }

  test("A34 gini impurity: pure cohort 0, balanced pair 1/2, exact numerator") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // cohort 1 (user 1): 4 rows one type → gini 0; cohort 2 (user 2):
    // 2+2 across two types → num = 16 − 8 = 8, gini = 0.5; cohort 3
    // (user 3): 3+1 → num = 16 − 10 = 6, gini = 0.375
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "a"), (3L, "a"), (3L, "b"))
      .zipWithIndex.map { case ((u, et), i) => (i.toLong, t(i * 1000), u, et, 0.0, "{}") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val spark2 = spark
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.giniImpurity(spark2, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 1L, 0L, 0.0)), s"pure: ${got(1L)}")
    assert(got(2L) == ((4L, 2L, 8L, 0.5)), s"balanced: ${got(2L)}")
    assert(got(3L) == ((4L, 2L, 6L, 0.375)), s"3+1: ${got(3L)}")
  }

  test("C38 watermark plan: drop counts shrink as the delay absorbs lateness") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // shard 0 (user 8): arrival ts 10s, 60s, then 58.5s (1.5s late),
    // then 9s (51s late) — delays 0/1s drop both, 10s absorbs the
    // 1.5s one, 60s absorbs both; shard 1 (user 9) is in order
    val rows = Seq(
      (1L, 8L, t(10000000L)), (2L, 8L, t(60000000L)),
      (3L, 8L, t(58500000L)), (4L, 8L, t(9000000L)),
      (5L, 9L, t(1000000L)), (6L, 9L, t(2000000L)))
    val df = rows.map { case (e, u, ts) => (e, ts, u, "x", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Cdc.watermarkPlan(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((6L, 2L, 2L, 333333L)), s"delay 0: ${got(0L)}")
    assert(got(1000000L)._3 == 2L, s"1s still drops both: ${got(1000000L)}")
    assert(got(10000000L)._3 == 1L, s"10s absorbs the 1.5s row: ${got(10000000L)}")
    assert(got(60000000L) == ((6L, 2L, 0L, 0L)), s"60s absorbs all: ${got(60000000L)}")
  }

  test("C36 late-arrival audit measures event-time lateness in arrival order") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // user 1 arrival order (event_id): ts 10ms, 50ms, 20ms, 60ms —
    // the third row trails the running max by 30ms; user 2 in order
    val rows = Seq(
      (1L, 1L, t(10000), 0.0), (1L, 2L, t(50000), 0.0),
      (1L, 3L, t(20000), 0.0), (1L, 4L, t(60000), 0.0),
      (2L, 5L, t(1000), 0.0), (2L, 6L, t(2000), 0.0))
    val got = graft.operators.Cdc.lateAudit(
        rows.toDF("user_id", "event_id", "ts", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 1L, 30000L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 0L, -1L)), s"in-order key must have null max: ${got(2L)}")
  }

  test("C37 incremental MV merge == full recompute across upsert/delete/revive/insert") {
    import spark.implicits._
    import graft.operators.Cdc
    // base commits 1-10, delta 11-17; cohort = user_id % 100.
    // key 1: updated in delta; key 2: tombstoned; key 3: deleted in
    // base then revived; key 4: new in delta; key 5: untouched;
    // key 6: deleted in base, untouched (stays out); key 7: updated
    // twice in delta (latest commit wins)
    val changes = Seq(
      (1L, 1L, 100L, 0), (2L, 2L, 200L, 0), (3L, 3L, 300L, 0),
      (3L, 4L, 0L, 1), (5L, 5L, 500L, 0), (6L, 6L, 600L, 0),
      (6L, 7L, 0L, 1), (7L, 8L, 700L, 0),
      (1L, 11L, 150L, 0), (2L, 12L, 0L, 1), (3L, 13L, 350L, 0),
      (4L, 14L, 400L, 0), (7L, 15L, 710L, 0), (7L, 16L, 720L, 0))
      .toDF("user_id", "event_id", "cents", "del")
    val base = changes.filter($"event_id" <= 10)
    val delta = changes.filter($"event_id" > 10)
    val bState = Cdc.keyState(base)
    def toMapRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val merged = toMapRows(Cdc.incrAggMerge(bState, Cdc.cohortAgg(bState), delta))
    val full = toMapRows(Cdc.cohortAgg(Cdc.keyState(changes)))
    assert(merged == full, s"merged $merged != full $full")
    // sanity on the content itself: live keys 1,3,4,5,7 →
    // 150+350+400+500+720 cents in cohorts 1,3,4,5,7
    assert(full == Map(1L -> ((1L, 150L)), 3L -> ((1L, 350L)),
      4L -> ((1L, 400L)), 5L -> ((1L, 500L)), 7L -> ((1L, 720L))),
      s"full recompute content: $full")
  }

  test("C33 changelog compaction keeps first records and true changes only") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s)
    val rows = Seq(
      (1L, 1L, t(1), 2.50), (1L, 2L, t(2), 2.50), // retry dup -> drop
      (1L, 3L, t(3), 3.00),                        // change -> keep
      (1L, 4L, t(4), 3.00), (1L, 5L, t(5), 3.00), // heartbeats -> drop
      (1L, 6L, t(6), 2.50),                        // back-change -> keep
      (2L, 7L, t(1), 9.99))                        // first per key -> keep
    val got = graft.operators.Cdc.compactChangelog(
        rows.toDF("user_id", "event_id", "ts", "value"))
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 3L, 6L, 7L), s"got $got")
  }

  test("B26 rolling autocorr: ramp -> +1, alternation -> -1, constants -> null") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s)
    val rows =
      (0 until 12).map(i => (1L, i.toLong, t(i), 1.0 + i)) ++        // ramp
      (0 until 12).map(i => (2L, 20L + i, t(i),
        if (i % 2 == 0) 1.0 else 3.0)) ++                            // alternating
      (0 until 12).map(i => (3L, 40L + i, t(i), 7.0))                // constant
    val got = graft.operators.Resilience.rollingAutocorr(
        rows.toDF("user_id", "event_id", "ts", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // a linear ramp's trailing windows correlate exactly +1; a strict
    // alternation exactly -1; a constant series has zero variance ->
    // null. First pairs (n < 2) are null everywhere.
    def lastOf(u: Long) = got.filter(_._1 == u).maxBy(_._2)._3
    assert(lastOf(1L) == Some(1.0), s"ramp: ${lastOf(1L)}")
    assert(lastOf(2L) == Some(-1.0), s"alternation: ${lastOf(2L)}")
    assert(lastOf(3L).isEmpty, s"constant: ${lastOf(3L)}")
    assert(got.filter(r => r._1 == 1L && r._2 <= 1L).forall(_._3.isEmpty),
      "n < 2 pairs must be null")
  }

  test("F15 bm25 ranks a term-stuffed doc first and saturates tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("spark " * 50).trim),                    // stuffed, short
      (2L, ("spark window scan " * 5 + "x " * 200).trim), // all terms, long
      (3L, "spark " + ("y " * 20).trim),             // one hit
      (4L, ("z " * 30).trim))                        // no hits
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bm25(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(!got.map(_._1).contains(4L), "no-hit doc must not appear")
    // doc 2 hits all 3 query terms; idf of each term is equal here
    // (every term appears in 2 docs), so 3 saturated parts beat doc
    // 1's single saturated part despite 50x term stuffing
    assert(got.head._1 == 2L && got.head._3 == 3L, s"got ${got.toSeq}")
    val d1 = got.find(_._1 == 1L).get
    assert(d1._3 == 1L && d1._2 < 3 * got.head._2, s"tf must saturate: $d1")
  }

  test("F19 bigram LM: order-sensitive scoring, hand-computed smoothed probs") {
    import spark.implicits._
    // same unigram bag (3×a, 3×b) in docs 1 and 2 — only the bigram
    // structure differs. Corpus bigrams: ab×4, ba×4, aa×1, bb×1;
    // first-token totals a·=5, b·=5; V=3 (a, b, solo).
    // doc1 = 5 predictable bigrams → lp/5 = ln(5/8); doc2 mixes in
    // the rare aa/bb → (3·ln(5/8) + 2·ln(2/8))/5. doc3 has no bigram.
    val docs = Seq((1L, "a b a b a b"), (2L, "b a a b b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramLm(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(!got.contains(3L), "single-token doc carries no bigram")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((5L, r4(math.log(5.0 / 8.0)))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((5L,
      r4((3 * math.log(5.0 / 8.0) + 2 * math.log(2.0 / 8.0)) / 5))),
      s"doc2: ${got(2L)}")
    assert(got(1L)._2 > got(2L)._2, "natural order must outscore shuffled")
  }

  test("F47 Kneser-Ney LM: hand-computed discount + continuation interpolation") {
    import spark.implicits._
    // corpus bigrams: ab×2, ba×1, bc×2 → contexts a·=2 (1 type),
    // b·=3 (2 types); continuations: ·a 1, ·b 1, ·c 1 of 3 distinct
    // bigrams. P(ab) = 1.25/2 + (.75·1/2)(1/3) = 0.75;
    // P(ba) = 0.25/3 + (.75·2/3)(1/3) = 0.25;
    // P(bc) = 1.25/3 + (.75·2/3)(1/3) = 7/12. doc3 has no bigram.
    val docs = Seq((1L, "a b a b c"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.knLm(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(!got.contains(3L), "single-token doc carries no bigram")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAb = math.max(2 - 0.75, 0.0) / 2 + 0.75 * 1 / 2 * (1.0 / 3)
    val pBa = math.max(1 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pBc = math.max(2 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    assert(got(1L) == ((4L, r4(
      (2 * math.log(pAb) + math.log(pBa) + math.log(pBc)) / 4))),
      s"doc1: ${got(1L)}")
    assert(got(2L) == ((1L, r4(math.log(pBc)))), s"doc2: ${got(2L)}")
    // absolute discounting: the predictable repeated bigram outscores
    // the shuffled mix
    assert(got(2L)._2 > got(1L)._2,
      "pure high-count bigram must outscore the mix")
  }

  test("A39 KS: hand-computed ECDF gap, smallest-value tie, non-R/N excluded") {
    import spark.implicits._
    // R = {1,2,3,4}, N = {3,4,5,6} (dollars): cross-multiplied gaps
    // over the value union are 4,8,8,8,4,0 sixteenths -> D = 8/16 =
    // 0.5 first reached at 2.00; the 'A' row must be ignored
    val rows = Seq(("R", 1.0), ("R", 2.0), ("R", 3.0), ("R", 4.0),
      ("N", 3.0), ("N", 4.0), ("N", 5.0), ("N", 6.0), ("A", 9.0))
    val df = rows.zipWithIndex.map { case ((f, p), i) => (i.toLong, f, p) }
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.ksTest(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L, s"ns: ${r.mkString(",")}")
    assert(r.getLong(2) == 200L, s"argmax value: ${r.mkString(",")}")
    assert(r.getDouble(3) == 0.5, s"D: ${r.mkString(",")}")
  }

  test("A40 Welch t: hand-computed unequal-variance statistic and dof") {
    import spark.implicits._
    // group 1: {1..5} -> m=300c, var=25000; group 2: {2,4,6} -> m=400c,
    // var=40000; the spec replays the identical IEEE sequence
    val rows = Seq(("1", 1.0), ("1", 2.0), ("1", 3.0), ("1", 4.0),
      ("1", 5.0), ("2", 2.0), ("2", 4.0), ("2", 6.0))
    val df = rows.zipWithIndex.map { case ((p, v), i) => (i.toLong, p, v) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("welch").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.welchTTest(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val se2 = 25000.0 / 5.0 + 40000.0 / 3.0
    val t = (300.0 - 400.0) / math.sqrt(se2)
    val dof = se2 * se2 / ((25000.0 / 5.0) * (25000.0 / 5.0) / 4.0 +
      (40000.0 / 3.0) * (40000.0 / 3.0) / 2.0)
    assert(r.getLong(2) == 5L && r.getLong(3) == 3L, r.mkString(","))
    assert(r.getDouble(4) == -1.0, s"mean_diff: ${r.mkString(",")}")
    assert(r.getDouble(5) == r6(t), s"t: ${r.mkString(",")} vs ${r6(t)}")
    assert(r.getDouble(6) == r4(dof), s"dof: ${r.mkString(",")} vs ${r4(dof)}")
  }

  test("A41 ANOVA: two crafted groups give F=13.5, exact SSB/SSW") {
    import spark.implicits._
    // line 1: {1,2,3}, line 2: {4,5,6} (dollars): SSB=135000c2,
    // SSW=40000c2, F=(135000/1)/(40000/4)=13.5
    val rows = Seq((1, 1.0), (1, 2.0), (1, 3.0), (2, 4.0), (2, 5.0), (2, 6.0))
    val df = rows.zipWithIndex.map { case ((ln, v), i) => (i.toLong, ln, v) }
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("anova").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.anovaF(spark, dir).collect()
    assert(got.length == 2)
    val byLine = got.map(r => r.getLong(0) -> r).toMap
    assert(byLine(1L).getLong(1) == 3L && byLine(1L).getDouble(2) == 2.0)
    assert(byLine(2L).getLong(1) == 3L && byLine(2L).getDouble(2) == 5.0)
    got.foreach { r =>
      assert(r.getLong(3) == 2L && r.getLong(4) == 6L, r.mkString(","))
      assert(r.getDouble(5) == 13.5 && r.getDouble(6) == 4.0, r.mkString(","))
      assert(r.getDouble(7) == 13.5, s"F: ${r.mkString(",")}")
    }
  }

  test("B30 periodogram: pure period-4 wave peaks at k=2 with power 50") {
    import spark.implicits._
    // y = 10 + 5*cos(2*pi*2t/8): centered z = n*y - S = 8y - 80 gives
    // a(k=2) = 160, b = 0 -> power = 160^2/8^3 = 50; k=1 and k=3
    // carry ~0 (cos(pi/2) ulps round away at 4dp)
    val ys = Seq(10L, 5L, 10L, 15L, 10L, 5L, 10L, 15L)
    val df = ys.zipWithIndex.map { case (y, i) => ("x", i + 1, y) }
      .toDF("g", "p", "y")
    val got = graft.operators.Resilience
      .periodogramOn(graft.operators.Resilience.Series(df, "g", "p", "y"))
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"kmax=(n-1)/2=3: ${got.keySet}")
    assert(got(2L) == ((4.0, 50.0, 1L)), s"k=2: ${got(2L)}")
    assert(got(1L)._2 == 0.0 && got(3L)._2 == 0.0, s"off-harmonics: $got")
  }

  test("F22 RAKE: hand-computed degree/freq phrase scores, dup phrases, in-phrase repeats") {
    import spark.implicits._
    // d1: phrases "red apple" / "red apple pie" / "red" —
    //   red f3 d6 → 2M ppm, apple f2 d5 → 2.5M, pie f1 d3 → 3M;
    //   scores 7.5M > 4.5M > 2M
    // d2: "big cat" twice → one phrase row, n_occ 2, score 4M
    // d3: "very very good" — very counts per instance → 9M
    val docs = Seq(
      (1L, "red apple. red apple pie of red"),
      (2L, "big cat. big cat"),
      (3L, "very very good")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.rake(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, 1L)) == (("red apple pie", 7500000L, 1L)), s"${got((1L, 1L))}")
    assert(got((1L, 2L)) == (("red apple", 4500000L, 1L)))
    assert(got((1L, 3L)) == (("red", 2000000L, 1L)))
    assert(got((2L, 1L)) == (("big cat", 4000000L, 2L)), s"${got((2L, 1L))}")
    assert(!got.contains((2L, 2L)), "duplicate phrase must collapse to one row")
    assert(got((3L, 1L)) == (("very very good", 9000000L, 1L)), s"${got((3L, 1L))}")
  }

  test("F23 heavy hitters == exact groupBy under every partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{explode, length, lit, lower, split}
    // 4000 noise singletons dilute the corpus; "alpha"/"beta" stay
    // above the 0.5% threshold, "gamma" (20 hits ≈ 0.3%) must not
    val docs = (
      (1 to 300).map(i => (i.toLong, "alpha")) ++
      (1 to 60).map(i => (1000L + i, "beta beta")) ++
      (1 to 20).map(i => (2000L + i, "gamma")) ++
      (1 to 4000).map(i => (10000L + i, s"n$i"))
    ).toDF("doc_id", "text")
    val exact = docs
      .select(explode(split(lower($"text"), "\\s+")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val want = exact.filter { case (_, c) => c * 1000000L > n * 5000L }
    assert(want.keySet == Set("alpha", "beta"), s"fixture drifted: $want")
    for (p <- Seq(1, 3, 8)) {
      val got = graft.operators.TextAnalysis.heavyHitters(docs.repartition(p))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got.keySet == want.keySet, s"p=$p: ${got.keySet}")
      for ((t, (c, ppm)) <- got) {
        assert(c == want(t), s"p=$p $t: exact recount must equal groupBy")
        assert(ppm == c * 1000000L / n)
      }
    }
  }

  test("F25 lexical diversity: hand-computed TTR/hapax, empty doc emits zeros") {
    import spark.implicits._
    // d1 "a a b c": 4 tokens, 3 types (ttr 750000), hapax b,c
    // (500000); d2 all-same: ttr 1/3, hapax 0; d3 empty: zero row
    val docs = Seq((1L, "a a b c"), (2L, "x x x"), (3L, "  "))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lexicalDiversity(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((4L, 3L, 750000L, 500000L)), s"${got(1L)}")
    assert(got(2L) == ((3L, 1L, 333333L, 0L)), s"${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0L)), s"empty doc: ${got(3L)}")
  }

  test("F24 JSD: identical slices give exactly 0, crafted asymmetry matches the formula") {
    import spark.implicits._
    // identical distributions: every pe == pr → log2(1) = 0 exactly,
    // jsd bit-exactly 0.0 with no tolerance
    val same = Seq(
      (1L, "aa aa bb", "en"), (2L, "aa aa bb", "fr"))
      .toDF("doc_id", "text", "lang")
    val r0 = graft.operators.TextAnalysis.jsdSlices(same).collect()
    assert(r0.forall(_.getDouble(3) == 0.0), s"${r0.map(_.mkString(",")).toSeq}")
    // en = {aa,aa,bb}, rest = {aa,cc,cc}: hand formula within 1e-9
    // (log2 is the suite's one libm call — see operator note)
    val diff = Seq(
      (1L, "aa aa bb", "en"), (2L, "aa cc cc", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = graft.operators.TextAnalysis.jsdSlices(diff)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def t(p: Double, q: Double) =
      (if (p > 0) p * math.log(p / ((p + q) / 2)) / math.log(2) else 0.0) +
      (if (q > 0) q * math.log(q / ((p + q) / 2)) / math.log(2) else 0.0)
    val want = (t(2.0 / 3, 1.0 / 3) + t(1.0 / 3, 0) + t(0, 2.0 / 3)) / 2
    assert(rows("aa")._1 == 666666L && rows("aa")._2 == 333333L)
    assert(rows("bb")._1 == 333333L && rows("bb")._2 == 0L)
    assert(rows("")._1 == 0L && rows("")._2 == 0L, "other bucket empty here")
    val want6 = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(rows("aa")._3 == want6, s"jsd ${rows("aa")._3} vs $want6")
  }

  test("F20 collocations: hand-computed PMI ranks the true phrase first") {
    import spark.implicits._
    // corpus: 5x "new york" + one 10-a doc. N=20 tokens, B=14 bigrams;
    // PMI(new,york) = ln(5*20*20/(14*5*5)) = ln(40/7) beats
    // PMI(a,a) = ln(9*20*20/(14*10*10)) = ln(18/7)
    val docs = ((1 to 5).map(i => (i.toLong, "new york")) :+
      (9L, "a a a a a a a a a a")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.collocations(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4))))
      .toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.size == 2, s"min-count 5 leaves 2 pairs: $got")
    assert(got(1L) == (("new", "york", 5L, r4(math.log(40.0 / 7.0)))), s"${got(1L)}")
    assert(got(2L) == (("a", "a", 9L, r4(math.log(18.0 / 7.0)))), s"${got(2L)}")
  }

  test("C41 concurrency: overlap peak=3 with closed-interval ties, day offsets") {
    import spark.implicits._
    // day 1: u1 [00:00,00:10], u2 [00:05,00:15], u3 [00:10,00:10] -
    // at 00:10 the +1 lands before u1's -1 -> peak 3. day 2: one
    // 2-event session (20-min gap stays one session) -> peak 1
    val rows = Seq(
      (1L, 1L, "2020-01-01 00:00:00"), (2L, 1L, "2020-01-01 00:10:00"),
      (3L, 2L, "2020-01-01 00:05:00"), (4L, 2L, "2020-01-01 00:15:00"),
      (5L, 3L, "2020-01-01 00:10:00"),
      (6L, 1L, "2020-01-02 10:00:00"), (7L, 1L, "2020-01-02 10:20:00"))
    val df = rows.toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s"))
    val got = graft.operators.Cdc.concurrency(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2020-01-01") == ((3L, 3L)), s"day1: $got")
    assert(got("2020-01-02") == ((1L, 1L)), s"day2: $got")
  }

  test("A36 chi-square: crafted 2x2 table gives chi2=20, dof=1, exact cells") {
    import spark.implicits._
    // A-X 30, A-Y 10, B-X 10, B-Y 30: all marginals 40, N 80,
    // every expected cell 20, every |O-E| 10 → chi_cell 5, chi2 20
    val rows =
      Seq.fill(30)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(30)(("B", "Y"))
    val df = rows.zipWithIndex.map { case ((p, st), i) =>
      (i.toLong, p, st, 1.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("chisq").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.chiSquare(spark, dir).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getDouble(5) == 20.0, s"expected: ${r.mkString(",")}")
      assert(r.getDouble(6) == 5.0, s"chi_cell: ${r.mkString(",")}")
      assert(r.getDouble(7) == 20.0 && r.getLong(8) == 1L,
        s"chi2/dof: ${r.mkString(",")}")
    }
    // zero cells are densified: a diagonal-only 2×2 (A-X 10, B-Y 10)
    // must surface all four cells and χ² = n = 20
    val diag = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y")))
      .zipWithIndex.map { case ((p, st), i) => (i.toLong, p, st, 1.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
    val dir2 = java.nio.file.Files.createTempDirectory("chisq0").toString
    diag.write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val got2 = graft.operators.Relational.chiSquare(spark, dir2).collect()
    assert(got2.length == 4, s"densified cells: ${got2.length}")
    assert(got2.forall(_.getDouble(7) == 20.0),
      "zero cells must contribute to chi2")
  }

  test("A37 MAD: even-count interpolation and odd-count exact, both dyadic") {
    import spark.implicits._
    // A: cents 100,200,300,400 → median 250, deviations
    // 150,50,50,150 → MAD 100; B: 1000,2000,9000 → median 2000,
    // deviations 1000,0,7000 → MAD 1000
    val rows = Seq(("A", 1.00), ("A", 2.00), ("A", 3.00), ("A", 4.00),
      ("B", 10.00), ("B", 20.00), ("B", 90.00))
    val df = rows.zipWithIndex.map { case ((p, v), i) =>
      (i.toLong, p, "O", v) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.madPerGroup(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") == ((4L, 250.0, 100.0)), s"interp: ${got("A")}")
    assert(got("B") == ((3L, 2000.0, 1000.0)), s"odd: ${got("B")}")
  }

  test("A38 Benford: string-head digits, integer ppm, known expectations") {
    import spark.implicits._
    // digits of cents: 100→1 (x2), 250→2, 9500→9; zero-price row
    // dropped. freq_ppm: digit 1 = 2·10⁶/4 = 500000, others 250000
    val df = Seq(1.00, 1.05, 2.50, 95.00, 0.00).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.benford(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((1L, 2L, 500000L), (2L, 1L, 250000L), (9L, 1L, 250000L)),
      s"got ${got.toSeq}")
    // log10(2)·10⁶ and log10(10/9)·10⁶, rounded
    val byDigit = got.map(x => x._1 -> x._4).toMap
    assert(byDigit(1L) == 301030L && byDigit(9L) == 45757L, s"$byDigit")
    assert(got.forall(x => x._5 == x._3 - x._4), "dev must be freq - benford")
  }

  test("A42 Mann-Whitney: doubled tie ranks, hand-computed U and z") {
    import spark.implicits._
    // R = {1,2,3}, N = {2,3,4} dollars. Doubled avg ranks over the
    // union: 100→2, 200→5 (avg 2.5), 300→9 (4.5), 400→12. R's
    // doubled rank sum = 2+5+9 = 16 → 2U = 16 − 3·4 = 4, U = 2.
    // ties Σ(c³−c) = 6+6 = 12 over blocks {1,2,2,1}; the 'A' row is
    // excluded like A39
    val rows = Seq(("R", 1.0), ("R", 2.0), ("R", 3.0),
      ("N", 2.0), ("N", 3.0), ("N", 4.0), ("A", 9.0))
    val df = rows.zipWithIndex.map { case ((f, p), i) => (i.toLong, f, p) }
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("mwu").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.mannWhitney(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, r.mkString(","))
    assert(r.getDouble(2) == 2.0, s"U: ${r.mkString(",")}")
    // identical IEEE sequence as the operator: (2U − nRnN)/(2σ)
    val z = (4.0 - 9.0) / (2.0 * math.sqrt(
      3.0 * 3.0 / 12.0 * (7.0 - 12.0 / (6.0 * 5.0))))
    assert(r.getDouble(3) == r6(z), s"z: ${r.mkString(",")} vs ${r6(z)}")
  }

  test("A43 Spearman: perfect monotone gives ±1 through tied doubled ranks") {
    import spark.implicits._
    // R: y strictly decreasing in x → rho = −1; N: x has a tie and y
    // ties along with it → Pearson-on-ranks still exactly +1
    val rows = Seq(
      ("R", 1L, 3.00), ("R", 2L, 2.00), ("R", 3L, 1.00),
      ("N", 1L, 5.00), ("N", 1L, 5.00), ("N", 2L, 9.00))
    val df = rows.zipWithIndex.map { case ((f, x, y), i) => (i.toLong, f, x, y) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("spear").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.spearman(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("R") == ((3L, -1.0)), s"R: ${got("R")}")
    assert(got("N") == ((3L, 1.0)), s"N: ${got("N")}")
  }

  test("A44 runs test: alternation maxes runs, clumps minimize, all-tied group vanishes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // a: 1,9 alternating ×4 → median 5, signs alternate → runs=8;
    // c: 1,1,9,9 → runs=2; b: all equal → every row is a median tie,
    // dropped → the group emits NO row
    def mk(t: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (t, (t.hashCode.toLong << 8) + i, i, v) }
    val rows = mk("a", Seq(1, 9, 1, 9, 1, 9, 1, 9.0)) ++
      mk("b", Seq(5, 5, 5.0)) ++ mk("c", Seq(1, 1, 9, 9.0))
    val df = rows.toDF("event_type", "event_id", "i", "value")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
      .select("event_type", "event_id", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("runs").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.runsTest(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set("a", "c"), s"groups: ${got.keySet}")
    val za = (8.0 - (1.0 + 2.0 * 16.0 / 8.0)) / math.sqrt(
      (2.0 * 16.0 * (2.0 * 16.0 - 8.0)) / (8.0 * 8.0 * 7.0))
    assert(got("a") == ((4L, 4L, 8L, r6(za))), s"a: ${got("a")} vs ${r6(za)}")
    val zc = (2.0 - (1.0 + 2.0 * 4.0 / 4.0)) / math.sqrt(
      (2.0 * 4.0 * (2.0 * 4.0 - 4.0)) / (4.0 * 4.0 * 3.0))
    assert(got("c") == ((2L, 2L, 2L, r6(zc))), s"c: ${got("c")} vs ${r6(zc)}")
  }

  test("A45 skyline: hand-checked frontier with x-ties and cross-bucket points") {
    import spark.implicits._
    // pairs (cents, qty): frontier = (1,5), (2,4), (4,1), and the
    // cross-bucket point (200000, 0); (300000, 1) is dominated from
    // two buckets away — exercises the exclusive prior-bucket min
    val rows = Seq((0.01, 5L), (0.01, 7L), (0.02, 4L), (0.03, 4L),
      (0.04, 1L), (0.05, 1L), (0.02, 9L), (0.04, 1L),
      (2000.00, 0L), (3000.00, 1L))
    val df = rows.zipWithIndex.map { case ((p, q), i) => (i.toLong, p, q) }
      .toDF("l_orderkey", "l_extendedprice", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.skyline(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L), (2L, 4L), (4L, 1L), (200000L, 0L)),
      s"got $got")
  }

  test("A47 A/B z-test: hand-computed pooled z, degenerate experiment nulls out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    def write(rows: Seq[(Long, String)]): String = {
      val df = rows.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, i, t) }
        .toDF("user_id", "event_id", "i", "event_type")
        .withColumn("ts",
          expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
        .withColumn("value", expr("1.0"))
        .select("user_id", "event_id", "ts", "event_type", "value")
      val dir = java.nio.file.Files.createTempDirectory("ab").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // cohort 0 = {2 converts, 4 doesn't}; cohort 1 = {1, 3 both convert}
    val dir = write(Seq(2L -> "purchase", 2L -> "view", 4L -> "view",
      1L -> "purchase", 3L -> "purchase"))
    val r = graft.operators.Relational.abTest(spark, dir).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 2L)), r.mkString(","))
    assert(r.getLong(4) == 500000L && r.getLong(5) == 1000000L)
    val z = (0.5 - 1.0) / math.sqrt(
      3.0 / 4.0 * (1.0 - 3.0 / 4.0) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(r.getDouble(6) == r6(z), s"z: ${r.getDouble(6)} vs ${r6(z)}")
    // everyone converts → pooled variance 0 → z null
    val dir2 = write(Seq(1L -> "purchase", 2L -> "purchase"))
    val r2 = graft.operators.Relational.abTest(spark, dir2).collect().head
    assert(r2.isNullAt(6), s"degenerate z must be null: ${r2.mkString(",")}")
  }

  test("A51 HHI: monopoly 10000, even split 2500, exact integer points") {
    import spark.implicits._
    // nation 1: one supplier → HHI 10000; nation 2: four equal
    // suppliers → 4·(1/4)² = 2500; nation 3: shares 3/4, 1/4 →
    // (9+1)/16 → 6250
    val sup = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L),
      (6L, 3L), (7L, 3L)).toDF("s_suppkey", "s_nationkey")
    val li = Seq((1L, 8.0), (2L, 2.0), (3L, 2.0), (4L, 2.0), (5L, 2.0),
      (6L, 6.0), (7L, 2.0))
      .zipWithIndex.map { case ((sk, p), i) => (i.toLong, sk, p) }
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("hhi").toString
    sup.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.hhi(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((1L, 10000L)), s"${got(1L)}")
    assert(got(2L) == ((4L, 2500L)), s"${got(2L)}")
    assert(got(3L) == ((2L, 6250L)), s"${got(3L)}")
  }

  test("A50 Wasserstein: interleaved unit shift gives exactly 1 dollar") {
    import spark.implicits._
    // R={1,3}, N={2,4}: every R point moves one dollar right → W₁=1;
    // the 'A' row is excluded like A39
    val rows = Seq(("R", 1.0), ("R", 3.0), ("N", 2.0), ("N", 4.0),
      ("A", 9.0))
    val df = rows.zipWithIndex.map { case ((f, p), i) => (i.toLong, f, p) }
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("emd").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Relational.wasserstein(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, r.mkString(","))
    assert(r.getDouble(2) == 1.0, s"W1: ${r.mkString(",")}")
  }

  test("A49 ridge: Cramer closed form on crafted Gram matrix, exact numerators") {
    import spark.implicits._
    // s11=2 s12=1 s22=2 b1=2500 b2=2000, λ=1000 →
    // det=1002²−1, β = exact integer numerators / det
    val rows = Seq((1L, 0L, 10.00), (0L, 1L, 5.00), (1L, 1L, 15.00))
    val df = rows.zipWithIndex.map { case ((x1, x2, y), i) =>
      (i.toLong, "R", x1, x2, y) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_linenumber",
        "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("ridge").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Relational.ridge2(spark, dir).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val det = 1002.0 * 1002.0 - 1.0
    assert(r.getString(0) == "R" && r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6((1002.0 * 2500 - 2000) / det), r.mkString(","))
    assert(r.getDouble(3) == r6((1002.0 * 2000 - 2500) / det), r.mkString(","))
  }

  test("A48 basket lift: hand-computed support/confidence/lift, dup lines collapse") {
    import spark.implicits._
    // baskets {1,2}×3, {1,3}, {3}; order 1 lists part 1 TWICE (must
    // not double-count); N=5, n1=4, n2=3 → pair (1,2): supp 600000,
    // conf 750000, lift 3·5·1e6/(4·3) = 1250000; (1,3) misses
    // min-support
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L), (5L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val orders = (1L to 5L).map(i => (i, i)).toDF("o_orderkey", "o_custkey")
    val dir = java.nio.file.Files.createTempDirectory("basket").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.basketLift(spark, dir).collect()
    assert(got.length == 1, got.map(_.mkString(",")).mkString(";"))
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 3L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((600000L, 750000L, 1250000L)), r.mkString(","))
  }

  test("C44 transitions: session-bounded lag pairs, exact ppm rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // u1 session 1: view→click→view; then a 2h gap → purchase opens
    // session 2 (the view→purchase pair must NOT count). u2: one
    // more view→click.
    val rows = Seq(
      (1L, 1L, 0, "view"), (1L, 2L, 60, "click"), (1L, 3L, 120, "view"),
      (1L, 4L, 7500, "purchase"),
      (2L, 5L, 0, "view"), (2L, 6L, 30, "click"))
    val df = rows.toDF("user_id", "event_id", "i", "event_type")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
      .withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Cdc.transitions(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(("view", "click"), ("click", "view")),
      s"pairs: ${got.keySet}")
    assert(got(("view", "click")) == ((2L, 2L, 1000000L)))
    assert(got(("click", "view")) == ((1L, 1L, 1000000L)))
  }

  test("B34 Mann-Kendall: monotone series maxes S, flat zeroes, tie correction applies") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // one event on day d contributes cnt=1... craft counts via
    // repeated events per day: type 'up' counts 1,2,3,4 over 4 days
    // → S = 6 (all pairs rise); 'flat' 2,2,2 → S = 0, z = 0;
    // 'tied' 1,1,2 → S = 2, T = 2·1·9 = 18,
    // var = (3·2·11 − 18)/18 = 48/18
    def mk(t: String, daily: Seq[Int]) = daily.zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(j =>
        (t, (t.hashCode.toLong << 16) + d * 100 + j, d, j)) }
    val rows = mk("up", Seq(1, 2, 3, 4)) ++ mk("flat", Seq(2, 2, 2)) ++
      mk("tied", Seq(1, 1, 2))
    val df = rows.toDF("event_type", "event_id", "d", "j")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, j)"))
      .withColumn("user_id", expr("1L")).withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("mk").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Resilience.mannKendall(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val zUp = r6(5.0 / math.sqrt((4.0 * 3 * 13 - 0) / 18.0))
    assert(got("up") == ((4L, 6L, zUp)), s"up: ${got("up")} vs $zUp")
    assert(got("flat") == ((3L, 0L, 0.0)), s"flat: ${got("flat")}")
    val zTied = r6(1.0 / math.sqrt((3.0 * 2 * 11 - 18) / 18.0))
    assert(got("tied") == ((3L, 2L, zTied)), s"tied: ${got("tied")} vs $zTied")
  }

  test("B35 ACF/Ljung-Box: alternating counts give exact alternating acf and Q") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // daily counts 1,2,1,2,... over 10 days: n=10, S=15, every
    // centered term is ±5 → den=250, num_k = ±25·(10−k), so
    // acf_k = ±(10−k)/10 alternating, and
    // Q = 120·(.81/9+.64/8+.49/7+.36/6+.25/5+.16/4+.09/3) = 50.4
    val rows = (0 until 10).flatMap { d =>
      (0 until (if (d % 2 == 0) 1 else 2)).map(j => ("alt", d, j)) }
    val events = rows.toDF("event_type", "d", "j")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, j)"))
    val got = graft.operators.Resilience.acfLjungBox(events).collect()(0)
    assert(got.getString(0) == "alt" && got.getLong(1) == 10L)
    val acf = (2 to 8).map(got.getDouble)
    assert(acf == Seq(-0.9, 0.8, -0.7, 0.6, -0.5, 0.4, -0.3), s"acf $acf")
    assert(got.getDouble(9) == 50.4, s"q_lb ${got.getDouble(9)}")
  }

  test("A56 AUC: perfect separation 1.0, identical distributions 0.5 through ties, one-class null") {
    import spark.implicits._
    // group 1: pos {3,4} vs neg {1,2} → AUC 1; group 2: pos {1,2} vs
    // neg {1,2} (full ties) → 0.5; group 3: positives only → null
    val rows = Seq(
      (1, 3.0, "R"), (1, 4.0, "R"), (1, 1.0, "N"), (1, 2.0, "N"),
      (2, 1.0, "R"), (2, 2.0, "R"), (2, 1.0, "N"), (2, 2.0, "N"),
      (3, 1.0, "R"), (3, 2.0, "R"))
    val df = rows.map { case (ln, price, fl) => (ln, price, fl) }
      .toDF("l_linenumber", "l_extendedprice", "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("auc").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.aucScore(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(1L) == ((2L, 2L, Some(1.0))), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, Some(0.5))), s"got ${got(2L)}")
    assert(got(3L) == ((2L, 0L, None)), s"got ${got(3L)}")
  }

  test("A58 DQ checks: every planted violation counted, clean rules pass") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    Seq(
      (1L, 1L, 10.0, d("1995-01-01")),
      (2L, 99L, -5.0, d("2005-01-01")), // orphan cust, bad price, bad date
      (2L, 1L, 20.0, d("1995-03-01"))   // duplicate key
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 0.05, 5.0, d("1995-02-01")),
      (77L, 1.5, 0.0, d("1995-02-01")), // orphan order, bad disc, bad qty
      (1L, 0.10, 3.0, d("1994-12-31"))  // shipped before its order
    ).toDF("l_orderkey", "l_discount", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.operators.Relational.dqChecks(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("orders_totalprice_positive") == ((3L, 1L, false)))
    assert(got("orders_orderdate_in_range") == ((3L, 1L, false)))
    assert(got("orders_orderkey_unique") == ((3L, 1L, false)))
    assert(got("orders_custkey_exists") == ((3L, 1L, false)))
    assert(got("lineitem_discount_bounded") == ((3L, 1L, false)))
    assert(got("lineitem_quantity_positive") == ((3L, 1L, false)))
    assert(got("lineitem_orderkey_exists") == ((3L, 1L, false)))
    // dup order key 2 fans nothing (no lineitem joins it): 2 joined
    // rows from order 1, one shipped before it
    assert(got("lineitem_ship_after_order") == ((2L, 1L, false)))
  }

  test("A57 decile lift: top deciles capture the planted positives, lift exact") {
    import spark.implicits._
    // 20 rows, prices 20..1; positives at ranks 1-4 and 20
    val rows = (1 to 20).map { i =>
      (i.toLong, 1, i.toDouble, if (i >= 17 || i == 1) "R" else "N")
    }
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice",
      "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("lift").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.decileLift(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((2L, 2L, 1000000L, 2L, 400000L, 4000000L)),
      s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 1000000L, 4L, 800000L, 4000000L)),
      s"got ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0L, 4L, 800000L, 2666666L)),
      s"got ${got(3L)}")
    assert(got(10L) == ((2L, 1L, 500000L, 5L, 1000000L, 1000000L)),
      s"got ${got(10L)}")
  }

  test("C53 window funnel: chain completes inside the hour, breaks past it, picks earliest") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2024-04-01").getTime + min * 60000L)
    val rows = Seq(
      // user 1: full chain within the hour — and a LATER cheaper chain
      // that must NOT displace the earliest one
      (1L, t(0), "view"), (1L, t(10), "click"), (1L, t(20), "purchase"),
      (1L, t(30), "view"), (1L, t(31), "click"), (1L, t(32), "purchase"),
      // user 2: purchase lands 61 min after the view → depth 2
      (2L, t(0), "view"), (2L, t(40), "click"), (2L, t(61), "purchase"),
      // user 3: click precedes the view → depth 1
      (3L, t(10), "click"), (3L, t(20), "view"),
      // user 4: purchases only → depth 0
      (4L, t(5), "purchase"))
    val df = rows.map { case (u, ts, et) => (u, ts, et) }
      .toDF("user_id", "ts", "event_type")
    val baseUs = java.sql.Date.valueOf("2024-04-01").getTime * 1000L
    val got = graft.operators.Cdc.funnelWindow(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L
        else (r.getLong(2) - baseUs) / 60000000L))).toMap
    assert(got(1L) == ((3L, 0L)), s"got ${got(1L)}")   // earliest chain at min 0
    assert(got(2L) == ((2L, -1L)), s"got ${got(2L)}")
    assert(got(3L) == ((1L, -1L)), s"got ${got(3L)}")
    assert(got(4L) == ((0L, -1L)), s"got ${got(4L)}")
  }

  test("C52 bitemporal: late arrival restates history, tombstone visible, late valid time excluded") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2023-01-$day%02d").getTime)
    // eids 1..10 → tx_cut 8; days 1..9 → valid_cut = day1 + 4.8 days
    val rows = Seq(
      (1L, 1L, t(1), "click", 1.00),  // known early
      (1L, 9L, t(2), "click", 2.00),  // late ARRIVAL, early valid → restates
      (2L, 2L, t(3), "click", 5.00),
      (2L, 3L, t(9), "click", 7.00),  // valid time past the cut: both clocks ignore
      (3L, 10L, t(4), "click", 3.00), // arrived after tx_cut only
      (4L, 4L, t(5), "error", 9.99),  // tombstone: visible as null cents
      (5L, 5L, t(1), "click", 1.00), (5L, 6L, t(2), "click", 1.00),
      (5L, 7L, t(3), "click", 1.00), (5L, 8L, t(4), "click", 2.00))
    val df = rows.map { case (u, e, ts, et, v) => (u, e, ts, et, v) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.operators.Cdc.bitemporal(df).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(7)))).toMap
    assert(got(1L) == ((Some(100L), Some(200L), true)), s"got ${got(1L)}")
    assert(got(2L) == ((Some(500L), Some(500L), false)), s"got ${got(2L)}")
    assert(got(3L) == ((None, Some(300L), true)), s"got ${got(3L)}")
    assert(got(4L) == ((None, None, false)), s"got ${got(4L)}")
    assert(got(5L) == ((Some(200L), Some(200L), false)), s"got ${got(5L)}")
  }

  test("C50 schema drift: late key surfaces with its first day, corrupt bags survive") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2021-03-$day%02d").getTime + 7200000L)
    val feed = Seq(
      (t(1), """{"k": 1}"""),
      (t(2), """{"k": 2, "k": 3}"""),          // dup key in one row: 2 hits
      (t(3), """not json at all"""),           // corrupt: contributes nothing
      (t(5), """{"k": 4, "new_field": 9}"""),  // the drift event
      (t(6), """{"new_field": 10}""")
    ).toDF("ts", "props")
    val r = graft.operators.Cdc.schemaDrift(feed)
      .as[(String, String, String, Long, Long)].collect()
    assert(r(0) == (("k", "2021-03-01", "2021-03-05", 3L, 4L)), s"got ${r(0)}")
    assert(r(1) == (("new_field", "2021-03-05", "2021-03-06", 2L, 2L)),
      s"got ${r(1)}")
    assert(r.length == 2)
  }

  test("B49 SES fit: grid winner bit-equal to a driver-side fold, walk prefers high alpha") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-11-01").getTime + (day - 1) * 86400000L)
    // "walk": strongly trending counts → one-step SSE minimized by
    // the most reactive alpha; "level": i.i.d.-ish wiggle around 5
    val walkY = (1 to 20).map(d => d * 3)
    val levelY = (1 to 20).map(d => 5 + (d * 7 % 3) - 1)
    val rows =
      walkY.zipWithIndex.flatMap { case (y, d) => Seq.fill(y)(("walk", d + 1)) } ++
      levelY.zipWithIndex.flatMap { case (y, d) => Seq.fill(y)(("level", d + 1)) }
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    def ref(ys: Seq[Double]): (Double, Double, Double) =
      (1 to 9).map(_ / 10.0).map { a =>
        var l = ys.head; var sse = 0.0
        ys.tail.foreach { y =>
          val e = (y - l); sse += e * e; l = l + a * e
        }
        (sse, a, l)
      }.minBy(x => (x._1, x._2))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.operators.Resilience.sesFit(df).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    for ((name, ys) <- Seq("walk" -> walkY, "level" -> levelY)) {
      val (sse, a, l) = ref(ys.map(_.toDouble))
      assert(got(name) == ((a, r4(sse), r4(l))),
        s"$name: got ${got(name)}, ref ($a, ${r4(sse)}, ${r4(l)})")
    }
    assert(got("walk")._1 == 0.9, "trending series must pick the reactive alpha")
  }

  test("B48 STL strength: periodic+trend series scores exactly 1/1, flat series nulls") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-10-01").getTime + (day - 1) * 86400000L)
    // mixed: weekly pattern + linear trend — a 7-term centered MA
    // reproduces the trend exactly, so resid ≡ 0 and both strengths
    // are exactly 1; flat: every variance is 0 → both null
    val pat = Array(1, 3, 6, 9, 6, 3, 1)
    val rows =
      (1 to 28).flatMap(d => Seq.fill(pat((d - 1) % 7) + d)(("mix", d))) ++
      (1 to 28).flatMap(d => Seq.fill(4)(("flat", d)))
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("stl").toString
    df.withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L)).withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Resilience.stlStrength(spark, dir)
      .collect().map(r => r.getString(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("mix") == ((Some(1.0), Some(1.0))), s"got ${got("mix")}")
    assert(got("flat") == ((None, None)), s"got ${got("flat")}")
  }

  test("B50 ADF: alternation rejects the unit root, walk does not, ramp nulls; bit-equal to a driver ref") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2021-01-01").getTime + (day - 1) * 86400000L)
    // alt: noisy mean reversion around 7 (a clean 5,9,5,9 alternation
    // is a PERFECT AR fit — sse = 0 → null; the %3 wobble keeps a
    // residual) → t ≈ −12, rejects; walk: cumulative LCG steps →
    // near-unit-root, fails to reject;
    // ramp: constant diff → perfect fit, sse = 0 → null by the guard
    val altY = (1 to 20).map(d =>
      if (d % 2 == 1) 4L + (d % 3) else 10L - (d % 3))
    val walkY = {
      var s = 11L; var y = 50L
      (1 to 20).map { _ =>
        s = (s * 1103515245L + 12345L) % 2147483648L
        y += (s % 5); y }
    }
    val rampY = (1 to 20).map(d => 3L * d)
    val rows =
      altY.zipWithIndex.flatMap { case (y, d) =>
        Seq.fill(y.toInt)(("alt", d + 1)) } ++
      walkY.zipWithIndex.flatMap { case (y, d) =>
        Seq.fill(y.toInt)(("walk", d + 1)) } ++
      rampY.zipWithIndex.flatMap { case (y, d) =>
        Seq.fill(y.toInt)(("ramp", d + 1)) }
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    def rnd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(ys: Seq[Long]): (Option[Double], Option[Double], Option[Int]) = {
      val ps = ys.sliding(2).map { case Seq(a, b) => (a, b - a) }.toSeq
      val n = ps.size
      def S(f: ((Long, Long)) => BigInt) = ps.map(f).sum
      val (sx, sd) = (S(p => BigInt(p._1)), S(p => BigInt(p._2)))
      val sxx = S(p => BigInt(p._1) * p._1)
      val sdd = S(p => BigInt(p._2) * p._2)
      val sxd = S(p => BigInt(p._1) * p._2)
      val cxx = (n * sxx - sx * sx).toDouble
      val cxd = (n * sxd - sx * sd).toDouble
      val cdd = (n * sdd - sd * sd).toDouble
      val rho = cxd / cxx
      val sse = (cdd - cxd * cxd / cxx) / n.toDouble
      val s2 = sse / (n.toDouble - 2.0)
      val tst = rho / math.sqrt(s2 * n.toDouble / cxx)
      val ok = n >= 4 && cxx > 0 && s2 > 0
      (if (cxx > 0) Some(rnd(rho, 6)) else None,
        if (ok) Some(rnd(tst, 4)) else None,
        if (ok) Some(if (tst < -2.86) 1 else 0) else None)
    }
    val got = graft.operators.Resilience.adf(df).collect().map(r =>
      r.getString(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))).toMap
    for ((name, ys) <- Seq("alt" -> altY, "walk" -> walkY, "ramp" -> rampY))
      assert(got(name) == ref(ys), s"$name: got ${got(name)}, ref ${ref(ys)}")
    assert(got("alt")._3 == Some(1), "alternation must reject the unit root")
    assert(got("walk")._3 == Some(0), "walk must fail to reject")
    assert(got("ramp")._2.isEmpty, "perfect fit must null the statistic")
  }

  test("B51 backtest: ramp series scores the three baselines exactly") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2021-02-01").getTime + (day - 1) * 86400000L)
    // y_t = t over 14 days: naive |e| = 1, snaive-7 |e| = 7, expanding
    // mean ŷ_t = t/2 → |e| = t/2 for t = 8..14 → MAE = 5.5,
    // RMSE = sqrt(31.25), MASE ratios 7 and 5.5 exactly
    val rows = (1 to 14).flatMap(d => Seq.fill(d)(("ramp", d)))
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    val r = graft.operators.Resilience.backtest(df).collect()(0)
    assert(r.getString(0) == "ramp" && r.getLong(1) == 7L)
    assert((r.getDouble(2), r.getDouble(3)) == ((1.0, 1.0)), "naive")
    assert((r.getDouble(4), r.getDouble(5)) == ((7.0, 7.0)), "snaive")
    assert(r.getDouble(6) == 5.5, s"mae_mean ${r.getDouble(6)}")
    assert(r.getDouble(7) ==
      BigDecimal(math.sqrt(31.25)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"rmse_mean ${r.getDouble(7)}")
    assert((r.getDouble(8), r.getDouble(9)) == ((7.0, 5.5)), "mase")
  }

  test("B47 Granger: a strict one-day lead is causal in one direction only") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-09-01").getTime + (day - 1) * 86400000L)
    // clicks: seeded irregular counts; views tomorrow = clicks today
    // plus a small alternating wobble → x Granger-causes y, not vice versa
    val xs = {
      var s = 5L
      (1 to 14).map { _ => s = (s * 1103515245L + 12345L) % 2147483648L
        (2 + (s % 9)).toInt }
    }
    val rows =
      xs.zipWithIndex.flatMap { case (x, d) =>
        Seq.fill(x)(("click", d + 1)) } ++
      xs.dropRight(1).zipWithIndex.flatMap { case (x, d) =>
        Seq.fill(x + ((d + 2) % 2))(("view", d + 2)) } ++
      Seq(("view", 1))
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    val r = graft.operators.Resilience.granger(df).collect()(0)
    val (fxy, bxy, fyx) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(fxy > 10 * math.max(fyx, 1.0),
      s"x->y must dominate: f_xy=$fxy f_yx=$fyx")
    assert(math.abs(bxy - 1.0) < 0.3,
      s"cross slope must track the planted unit lead: $bxy")
  }

  test("B46 permutation entropy: monotone 0, alternation ln2/ln6, tie rule honored") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-07-01").getTime + (day - 1) * 86400000L)
    val rows =
      (1 to 10).flatMap(d => Seq.fill(d)(("mono", d))) ++           // 1..10 rising
      (1 to 10).flatMap(d => Seq.fill(if (d % 2 == 1) 1 else 9)(("alt", d)))
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    val got = graft.operators.Resilience.permutationEntropy(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("mono") == ((8L, 1L, 0.0)), s"got ${got("mono")}")
    // alternation: patterns 021 and 102 split 4/4 → H = ln 2
    assert(got("alt")._1 == 8L && got("alt")._2 == 2L)
    assert(got("alt")._3 == 0.386853, s"got ${got("alt")}")
  }

  test("B45 PACF: bit-equal to a driver-side Durbin-Levinson fold") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-02-01").getTime + (day - 1) * 86400000L)
    // seeded-LCG daily counts — arbitrary but deterministic
    val ys = {
      var s = 77L
      (1 to 30).map { _ => s = (s * 1103515245L + 12345L) % 2147483648L
        (1 + (s % 7)).toInt }
    }
    val rows = ys.zipWithIndex.flatMap { case (y, d) =>
      Seq.fill(y)(("e", d + 1)) }
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    // reference: exact integer ACF numerators then the identical fold
    val n = ys.length.toLong; val s0 = ys.map(_.toLong).sum
    val dev = ys.map(y => n * y - s0)
    val den = dev.map(d => d * d).sum.toDouble
    val rho = (1 to 7).map(k =>
      dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }
        .sum.toDouble / den)
    var phis = Vector(rho(0)); var pacfs = Vector(rho(0))
    for (k <- 2 to 7) {
      val num = rho(k - 1) -
        (1 until k).foldLeft(0d)((a, j) => a + phis(j - 1) * rho(k - j - 1))
      val d2 = 1d -
        (1 until k).foldLeft(0d)((a, j) => a + phis(j - 1) * rho(j - 1))
      val pkk = num / d2
      phis = Vector.tabulate(k)(i => if (i == k - 1) pkk
        else phis(i) - pkk * phis(k - 2 - i))
      pacfs = pacfs :+ pkk
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.operators.Resilience.pacf(df).collect()(0)
    (1 to 7).foreach { k =>
      assert(got.getDouble(k) == r6(pacfs(k - 1)),
        s"pacf_$k: got ${got.getDouble(k)}, ref ${r6(pacfs(k - 1))}")
    }
    // lag-1 PACF is the lag-1 ACF by definition
    assert(got.getDouble(1) == r6(rho(0)))
  }

  test("B44 SAX: step series reads aaaddd with z exactly ±1, constant series nulls") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-06-01").getTime + (day - 1) * 86400000L)
    // step: 15 days of 1 event then 15 days of 9 → varn = 14400,
    // each segment D = ∓600 → z = ∓1.0 exactly; flat: varn = 0
    val rows =
      (1 to 15).flatMap(d => Seq.fill(1)(("step", d))) ++
      (16 to 30).flatMap(d => Seq.fill(9)(("step", d))) ++
      (1 to 30).flatMap(d => Seq.fill(2)(("flat", d)))
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    val got = graft.operators.Resilience.sax(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = got("step")
    assert(s.getLong(1) == 30L && s.getLong(2) == 6L)
    assert(s.getString(3) == "aaaddd", s"word ${s.getString(3)}")
    assert((4 to 6).forall(i => s.getDouble(i) == -1.0) &&
      (7 to 9).forall(i => s.getDouble(i) == 1.0), s"z row $s")
    val f = got("flat")
    assert(f.isNullAt(3) && f.isNullAt(4), s"flat row $f")
  }

  test("B43 Hurst R/S: bit-equal to a driver-side fold; trend beats alternation") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2020-01-01").getTime + (day - 1) * 86400000L)
    // trend: y_i = i (persistent ramp); alt: 1,9,1,9,… (anti-persistent)
    val trendY = (1 to 30).map(i => i)
    val altY = (1 to 30).map(i => if (i % 2 == 1) 1 else 9)
    val rows =
      trendY.zipWithIndex.flatMap { case (y, d) =>
        Seq.fill(y)(("trend", d + 1)) } ++
      altY.zipWithIndex.flatMap { case (y, d) =>
        Seq.fill(y)(("alt", d + 1)) }
    val df = rows.map { case (et, d) => (t(d), et) }.toDF("ts", "event_type")
    // driver-side reference: the identical integer/IEEE sequence
    def ref(ys: Seq[Long]): (Map[Int, Double], Double) = {
      val sizes = Seq(5, 10, 15)
      val means = sizes.map { m =>
        val rs = ys.grouped(m).filter(_.size == m).toSeq.flatMap { blk =>
          val s = blk.sum; val sq = blk.map(y => y * y).sum
          val varn = m * sq - s * s
          if (varn <= 0) None else {
            var p = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
            blk.zipWithIndex.foreach { case (y, j) =>
              p += y
              val pp = m * p - (j + 1) * s
              if (pp > mx) mx = pp; if (pp < mn) mn = pp
            }
            Some((mx - mn).toDouble / math.sqrt(varn.toDouble))
          }
        }
        m -> (if (rs.isEmpty) Double.NaN
              else rs.foldLeft(0d)(_ + _) / rs.size)
      }
      val pts = means.filter(!_._2.isNaN)
        .map { case (m, v) => (math.log(m.toDouble), math.log(v)) }
      val n = pts.size
      val sx = pts.foldLeft(0d)(_ + _._1); val sy = pts.foldLeft(0d)(_ + _._2)
      val sxy = pts.foldLeft(0d)((a, p) => a + p._1 * p._2)
      val sxx = pts.foldLeft(0d)((a, p) => a + p._1 * p._1)
      (means.toMap, (n * sxy - sx * sy) / (n * sxx - sx * sx))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.operators.Resilience.hurst(df).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    for ((name, ys) <- Seq("trend" -> trendY, "alt" -> altY)) {
      val (ms, h) = ref(ys.map(_.toLong))
      val (g5, g10, g15, gh) = got(name)
      assert((g5, g10, g15) == ((r6(ms(5)), r6(ms(10)), r6(ms(15)))),
        s"$name mean R/S mismatch: got ${got(name)}, ref $ms")
      assert(gh == r4(h), s"$name hurst: got $gh ref ${r4(h)}")
    }
    assert(got("trend")._4 > 0.7 && got("alt")._4 < 0.4,
      s"trend must read persistent, alternation anti-persistent: $got")
  }

  test("B36 change point: level shift found exactly; ties break to smallest index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 'shift' counts 2,2,2,8,8,8 → S=30, best split after i=3
    // (gain 36/3 + 576/3 = 204), ΔSSE = 204 − 30²/6 = 54, means 2, 8;
    // 'tie' counts 1,3,3,1 is symmetric: i=1 and i=3 score the SAME
    // two addends (1/1 + 49/3) — the argmax must take i=1
    def mk(t: String, daily: Seq[Int]) = daily.zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(j => (t, d, j)) }
    val events = (mk("shift", Seq(2, 2, 2, 8, 8, 8)) ++
        mk("tie", Seq(1, 3, 3, 1))).toDF("event_type", "d", "j")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, j)"))
    val got = graft.operators.Resilience.changePoint(events)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("shift") == ((3, "2024-01-03", 54.0, 2.0, 8.0)),
      s"shift: ${got("shift")}")
    val tie = got("tie")
    assert(tie._1 == 1 && tie._2 == "2024-01-01" && tie._4 == 1.0 &&
      tie._5 == 2.3333, s"tie: $tie")
  }

  test("B33 Kaplan-Meier: hand-computed survival steps, censored user stays at risk") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // lifetimes (hours): u1=2 churn, u2=2 churn, u3=10 churn,
    // u4=25 censored (active at the end) → S(2)=1·(1−2/4)=0.5,
    // S(10)=0.5·(1−1/2)=0.25; u4 is at risk at t=2 but not an event
    val rows = Seq(
      (1L, 1L, 0), (1L, 2L, 2), (2L, 3L, 0), (2L, 4L, 2),
      (3L, 5L, 0), (3L, 6L, 10), (4L, 7L, 5), (4L, 8L, 30))
    val df = rows.toDF("user_id", "event_id", "h")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, h, 0, 0)"))
      .withColumn("event_type", expr("'view'"))
      .withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Resilience.kaplanMeier(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(2L, 10L), s"event times: ${got.keySet}")
    assert(got(2L) == ((4L, 2L, 0.5)), s"${got(2L)}")
    assert(got(10L) == ((2L, 1L, 0.25)), s"${got(10L)}")
  }

  test("A46 Lorenz/Gini: hand-computed coefficient and cumulative shares") {
    import spark.implicits._
    // spends [1, 1, 2] cents: Σi·x = 9, Σx = 4, n = 3 →
    // G = (18 − 16)/12 = 1/6; cum shares 25%, 50%, 100%
    val df = Seq((10L, 1L, 0.01), (11L, 2L, 0.01), (12L, 3L, 0.02))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("lorenz").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.lorenzGini(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gini = r6(2.0 / 12.0)
    assert(got(1L) == ((1L, 250000L, gini)), s"${got(1L)}")
    assert(got(2L) == ((1L, 500000L, gini)))
    assert(got(3L) == ((1L, 1000000L, gini)))
  }

  private def eventsFixture(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val flat = rows.flatMap { case (uid, vs) => vs.zipWithIndex.map {
      case (v, i) => (uid, uid * 1000 + i, i, v) } }
    val df = flat.toDF("user_id", "event_id", "i", "value")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
      .select("user_id", "event_id", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("evfix").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("B31 Bollinger: hand-computed breach on a spike, flat window silent, short series excluded") {
    // u1: 19×5.00 then 6.00 — dev_n=1900, var_nn=190000 →
    // 1900² > 4·190000 → breach +1; u2: 20×5.00 → var 0, breach 0;
    // u3: 19 rows → below the window, no output
    val dir = eventsFixture(Seq(
      1L -> (Seq.fill(19)(5.00) :+ 6.00),
      2L -> Seq.fill(20)(5.00),
      3L -> Seq.fill(19)(5.00)))
    val got = graft.operators.Resilience.bollinger(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got.keySet == Set(1L, 2L), s"users: ${got.keySet}")
    val sigma = math.sqrt(190000.0) / (20.0 * 100.0)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((5.05, r4(5.05 - 2.0 * sigma), r4(5.05 + 2.0 * sigma), 1L)),
      s"u1: ${got(1L)}")
    assert(got(2L) == ((5.0, 5.0, 5.0, 0L)), s"u2: ${got(2L)}")
  }

  test("B32 RSI: monotone up = 1e6 ppm, down = 0, alternation = 500000, short = null") {
    // 15 points: 14 deltas fill the window exactly at the last row
    val up = (1 to 15).map(i => 10.0 + i)
    val down = (1 to 15).map(i => 50.0 - i)
    val alt = (1 to 15).map(i => if (i % 2 == 0) 11.0 else 10.0)
    val dir = eventsFixture(Seq(1L -> up, 2L -> down, 3L -> alt,
      4L -> Seq(1.0, 2.0, 3.0)))
    val got = graft.operators.Resilience.rsi(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val byUser = got.groupBy(_._1)
    // only the 15th row of each full series carries a value
    assert(byUser(1L).flatMap(_._3).toSeq == Seq(1000000L))
    assert(byUser(2L).flatMap(_._3).toSeq == Seq(0L))
    assert(byUser(3L).flatMap(_._3).toSeq == Seq(500000L))
    assert(byUser(4L).flatMap(_._3).isEmpty, "short series must stay null")
    assert(got.count(_._3.isDefined) == 3)
  }

  test("F21 domain cap keeps exactly top-3 by (quality score desc, doc_id)") {
    import spark.implicits._
    // 5 docs per source with strictly different stopword densities;
    // the cap must agree with the independently-spec'd quality() order
    val mk = (n: Int) => ("the and of " * n) + ("zzz " * (12 - n))
    val docs = (0 until 10).map { i =>
      (i.toLong, mk(i % 5 + 1), "en", s"src${i / 5}", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.domainCap(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.count(_._1 == "src0") == 3 && got.count(_._1 == "src1") == 3)
    val scores = graft.operators.TextAnalysis.quality(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    for (src <- Seq("src0", "src1")) {
      val ids = (0 until 10).map(_.toLong)
        .filter(d => (if (d < 5) "src0" else "src1") == src)
      val want = ids.sortBy(d => (-scores(d), d)).take(3)
      val kept = got.filter(_._1 == src).sortBy(_._3).map(_._2).toSeq
      assert(kept == want, s"$src: kept $kept want $want")
    }
  }

  test("C42 forget purges every version of requested keys, survivors bit-identical") {
    val dir = eventsFixture(Seq(
      1L -> Seq(1.0, 2.0, 3.0), 2L -> Seq(4.0, 5.0), 3L -> Seq(6.0)))
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
    val purged = graft.operators.Cdc.forget(ev, Seq(2L).toDF("user_id"))
      .collect().map(_.toSeq)
    assert(!purged.exists(_.head == 2L), "no version of user 2 may survive")
    val full = graft.operators.Cdc.scd2(ev)
      .filter($"user_id" =!= 2L).collect().map(_.toSeq)
    assert(purged.toSeq == full.toSeq,
      "survivors' version chains must be untouched by the purge")
  }

  test("A52 Cramér's V: independent table = 0, perfect 2×2 association = 1") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]): (Long, Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("cramers").toString
      rows.toDF("l_returnflag", "l_linestatus")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val r = graft.operators.Relational.cramersV(spark, dir).collect().head
      (r.getLong(0), r.getDouble(3), r.getDouble(4))
    }
    val indep = run(for { f <- Seq("R", "N"); m <- Seq("AIR", "TRUCK");
      _ <- 1 to 10 } yield (f, m))
    assert(indep == ((40L, 0.0, 0.0)), s"independent: $indep")
    val assoc = run(Seq.fill(10)(("R", "AIR")) ++ Seq.fill(10)(("N", "TRUCK")))
    assert(assoc._1 == 20L && assoc._2 == 20.0 && assoc._3 == 1.0,
      s"perfect association: $assoc")
  }

  test("A53 pca2: isotropic cloud gives equal eigenvalues, perfect correlation gives evr 1") {
    import spark.implicits._
    val rows =
      Seq(("I", 0L, 0.00), ("I", 2L, 0.00), ("I", 0L, 0.02), ("I", 2L, 0.02),
        ("C", 0L, 0.00), ("C", 2L, 0.02))
    val dir = java.nio.file.Files.createTempDirectory("pca2").toString
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.pca2(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // I: x,y independent ±1 around the mean → λ₁ = λ₂ = 1, evr ½
    assert(got("I") == ((4L, 1.0, 1.0, 0.5)), s"isotropic: ${got("I")}")
    // C: y ≡ x → all variance on the diagonal, λ₂ exactly 0
    assert(got("C") == ((2L, 2.0, 0.0, 1.0)), s"correlated: ${got("C")}")
  }

  test("C46 RFM: aligned metrics give rank-identical quintiles on all three axes") {
    import spark.implicits._
    // u_i has i events, last at t0 + i hours, each worth i dollars —
    // so recency/frequency/monetary all rank u1 < … < u5 and with
    // n = 5 the quintile formula degenerates to the rank itself
    val rows = for { i <- 1 to 5; j <- 1 to i } yield
      (i.toLong, i * 100L + j, (i * 3600L) - (i - j), i.toDouble)
    val df = rows.toDF("user_id", "event_id", "secs", "value")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, secs)"))
      .select("user_id", "event_id", "ts", "value")
    val got = graft.operators.Cdc.rfm(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    for (i <- 1L to 5L) {
      val (rec, freq, mon, rs, fs, ms, code) = got(i)
      assert(rec == 5 - i && freq == i && mon == i * i * 100,
        s"u$i metrics: ${got(i)}")
      assert((rs, fs, ms, code) == ((i, i, i, i * 111)),
        s"u$i scores: ${got(i)}")
    }
  }

  test("B42 seasonality: single July pulse yields the exact basis-point indices") {
    import spark.implicits._
    // 24 months of 1.00 with July = 2.00 both years: every full
    // centered window straddles exactly one pulse, so T = 2600 cents
    // everywhere; July indexes at 200·240000//2600, others at half
    val rows = for (yr <- Seq(1995, 1996); m <- 1 to 12) yield
      (s"$yr-$m", "P", f"$yr-$m%02d-15", if (m == 7) 2.00 else 1.00)
    val df = rows.zipWithIndex.map { case ((_, p, d, v), i) =>
      (i.toLong, p, d, v) }
      .toDF("o_orderkey", "o_orderpriority", "ds", "o_totalprice")
      .withColumn("o_orderdate", to_date($"ds")).drop("ds")
    val dir = java.nio.file.Files.createTempDirectory("seas").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Resilience.seasonalityIndex(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 12, s"one index per calendar month: ${got.size}")
    assert(got(("P", 7)) == ((1L, 200L * 240000L / 2600L)),
      s"July: ${got(("P", 7))}")
    for (m <- (1 to 12).filter(_ != 7))
      assert(got(("P", m)) == ((1L, 100L * 240000L / 2600L)),
        s"month $m: ${got(("P", m))}")
  }

  test("C47 Markov stationary: absorbing state takes all mass, floor split exact") {
    import spark.implicits._
    def ev(uid: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (uid, uid * 100 + i, i, t) }
    // u1: X→Y then Y→Y — Y absorbs everything
    val df = ev(1L, Seq("X", "Y", "Y"))
      .toDF("user_id", "event_id", "i", "event_type")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
      .select("user_id", "event_id", "ts", "event_type")
    val got5 = graft.operators.Cdc.markovStationary(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got5 == Map("X" -> 0L, "Y" -> 2000000000000L), s"$got5")
    // u2 adds X,Y,X,X: X→Y, Y→X, X→X — after ONE step from uniform,
    // X's mass splits by integer div: piX' = piY + piX div 2
    val df2 = (ev(1L, Seq("X", "Y", "X", "X")))
      .toDF("user_id", "event_id", "i", "event_type")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, i)"))
      .select("user_id", "event_id", "ts", "event_type")
    val got1 = graft.operators.Cdc.markovStationary(df2, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got1 == Map("X" -> 1500000000000L, "Y" -> 500000000000L),
      s"$got1")
  }

  test("F26 Zipf slope matches the replicated rank-ordered OLS fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa aa bb bb cc", "en", "s0", 10L),
      (2L, "aa aa aa aa bb bb cc dd", "en", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.zipfSlope(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def ols(freqs: Seq[Long]): (Double, Double) = {
      val pts = freqs.zipWithIndex.map { case (f, i) =>
        (math.log((i + 1).toDouble), math.log(f.toDouble)) }
      var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0
      pts.foreach { case (x, y) =>
        sx += x; sy += y; sxy += x * y; sxx += x * x }
      val n = pts.length.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      def r4(v: Double) = BigDecimal(v).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      (r4(slope), r4((sy - slope * sx) / n))
    }
    val (s0, i0) = ols(Seq(4L, 2L, 1L))
    val (s1, i1) = ols(Seq(4L, 2L, 1L, 1L))
    assert(got("s0") == ((3L, s0, i0)), s"s0: ${got("s0")} vs ($s0, $i0)")
    assert(got("s1") == ((4L, s1, i1)), s"s1: ${got("s1")} vs ($s1, $i1)")
    assert(s0 < 0 && s1 < 0, "Zipf slopes must be negative")
  }

  test("D16 winnowing: long shared substring links the pair, unrelated doc silent") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and " +
      "again until the fence falls over completely"
    val d1 = s"unique preamble one two three $shared suffix alpha"
    val d2 = s"different opening entirely $shared other ending beta"
    val d3 = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm " +
      "lll kkk jjj iii hhh ggg fff eee ddd ccc bbb"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = graft.operators.Dedup.winnow(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.keySet == Set((1L, 2L)), s"pairs: ${got.keySet}")
    // ~90 shared grams winnow to far more than the 5-hash floor
    assert(got((1L, 2L)) >= 5L, s"shared: ${got((1L, 2L))}")
  }

  test("C61 lag quantiles: arithmetic-series delays give exact type-1 ranks") {
    import spark.implicits._
    // event_ids 0..99 -> delays id*97 (ids far below the modulus):
    // p50 = 50th smallest = 49*97, p90 = 89*97, p99 = 98*97
    val df = (0L until 100L).map(i => ("a", i))
      .toDF("event_type", "event_id")
      .withColumn("ts", expr("to_timestamp('2024-01-01')"))
      .withColumn("user_id", lit(1L))
    val r = graft.operators.Cdc.lagQuantiles(df).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) ==
      ((100L, 97L * 99L / 2L, 49L * 97L, 89L * 97L, 98L * 97L, 99L * 97L)),
      s"got $r")
  }

  test("C48 interval union: overlap merges, touching merges, gap splits") {
    import spark.implicits._
    // u1: 0s and 300s overlap into [0,900); 1200s opens a new island
    // u2: 600s starts EXACTLY at the first interval's end — merges
    val rows = Seq((1L, 0L), (1L, 300L), (1L, 1200L),
      (2L, 0L), (2L, 600L))
    val df = rows.zipWithIndex.map { case ((u, sec), i) =>
      (u, i.toLong, sec) }
      .toDF("user_id", "event_id", "secs")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, secs)"))
      .select("user_id", "event_id", "ts")
    val got = graft.operators.Cdc.intervalUnion(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1500000000L, 900000000L)), s"u1: ${got(1L)}")
    assert(got(2L) == ((1L, 1200000000L, 1200000000L)), s"u2: ${got(2L)}")
  }

  test("A54 elasticity: collinear ln-ln months fit slope exactly -1, short brand excluded") {
    import spark.implicits._
    // B1: (price, qty) = (8,2), (4,4), (2,8) across three months —
    // y = ln Q, x = ln(price) are exactly collinear with slope -1
    val li = Seq(
      (1L, 101L, 2L, 16.00, "1995-01-10"),
      (2L, 101L, 4L, 16.00, "1995-02-10"),
      (3L, 101L, 8L, 16.00, "1995-03-10"),
      (4L, 102L, 5L, 10.00, "1995-01-10"),
      (5L, 102L, 5L, 10.00, "1995-02-10"))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "ds")
      .withColumn("l_shipdate", to_date($"ds")).drop("ds")
    val part = Seq((101L, "B1"), (102L, "B2"))
      .toDF("p_partkey", "p_brand")
    val dir = java.nio.file.Files.createTempDirectory("elas").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = graft.operators.Relational.elasticity(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("B1"), "2-month B2 must be excluded")
    assert(got("B1") == ((3L, -1.0)), s"B1: ${got("B1")}")
  }

  test("A55 Theil: equal shares give exactly 0, 1:3 split matches the replicated fold") {
    import spark.implicits._
    val li = Seq(
      (1L, 11L, 1.00), (2L, 12L, 1.00),           // nation 1: equal
      (3L, 21L, 1.00), (4L, 22L, 3.00))           // nation 2: 1:3
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val supp = Seq((11L, 1L), (12L, 1L), (21L, 2L), (22L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val dir = java.nio.file.Files.createTempDirectory("theil").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    supp.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = graft.operators.Relational.theilIndex(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2L, 0.0)), s"equal shares: ${got(1L)}")
    val want = 0.25 * math.log(2.0 * 100 / 400) +
      0.75 * math.log(2.0 * 300 / 400)
    def r4(v: Double) = BigDecimal(v).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L) == ((2L, r4(want))), s"1:3 split: ${got(2L)} vs $want")
  }

  test("F27 confusion matrix: off-diagonal leak counted, ppm shares exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the a of the", "en"),
      (2L, "la el los de la", "en"),     // declared en, predicts es
      (3L, "le la les des le la", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.langConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("en", "en")) == ((1L, 2L, 500000L)), s"${got(("en", "en"))}")
    assert(got(("en", "es")) == ((1L, 2L, 500000L)), s"${got(("en", "es"))}")
    assert(got(("fr", "fr")) == ((1L, 1L, 1000000L)), s"${got(("fr", "fr"))}")
    assert(got.size == 3)
  }

  test("B41 DTW: identical series 0, one-month phase shift 0, amplitude change pays") {
    import spark.implicits._
    def month(yr: Int, m: Int) = f"$yr-$m%02d-15"
    def series(p: String, yr: Int, pulse: Int, amp: Double) =
      (1 to 12).map(m => (p, month(yr, m),
        if (m == pulse) amp else 1.00))
    val rows =
      series("A", 1995, 0, 1.00) ++ series("A", 1996, 0, 1.00) ++
      series("B", 1995, 3, 2.00) ++ series("B", 1996, 4, 2.00) ++
      series("C", 1995, 3, 3.00) ++ series("C", 1996, 3, 2.00)
    val df = rows.zipWithIndex.map { case ((p, d, v), i) =>
      (i.toLong, p, d, v) }
      .toDF("o_orderkey", "o_orderpriority", "ds", "o_totalprice")
      .withColumn("o_orderdate", to_date($"ds"))
      .drop("ds")
    val dir = java.nio.file.Files.createTempDirectory("dtw").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Resilience.dtwSeasonal(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") == ((0L, 1200L, 1200L)), s"identical: ${got("A")}")
    // the shifted pulse re-aligns inside the band at zero cost —
    // month-by-month Euclidean would have paid 200
    assert(got("B") == ((0L, 1300L, 1300L)), s"shift: ${got("B")}")
    assert(got("C") == ((100L, 1400L, 1300L)), s"amplitude: ${got("C")}")
  }

  test("B38 stochastic: hand-computed %K band positions, 3-of-3 %D, flat and short null") {
    // u1: 13×5.00 then 10.00, 7.50, 5.00 — windows all span [500,1000]
    val dir = eventsFixture(Seq(
      1L -> ((Seq.fill(13)(5.00) :+ 10.00) :+ 7.50 :+ 5.00),
      2L -> Seq.fill(14)(5.00),
      3L -> Seq.fill(13)(5.00)))
    val got = graft.operators.Resilience.stochastic(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val byUser = got.groupBy(_._1)
    assert(byUser(1L).flatMap(_._3).toSeq == Seq(1000000L, 500000L, 0L))
    // %D fires only on the 16th row, averaging the three %K values
    assert(byUser(1L).flatMap(_._4).toSeq == Seq(500000L))
    assert(byUser(2L).flatMap(_._3).isEmpty, "flat band must stay null")
    assert(byUser(3L).flatMap(_._3).isEmpty, "short series must stay null")
  }

  test("B39 MACD: constant series all-zero; two-point step matches the hand fold") {
    val dir = eventsFixture(Seq(
      1L -> Seq.fill(5)(3.25),
      2L -> Seq(1.00, 2.00)))
    val got = graft.operators.Resilience.macd(
        graft.sources.Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val byUser = got.groupBy(_._1)
    assert(byUser(1L).forall(_._3 == ((0.0, 0.0, 0.0))),
      "EMA of a constant is the constant, so macd/sig/hist are exactly 0")
    val aF = 2.0 / 13.0; val aS = 2.0 / 27.0; val aSig = 2.0 / 10.0
    val eF = 1.0 * (1 - aF) + aF * 2.0
    val eS = 1.0 * (1 - aS) + aS * 2.0
    val m2 = eF - eS
    val sig2 = 0.0 * (1 - aSig) + aSig * m2
    val u2 = byUser(2L).sortBy(_._2).map(_._3)
    assert(u2.head == ((0.0, 0.0, 0.0)), s"first row: ${u2.head}")
    assert(u2(1) == ((m2, sig2, m2 - sig2)), s"second row: ${u2(1)}")
  }

  test("B40 VaR/ES: exact tail means incl. partial bucket, tiny-n k=1 edge") {
    import spark.implicits._
    val rows =
      (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(_ => ("b", 2.00)) ++
      (Seq.fill(3)(1.00) ++ Seq.fill(97)(2.00)).map(("d", _))
    val ev = rows.toDF("event_type", "value")
    val got = graft.operators.Resilience.varEs(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a: n=100, k=5, VaR = 5.00, ES = mean(1..5) = 3.00
    assert(got("a") == ((100L, 5.0, 3.0)), s"a: ${got("a")}")
    // b: n=10, k=1, VaR = ES = the single smallest value
    assert(got("b") == ((10L, 2.0, 2.0)), s"b: ${got("b")}")
    // d: k=5 splits the VaR bucket — 3×1.00 below + 2×2.00 at VaR
    assert(got("d") == ((100L, 2.0, 1.4)), s"d: ${got("d")}")
  }

  test("A61 mutual information: exact 0 under independence, ln 2 under identity") {
    import spark.implicits._
    import graft.operators.Relational
    // uniform 2×2 product distribution: every cell's log ratio is ln 1
    val ind = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("x", "y")
    val r0 = Relational.mutualInfoOn(ind, col("x"), col("y")).collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(2)) == ((4L, 4L, 0.0)))
    // y determined by x over 2 uniform classes: I = H = ln 2
    val dep = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("x", "y")
    val r1 = Relational.mutualInfoOn(dep, col("x"), col("y")).collect()(0)
    assert((r1.getLong(1), r1.getDouble(2)) == ((2L, 0.693147)))
  }

  test("A62 count-min: estimates never undercount, lone-key stream is exact") {
    import spark.implicits._
    import graft.operators.Relational
    val df = (Seq.fill(40)(7L) ++ Seq.fill(30)(9L) ++ (100L to 140L))
      .toDF("user_id")
    val got = Relational.countMinOn(df, col("user_id")).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"undercount: $r")
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2))
    }
    // the two heavy keys rank first with their exact true counts
    assert((got(0).getLong(1), got(0).getLong(2)) == ((7L, 40L)))
    assert((got(1).getLong(1), got(1).getLong(2)) == ((9L, 30L)))
    // a lone key owns all four of its lanes → estimate exact
    val solo = Seq.fill(5)(42L).toDF("user_id")
    val g2 = Relational.countMinOn(solo, col("user_id")).collect()
    assert(g2.length == 1 && g2(0).getLong(3) == 5L && g2(0).getLong(4) == 0L)
  }

  test("A65 ABC: hand-built 80/15/5 revenue splits classify exactly at the boundaries") {
    import spark.implicits._
    import graft.operators.Relational
    val dir = java.nio.file.Files.createTempDirectory("abc").toString
    Seq((1L, 0.80, 0.0), (2L, 0.15, 0.0), (3L, 0.05, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.abcPareto(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cum(A) = exactly 80% and cum(B) = exactly 95% — boundaries are
    // inclusive by the cross-multiplied integer predicate
    assert(got == Map("A" -> ((1L, 8000L, 800000L)),
      "B" -> ((1L, 1500L, 150000L)),
      "C" -> ((1L, 500L, 50000L))), s"got: $got")
  }

  test("B57 DiD: hand-built 2x2 cells give did = 9000 cents, z = 4.5") {
    import spark.implicits._
    import graft.operators.Resilience
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    def o(pri: String, day: String, v: Double) = (pri, java.sql.Date.valueOf(day), v)
    Seq(o("1-URGENT", "1994-06-01", 90.0), o("1-URGENT", "1994-06-02", 110.0),
      o("1-URGENT", "1995-06-01", 190.0), o("1-URGENT", "1995-06-02", 210.0),
      o("5-LOW", "1994-06-01", 40.0), o("5-LOW", "1994-06-02", 60.0),
      o("5-LOW", "1995-06-01", 50.0), o("5-LOW", "1995-06-02", 70.0))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Resilience.didEventStudy(spark, dir).collect()(0)
    // treated: 100 -> 200 dollars, control: 50 -> 60; each cell var =
    // 2e6 cents^2 -> se = 2000 cents, did = 9000 cents, z = 4.5
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 2L)))
    assert(r.getDouble(4) == 10000.0 && r.getDouble(5) == 1000.0, s"d: $r")
    assert(r.getDouble(6) == 9000.0 && r.getDouble(7) == 4.5 &&
      r.getLong(8) == 1L, s"z: $r")
  }

  test("B58 Nelson-Aalen: single event time gives H = d/n exactly") {
    import spark.implicits._
    import graft.operators.Resilience
    // the B54 construction: 3 churners at 1h among 7 at risk
    def ev(rows: Seq[(Long, Int)]) = rows.zipWithIndex.map {
        case ((u, h), i) => (u, i.toLong, h) }
      .toDF("user_id", "event_id", "h")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, h)"))
      .select("user_id", "event_id", "ts")
    val a = ev(Seq(1L -> 0, 1L -> 1, 3L -> 0, 3L -> 1, 5L -> 0, 5L -> 1,
      0L -> 0, 0L -> 100, 2L -> 0, 2L -> 99, 4L -> 0, 4L -> 99,
      6L -> 0, 6L -> 99))
    val got = Resilience.nelsonAalen(a).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getDouble(3)) == ((1L, 7L, 3L, 0.428571)), s"got: ${got(0)}")
  }

  test("A66 price index: two-part basket gives L = P = Fisher = 1.2 exactly") {
    import spark.implicits._
    import graft.operators.Relational
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    def li(p: Long, day: String, qty: Double, ext: Double) =
      (p, java.sql.Timestamp.valueOf(s"$day 00:00:00"), qty, ext)
    Seq(li(1L, "1996-03-01", 10.0, 100.0), li(1L, "1997-03-01", 5.0, 60.0),
      li(2L, "1996-03-01", 4.0, 20.0), li(2L, "1997-03-01", 8.0, 48.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.priceIndex(spark, dir).collect()(0)
    // unit prices $10->$12 and $5->$6: both +20%, all three indices 1.2
    assert(r.getLong(0) == 2L)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((1.2, 1.2, 1.2)), s"got: $r")
  }

  test("C60 feed audit: re-deliveries and inversions fire, a clean feed passes") {
    import spark.implicits._
    import graft.operators.Cdc
    def mk(rows: Seq[(Long, Long, Long)]) = rows
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
      .select("user_id", "event_id", "ts")
    // dirty: event 11 delivered twice, and id order 12→13 runs
    // 5 s backwards in event time
    val dirty = mk(Seq((1L, 10L, 1000000L), (1L, 11L, 2000000L),
      (1L, 11L, 2000000L), (1L, 12L, 9000000L), (1L, 13L, 4000000L)))
    val d = Cdc.feedAudit(dirty).collect()(0)
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3)) ==
      ((5L, 4L, 1L, 1L)), s"dirty: $d")
    assert(d.getLong(5) == 5000000L && d.getLong(6) == 0L, s"dirty: $d")
    // clean: unique ids, monotone time
    val clean = mk(Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 1L)))
    val c = Cdc.feedAudit(clean).collect()(0)
    assert(c.getLong(2) == 0L && c.getLong(3) == 0L && c.getLong(6) == 1L,
      s"clean: $c")
  }

  test("C58 Markov entropy: a deterministic chain scores H = 0, perplexity 1") {
    import spark.implicits._
    import graft.operators.Cdc
    // one user alternating a->b within one session: every row of the
    // transition matrix is a point mass
    val ev = (0 until 10).map(i =>
        (1L, i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0,0,0,0,0,event_id)"))
      .withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val r = Cdc.markovEntropy(ev).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"shape: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0, s"h: $r")
  }

  test("A63 k-anonymity: small class fails both flags, broad class passes") {
    import spark.implicits._
    import graft.operators.Relational
    // class A: 60 rows from 25 users (k=50 ok, l=20 ok);
    // class B: 10 rows from 2 users (fails both)
    val rows =
      (0 until 60).map(i => (("a", (i % 25).toLong, 1))) ++
        (0 until 10).map(i => (("b", (i % 2).toLong, 1)))
    val df = rows.map { case (t, u, h) => (t, u, h) }
      .toDF("event_type", "user_id", "h")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, h)"))
      .select("event_type", "user_id", "ts")
    val got = Relational.kAnonymity(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("a") == ((60L, 25L, 1L, 1L)), s"a: ${got("a")}")
    assert(got("b") == ((10L, 2L, 0L, 0L)), s"b: ${got("b")}")
  }

  // crafted events frame: daily counts per type via repeated rows
  private def dailyEvents(specs: (String, Seq[Int])*) = {
    import spark.implicits._
    specs.flatMap { case (t, daily) => daily.zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(j =>
        (t, (t.hashCode.toLong << 16) + d * 100 + j, d, j)) } }
      .toDF("event_type", "event_id", "d", "j")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, j)"))
      .withColumn("user_id", expr("1L")).withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
  }

  test("B52 isotonic: textbook PAVA pooling, already-monotone series unchanged") {
    import graft.operators.Resilience
    // y = 1,3,2,4 → PAVA pools the violator pair: 1, 2.5, 2.5, 4
    val got = Resilience.isotonic(dailyEvents("a" -> Seq(1, 3, 2, 4)))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1.0), (3L, 2.5), (2L, 2.5), (4L, 4.0)),
      s"got: ${got.toSeq}")
    // monotone input is its own isotonic fit
    val mono = Resilience.isotonic(dailyEvents("m" -> Seq(1, 2, 5)))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(mono.toSeq == Seq((1L, 1.0), (2L, 2.0), (5L, 5.0)))
  }

  test("B53 cointegration: mean-reverting residual flags, perfect fit nulls") {
    import graft.operators.Resilience
    // clicks 1..6, views = clicks + alternating ±1 noise → OLS
    // beta = 87/105, alpha = 0.6; residuals alternate sign, so the
    // DF step sees strong mean reversion → cointegrated
    val ev = dailyEvents("click" -> Seq(1, 2, 3, 4, 5, 6),
      "view" -> Seq(2, 1, 4, 3, 6, 5))
    val r = Resilience.cointegration(ev).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L, s"n: $r")
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == 0.828571, s"ab: $r")
    assert(r.getDouble(4) < 0.0, s"rho: $r")
    assert(r.getDouble(5) < -3.34 && r.getLong(6) == 1L, s"t: $r")
    // views = 2*clicks exactly → zero residuals → degenerate DF nulls
    val perfect = dailyEvents("click" -> Seq(1, 2, 3),
      "view" -> Seq(2, 4, 6))
    val p = Resilience.cointegration(perfect).collect()(0)
    assert(p.isNullAt(4) && p.isNullAt(5) && p.isNullAt(6), s"p: $p")
  }

  test("B54 logrank: hand-computed chi2 = 6, symmetric groups score 0") {
    import spark.implicits._
    import graft.operators.Resilience
    def ev(rows: Seq[(Long, Int)]) = rows.zipWithIndex.map {
        case ((u, h), i) => (u, i.toLong, h) }
      .toDF("user_id", "event_id", "h")
      .withColumn("ts",
        expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, h)"))
      .withColumn("event_type", expr("'x'")).withColumn("value", expr("1.0"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    // grp1 = users 1,3,5 churn at 1h; grp0 = users 0,2,4,6 censored →
    // single event time with n=7, n1=3, d=d1=3: chi2 = 294/49 = 6
    val a = ev(Seq(1L -> 0, 1L -> 1, 3L -> 0, 3L -> 1, 5L -> 0, 5L -> 1,
      0L -> 0, 0L -> 100, 2L -> 0, 2L -> 99, 4L -> 0, 4L -> 99,
      6L -> 0, 6L -> 99))
    val ra = Resilience.logRank(a).collect()(0)
    assert((ra.getLong(0), ra.getLong(1), ra.getLong(2), ra.getLong(3)) ==
      ((4L, 3L, 1L, 3L)), s"a: $ra")
    assert(ra.getDouble(4) == 1.2857 && ra.getDouble(5) == 6.0 &&
      ra.getLong(6) == 1L, s"a: $ra")
    // one churner and one survivor per parity → O1 = E1 → chi2 = 0
    val b = ev(Seq(1L -> 0, 1L -> 1, 2L -> 0, 2L -> 1,
      3L -> 0, 3L -> 50, 4L -> 0, 4L -> 50))
    val rb = Resilience.logRank(b).collect()(0)
    assert(rb.getDouble(5) == 0.0 && rb.getLong(6) == 0L, s"b: $rb")
  }

  test("B61 halflife: geometric decay fits phi exactly, divergence and constants null out") {
    import graft.operators.Resilience
    val got = Resilience.halflife(dailyEvents(
        "decay" -> Seq(64, 32, 16, 8, 4),  // y_t = 0.5 y_{t-1} exactly
        "explode" -> Seq(1, 2, 4, 8, 16),  // phi = 2 -> no reversion
        "flat" -> Seq(3, 3, 3, 3)))        // zero lag variance -> no fit
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got("decay") == ((0.5, Some(1.0))), s"decay: ${got("decay")}")
    assert(got("explode")._1 == 2.0 && got("explode")._2.isEmpty)
    assert(!got.contains("flat"), "constant series must be excluded")
  }

  test("B66 garch: hand-folded variance recursion exact, constant series excluded") {
    import graft.operators.Resilience
    val got = Resilience.garch(dailyEvents(
        "osc" -> Seq(2, 4, 2, 4),
        "flat" -> Seq(4, 4, 4, 4)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(!got.contains("flat"), "zero-variance series must be excluded")
    // replicate the exact double sequence: mu=3, var0=16/12, om=(1-.1-.8)*var0
    val mu = 12.0 / 4.0; val var0 = 16.0 / 12.0
    val om = (1.0 - 0.1 - 0.8) * var0
    def step(s2: Double, pv: Double) =
      om + 0.1 * (pv - mu) * (pv - mu) + 0.8 * s2
    val s2a = step(var0, 2.0); val s2b = step(s2a, 4.0)
    val s2c = step(s2b, 2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("osc") == ((4L, r6(var0), r6(s2c),
      r6(Seq(var0, s2a, s2b, s2c).max))), s"got ${got("osc")}")
  }

  test("B68 kruskal-wallis: hand-ranked H exact, tie correction rescales") {
    import graft.operators.Resilience
    // no ties: a={1,2} b={3,4} -> ranks 1,2|3,4; Ra=3, Rb=7
    // H = 12/(4*5)*(9/2 + 49/2) - 3*5 = 2.4; C = 1
    val r1 = Resilience.kruskalWallis(dailyEvents(
      "a" -> Seq(1, 2), "b" -> Seq(3, 4))).collect()
    assert(r1.length == 1)
    assert((r1(0).getLong(0), r1(0).getLong(1), r1(0).getLong(2),
      r1(0).getDouble(3), r1(0).getDouble(4)) == ((2L, 4L, 1L, 2.4, 2.4)))
    // ties: a={1,1} b={2} -> avg ranks 1.5,1.5,3; H = 1.5;
    // tie3 = 2^3-2 = 6, C = 1 - 6/24 = 0.75, Hc = 2.0
    val r2 = Resilience.kruskalWallis(dailyEvents(
      "a" -> Seq(1, 1), "b" -> Seq(2))).collect()
    assert((r2(0).getDouble(3), r2(0).getDouble(4)) == ((1.5, 2.0)))
  }

  test("B69 friedman: within-day ranks exact, incomplete blocks drop") {
    import graft.operators.Resilience
    // 3 complete days: ranks a=(1,1,3) b=(2,2,2) c=(3,3,1) ->
    // Rj = 5,6,7; chi2 = 12/(3*3*4)*110 - 36 = 2/3
    val r1 = Resilience.friedman(dailyEvents(
      "a" -> Seq(1, 1, 3), "b" -> Seq(2, 2, 2),
      "c" -> Seq(3, 3, 1))).collect()
    assert(r1.length == 1)
    assert((r1(0).getLong(0), r1(0).getLong(1), r1(0).getLong(2),
      r1(0).getDouble(3)) == ((3L, 3L, 2L, 0.666667)))
    // tie inside day0 (2,2 -> rank2 3,3), day1 ranks 1,2:
    // Rj2 = 5,7 -> chi2 = 3*74/(2*2*3) - 18 = 0.5
    val r2 = Resilience.friedman(dailyEvents(
      "a" -> Seq(2, 1), "b" -> Seq(2, 3))).collect()
    assert(r2(0).getDouble(3) == 0.5)
    // a day missing one type is not a complete block: with only one
    // block left the test is undefined -> empty frame
    val r3 = Resilience.friedman(dailyEvents(
      "a" -> Seq(2, 5), "b" -> Seq(2))).collect()
    assert(r3.isEmpty)
  }

  test("B75 durbin-watson: cleared-coefficient residuals exact, perfect fit drops") {
    import graft.operators.Resilience
    // alternating 2,1,...: E = (896,-1664,1152,-1408,1408,-1152,
    // 1664,-896) -> see = 13762560, sd2 = 50003968
    val got = Resilience.durbinWatson(dailyEvents(
        "alt" -> Seq(2, 1, 2, 1, 2, 1, 2, 1),
        "lin" -> (1 to 8)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains("lin"), "zero-residual fit must drop")
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("alt") == ((8L, r6(50003968.0 / 13762560.0))),
      s"got ${got("alt")}")
  }

  test("C73 growth accounting: four flows exact, churn lands on the month missed") {
    import spark.implicits._
    val rows = Seq((1L, "2024-01-15"), (1L, "2024-02-03"),
      (1L, "2024-04-09"), (2L, "2024-01-20"), (3L, "2024-02-11"),
      (3L, "2024-04-25"))
    val df = rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .withColumn("ts", expr("to_timestamp(d)"))
      .withColumn("event_type", expr("'view'"))
    val got = graft.operators.Cdc.growthAccounting(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("2024-01") == ((2L, 2L, 0L, 0L, 0L)), s"${got("2024-01")}")
    // u1 retained, u3 new; u2 churned into february
    assert(got("2024-02") == ((2L, 1L, 1L, 0L, 1L)), s"${got("2024-02")}")
    // both actives resurrect after the march gap; march itself has
    // no activity row, so u1/u3's churn-into-march is not reported
    // (stated precondition)
    assert(got("2024-04") == ((2L, 0L, 0L, 2L, 0L)), s"${got("2024-04")}")
    assert(!got.contains("2024-03"))
  }

  test("C74 stickiness: mean-DAU over MAU exact, repeat visits within a day collapse") {
    import spark.implicits._
    // jan: u1 active day1+day2 (two events day1 collapse), u2 day1
    // -> DAU 2,1 over 2 present days, MAU 2:
    // stickiness = 3*1e6 div (2*2) = 750000
    val rows = Seq((1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-02 08:00:00"), (2L, "2024-01-01 10:00:00"))
    val df = rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .withColumn("ts", expr("to_timestamp(d)"))
      .withColumn("event_type", expr("'view'"))
    val r = graft.operators.Cdc.stickiness(df).collect()(0)
    assert(r.toSeq == Seq("2024-01", 2L, 2L, 750000L), s"got $r")
  }

  test("B74 pettitt: rank change-point exact via the telescoped V identity") {
    import graft.operators.Resilience
    // 1,1,1,1,5,5,5,5: V = -4 x4 then +4 x4, U = 4,8,12,16,12,8,4
    // -> K = 16 at day 4; flat series: K = 0, p capped at 1
    val got = Resilience.pettitt(dailyEvents(
        "shift" -> Seq(1, 1, 1, 1, 5, 5, 5, 5),
        "flat" -> Seq.fill(8)(2)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3),
          r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val p = r6(math.min(1.0, 2.0 * math.exp(-6.0 * 256.0 / 576.0)))
    assert(got("shift") == ((8L, "2024-01-04", 16L, p)),
      s"shift: ${got("shift")}")
    assert(got("flat") == ((8L, "2024-01-01", 0L, 1.0)),
      s"flat: ${got("flat")}")
  }

  test("A70 simpson: per-stratum reversal against the pooled direction flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("simp").toString
    // Berkeley shape: both strata favor non-urgent (ad-bc < 0) while
    // the pooled table favors urgent (150 > 0)
    def arm(nation: Long, urgent: Boolean, nf: Int, nOther: Int) =
      (0 until nf).map(_ => (nation, urgent, "F")) ++
        (0 until nOther).map(_ => (nation, urgent, "O"))
    val rows = arm(1, true, 1, 9) ++ arm(1, false, 3, 17) ++
      arm(2, true, 16, 4) ++ arm(2, false, 9, 1)
    rows.zipWithIndex.map { case ((n, u, st), i) =>
        (i.toLong, n * 1000, if (u) "1-URGENT" else "3-MEDIUM", st) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1000L, 1L), (2000L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = graft.operators.Relational.simpson(spark, dir).collect()(0)
    // pooled: a=17 b=13 c=12 d=18 -> or = 306/156, sign +1;
    // both strata sign -1 -> flipped = 2, flag = 1
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq == Seq(2L, r6(306.0 / 156.0), 1L, 0L, 2L, 0L, 1L),
      s"got $r")
  }

  test("A71 last digit: uniform cents quiet, missing cells still deviate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("digit").toString
    // two full 0..9 cycles: chi2 = 0
    (0 until 20).map(i => (i.toLong, (100 + i % 10) / 100.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ok = graft.operators.Relational.lastDigit(spark, dir).collect()(0)
    assert(ok.toSeq == Seq(20L, 10L, 0.0, 0L), s"got $ok")
    // every amount ends in 0: the 9 ABSENT cells must still count
    // -> chi2 = (180^2 + 9*20^2)/200 = 180
    (0 until 20).map(i => (i.toLong, 1.00 + i))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val bad = graft.operators.Relational.lastDigit(spark, dir).collect()(0)
    assert(bad.toSeq == Seq(20L, 1L, 180.0, 1L), s"got $bad")
  }

  test("C70 cuped: hand moments exact, adjusted delta shrinks toward the true effect") {
    import spark.implicits._
    // window days 0..3, mid = 2: x = pre count, y = post count
    // u0:(2,4) u2:(1,2) even arm; u1:(3,7) u3:(2,5) odd arm
    val spec = Seq(
      (0L, Seq(0, 1, 2, 2, 3, 3)), (2L, Seq(0, 2, 3)),
      (1L, Seq(0, 0, 1, 2, 2, 2, 3, 3, 3, 3)), (3L, Seq(1, 1, 2, 2, 2, 2, 2)))
    val df = spec.flatMap { case (u, days) => days.zipWithIndex.map {
        case (d, i) => (u * 1000 + i, u, "view", d, i) } }
      .toDF("event_id", "user_id", "event_type", "d", "sec")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, sec)"))
    val r = graft.operators.Cdc.cuped(df).collect()(0)
    // covn = 20, varx = 8, vary = 52 -> theta 2.5, rho2 400/416
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq == Seq(4L, 2L, 2L, 2.5, r6(400.0 / 416.0), 3.0, 0.5),
      s"got $r")
  }

  test("C71 srm: balanced split quiet, broken split pages") {
    import spark.implicits._
    def evs(uids: Seq[Long]) = uids.zipWithIndex
      .map { case (u, i) => (i.toLong, u, "view") }
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", expr("to_timestamp('2024-01-01')"))
    // 2 even vs 3 odd users: chi2 = 1/5, no flag
    val ok = graft.operators.Cdc.srm(evs(Seq(0L, 2L, 1L, 3L, 5L)))
      .collect()(0)
    assert(ok.toSeq == Seq(5L, 2L, 3L, 0.2, 0L), s"got $ok")
    // 30 even, 0 odd: chi2 = 30 -> flag
    val bad = graft.operators.Cdc.srm(evs((0L until 60L by 2)))
      .collect()(0)
    assert((bad.getDouble(3), bad.getLong(4)) == ((30.0, 1L)), s"got $bad")
  }

  test("C69 slo burn: alert needs both windows over budget, day gaps shrink the frame") {
    import spark.implicits._
    def evs(d: Int, errs: Int, tot: Int) = (0 until tot).map(i =>
      (d.toLong * 100 + i, 1L, if (i < errs) "error" else "view", d, i))
    val df = (evs(0, 1, 4) ++ evs(1, 1, 4) ++ evs(2, 1, 4) ++
      evs(3, 3, 4) ++ evs(10, 2, 4))
      .toDF("event_id", "user_id", "event_type", "d", "sec")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, sec)"))
    val got = graft.operators.Cdc.sloBurn(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // exactly-at-SLO days do not alert (strict >); day 3 burns both
    // windows; the gap leaves day 10's 7-day frame holding only itself
    assert(got("2024-01-01") == ((250000L, 250000L, 0L)))
    assert(got("2024-01-04") == ((750000L, 375000L, 1L)),
      s"day3: ${got("2024-01-04")}")
    assert(got("2024-01-11") == ((500000L, 500000L, 1L)),
      s"day10: ${got("2024-01-11")}")
  }

  test("B73 arch-lm: hand regression exact, zero-variance residuals excluded") {
    import graft.operators.Resilience
    // burst 2,2,2,2,6,2,2,2,2: z = 16 x8, 1024; the lag-1 regression
    // gives num = -1016064, d1 = d2 = 7112448 = 7|num| -> R^2 = 1/49
    val got = Resilience.archLm(dailyEvents(
        "burst" -> Seq(2, 2, 2, 2, 6, 2, 2, 2, 2),
        "flat" -> Seq.fill(9)(3)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(!got.contains("flat"), "constant squared residuals must drop")
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val num = -1016064.0; val d = 7112448.0
    val lm = r6(8.0 * (num * num / (d * d)))
    assert(got("burst") == ((8L, lm, 0L)), s"got ${got("burst")}")
  }

  test("C68 dwell: gap to the user's next event lands on the state left, terminals drop") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, 10L, t(0), "view"), (1L, 11L, t(10), "click"),
      (1L, 12L, t(40), "purchase"),
      (2L, 20L, t(5), "view"), (2L, 21L, t(25), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.operators.Cdc.dwell(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // view dwells: u1 10s, u2 20s; click: 30s; purchase terminal
    assert(!got.contains("purchase"), "terminal events carry no dwell")
    assert(got("view") == ((2L, 30000000L, 20000000L, 15000000.0)),
      s"view: ${got("view")}")
    assert(got("click") == ((1L, 30000000L, 30000000L, 30000000.0)),
      s"click: ${got("click")}")
  }

  test("B71 variance ratio: alternating series mean-reverts, perfect trend excluded") {
    import graft.operators.Resilience
    // trend: every 1-diff equals mu-hat -> A = 0, excluded
    // alt 2,1,2,...: n=9, D=-1; A = 5*64+4*100 = 720;
    // B2 = 8*4 = 32; B4 = 6*16 = 96
    val got = Resilience.varianceRatio(dailyEvents(
        "alt" -> Seq(2, 1, 2, 1, 2, 1, 2, 1, 2, 1),
        "trend" -> (1 to 10)))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(!got.keys.exists(_._1 == "trend"), "zero-A series must drop")
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val vr2 = 32.0 / (720.0 * 2); val vr4 = 96.0 / (720.0 * 4)
    val z2 = (vr2 - 1.0) * math.sqrt(9.0) /
      math.sqrt((2.0 * 3 * 1) / 6.0)
    val z4 = (vr4 - 1.0) * math.sqrt(9.0) /
      math.sqrt((2.0 * 7 * 3) / 12.0)
    assert(got(("alt", 2L)) == ((9L, r6(vr2), r6(z2))),
      s"q=2: ${got(("alt", 2L))}")
    assert(got(("alt", 4L)) == ((9L, r6(vr4), r6(z4))),
      s"q=4: ${got(("alt", 4L))}")
  }

  test("B72 levene: median-centered spreads exact, all-constant groups degenerate") {
    import graft.operators.Resilience
    // a = {1,5,9}: med 5, Z2 = 8,0,8; b = {3,3,3,3}: med2 6, Z2 = 0
    val got = Resilience.levene(dailyEvents(
      "a" -> Seq(1, 5, 9), "b" -> Seq(3, 3, 3, 3))).collect()
    assert(got.length == 1)
    val ssn = (0.0 + 256.0 / 3.0) + 0.0
    val between = ssn - 256.0 / 7.0
    val within = (0.0 + (128.0 - 256.0 / 3.0)) + 0.0
    val w = (5.0 / 1.0) * (between / within)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3), got(0).getDouble(4)) == ((2L, 7L, 1L, 5L, r6(w))),
      s"got ${got(0)}")
    // every group constant -> within = 0 -> undefined, empty frame
    val r0 = Resilience.levene(dailyEvents(
      "a" -> Seq(2, 2, 2), "b" -> Seq(5, 5))).collect()
    assert(r0.isEmpty)
  }

  test("B70 jarque-bera: shifted-moment skew/kurtosis exact, flat series excluded") {
    import graft.operators.Resilience
    val got = Resilience.jarqueBera(dailyEvents(
        "a" -> Seq(1, 2, 3, 6), "flat" -> Seq(4, 4, 4, 4)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(!got.contains("flat"), "zero-variance series must be excluded")
    // shift = 12 div 4 = 3, residuals (-2,-1,0,3):
    // s2=14 s3=18 s4=98 -> m2=3.5 m3=4.5 m4=24.5
    val m2 = 3.5; val m3 = 4.5; val m4 = 24.5
    val sk = m3 / (m2 * math.sqrt(m2)); val ku = m4 / (m2 * m2)
    val jb = 4.0 / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((4L, r6(sk), r6(ku), r6(jb))), s"got ${got("a")}")
  }

  test("C65 interarrival: day-split gap multiset equals the sorted-sequence gaps") {
    import spark.implicits._
    // day0 seconds 0,10,10,40 then day1 second 0: gaps 10s, 0, 30s
    // in-day + 86360s across the boundary
    val df = Seq((0, 0), (0, 10), (0, 10), (0, 40), (1, 0))
      .zipWithIndex.map { case ((d, sec), i) => (i.toLong, 1L, "a", d, sec) }
      .toDF("event_id", "user_id", "event_type", "d", "sec")
      .withColumn("ts", expr(
        "to_timestamp('2024-01-01') + make_interval(0, 0, 0, d, 0, 0, sec)"))
    val r = graft.operators.Cdc.interarrival(df).collect()(0)
    val gaps = Seq(10L, 0L, 30L, 86360L).map(_ * 1000000L)
    val n = gaps.length.toLong; val sg = gaps.sum
    val sq = gaps.map(g => BigInt(g) * g).sum
    val mean = sg.toDouble / n.toDouble
    val sd = math.sqrt((BigDecimal(n * sq - sg * BigInt(sg))).toDouble /
      (n * (n - 1)).toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == (("a", n, r6(mean), r6(sd / mean),
      r6((sd - mean) / (sd + mean)))), s"got $r")
  }

  test("C66 mcnemar: only discordant users decide, concordant-only feed is null") {
    import spark.implicits._
    def evs(rows: (Long, String)*) = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", expr("to_timestamp('2024-01-01')"))
    // u1 click-only; u2-u4 purchase-only; u5 both; u6 neither
    val r = graft.operators.Cdc.mcnemar(evs(
      1L -> "click", 2L -> "purchase", 3L -> "purchase", 4L -> "purchase",
      5L -> "click", 5L -> "purchase", 6L -> "view")).collect()(0)
    // chi2 = (|1-3|-1)^2 / 4 = 0.25
    assert(r.toSeq == Seq(6L, 1L, 1L, 3L, 0.25, 0L), s"got $r")
    val nul = graft.operators.Cdc.mcnemar(evs(
      1L -> "click", 1L -> "purchase")).collect()(0)
    assert(nul.isNullAt(4) && nul.getLong(5) == 0L, s"got $nul")
  }

  test("B67 control chart: moving-range limits catch the spike, 8-run rule fires both sides") {
    import graft.operators.Resilience
    val got = Resilience.controlChart(dailyEvents(
        "spike" -> Seq(10, 10, 10, 10, 50),
        "shift" -> (Seq.fill(8)(1) ++ Seq.fill(8)(3))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(5), r.getLong(6)))).toMap
    // spike: mRbar = 40/4 = 10, ucl = 18 + 26.6 = 44.6 -> one y=50 out;
    // runs need 8 days of history on one side: none
    assert(got("spike") == ((5L, 1L, 0L)), s"spike: ${got("spike")}")
    // shift: limits hug ybar (mRbar = 2/15) so BOTH levels violate;
    // the run rule fires at day 8 (all-below) and day 16 (all-above)
    assert(got("shift") == ((16L, 16L, 2L)), s"shift: ${got("shift")}")
  }

  test("B62 croston: hand-folded intermittent series exact, single demand excluded") {
    import graft.operators.Resilience
    // demands 4@d0, 6@d10, 2@d12 -> z: 4 -> 4.2 -> 3.98;
    // p: 1 -> 1+0.1(10-1)=1.9 -> 1.9+0.1(2-1.9)=1.91
    val got = Resilience.croston(dailyEvents(
        "int" -> (Seq(4) ++ Seq.fill(9)(0) ++ Seq(6, 0, 2)),
        "one" -> Seq(7)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(!got.contains("one"), "single-demand series must be excluded")
    val (n, z, p, sba) = got("int")
    assert(n == 3L && z == 3.98 && p == 1.91)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sba == r6(0.95 * 3.98 / 1.91), s"sba $sba")
  }

  test("B63 dispersion: constant series index 0, alternation overdisperses with exact VMR") {
    import graft.operators.Resilience
    val got = Resilience.dispersion(dailyEvents(
        "const" -> Seq(2, 2, 2, 2),
        "burst" -> Seq(1, 5, 1, 5)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got("const") == ((4L, 8L, 0.0, 0L)))
    // n=4, S=12, Q=52: VMR = (4*52-144)/(3*12) = 64/36 exactly
    assert(got("burst") == ((4L, 12L, 64.0 / 36.0, 1L)))
  }

  test("B64 gumbel: known block maxima give the closed-form beta/mu/return level") {
    import graft.operators.Resilience
    // 62 daily counts spanning Jan/Feb/Mar 2024: block maxima 5, 8, 2
    val daily = Seq.tabulate(62) { d =>
      if (d == 10) 5 else if (d == 40) 8 else if (d >= 60) 2 else 1
    }
    val got = Resilience.gumbelFit(dailyEvents("g" -> daily)).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L)
    // n=3, S=15, Q=93 -> varn=54, s=sqrt(54/6)=3 exactly
    val beta = 3.0 * 0.7796968012336761
    val mu = 15.0 / 3.0 - 0.5772156649015329 * beta
    val ret = mu - beta * math.log(-math.log(0.9166666666666666))
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(2) == r4(beta), s"beta ${got(0).getDouble(2)}")
    assert(got(0).getDouble(3) == r4(mu))
    assert(got(0).getDouble(4) == r4(ret))
  }

  test("B60 chow: level shift at the midpoint fires, homogeneous series stays calm, short nulls") {
    import graft.operators.Resilience
    val got = Resilience.chowBreak(dailyEvents(
        // regime jump at t=5 with in-segment noise (perfect segment
        // fits would null the F by the sse>0 guard, by design)
        "brk" -> Seq(1, 2, 1, 2, 1, 9, 10, 9, 10, 9),
        "same" -> Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2),
        "short" -> Seq(1, 5, 2, 9)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("short")._3.isEmpty, "n<8 must null the F")
    assert(got("brk")._2 == 5L)
    val fBrk = got("brk")._3.get
    val fSame = got("same")._3.get
    assert(fBrk > 40.0, s"level shift must dominate: $fBrk")
    assert(fSame < 5.0 && fSame >= 0.0, s"homogeneous series: $fSame")
  }

  test("B65 kendall tau: perfect agreement 1, reversal -1, x-ties use the tau-b correction") {
    import graft.operators.Resilience
    def tau(click: Seq[Int], view: Seq[Int]): Option[Double] = {
      val r = Resilience.kendallTau(
        dailyEvents("click" -> click, "view" -> view)).collect()(0)
      if (r.isNullAt(3)) None else Some(r.getDouble(3))
    }
    assert(tau(Seq(1, 2, 3, 4), Seq(2, 3, 4, 5)).contains(1.0))
    assert(tau(Seq(1, 2, 3, 4), Seq(5, 4, 3, 2)).contains(-1.0))
    // C=2, tied_x=1: tau-b = 2/sqrt(2*3) = 0.816497 (6dp)
    assert(tau(Seq(1, 1, 2), Seq(1, 2, 3)).contains(0.816497))
    // all-tied x: zero denominator -> null
    assert(tau(Seq(2, 2, 2), Seq(1, 2, 3)).isEmpty)
  }

  test("B59 turning points: sawtooth maxes T, monotone zeroes it, ties count as neither") {
    import graft.operators.Resilience
    val got = Resilience.turningPoints(dailyEvents(
        "saw" -> Seq(1, 3, 1, 3, 1, 3),   // every interior point turns
        "mono" -> Seq(1, 2, 3, 4, 5, 6),  // none
        "tied" -> Seq(1, 2, 2, 1, 2)))    // plateaus are not extrema
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("saw") == ((6L, 4L)), s"saw: ${got("saw")}")
    assert(got("mono") == ((6L, 0L)), s"mono: ${got("mono")}")
    // 1,2,2,1,2: index 2 ties left (not strict), index 3 is a strict
    // minimum (2 > 1 < 2) — exactly one turning point
    assert(got("tied") == ((5L, 1L)), s"tied: ${got("tied")}")
  }

  test("B56 spectral entropy: flat spectrum nulls, pure cycle scores 0, bounds hold") {
    import graft.operators.Resilience
    val dir = java.nio.file.Files.createTempDirectory("sent").toString
    dailyEvents(
      "flat" -> Seq(2, 2, 2, 2, 2, 2, 2, 2),          // zero spectrum
      // pure period-4 pulse: n = 8 → kmax = 3; an exactly-periodic
      // signal carries mass only at multiples of n/period = 2, and
      // the Nyquist half lives at k = 4 (outside the range), so the
      // in-range spectrum is a single line at k = 2
      "cycle" -> Seq(1, 1, 5, 1, 1, 1, 5, 1),
      "mixed" -> Seq(1, 4, 2, 5, 1, 2, 6, 3))          // broadband
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Resilience.spectralEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // constant series: every harmonic power is 0 → tp = 0 → null
    assert(got("flat").isNullAt(5), s"flat: ${got("flat")}")
    // alternating series: all mass on k = n/2 = 4 → entropy exactly 0
    assert(got("cycle").getLong(3) == 2L, s"peak: ${got("cycle")}")
    assert(got("cycle").getDouble(5) == 0.0, s"cycle: ${got("cycle")}")
    // broadband: strictly inside (0, 1]
    val h = got("mixed").getDouble(5)
    assert(h > 0.0 && h <= 1.0, s"mixed: $h")
  }

  test("F39 DSIR ESS: uniform weights give ess == n, a dominant doc collapses it") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // crawl docs with IDENTICAL text → identical logw → ess = n exactly
    val uniform = (Seq((0L, "alpha beta"), (50L, "alpha beta")) ++
      (1L to 4L).map(i => (i, "alpha gamma delta")))
      .toDF("doc_id", "text")
    val u = TextAnalysis.dsirEss(uniform).collect()(0)
    assert(u.getLong(0) == 4L && u.getDouble(1) == 4.0 &&
      u.getDouble(2) == 1.0, s"uniform: $u")
    // one target-matching doc among junk → that doc dominates
    val skew = (Seq((0L, "alpha beta gamma delta"),
      (50L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta")) ++
      (2L to 9L).map(i => (i, s"zz$i qq$i ww$i rr$i")))
      .toDF("doc_id", "text")
    val k = TextAnalysis.dsirEss(skew).collect()(0)
    assert(k.getLong(0) == 9L, s"skew n: $k")
    assert(k.getDouble(1) < 2.0, s"skew ess not collapsed: $k")
  }

  test("B55 BH-FDR: flat series is a sure null, trend survives, step-up monotone") {
    import graft.operators.Resilience
    val dir = java.nio.file.Files.createTempDirectory("fdr").toString
    dailyEvents("up" -> Seq(1, 2, 3, 4, 5, 6, 7, 8),
      "flat" -> Seq(2, 2, 2, 2, 2, 2, 2, 2),
      "mild" -> Seq(2, 1, 3, 2, 4, 1, 3, 2))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Resilience.fdrBh(spark, dir).collect()
    assert(got.length == 3)
    val byType = got.map(r => r.getString(0) -> r).toMap
    // z = 0 → two-sided p = 1 exactly, never rejected
    assert(byType("flat").getDouble(3) == 1.0 &&
      byType("flat").getLong(6) == 0L)
    // strong monotone trend: first rank, rejected even after BH
    assert(byType("up").getLong(4) == 1L && byType("up").getLong(6) == 1L)
    // step-up: p_adj is non-decreasing in rank and ≥ its raw p
    val byRank = got.sortBy(_.getLong(4))
    byRank.sliding(2).foreach { case Array(x, y) =>
      assert(x.getDouble(5) <= y.getDouble(5)) }
    byRank.foreach(r => assert(r.getDouble(5) >= r.getDouble(3) - 1e-12))
  }
}
