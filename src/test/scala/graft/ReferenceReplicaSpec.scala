package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Resilience
import graft.operators.Resilience.Series

/** Replays the reference's own scenario (resilience.py:29-70) on a
  * hand-built (Industry, Year, Real_Value) frame through the generic
  * Series API, asserting the exact values the pandas code produces:
  * Drawdown_2020 = (v2020-v2019)/v2019; Recovered_Years = first year
  * in 2020..2023 with value >= v2019, else None. */
class ReferenceReplicaSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def frame() = {
    import spark.implicits._
    // Three industries, 2019-2023:
    //  - Satellites: drops 20% in 2020, recovers in 2022
    //  - Launch: drops 50%, never recovers by 2023
    //  - Ground: no drop at all (recovers immediately in 2020)
    Seq(
      ("Satellites", 2019L, 100.0), ("Satellites", 2020L, 80.0),
      ("Satellites", 2021L, 95.0), ("Satellites", 2022L, 104.0),
      ("Satellites", 2023L, 110.0),
      ("Launch", 2019L, 200.0), ("Launch", 2020L, 100.0),
      ("Launch", 2021L, 120.0), ("Launch", 2022L, 150.0),
      ("Launch", 2023L, 180.0),
      ("Ground", 2019L, 50.0), ("Ground", 2020L, 55.0),
      ("Ground", 2021L, 60.0), ("Ground", 2022L, 65.0),
      ("Ground", 2023L, 70.0),
      // NoBaseline has no 2019 row → reference's IndexError→continue
      ("NoBaseline", 2020L, 10.0), ("NoBaseline", 2021L, 12.0)
    ).toDF("Industry", "Year", "Real_Value")
  }

  private val series = () => Series(frame(), "Industry", "Year", "Real_Value")

  test("Drawdown_2020 matches resilience.py:39 per industry") {
    val got = Resilience.drawdownOn(series(), 2019L, 2020L)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got("Satellites").get == -0.2)
    assert(got("Launch").get == -0.5)
    assert(got("Ground").get == 0.1)
    assert(got("NoBaseline").isEmpty) // null drawdown without baseline
  }

  test("Recovered_Years matches resilience.py:59-66 per industry") {
    val got = Resilience.recoveryOn(series(), 2019L)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got("Satellites").get == 3L) // 2022 first >= 100
    assert(got("Launch").isEmpty)      // never back to 200
    assert(got("Ground").get == 1L)    // 2020 already >= 50
    assert(!got.contains("NoBaseline")) // dropped like the reference
  }

  test("combined outer merge matches resilience.py:76 shape") {
    val df = Resilience.resilienceOn(series(), 2019L, 2020L)
    assert(df.columns.toSeq == Seq("Industry", "drawdown", "recovered_years"))
    assert(df.count() == 4) // outer: NoBaseline kept with null recovery
  }

  test("shock simulator projects the trend and prices in the shock") {
    val got = Resilience.shockSimOn(series(), 2019L,
      projectOffset = 5, shock = 0.40)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // Ground grows exactly +5/yr from 50: projection 2024 = 75 ($M/1e? —
    // values are already small so slope_m units are value/1e6; compare
    // ratio instead of absolute): shocked = projected * 0.6
    got.foreach { case (_, proj, shocked) =>
      assert(math.abs(shocked - proj * 0.6) < 1e-12)
    }
  }

  test("AR(1) forecast recovers exact coefficients on crafted series") {
    import spark.implicits._
    // geometric: y_t = 2^t -> phi = 2, c = 0, forecasts keep doubling;
    // mean-reverting: y_t = 50 + 0.5^t * 64 -> phi = 0.5, c = 25,
    // forecasts decay toward the 50 fixed point
    val df = Seq(
      ("geo", 1L, 2.0), ("geo", 2L, 4.0), ("geo", 3L, 8.0),
      ("geo", 4L, 16.0),
      ("rev", 1L, 82.0), ("rev", 2L, 66.0), ("rev", 3L, 58.0),
      ("rev", 4L, 54.0)).toDF("g", "p", "v")
    val got = Resilience.ar1ForecastOn(Series(df, "g", "p", "v"), 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(5), r.getDouble(6),
          r.getDouble(7))).toMap
    val (gphi, gc, g1, g2, g3) = got("geo")
    assert(gphi == 2.0 && gc == 0.0 && g1 == 32.0 && g2 == 64.0 && g3 == 128.0)
    val (rphi, rc, r1, r2, r3) = got("rev")
    assert(rphi == 0.5 && rc == 25.0)
    assert(r1 == 52.0 && r2 == 51.0 && r3 == 50.5,
      "forecast must decay toward the AR(1) fixed point c/(1-phi) = 50")
  }

  test("Holt smoothing is exact on linear and constant series; <2 periods excluded") {
    import spark.implicits._
    // perfect line: level locks to y_n, trend to the slope, forecasts
    // continue the line exactly (every fold op is FP-exact here);
    // constant: trend 0, forecasts flat; single point: no trend init
    val df = Seq(
      ("lin", 1L, 10.0), ("lin", 2L, 20.0), ("lin", 3L, 30.0),
      ("lin", 4L, 40.0),
      ("flat", 1L, 5.0), ("flat", 2L, 5.0), ("flat", 3L, 5.0),
      ("solo", 1L, 9.0)).toDF("g", "p", "v")
    val got = Resilience.holtOn(Series(df, "g", "p", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set("lin", "flat"), s"got ${got.keySet}")
    assert(got("lin") == ((4L, 40.0, 10.0, 50.0, 60.0, 70.0)), s"got ${got("lin")}")
    assert(got("flat") == ((3L, 5.0, 0.0, 5.0, 5.0, 5.0)), s"got ${got("flat")}")
  }

  test("Theil-Sen: exact on a line, immune to an outlier OLS would chase") {
    import spark.implicits._
    // clean: y = 5t + 3 for t = 1..9 → slope exactly 5.0, intercept 3.0
    val clean = (1L to 9L).map(t => ("clean", t, 5.0 * t + 3.0))
    // same line but t=9 is a wild outlier (y=1000): 8 of 9 points
    // still pairwise-agree on slope 5 → median slope stays 5.0 and
    // the median residual stays 3.0; OLS slope would jump to ~21
    val dirty = clean.init.map { case (_, t, v) => ("dirty", t, v) } :+
      (("dirty", 9L, 1000.0))
    val got = Resilience.theilSenOn(
        Series((clean ++ dirty).toDF("g", "p", "v"), "g", "p", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("clean") == ((9L, 36L, 5.0, 3.0)), s"clean: ${got("clean")}")
    assert(got("dirty")._3 == 5.0 && got("dirty")._4 == 3.0,
      s"outlier must not move the Sen estimates: ${got("dirty")}")
  }

  test("Kalman local-level: constant locks, gain hits steady state, LCG fold bit-equal") {
    import spark.implicits._
    // constant: every innovation is exactly 0 → level == c bitwise;
    // long series: gain must converge to the steady-state root
    // k* = pp*/(pp*+r) with pp* = (q+√(q²+4qr))/2
    var seed = 98765L
    val rnd = (1L to 40L).map { t =>
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ("rnd", t, math.floorMod(seed >> 33, 200L).toDouble)
    }
    val flat = (1L to 40L).map(t => ("flat", t, 42.0))
    val got = Resilience.kalmanOn(
        Series((flat ++ rnd).toDF("g", "p", "v"), "g", "p", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val f = got("flat")
    assert(f.getDouble(2) == 42.0, "constant series: level must lock exactly")
    val ppStar = (25.0 + math.sqrt(25.0 * 25.0 + 4 * 25.0 * 100.0)) / 2
    val kStar = ppStar / (ppStar + 100.0)
    assert(math.abs(f.getDouble(4) - kStar) < 1e-9,
      s"steady-state gain: got ${f.getDouble(4)}, want $kStar")
    // driver-side reference fold, identical op order — bit-equality
    val ys = rnd.map(_._3).toArray
    var l = ys(0); var p = 100.0; var k = 0.0
    for (x <- ys.drop(1)) {
      val pp = p + 25.0; k = pp / (pp + 100.0)
      l = l + k * (x - l); p = (1.0 - k) * pp
    }
    val r = got("rnd")
    assert(r.getDouble(2) == l && r.getDouble(3) == p && r.getDouble(4) == k,
      s"fold mismatch: got (${r.getDouble(2)}, ${r.getDouble(3)}, ${r.getDouble(4)})")
    assert(r.getDouble(5) == p + 25.0 + 100.0, "fvar1 = P + Q + R")
  }

  test("seasonal decompose recovers an exact linear trend + integer seasonal") {
    import spark.implicits._
    // y = 10·t + p[(t−1)%7], Σp = 0: the centered 7-MA of the linear
    // part is exactly 10·t, every window covers each position once, so
    // trend/seasonal/resid are all EXACT (integer FP arithmetic).
    val p = Array(3L, -2L, 5L, -1L, -4L, 1L, -2L)
    val rows = for (t <- 1L to 28L) yield ("g", t, 10L * t + p(((t - 1) % 7).toInt))
    val got = Resilience.seasonalDecomposeOn(
        Series(rows.toDF("g", "p", "v"), "g", "p", "v"))
      .orderBy($"p").collect()
    assert(got.length == 28)
    for (r <- got) {
      val t = r.getLong(1)
      if (t >= 4 && t <= 25) {
        assert(r.getDouble(3) == 10.0 * t, s"trend at t=$t")
        assert(r.getDouble(4) == p(((t - 1) % 7).toInt).toDouble, s"seasonal at t=$t")
        assert(r.getDouble(5) == 0.0, s"resid at t=$t")
      } else assert(r.isNullAt(3) && r.isNullAt(5), s"edge t=$t must be null")
    }
  }

  test("Holt-Winters: flat series is a fixed point; random series matches a driver fold") {
    import spark.implicits._
    val flat = (1L to 28L).map(t => ("flat", t, 9L))
    // deterministic pseudo-random integers (no Random — seeded LCG)
    var seed = 12345L
    val rnd = (1L to 30L).map { t =>
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ("rnd", t, math.floorMod(seed >> 33, 50L))
    }
    val got = Resilience.holtWintersOn(
        Series((flat ++ rnd).toDF("g", "p", "v"), "g", "p", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val f = got("flat")
    assert(f.getLong(1) == 28L && f.getDouble(2) == 9.0 && f.getDouble(3) == 0.0)
    for (h <- 1 to 7) assert(f.getDouble(3 + h) == 9.0, s"flat fc$h")
    // driver-side reference fold: classic init + the three coupled
    // updates, the IDENTICAL op order — must match bit-for-bit.
    val ys = rnd.map(_._3.toDouble).toArray
    val (a, b, g, m) = (0.5, 0.3, 0.2, 7)
    val s1 = ys.take(m).foldLeft(0.0)(_ + _)
    val s2 = ys.slice(m, 2 * m).foldLeft(0.0)(_ + _)
    var l = s1 / 7.0; var bb = (s2 - s1) / 49.0
    var q = ys.take(m).map(_ - s1 / 7.0)
    for (x <- ys.drop(m)) {
      val lnew = a * (x - q(0)) + (1 - a) * (l + bb)
      val bnew = b * (lnew - l) + (1 - b) * bb
      val snew = g * (x - lnew) + (1 - g) * q(0)
      q = q.drop(1) :+ snew; l = lnew; bb = bnew
    }
    val r = got("rnd")
    assert(r.getDouble(2) == l && r.getDouble(3) == bb)
    for (h <- 1 to 7)
      assert(r.getDouble(3 + h) == l + h.toDouble * bb + q(h - 1), s"rnd fc$h")
  }

  test("anomaly flag: spike fires, steady state doesn't, constant-window deviation is ±inf") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def series(uid: Long, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => (uid, uid * 100 + i, i, v) }
    val rows =
      series(10L, Seq(4, 6, 4, 6, 4, 6, 4, 100.0)) ++ // spike → flag
      series(20L, Seq(5, 5, 5, 5, 5, 5, 5, 5.0)) ++   // steady → none
      series(30L, Seq(5, 5, 5, 5, 5, 5, 5, 6.0))      // const window, dev → ±inf flag
    val events = rows.toDF("user_id", "event_id", "i", "value")
      .withColumn("ts", expr("to_timestamp('2024-01-01') + make_interval(0, 0, 0, 0, i)"))
      .select($"user_id", $"event_id", $"ts", $"value")
    val res = graft.operators.Resilience.anomalies(events).collect()
    val got = res.map(r => (r.getLong(0), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.map(_._1).toSeq == Seq(10L, 30L), s"flagged users: ${got.toSeq}")
    val z10 = got.find(_._1 == 10L).get._2.get
    assert(z10 > 3 && !z10.isInfinite, s"spike z=$z10")
    assert(got.find(_._1 == 30L).get._2.isEmpty,
      "const-window deviation flags with undefined (null) z")
  }

  test("AR(1) skips groups without consecutive periods or with zero variance") {
    import spark.implicits._
    val df = Seq(
      ("gap", 1L, 10.0), ("gap", 3L, 20.0), ("gap", 5L, 30.0), // no pairs
      ("flat", 1L, 7.0), ("flat", 2L, 7.0), ("flat", 3L, 7.0), // var = 0
      ("ok", 1L, 1.0), ("ok", 2L, 2.0), ("ok", 3L, 4.0)).toDF("g", "p", "v")
    val got = Resilience.ar1ForecastOn(Series(df, "g", "p", "v"), 3)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("ok"), s"got $got")
  }

  // ------------------------------------------------------------------
  // REAL reference data: fixture copies of the reference's shipped
  // input (data/processed/clean_va_price.csv — 1,190 data rows, 93
  // industries with leading-whitespace hierarchy indentation,
  // footnote-suffixed labels, quoted commas, and 24 duplicate
  // (Industry, Year) pairs from the notebook's inner-merge cross) and
  // its published output (resilience_metrics.csv, the ground truth
  // resilience.py:29-82 saved).
  // ------------------------------------------------------------------

  private def realInput() = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.monotonically_increasing_id
    val path = getClass.getResource("/reference/clean_va_price.csv").getPath
    val schema = StructType(Seq(
      StructField("Industry", StringType),
      StructField("Year", LongType),
      StructField("Nominal_Value", LongType),
      StructField("Price_Index", DoubleType),
      StructField("Real_Value", DoubleType)))
    // _ord = file order (single small file: partition-local id order
    // follows byte offsets), standing in for an ingest sequence — the
    // order pandas' .values[0] silently depends on
    graft.sources.Csv.clean(graft.sources.Csv.read(spark, path, schema))
      .withColumn("_ord", monotonically_increasing_id())
  }

  private def sparkReplay(): Map[String, (Option[Double], Option[Long])] =
    Resilience.resilienceReplayOn(
        Series(realInput(), "Industry", "Year", "Real_Value"),
        "_ord", 2019L, 2020L, 4L)
      .collect().map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("REAL data: Spark replay is bit-identical to the pandas loop semantics") {
    import spark.implicits._
    // exact driver-side transcription of resilience.py:29-70 (test
    // scope only — the operator under test is the distributed twin)
    val rows = realInput().select($"Industry", $"Year", $"Real_Value", $"_ord")
      .orderBy($"_ord").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byInd = rows.groupBy(_._1) // Array groupBy keeps file order in-group
    def firstAt(g: Array[(String, Long, Double)], y: Long): Option[Double] =
      g.find(_._2 == y).map(_._3)
    val loop: Map[String, (Option[Double], Option[Long])] =
      byInd.flatMap { case (ind, g) =>
        firstAt(g, 2019L).map { v19 =>
          val dd = firstAt(g, 2020L).map(v20 => (v20 - v19) / v19)
          val rec = (2020L to 2023L).collectFirst {
            case y if firstAt(g, y).exists(_ >= v19) => y - 2019L }
          ind -> ((dd, rec))
        }
      }
    val got = sparkReplay()
    assert(got.size == 93 && loop.keySet == got.keySet)
    for ((k, (ld, lr)) <- loop) {
      val (gd, gr) = got(k)
      assert(gr == lr, s"$k recovery: loop $lr vs spark $gr")
      (ld, gd) match {
        case (Some(l), Some(g)) =>
          assert(java.lang.Double.doubleToLongBits(l) ==
            java.lang.Double.doubleToLongBits(g),
            s"$k drawdown: loop $l vs spark $g") // NaN/Inf included
        case (l, g) => assert(l == g, s"$k drawdown: loop $l vs spark $g")
      }
    }
  }

  test("REAL data: replay matches the published resilience_metrics.csv") {
    val pubPath = getClass.getResource("/reference/resilience_metrics.csv").getPath
    val pub = spark.read.option("header", "true").csv(pubPath)
      .collect().map { r =>
        val dd = Option(r.getString(1)).map {
          case "inf" => Double.PositiveInfinity
          case "-inf" => Double.NegativeInfinity
          case s => s.toDouble }
        val rec = Option(r.getString(2)).map(_.toDouble.toLong)
        r.getString(0) -> ((dd, rec))
      }.toMap
    val got = sparkReplay()
    assert(pub.keySet == got.keySet && got.size == 93)
    // Recovered_Years: exact for every industry, null rows included
    for ((k, (_, pr)) <- pub)
      assert(got(k)._2 == pr, s"$k recovery: published $pr vs got ${got(k)._2}")
    // Drawdown_2020: the published file was generated from a pre-save
    // revision of the input — re-running the reference's OWN code on
    // the SHIPPED csv reproduces only 27/93 doubles bitwise (the rest
    // differ in the final 1-2 digits, ≤6e-14 relative) and picks
    // different duplicate rows for the two duplicate-label industries
    // (both appear under Federal AND State-and-local; the generating
    // frame's row order differed). So: tolerance 1e-12 for 91 rows,
    // NaN (0/0: Amusements etc.) and ±inf (Motor vehicle dealers:
    // v2019 = 0) positions exact, and the two dup-label rows pinned
    // as KNOWN divergence — bit-fidelity to the shipped input is
    // covered by the loop-replication test above.
    val dupLabels = Set("            General government",
      "            Government enterprises")
    var nan = 0; var inf = 0
    for ((k, (pd, _)) <- pub if !dupLabels(k)) {
      val gd = got(k)._1
      (pd, gd) match {
        case (None, Some(g)) =>
          assert(g.isNaN, s"$k: published empty but got $g"); nan += 1
        case (Some(p), Some(g)) if p.isInfinity =>
          assert(g == p, s"$k: published $p vs got $g"); inf += 1
        case (Some(p), Some(g)) =>
          assert(math.abs(p - g) <= 1e-12 * math.abs(p), s"$k: $p vs $g")
        case other => fail(s"$k: unexpected $other")
      }
    }
    assert(nan == 7, s"expected 7 NaN drawdowns, saw $nan")
    assert(inf == 1, s"expected 1 inf drawdown, saw $inf")
    for (k <- dupLabels) {
      assert(pub(k)._1.isDefined && got(k)._1.isDefined, s"$k missing")
      assert(pub(k)._1.get != got(k)._1.get,
        s"$k: published now matches the shipped input — drop the dup-label carve-out")
    }
  }

  test("REAL data: the 93-industry metrics export to xlsx and read back intact") {
    // the reference's final hand-off is to_excel (ipynb cell 5); this
    // closes that loop: replay → Excel.write → Excel.read, 93 rows,
    // values identical in their string form (NaN/Infinity included)
    val metrics = Resilience.resilienceReplayOn(
      Series(realInput(), "Industry", "Year", "Real_Value"),
      "_ord", 2019L, 2020L, 4L)
    val f = java.nio.file.Files.createTempDirectory("graft_refx")
      .resolve("resilience_metrics.xlsx").toString
    graft.sources.Excel.write(metrics, f, sheetName = "Metrics")
    val back = graft.sources.Excel.read(spark, f, "Metrics")
    assert(back.columns.toSeq == metrics.columns.toSeq)
    def strRows(d: org.apache.spark.sql.DataFrame) = d
      .select(d.columns.map(c => org.apache.spark.sql.functions
        .col(c).cast("string")): _*)
      .collect().map(_.toSeq.map(Option(_))).toSet
    val b = strRows(back)
    assert(b.size == 93 && b == strRows(metrics))
  }
}
