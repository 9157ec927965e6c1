package graft

import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap

/** Benchmark entrypoint. Prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  * — capped at ~1.7 KB (headline rows only; see compactRender) so the
  * driver's bounded output tail can always parse it — and mirrors the
  * FULL per-query map to bench_out.json.
  *
  * Timeout posture (the round-9 driver run died rc=124 with zero rows):
  *  - pass 1 times every query ONCE in sorted order — full per-query
  *    coverage lands as early as possible;
  *  - further passes (up to SPARK_GRAFT_REPS, default 2) re-time
  *    queries by RATIO VS THE COMMITTED BASELINE descending (parsed
  *    from BASELINE.md's superseding per-query table; rows with no
  *    baseline — new queries — and pass-1 failures sort first), but
  *    only while the POLISH budget (SPARK_GRAFT_BUDGET_SEC, default
  *    300 s of re-measure time, pass 1 excluded — charging mandatory
  *    coverage against it silently degraded rows to first-touch
  *    best-of-1 once the suite outgrew the budget) has room.
  *    Cheapest-first ordering (the old policy) spent the whole budget
  *    giving sub-second rows their fourth rep while multi-second
  *    first-touch outliers (JIT + codegen + plan compile) were
  *    recorded at best-of-1 and read as false >=2x regressions;
  *    ratio-descending sends the retry exactly where a 2x row would
  *    otherwise be reported;
  *  - a JVM shutdown hook emits the partial JSON if the driver's
  *    `timeout` SIGTERMs us anyway, so a kill can truncate the table
  *    but can no longer erase it;
  *  - full-suite runs close with an automatic ADJUDICATION pass: any
  *    row ≥1.5× its committed baseline re-measures best-of-4 and the
  *    result lands in the same artifact as `<q>_adjudicated`
  *    (excluded from the total and n_queries), so the shipped json
  *    carries its own noise adjudication instead of relying on a
  *    separate narrative run.
  */
object Bench {
  private val results = new TrieMap[String, Double]()
  private val sfDirRef = new java.util.concurrent.atomic.AtomicReference[String]("")
  private val emitted = new AtomicBoolean(false)

  /** `<q>_adjudicated` rows are measurement METADATA (the automatic
    * best-of-4 re-measure of a ≥1.5×-vs-baseline row) — they ride the
    * queries map so one artifact carries its own adjudication, but
    * they must not inflate the suite total or the query count. */
  private def isAdj(k: String): Boolean = k.endsWith("_adjudicated")

  private def render(): String = {
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.filter { case (k, v) => v >= 0 && !isAdj(k) }
      .values.sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${sfDirRef.get}"}"""
  }

  /** STDOUT line, capped to fit the driver's 2000-byte output tail:
    * once the suite passed ~150 queries the full map outgrew the
    * buffer and rounds 7-9 recorded `parsed: null` — the driver
    * captured only the line's tail and could not json-parse it. The
    * compact line keeps every summary field plus the HEADLINE subset
    * (most expensive rows first — they carry the total) and points at
    * bench_out.json, which always holds the full-precision full map. */
  private def compactRender(maxBytes: Int = 1500): String = {
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.filter { case (k, v) => v >= 0 && !isAdj(k) }
      .values.sum
    val nQueries = results.keys.count(!isAdj(_))
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""n_queries":$nQueries,"queries_full":"bench_out.json","queries":{"""
    val tail = s"""},"sf":"${sfDirRef.get}"}"""
    val picked = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var sz = head.length + tail.length
    results.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val extra = k.length + fmt(v).length + 3 +
        (if (picked.nonEmpty) 1 else 0)
      if (sz + extra <= maxBytes) { picked += ((k, v)); sz += extra }
    }
    head + picked.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString(",") + tail
  }

  /** Committed per-query baseline seconds, parsed from BASELINE.md's
    * `| query | sec |` tables; later tables overwrite earlier rows, so
    * the superseding re-baseline table at the bottom of the file wins.
    * Missing file or unparseable rows degrade to an empty map (polish
    * order then treats every row as baseline-less, i.e. first). */
  private def baselineTimes(): Map[String, Double] =
    try {
      val src = scala.io.Source.fromFile("BASELINE.md", "UTF-8")
      try {
        val m = scala.collection.mutable.LinkedHashMap[String, Double]()
        src.getLines().foreach { l =>
          val t = l.trim
          if (t.startsWith("|")) {
            val cells = t.split("\\|").map(_.trim).filter(_.nonEmpty)
            if (cells.length == 2 && cells(1).matches("[0-9]+(\\.[0-9]+)?"))
              m.put(cells(0), cells(1).toDouble)
          }
        }
        m.toMap
      } finally src.close()
    } catch { case _: Throwable => Map.empty }

  private def writeFile(): Unit =
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (render() + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }

  private def emit(): Unit = if (emitted.compareAndSet(false, true)) {
    println(compactRender())
    scala.Console.out.flush()
    writeFile()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sfDirRef.set(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit()))
    // warmup on the SAME dataset the timed queries read (JIT/codegen +
    // FS metadata outside the timed region; a host that only carries
    // sfDir must not abort here)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => }

    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=q1,q2 narrows to named queries,
    // SPARK_GRAFT_REPS=n raises the best-of target, and
    // SPARK_GRAFT_BUDGET_SEC lifts the measured-time budget —
    // adjudication knobs for re-benching rows on a quiet host; the
    // driver's full-suite run sets none of them.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val budgetSec = sys.env.get("SPARK_GRAFT_BUDGET_SEC").map(_.toDouble)
      .getOrElse(300.0)
    val queries = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1)

    val verbose = sys.env.contains("SPARK_GRAFT_LOG")
    // the budget bounds the POLISH passes only — pass 1 is mandatory
    // coverage whatever it costs (247 queries ≈ 3.5 min), and charging
    // it against the budget silently degraded most rows to noisy
    // first-touch best-of-1 once the suite outgrew the budget
    var spent = 0.0
    // pass 1: every query once, sorted order — coverage before polish;
    // the file checkpoints after EVERY query (the shutdown hook covers
    // SIGTERM, but `timeout -k`'s follow-up SIGKILL runs no hooks —
    // a kill mid-pass now loses one row, not the table)
    val wall0 = System.nanoTime()
    queries.foreach { case (name, fn) =>
      val t = timeOnce(fn)
      results.put(name, t)
      writeFile()
      if (verbose) System.err.println(
        f"[bench] ${(System.nanoTime() - wall0) / 1e9}%8.1f wall  $t%7.3f q  $name")
    }
    // passes 2..reps: ratio-vs-committed-baseline DESCENDING — the
    // worst-looking rows (first-touch outliers on expensive queries)
    // get the retry before sub-second rows get their fourth rep.
    // Pass-1 failures (transient OOM/GC timeout) and rows with no
    // baseline (new queries) sort FIRST — a one-off crash no longer
    // freezes the row at -1 / excluded-from-total for the whole run
    val base = baselineTimes()
    var pass = 2
    while (pass <= reps && spent < budgetSec) {
      val order = queries.sortBy { case (n, _) =>
        val v = results.getOrElse(n, -1.0)
        if (v < 0) Double.MinValue // failed: retry first
        else base.get(n) match {
          case Some(b) if b > 0 => -(v / b) // ratio desc
          case _                => Double.MinValue / 2 // new query: early
        }
      }
      val it = order.iterator
      while (it.hasNext && spent < budgetSec) {
        val (name, fn) = it.next()
        val t = timeOnce(fn)
        if (t > 0) {
          spent += t
          if (results(name) < 0 || t < results(name)) results.put(name, t)
        }
      }
      writeFile()
      pass += 1
    }
    // ADJUDICATION (full-suite runs only): any row still ≥1.5× its
    // committed baseline gets an automatic targeted best-of-4,
    // appended to the SAME artifact as `<q>_adjudicated` — the round
    // close carries its own adjudication instead of a narrative that
    // can drift from the shipped json (the round-10 lesson). Worst
    // ratio first, bounded by its own budget so a noisy host cannot
    // stall the emit.
    if (only.isEmpty) {
      val adjBudget = sys.env.get("SPARK_GRAFT_ADJ_BUDGET_SEC")
        .map(_.toDouble).getOrElse(240.0)
      val flagged = queries
        .flatMap { case (name, fn) =>
          val v = results.getOrElse(name, -1.0)
          base.get(name) match {
            case Some(b) if b > 0 && v > 0 && v / b >= 1.5 =>
              Some((name, fn, v / b))
            case _ => None
          }
        }
        .sortBy(-_._3)
      var adjSpent = 0.0
      flagged.foreach { case (name, fn, _) =>
        if (adjSpent < adjBudget) {
          var best = Double.MaxValue
          var k = 0
          while (k < 4 && adjSpent < adjBudget) {
            val t = timeOnce(fn)
            if (t > 0) { adjSpent += t; if (t < best) best = t }
            k += 1
          }
          if (best < Double.MaxValue) {
            // the re-measure lives ONLY in the adjudicated row (already
            // excluded from total/n_queries): overwriting the primary
            // would be a one-sided re-measurement that can only lower
            // the suite total vs the uniform-reps protocol (ADVICE r11)
            results.put(name + "_adjudicated", best)
            writeFile()
          }
        }
      }
    }
    emit()
    spark.stop()
  }
}
