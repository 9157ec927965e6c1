package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** CDC apply / event-stream operators, batch twins (SURVEY.md §2.C).
  *
  * The north-star architecture treats the reference's pipeline as
  * change-data-capture ingestion: `events` is read as a change stream
  * keyed by `user_id` (signup→insert, error→delete tombstone,
  * click/view/purchase→update). These are the batch-mode twins of the
  * Structured Streaming operators in `graft.streaming` — identical
  * semantics, so the oracle validates the streaming logic's shape too.
  *
  * Scale notes: every op is a single hash-partition-by-key pass
  * (window or agg on user_id). At 100 TB the same plan shuffles once
  * on the key; no driver-side state. Timestamps are exported as epoch
  * micros (BIGINT) so engine-side timestamp encodings never skew the
  * oracle compare.
  */
object Cdc {

  private def op = when(col("event_type") === "signup", "I")
    .when(col("event_type") === "error", "D")
    .otherwise("U")

  /** C1 latest-state materialization: newest change per key wins
    * (upsert apply). */
  def latestState(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("last_op"),
        round($"value", 2).as("last_value"),
        unix_micros($"ts").as("last_ts_us"))
      .orderBy($"user_id")
  }

  /** C2 upsert+delete apply: rows whose final change is a tombstone
    * drop out of the materialized state. */
  def applyDeletes(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    events
      .withColumn("op", op)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D")
      .select($"user_id", $"op".as("last_op"),
        round($"value", 2).as("last_value"))
      .orderBy($"user_id")
  }

  /** C3 SCD type-2: every change opens a version; `lead` closes the
    * previous one; the open version is current. */
  def scd2(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"user_id", $"event_id",
        unix_micros($"ts").as("valid_from_us"),
        lead(unix_micros($"ts"), 1).over(w).as("valid_to_us"))
      .withColumn("is_current", $"valid_to_us".isNull)
      .orderBy($"user_id", $"event_id")
  }

  /** C4 tumbling event-time aggregation (batch twin of the streaming
    * windowed agg in graft.streaming.EventAgg). */
  def eventCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(unix_micros(date_trunc("hour", $"ts")).as("hour_us"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"hour_us", $"event_type")
  }

  /** C5 gap-based sessionization (30-min inactivity): new-session flag
    * via lag, session id via running sum — the classic two-window
    * formulation, all key-local. */
  /** Per-event session sequence — the pre-aggregation frame both
    * sessionize and the funnel aggregate from: 30-min-gap
    * sessionization, one window pass on the (high-cardinality)
    * user key. */
  private def withSessionSeq(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("gap_us", $"us" - lag($"us", 1).over(wOrd))
      .withColumn("is_new",
        when($"gap_us".isNull || $"gap_us" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"is_new").over(wRun))
  }

  def sessionize(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    withSessionSeq(events)
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"us").as("start_us"), max($"us").as("end_us"))
      .orderBy($"user_id", $"session_seq")
  }

  /** C41 peak session concurrency per day — the capacity-planning
    * statistic over C5's sessions (interval-stabbing sweep, the
    * classic +1/−1 event trick): each session contributes +1 at
    * start_us and −1 at end_us; the running delta sum IS the live
    * session count, and its per-day max is the peak. Ties at one
    * microsecond order +1 before −1 (closed intervals: back-to-back
    * counts as overlap) — the per-day MAX is invariant to any
    * permutation within an equal (t, d) run, so the window order is
    * fully deterministic where it matters. Scale: the global cumsum
    * is decomposed day-bucketed (in-day window + exclusive per-day
    * offsets joined back — the F14 two-level shape), so no
    * single-task corpus-sized window exists; the twin's single
    * global window equals the decomposition exactly in integers. */
  def concurrency(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val sess = withSessionSeq(events)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"us").as("start_us"), max($"us").as("end_us"))
    val deltas = sess.select($"start_us".as("t"), lit(1L).as("d"))
      .unionByName(sess.select($"end_us".as("t"), lit(-1L).as("d")))
      .withColumn("day", to_date(timestamp_micros($"t")))
    val wIn = Window.partitionBy($"day").orderBy($"t", $"d".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner = deltas.withColumn("run_in", sum($"d").over(wIn))
    val offs = deltas.groupBy($"day")
      .agg(sum($"d").as("dsum"),
        sum(when($"d" === 1L, 1L).otherwise(0L)).as("starts"))
      .withColumn("off", coalesce(sum($"dsum").over(
        Window.orderBy($"day").rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select($"day", $"off", $"starts")
    inner.join(broadcast(offs), Seq("day"))
      .groupBy(date_format($"day", "yyyy-MM-dd").as("day"))
      .agg(max($"off" + $"run_in").as("peak_concurrency"),
        max($"starts").as("sessions_started"))
      .orderBy($"day")
  }

  /** C20 ordered conversion funnel (view → click → purchase) over
    * sessions: a session reaches step k iff the first occurrence of
    * every step 1..k is in order. Per-session step times come from
    * one grouped aggregate over the sessionized frame; the funnel
    * itself is a single partial-aggregated global row unpivoted to
    * one row per step — nothing beyond per-user windows ever
    * shuffles, so the shape is corpus-scan-bound at 100 TB.
    * `conv_from_prev` is the raw quotient of two engine-identical
    * counts (step 1 = null: no previous step). */
  def funnel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val sess = withSessionSeq(events)
      .groupBy($"user_id", $"session_seq")
      .agg(
        min(when($"event_type" === "view", $"us")).as("t_view"),
        min(when($"event_type" === "click", $"us")).as("t_click"),
        min(when($"event_type" === "purchase", $"us")).as("t_purchase"))
    val r = sess.agg(
      sum(when($"t_view".isNotNull, 1L).otherwise(0L)).as("n1"),
      sum(when($"t_click" >= $"t_view", 1L).otherwise(0L)).as("n2"),
      sum(when($"t_click" >= $"t_view" && $"t_purchase" >= $"t_click", 1L)
        .otherwise(0L)).as("n3"))
    r.select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("step_name"),
          $"n1".as("n_sessions"),
          lit(null).cast("double").as("conv_from_prev")),
        struct(lit(2L).as("step"), lit("click").as("step_name"),
          $"n2".as("n_sessions"),
          when($"n1" === 0L, lit(null).cast("double"))
            .otherwise($"n2".cast("double") / $"n1").as("conv_from_prev")),
        struct(lit(3L).as("step"), lit("purchase").as("step_name"),
          $"n3".as("n_sessions"),
          when($"n2" === 0L, lit(null).cast("double"))
            .otherwise($"n3".cast("double") / $"n2").as("conv_from_prev"))))
        .as("s"))
      .select($"s.step".as("step"), $"s.step_name".as("step_name"),
        $"s.n_sessions".as("n_sessions"),
        $"s.conv_from_prev".as("conv_from_prev"))
      .orderBy($"step")
  }

  /** C21 weekly retention cohorts: cohort = ISO week of the user's
    * first event; count distinct users active k weeks later. One
    * window min on the user key + one distinct-count aggregate — the
    * classic retention triangle. All-integer week math (Monday-start
    * `date_trunc('week')` on both engines, day-diff div 7). At 100 TB
    * swap `countDistinct` for an HLL sketch if ±1% is acceptable. */
  def cohortRetention(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id")
    events
      .withColumn("first_ts", min($"ts").over(w))
      .select($"user_id",
        to_date(date_trunc("week", $"first_ts")).as("cohort_week"),
        to_date(date_trunc("week", $"ts")).as("act_week"))
      .groupBy($"cohort_week",
        expr("datediff(act_week, cohort_week) div 7").as("week_idx"))
      .agg(countDistinct($"user_id").as("n_users"))
      .select(
        datediff($"cohort_week", lit("1970-01-01")).cast("long")
          .as("cohort_week_days"),
        $"week_idx", $"n_users")
      .orderBy($"cohort_week_days", $"week_idx")
  }

  /** C59 top session PATHS — 3-step path mining over the sessionized
    * event stream (the product-analytics "what do users actually do"
    * artifact behind every Sankey view; the order-3 extension of
    * C44's lag-pair transitions, which C58 then summarizes — pairs
    * say which step follows which, paths expose the FLOWS:
    * browse→search→buy vs browse→search→browse): all
    * within-session event-type trigrams, counted, top-20 by
    * (count DESC, path). ALL integer/string ops; the trigram frame
    * aggregates map-side (|types|³ distinct keys at most) and the
    * top-20 rides orderBy+limit → TakeOrderedAndProject, never a
    * global sort. */
  def sessionPaths(events: DataFrame, topK: Int = 20): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tri = withSessionSeq(events)
      .withColumn("p1", lag($"event_type", 1).over(wOrd))
      .withColumn("p2", lag($"event_type", 2).over(wOrd))
      .withColumn("s1", lag($"session_seq", 1).over(wOrd))
      .withColumn("s2", lag($"session_seq", 2).over(wOrd))
      .filter($"p2".isNotNull && $"s1" === $"session_seq" &&
        $"s2" === $"session_seq")
      .select(concat_ws(">", $"p2", $"p1", $"event_type").as("path"))
    val counts = tri.groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path").limit(topK)
    counts.withColumn("rank", row_number().over(
        Window.orderBy($"n".desc, $"path")).cast("long"))
      .select($"rank", $"path", $"n")
      .orderBy($"rank")
  }

  /** C60 CDC FEED AUDIT — the ingest-contract check run BEFORE
    * trusting a changelog (every C-track operator above assumes ids
    * are unique and arrival order roughly tracks event time; when a
    * connector re-delivers or a partition lags, those assumptions
    * silently break exactly-once materialization and watermark
    * budgets): (a) duplicate event_ids (re-delivery), (b) adjacent
    * event-time inversions in id order per user (how out-of-order
    * the feed runs — the empirical input to choosing C27's watermark
    * delay), (c) max observed backwards jump in µs (the watermark
    * bound a zero-late-drop policy would need). ALL integer; two
    * aggregates + one keyed window pass. */
  def feedAudit(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val dups = events.groupBy($"event_id").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_ids"),
        sum(when($"c" > 1, $"c" - 1).otherwise(0L)).as("n_dup_deliveries"))
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val inv = events
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("inv",
        when($"prev_us".isNotNull && unix_micros($"ts") < $"prev_us",
          1L).otherwise(0L))
      .withColumn("jump_us",
        when($"inv" === 1L, $"prev_us" - unix_micros($"ts"))
          .otherwise(0L))
      .agg(count(lit(1)).as("n_events"), sum($"inv").as("n_inversions"),
        max($"jump_us").as("max_backjump_us"))
    inv.crossJoin(dups)
      .select($"n_events", $"n_ids", $"n_dup_deliveries",
        $"n_inversions",
        // ANSI div raises on an all-empty feed (global agg still
        // emits one n_events=0 row) — null ppm instead of a crash
        expr("case when n_events > 0 then n_inversions * 1000000" +
          " div n_events end").as("inversion_ppm"),
        $"max_backjump_us",
        ($"n_dup_deliveries" === 0L && $"n_inversions" === 0L)
          .cast("long").as("feed_clean"))
  }

  /** C8 as-of (backward) join: attach to every query row the most
    * recent state row with state.ts <= query.ts, per key — the CDC
    * "state at event time" lookup. Spark lacks a native as-of join;
    * the scalable composition is the union + last-ignore-nulls window
    * trick: one shuffle on the key, no range cross-join, holds at
    * 100 TB (vs. the naive `ON s.ts <= q.ts` join which explodes).
    * State stream = signup events; query stream = the rest. */
  def asofJoin(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("sval", when($"event_type" === "signup", $"value"))
      .withColumn("state_asof", last($"sval", ignoreNulls = true).over(w))
      .filter($"event_type" =!= "signup")
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        round($"value", 2).as("value"),
        round($"state_asof", 2).as("state_value_asof"))
      .orderBy($"user_id", $"event_id")
  }

  /** C32 as-of INTERPOLATED join — the time-weighted upgrade of C8's
    * last-observation as-of: each `purchase` event takes the LINEAR
    * interpolation of its user's bracketing `view` values at its
    * timestamp, v_prev + (v_next − v_prev)·(t − t_prev)/(t_next −
    * t_prev) — the standard sensor/price-series enrichment where
    * step-function as-of biases toward the stale side. Union-trick
    * plan: reference and query rows ride ONE keyed window ordering
    * (user, ts, ref-before-query, event_id) — prev ref via backward
    * `last` ignoreNulls, next ref via forward `first` — no range
    * self-join, no explosion, one shuffle on the user key (the C8
    * scale shape, two window passes instead of one). Edges: a missing
    * bracket on either side → null (strict interior interpolation,
    * pandas `interpolate(limit_area='inside')`); a ref sharing the
    * query's exact timestamp sorts BEFORE it (C8's inclusive tie
    * rule) and is taken AS the answer by an explicit exact-hit branch
    * — an exact observation needs no right bracket;
    * equal-timestamp brackets guard the zero denominator (ANSI-safe)
    * and take v_prev. Timestamp deltas are exact µs BIGINTs; one
    * double ratio + one fused multiply-add shape, identical op
    * sequence in the twin. */
  def asofInterp(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val u = events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"value", $"event_type",
        when($"event_type" === "view", lit(1)).otherwise(lit(0)).as("is_ref"))
      .filter($"event_type".isin("view", "purchase"))
    val ord = Window.partitionBy($"user_id")
      .orderBy($"us", $"is_ref".desc, $"event_id")
    val back = ord.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
    val refVal = when($"is_ref" === 1, $"value")
    val refUs = when($"is_ref" === 1, $"us")
    // one select so CollapseWindow fuses the four projections into
    // TWO Window nodes (one per frame) over a single sort
    u.select($"*",
        last(refVal, ignoreNulls = true).over(back).as("v_prev"),
        last(refUs, ignoreNulls = true).over(back).as("us_prev"),
        first(refVal, ignoreNulls = true).over(fwd).as("v_next"),
        first(refUs, ignoreNulls = true).over(fwd).as("us_next"))
      .filter($"event_type" === "purchase")
      .withColumn("interp",
        when($"us_prev" === $"us", $"v_prev") // exact observation hit
          .when($"us_next" === $"us_prev", $"v_prev")
          .otherwise($"v_prev" + ($"v_next" - $"v_prev") *
            (($"us" - $"us_prev").cast("double") /
              ($"us_next" - $"us_prev").cast("double"))))
      .select($"user_id", $"event_id", $"us".as("ts_us"),
        round($"interp", 6).as("val_interp"))
      .orderBy($"user_id", $"event_id")
  }

  /** C33 changelog compaction — drop NO-OP change records: a row is
    * emitted only when its value differs from the key's PREVIOUS
    * record (null-safe — the key's first record always emits). Retry
    * storms, heartbeat re-sends and idempotent writer re-emissions are
    * the bulk of many real change feeds; compacting them upstream
    * shrinks every downstream state store and apply cost to the TRUE
    * change rate (the same reason C30's snapshot diff skips unchanged
    * rows). One keyed window pass, value compared in exact cents. */
  def compactChangelog(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("prev", lag($"cents", 1).over(w))
      .filter(!($"cents" <=> $"prev"))
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"cents")
      .orderBy($"user_id", $"event_id")
  }

  /** C15 day-of-week activity histogram (calendar bucketing; careful
    * cross-engine: Spark dayofweek is 1=Sunday, DuckDB dayofweek is
    * 0=Sunday — normalized to ISO 1=Monday..7=Sunday on both sides). */
  def dowHistogram(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(expr("(((dayofweek(ts) + 5) % 7) + 1)").cast("long").as("iso_dow"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"iso_dow", $"event_type")
  }

  /** C14 session attribution through the custom range-join operator
    * (graft.plans.RangeJoin — LogicalPlan/Strategy/Exec): every event
    * finds its own user's session interval containing its timestamp.
    * Routed through the SHUFFLED keyed variant: the session side grows
    * linearly with the corpus (~10⁹ sessions at 100 TB), so both sides
    * are clustered on the user key and each task probes only its
    * partition's per-key interval index — no driver collect, no
    * broadcast. The oracle replays it as a plain key+BETWEEN join,
    * proving the custom physical operator's results. */
  def sessionAttrib(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val pts = events.select($"user_id", $"event_id",
      unix_micros($"ts").as("p_us"))
    val sess = sessionize(events)
      .select($"user_id".as("s_user"), $"session_seq",
        $"start_us", $"end_us")
    graft.plans.RangeJoin.joinKeyed(pts, sess,
        pts("user_id"), sess("s_user"),
        pts("p_us"), sess("start_us"), sess("end_us"))
      .select($"event_id", $"session_seq", $"start_us")
      .orderBy($"event_id")
  }

  /** Generic CDC apply for arbitrary change feeds (Debezium-style):
    * given a frame with key / ordering / op columns, materialize the
    * latest surviving row per key (tombstones excluded). `ordering`
    * may be several columns (e.g. ts + lsn) for total order; all other
    * columns pass through. This is the library entry point — the
    * `events`-schema ops above are its specialization to the test
    * corpus. */
  def applyChanges(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }

  /** C25 CDC envelope parse — the ingest edge of the north-star
    * architecture: a Debezium-shaped change envelope
    * `{op, ts_ms, before, after}` (tombstones carry `before` only,
    * upserts `after` only; absent sides are omitted from the wire
    * bytes, the connector convention) is parsed with an EXPLICIT
    * schema (`from_json` — permissive: a corrupt envelope nulls out,
    * never kills the job) and normalized to typed change rows. The
    * graded entry serializes the events feed into envelopes first —
    * the wire-format stand-in — so its oracle is the straight
    * relational twin: any field the round-trip drops or garbles
    * breaks the hash. Scale shape: pure per-row projection, one
    * codegen'd stage, no shuffle. */
  def parseEnvelope(envelopes: DataFrame, jsonCol: String = "env"): DataFrame = {
    import envelopes.sparkSession.implicits._
    val schema = "op STRING, ts_ms BIGINT, " +
      "before STRUCT<user_id: BIGINT, value: DOUBLE>, " +
      "after STRUCT<user_id: BIGINT, value: DOUBLE>"
    envelopes
      .withColumn("e", from_json(col(jsonCol), schema,
        Map.empty[String, String]))
      .select($"event_id", $"e.op".as("op"),
        coalesce($"e.after.user_id", $"e.before.user_id").as("user_id"),
        coalesce($"e.after.value", $"e.before.value").as("val"),
        $"e.ts_ms".as("ts_ms"))
  }
  // no ORDER BY in the core: the same projection must plan on a
  // streaming relation (CdcStream.envelopeChanges); the graded batch
  // entry adds the total order below

  /** Wire-format stand-in for the graded entry: each event serialized
    * as its Debezium-shaped envelope (delete → `before`, else
    * `after`; `to_json` omits the null side, as connectors do). */
  private def toEnvelopes(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val image = struct($"user_id", round($"value", 2).as("value"))
    events.select($"event_id", to_json(struct(
      op.as("op"),
      expr("unix_micros(ts) div 1000").as("ts_ms"),
      when(op === "D", image).as("before"),
      when(op =!= "D", image).as("after"))).as("env"))
  }

  /** C50 schema-drift detection — the property-bag REGISTRY a CDC
    * consumer maintains when the upstream emits semi-structured
    * payloads whose key set evolves faster than any declared schema
    * (the operational companion of A30's VARIANT analytics: VARIANT
    * makes drifting bags queryable, this tells you WHEN they
    * drifted): per JSON key observed anywhere in the feed, the first
    * and last day it appeared, days-seen and row counts. A key with
    * a late `first_day` IS the schema change — the signal that
    * triggers a backfill/contract review before downstream jobs
    * break.
    *
    * Keys come from one RE2-safe `regexp_extract_all` over the raw
    * payload (no parse, no schema — corrupt bags contribute no keys
    * and never kill the scan), exploded and aggregated in ONE
    * map-side-combined pass keyed by (key, day) then key —
    * vocabulary-bounded output regardless of corpus size. */
  def schemaDrift(feed: DataFrame, propsCol: String = "props"): DataFrame = {
    import feed.sparkSession.implicits._
    feed
      .select(to_date($"ts").as("day"),
        expr(s"regexp_extract_all($propsCol, '\"([a-z0-9_]+)\"\\\\s*:', 1)")
          .as("ks"))
      .select($"day", explode($"ks").as("key"))
      .groupBy($"key", $"day").agg(count(lit(1)).as("n"))
      .groupBy($"key")
      .agg(date_format(min($"day"), "yyyy-MM-dd").as("first_day"),
        date_format(max($"day"), "yyyy-MM-dd").as("last_day"),
        count(lit(1)).as("n_days"),
        sum($"n").as("n_rows"))
      .orderBy($"key")
  }

  /** Graded-entry payload for [[schemaDrift]]: the static test feed
    * carries a fixed `{"k": N}` bag, so the entry synthesizes the
    * DRIFT deterministically from the event itself (the C25
    * wire-format stand-in precedent) — `k` always, `v2_score` from
    * day 10 (a mid-month producer release), `exp_<type>` from day 20
    * (a per-type experiment field). The oracle reconstructs the same
    * payloads, so the hash proves construction, extraction, and
    * registry aggregation together. */
  private def driftedProps: org.apache.spark.sql.Column =
    concat(lit("{\"k\": 1"),
      when(dayofmonth(col("ts")) >= 10, lit(", \"v2_score\": 2"))
        .otherwise(lit("")),
      when(dayofmonth(col("ts")) >= 20,
        concat(lit(", \"exp_"), col("event_type"), lit("\": 3")))
        .otherwise(lit("")),
      lit("}"))

  /** C53 windowed funnel (the ClickHouse `windowFunnel` semantic —
    * C21's session funnel asks "did the steps happen in this
    * session?", this asks "did view→click→purchase complete within
    * ONE HOUR of the view?" — the conversion-latency-bounded variant
    * campaign analytics bills on): per user, the deepest step chain
    * with every step strictly after the previous and the WHOLE chain
    * inside [t_view, t_view + window], plus the earliest completing
    * chain's timestamps.
    *
    * No per-user fold: each step is one keyed equi-join restricted
    * by the exact-µs window predicate + a min aggregate — candidate
    * fan-out is events-per-user-per-window, not events²; all
    * shuffles on user_id. Chain choice is the struct-min over exact
    * integers (earliest view, then earliest click, then earliest
    * purchase — bit-deterministic). Users with no view emit depth 0
    * via the left join from the user universe. */
  def funnelWindow(events: DataFrame,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    import events.sparkSession.implicits._
    val ev = events.select($"user_id", $"event_type",
      unix_micros($"ts").as("us"))
    val users = ev.select($"user_id").distinct()
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"us".as("tv"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"us".as("tc"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"us".as("tp"))
    val vc = v.join(c, Seq("user_id"))
      .filter($"tc" > $"tv" && $"tc" <= $"tv" + windowUs)
      .groupBy($"user_id", $"tv").agg(min($"tc").as("tc"))
    val vcp = vc.join(p, Seq("user_id"))
      .filter($"tp" > $"tc" && $"tp" <= $"tv" + windowUs)
      .groupBy($"user_id", $"tv", $"tc").agg(min($"tp").as("tp"))
    val d1 = v.groupBy($"user_id").agg(min($"tv").as("first_tv"))
    val d2 = vc.groupBy($"user_id")
      .agg(min(struct($"tv", $"tc")).as("m"))
      .select($"user_id", $"m.tv".as("tv2"), $"m.tc".as("tc2"))
    val d3 = vcp.groupBy($"user_id")
      .agg(min(struct($"tv", $"tc", $"tp")).as("m"))
      .select($"user_id", $"m.tv".as("tv3"), $"m.tc".as("tc3"),
        $"m.tp".as("tp3"))
    users.join(d1, Seq("user_id"), "left")
      .join(d2, Seq("user_id"), "left")
      .join(d3, Seq("user_id"), "left")
      .select($"user_id",
        when($"tp3".isNotNull, 3L)
          .when($"tc2".isNotNull, 2L)
          .when($"first_tv".isNotNull, 1L)
          .otherwise(0L).as("depth"),
        $"tv3".as("chain_tv"), $"tc3".as("chain_tc"), $"tp3".as("chain_tp"))
      .orderBy($"user_id")
  }

  /** C52 BITEMPORAL read — the two-clock query a CDC-fed warehouse
    * owes its auditors: "as we KNEW it at transaction time T_tx, what
    * was each key's state VALID at event time T_v?" Arrival order is
    * the commit sequence (event_id — the C31/C36 convention), valid
    * time is the event timestamp; the then-known version is the
    * (ts, event_id)-max change with event_id ≤ tx_cut and ts ≤
    * valid_cut, the now-known version drops the tx bound. A key whose
    * two versions disagree was RESTATED — late-arriving data
    * retroactively changed history, which is exactly what bitemporal
    * bookkeeping exists to surface (and what a single-clock SCD2
    * silently overwrites).
    *
    * Both versions are ONE struct-max aggregate each (A28 extremum —
    * no window over the corpus), merged by a keyed full-outer join;
    * cuts are in-plan scalars (arithmetic points of the id/µs spans,
    * broadcast). Exact cents; tombstoned versions surface with null
    * cents rather than vanishing — an auditor must see the deletion. */
  def bitemporal(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ch = events.select($"user_id", $"event_id",
      unix_micros($"ts").as("us"),
      when(op === "D", lit(null)).otherwise(
        round($"value" * 100).cast("long")).as("cents"))
    val cuts = ch.agg(
      expr("max(event_id) * 4 div 5").as("tx_cut"),
      expr("min(us) + (max(us) - min(us)) * 3 div 5").as("valid_cut"))
    val bounded = ch.crossJoin(broadcast(cuts))
    def version(df: DataFrame, name: String) = df
      .groupBy($"user_id")
      .agg(max(struct($"us", $"event_id", $"cents")).as("v"))
      .select($"user_id", $"v.cents".as(s"${name}_cents"),
        $"v.event_id".as(s"${name}_event_id"),
        $"v.us".as(s"${name}_us"))
    val thenV = version(
      bounded.filter($"event_id" <= $"tx_cut" && $"us" <= $"valid_cut"),
      "then")
    val nowV = version(bounded.filter($"us" <= $"valid_cut"), "now")
    thenV.join(nowV, Seq("user_id"), "full_outer")
      .withColumn("restated",
        !($"then_cents" <=> $"now_cents") ||
          !($"then_event_id" <=> $"now_event_id"))
      .orderBy($"user_id")
  }

  /** C30 snapshot diff — CDC WITHOUT a change log: given two
    * snapshots of the same table, derive the change feed (insert /
    * update / delete rows) by a keyed full-outer join and value
    * comparison — the standard bootstrap when a source system offers
    * only periodic dumps (the reference's own data is exactly such
    * yearly snapshot dumps). Unchanged rows produce NO delta row, so
    * downstream apply cost tracks the real change rate, and the
    * emitted feed is exactly what [[applyChanges]]/H13's
    * copy-on-write merge consume. One keyed shuffle per side;
    * null-safe comparison (`<=>`) so null↔value transitions surface
    * as updates, not misses. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(c =>
      col(c).as(s"old_$c")): _*)
    val n = newDf.select((keys ++ compareCols).map(c =>
      col(c).as(s"new_$c")): _*)
    val cond = keys.map(k => col(s"old_$k") === col(s"new_$k"))
      .reduce(_ && _)
    val changed = compareCols.map(c =>
      !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    val oldKeyNull = col(s"old_${keys.head}").isNull
    val newKeyNull = col(s"new_${keys.head}").isNull
    o.join(n, cond, "full_outer")
      .withColumn("op",
        when(oldKeyNull, lit("i"))
          .when(newKeyNull, lit("d"))
          .when(changed, lit("u")))
      .filter(col("op").isNotNull)
      .select(keys.map(k =>
          coalesce(col(s"new_$k"), col(s"old_$k")).as(k)) ++
        Seq(col("op")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Graded adapter: two deterministic snapshots derived from orders —
    * new drops key%10==3 (deletes), adds key%10==7 back (inserts,
    * absent from old), reprices key%5==0 (+1 cent — updates). */
  private def snapshotDiffEntry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val oldSnap = base.filter($"o_orderkey" % 10 =!= 7)
    val newSnap = base.filter($"o_orderkey" % 10 =!= 3)
      .withColumn("cents",
        when($"o_orderkey" % 5 === 0, $"cents" + 1).otherwise($"cents"))
    snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"), Seq("cents"))
      .orderBy($"o_orderkey")
  }

  /** C36 late-arrival audit — the watermark-delay SIZING statistic:
    * order each key's changes by ARRIVAL (the connector's commit
    * sequence, event_id — the C31 offset contract) and compare each
    * row's EVENT time against the latest event time already arrived;
    * a row whose ts trails that running max arrived out of order, and
    * `prev_max − ts` is exactly the lateness a watermark must absorb
    * to keep it (C27 counts what a CHOSEN delay drops; this measures
    * the delay the data needs). Per key: event count, late count, max
    * lateness. All exact integer µs — one keyed window pass + one
    * aggregate, nothing else shuffles. */
  def lateAudit(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val wPrev = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("prev_max", max($"us").over(wPrev))
      .withColumn("late_us", when($"prev_max" > $"us", $"prev_max" - $"us"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        count($"late_us").as("n_late"),
        max($"late_us").as("max_late_us"))
      .orderBy($"user_id")
  }

  /** C75 REORDER-BUFFER DEPTH per key — the sizing question between
    * C36's "how late" and C38's "what would drop": replaying a feed
    * in EVENT-TIME order from an arrival-ordered log needs a buffer,
    * and its size is the maximum FORWARD displacement between an
    * event's arrival rank and its event-time rank (an event that
    * arrived 7 positions after its time slot forces 7 rows of
    * buffering). All-integer: two row_number ladders per key and
    * their difference; displaced counts and the total absolute
    * displacement quantify how pervasive the disorder is (one
    * straggler vs systemic shuffle). Both windows PARTITIONED by
    * key — never global. */
  def reorderDepth(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val byArrival = Window.partitionBy($"user_id").orderBy($"event_id")
    val byTime = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"user_id", $"event_id", $"ts")
      .withColumn("a_rank", row_number().over(byArrival).cast("long"))
      .withColumn("t_rank", row_number().over(byTime).cast("long"))
      .withColumn("depth", $"a_rank" - $"t_rank")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max(greatest($"depth", lit(0L))).as("buffer_depth"),
        sum(when($"depth" =!= 0L, 1L).otherwise(0L)).as("n_displaced"),
        sum(abs($"depth")).as("total_abs_depth"))
      .orderBy($"user_id")
  }

  /** C38 watermark-delay PLANNING — the decision table C36's audit
    * feeds: for each candidate watermark delay, how many rows the
    * stream would DROP (lateness exceeds the delay) vs absorb
    * (late but within it). Lateness is measured per SHARD
    * (user_id mod 8 — the source-partition model: a Kafka consumer
    * tracks one event-time high-water mark per partition and the
    * engine takes the min), so the running-max window partitions by
    * shard instead of collapsing the corpus onto one task the way a
    * global arrival order would. All exact integer µs; drop rate is
    * integer ppm (`div`, no float). One keyed window pass + one
    * delay-×-row conditional aggregate (the delay explode multiplies
    * rows by |delays| BEFORE the map-side combine, never shuffled). */
  def watermarkPlan(events: DataFrame,
      delaysSec: Seq[Long] = Seq(0L, 1L, 10L, 60L)): DataFrame = {
    import events.sparkSession.implicits._
    val wPrev = Window.partitionBy($"shard").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = events
      .select(pmod($"user_id", lit(8L)).as("shard"), $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("prev_max", max($"us").over(wPrev))
      .withColumn("late_us",
        coalesce(when($"prev_max" > $"us", $"prev_max" - $"us"), lit(0L)))
    late
      .select($"late_us",
        explode(array(delaysSec.map(d => lit(d * 1000000L)): _*)).as("delay_us"))
      .groupBy($"delay_us")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"late_us" > 0, 1L).otherwise(0L)).as("n_late"),
        sum(when($"late_us" > $"delay_us", 1L).otherwise(0L)).as("n_dropped"))
      .withColumn("drop_ppm", expr("n_dropped * 1000000 div n_events"))
      .orderBy($"delay_us")
  }

  /** C40 offset ACCOUNTING — gaps-and-islands over each shard's
    * commit sequence (the reconciliation audit a CDC consumer runs
    * against its source: which offsets never arrived?): island id =
    * event_id − row_number() per shard (consecutive ids share it —
    * the classic islands trick, one window pass, no self-join);
    * emits per shard the row/island counts, the longest contiguous
    * run, the widest gap, and the id span. A healthy partition has
    * n_islands = 1; every extra island is a hole the upstream
    * connector must replay. All exact BIGINTs. */
  def offsetIslands(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"shard").orderBy($"event_id")
    val iz = events
      .select(pmod($"user_id", lit(8L)).as("shard"), $"event_id")
      .withColumn("isl", $"event_id" - row_number().over(w))
      .withColumn("gap", $"event_id" - lag($"event_id", 1).over(w) - 1)
    val runs = iz.groupBy($"shard", $"isl").agg(count(lit(1)).as("run"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_islands"), max($"run").as("longest_run"))
    iz.groupBy($"shard")
      .agg(count(lit(1)).as("n_rows"), min($"event_id").as("min_id"),
        max($"event_id").as("max_id"), max($"gap").as("max_gap"))
      .join(runs, Seq("shard"))
      .orderBy($"shard")
  }

  /** Changelog rows typed for the C37 materialized-view path:
    * (user_id, event_id, cents, del) — cents exact, del = tombstone
    * flag, event_id = the commit sequence state applies in. */
  private def mvChanges(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select($"user_id", $"event_id",
      round($"value" * 100).cast("long").as("cents"),
      ($"event_type" === "error").cast("int").as("del"))
  }

  /** Latest state per key in COMMIT order (max event_id wins — the
    * order a connector applies changes in; C1's variant orders by
    * event time). Struct extremum keyed on the unique event_id, so
    * the result is deterministic under any partitioning. Carries
    * tombstoned keys as `deleted = 1` rows — the full state table
    * C37's old-contribution lookup needs. */
  def keyState(changes: DataFrame): DataFrame = {
    import changes.sparkSession.implicits._
    changes.groupBy($"user_id")
      .agg(max(struct($"event_id", $"cents", $"del")).as("m"))
      .select($"user_id", pmod($"user_id", lit(100L)).as("cohort"),
        $"m.cents".as("cents"), $"m.del".as("deleted"))
  }

  /** Grouped-aggregate view over a key-state table: live keys per
    * cohort + exact cent sum. */
  def cohortAgg(state: DataFrame): DataFrame = {
    import state.sparkSession.implicits._
    state.filter($"deleted" === 0)
      .groupBy($"cohort")
      .agg(count(lit(1)).as("n_keys"), sum($"cents").as("sum_cents"))
  }

  /** C37 incremental materialized-view maintenance — keep a grouped
    * aggregate (cohort → live-key count, cent sum) current under a
    * CDC delta WITHOUT re-aggregating the corpus: the delta's latest
    * per-key state joins the BASE key-state table for each touched
    * key's old contribution, the (new − old) contributions aggregate
    * per cohort (delta-sized), and that tiny frame merges into the
    * base aggregate by a full-outer coalesce — upserts retract the
    * old value and add the new, tombstones retract, revivals re-add,
    * unseen keys insert. Run cost scales with the DELTA (one
    * delta-keyed aggregate + one key-lookup join + one cohort-sized
    * merge); the corpus-sized base state/agg are read-only inputs —
    * at 100 TB the lookup join is the H12 bucketed / H13
    * copy-on-write layout's co-located read, and the same
    * (old, new) pairing is what a Flink/Materialize retraction
    * stream carries. PRECONDITION (the H13 contract): the grouping
    * key is a pure function of the record key — a cohort derived
    * from mutable payload would need the old row's group retracted
    * and the new row's added, which this single-group merge does not
    * model. Spec pins base+delta == full recompute across upserts,
    * deletes, revivals, inserts; the graded entry splits the events
    * changelog at the 80th commit percentile and must hash-match the
    * split-UNAWARE full-recompute oracle. */
  def incrAggMerge(baseState: DataFrame, baseAgg: DataFrame,
      deltaChanges: DataFrame): DataFrame = {
    import baseState.sparkSession.implicits._
    val d = keyState(deltaChanges).alias("d")
    // old-contribution lookup WITHOUT shuffling the corpus-sized base
    // state: the delta's key set broadcasts into a hash semi-join, so
    // the base state STREAMS (scan + filter, no Exchange) down to the
    // delta-sized touched set before the left join pairs old with
    // new. Without this the left join repartitions all of baseState
    // on every delta (measured 6.4 s vs 3.5 s full recompute at 10⁶
    // keys — slower than what it was meant to avoid; with it the
    // stress spec pins merge ≪ recompute). At 100 TB the stream-side
    // scan additionally prunes via the H12 bucketed / H19
    // stats-skipped layout.
    val b = baseState
      .join(broadcast(d.select($"user_id")), Seq("user_id"))
      .alias("b")
    val contrib = d.join(b, Seq("user_id"), "left")
      .select($"d.cohort".as("cohort"),
        (when($"d.deleted" === 0, lit(1L)).otherwise(lit(0L)) -
          when($"b.deleted" === 0, lit(1L)).otherwise(lit(0L))).as("dcnt"),
        (when($"d.deleted" === 0, $"d.cents").otherwise(lit(0L)) -
          when($"b.deleted" === 0, $"b.cents").otherwise(lit(0L))).as("dcents"))
    val perCohort = contrib.groupBy($"cohort")
      .agg(sum($"dcnt").as("dn"), sum($"dcents").as("ds"))
    baseAgg.join(perCohort, Seq("cohort"), "full_outer")
      .select($"cohort",
        (coalesce($"n_keys", lit(0L)) + coalesce($"dn", lit(0L))).as("n_keys"),
        (coalesce($"sum_cents", lit(0L)) + coalesce($"ds", lit(0L)))
          .as("sum_cents"))
      .filter($"n_keys" > 0)
  }

  /** Graded adapter: split the events changelog at the 80th commit
    * percentile (in-plan scalar, broadcast — no driver round-trip),
    * maintain the view incrementally across the split. The oracle is
    * the split-UNAWARE full recompute, so the hash proves the merge
    * algebra, not the split. */
  private def incrAggEntry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ch = mvChanges(Tables.events(s, dir))
    val cut = ch.agg(expr("max(event_id) * 4 div 5").as("cutoff"))
    val withCut = ch.crossJoin(broadcast(cut))
    val base = withCut.filter($"event_id" <= $"cutoff")
      .drop("cutoff")
    val delta = withCut.filter($"event_id" > $"cutoff")
      .drop("cutoff")
    val bState = keyState(base)
    incrAggMerge(bState, cohortAgg(bState), delta)
      .orderBy($"cohort")
  }

  /** C42 GDPR erasure over the versioned history (the
    * right-to-be-forgotten pass every regulated CDC deployment runs):
    * remove EVERY version of every requested key from the C3 SCD2
    * history — not just current state; retention law applies to the
    * history table too. The request set is broadcast (it is
    * request-sized, never corpus-sized) and the purge is one
    * anti-join; surviving users' version chains are untouched —
    * `lead` windows are per-user, so purging user A cannot re-close
    * or re-open user B's versions (spec-pinned). At 100 TB this
    * composes with H13's copy-on-write merge: the anti-join output
    * rewrites only partitions containing requested keys. */
  def forget(events: DataFrame, forgetUsers: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    scd2(events)
      .join(broadcast(forgetUsers.select($"user_id").distinct()),
        Seq("user_id"), "left_anti")
      .orderBy($"user_id", $"event_id")
  }

  /** C44 first-order event-type transition matrix (the Markov-chain
    * readout of user behavior — "after a view, what comes next?" —
    * the model behind next-action prediction baselines and funnel
    * drop-off attribution): per-user (ts, event_id)-ordered lag
    * pairs WITHIN the C5 30-minute session boundary (a transition
    * across sessions is noise by definition), transition counts and
    * row totals exact BIGINT, probabilities exported as integer
    * ppm floor-divs. One sessionize window pass + one lag over the
    * same order + one aggregate — all user-keyed. */
  def transitions(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val seq = withSessionSeq(events)
      .withColumn("prev_type", lag($"event_type", 1).over(wOrd))
      .withColumn("prev_session",
        lag($"session_seq", 1).over(wOrd))
      .filter($"prev_type".isNotNull &&
        $"prev_session" === $"session_seq")
    val counts = seq.groupBy($"prev_type".as("from_type"),
        $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"from_type")))
      .select($"from_type", $"to_type", $"n", $"row_total",
        expr("n * 1000000 div row_total").as("p_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  private def onEvents(f: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tables.events(s, dir))

  /** C47 Markov stationary distribution (where C44's transition
    * matrix settles — the long-run state mix a capacity model feeds
    * from): 5 power-iteration steps over the session-bounded
    * transition counts in 10¹² fixed-point BIGINTs, each step ONE
    * equi-join + ONE grouped sum shuffled on the state key (the I1
    * PageRank shape — no driver matrix, so a billion-state graph
    * iterates the same plan). Per-cell mass r·n div rowsum runs the
    * product in DECIMAL(38,0)/HUGEINT so fixed-point × count never
    * overflows at any SF; the ≤1 floor leak per cell is deterministic
    * and identical in the twin. States with no outgoing edges absorb
    * (raw iteration, no reinjection — documented contract). */
  /** The C43 transition-count + fixed-point power-iteration core —
    * shared by the stationary-distribution report and the C58
    * entropy rate. Returns (counts with row totals, π frame). */
  private def markovParts(events: DataFrame,
      iters: Int): (DataFrame, DataFrame) = {
    import events.sparkSession.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val seq = withSessionSeq(events)
      .withColumn("prev_type", lag($"event_type", 1).over(wOrd))
      .withColumn("prev_session", lag($"session_seq", 1).over(wOrd))
      .filter($"prev_type".isNotNull && $"prev_session" === $"session_seq")
    val counts = seq.groupBy($"prev_type".as("from_type"),
        $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"from_type")))
      .localCheckpoint()
    val states = counts.select($"from_type".as("state"))
      .union(counts.select($"to_type".as("state"))).distinct()
    var pi = states.select($"state", lit(1000000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = counts
        .join(pi.withColumnRenamed("state", "from_type"), "from_type")
        .select($"to_type".as("state"),
          expr("cast(r as decimal(38,0)) * n div row_total").as("c"))
      pi = states.join(
          contrib.groupBy($"state").agg(sum($"c").as("s")),
          Seq("state"), "left")
        .select($"state", coalesce($"s", lit(0L)).as("r"))
    }
    (counts, pi)
  }

  def markovStationary(events: DataFrame, iters: Int = 5): DataFrame = {
    import events.sparkSession.implicits._
    val (_, pi) = markovParts(events, iters)
    pi.select($"state", $"r".as("pi_fp"),
        round($"r".cast("double") / 1e12, 6).as("pi"))
      .orderBy($"state")
  }

  /** C58 Markov ENTROPY RATE of the session transition chain
    * (Cover/Thomas §4.2, H = −Σᵢ πᵢ Σⱼ Pᵢⱼ ln Pᵢⱼ — the one-number
    * "how predictable is user behavior" summary over C43's π and
    * C44's transition matrix: low = rigid funnels, high = aimless
    * browsing; its exp is the effective branching factor a sequence
    * model must beat): per-(i,j) terms are one identical IEEE
    * expression from EXACT integers (C43's fixed-point πᵢ, the exact
    * n/row_total rationals), folded in pinned (from, to) order over
    * the |S|²-bounded transition frame; perplexity = exp(H). */
  def markovEntropy(events: DataFrame, iters: Int = 5): DataFrame = {
    import events.sparkSession.implicits._
    val (counts, pi) = markovParts(events, iters)
    val nStates = pi.count()
    counts.join(pi.withColumnRenamed("state", "from_type"), "from_type")
      .withColumn("t", ($"r".cast("double") / lit(1e12)) *
        ($"n".cast("double") / $"row_total".cast("double")) *
        log($"n".cast("double") / $"row_total".cast("double")))
      .agg(count(lit(1)).as("n_transitions"),
        sort_array(collect_list(struct($"from_type", $"to_type", $"t")))
          .as("ts"))
      .withColumn("h", expr(
        "-aggregate(transform(ts, x -> x.t), 0D, (a, x) -> a + x)"))
      .select(lit(nStates).as("n_states"), $"n_transitions",
        round($"h", 6).as("entropy_rate_nats"),
        round(exp($"h"), 4).as("perplexity"))
  }

  /** C46 RFM segmentation (the recency/frequency/monetary quintile
    * grid a CRM feeds its campaign targeting from): per-user recency
    * (whole hours to the corpus max, exact µs div), frequency and
    * cent-exact monetary, each bucketed into quintiles by the
    * EXPLICIT rank formula ⌊(rank−1)·5/n⌋+1 with (metric, user_id)
    * total order — NOT the builtin ntile, so the bucket rule is the
    * same arithmetic in both engines AND the rank itself is computed
    * scale-shaped: a distinct-value cumulative histogram (A29) plus a
    * row_number partitioned BY METRIC VALUE for the tie-break, so no
    * global row_number window over the user table anywhere. Recency
    * is inverted (recent = 5). Output carries the three scores and
    * the familiar 3-digit rfm_code. */
  def rfm(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val users = events
      .groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(round($"value" * 100).cast("long")).as("monetary_cents"))
      .withColumn("recency_h",
        expr("(max(last_us) OVER () - last_us) div 3600000000"))
      .drop("last_us")
    // ascending quintile of `m` with user_id tie-break, rank assembled
    // from the distinct-value histogram — no unpartitioned row_number
    def quintile(df: DataFrame, m: String, score: String): DataFrame = {
      val counts = df.groupBy(col(m)).agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy(col(m))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(Window.partitionBy()))
        .select(col(m), ($"cum" - $"c").as("cum_prev"), $"n")
      val wTie = Window.partitionBy(col(m)).orderBy($"user_id")
      df.join(cum, m)
        .withColumn("rk", $"cum_prev" + row_number().over(wTie))
        .withColumn(score, expr("(rk - 1) * 5 div n + 1"))
        .drop("cum_prev", "n", "rk")
    }
    val s0 = quintile(users, "recency_h", "r_asc")
    val s1 = quintile(s0, "frequency", "f_score")
    val s2 = quintile(s1, "monetary_cents", "m_score")
    s2.select($"user_id", $"recency_h", $"frequency", $"monetary_cents",
        (lit(6L) - $"r_asc").as("r_score"), $"f_score", $"m_score")
      .withColumn("rfm_code",
        $"r_score" * 100 + $"f_score" * 10 + $"m_score")
      .orderBy($"user_id")
  }

  /** C48 interval union (gaps-and-islands over [start, end) spans —
    * the coverage statistic behind "how many distinct on-call windows
    * did this user actually occupy"): each event opens a fixed-length
    * 10-minute interval; overlapping or TOUCHING intervals merge
    * (new island iff start strictly exceeds the running max end of
    * all earlier intervals — the exclusive-prefix max, one keyed
    * window). Output per user: island count, exact covered
    * microseconds, longest island. Duplicate starts are
    * order-interchangeable so the window tie needs no extra key.
    * All integer; one window + two aggregates, everything keyed on
    * the high-cardinality user id. */
  def intervalUnion(events: DataFrame, lenUs: Long = 600000000L): DataFrame = {
    import events.sparkSession.implicits._
    val iv = events.select($"user_id", unix_micros($"ts").as("s"))
      .withColumn("e", $"s" + lenUs)
    val wOrd = Window.partitionBy($"user_id").orderBy($"s")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("pmax", max($"e").over(wPrev))
      .withColumn("is_new",
        when($"pmax".isNull || $"s" > $"pmax", 1L).otherwise(0L))
      .withColumn("island", sum($"is_new").over(wRun))
      .groupBy($"user_id", $"island")
      .agg(min($"s").as("is"), max($"e").as("ie"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum($"ie" - $"is").as("covered_us"),
        max($"ie" - $"is").as("longest_us"))
      .orderBy($"user_id")
  }

  /** C61 ingest-LAG percentiles per event type — the end-to-end
    * latency panel every CDC consumer runs next to C36's late-data
    * audit (C36 counts what the watermark DROPPED; this measures how
    * late the feed RUNS): exact p50/p90/p99/max of the event-time →
    * arrival delay via the A29 cumulative VALUE-DOMAIN histogram
    * (type-1 ranks, never a corpus-row window). The delay is the
    * C25/C50 deterministic wire stand-in — both engines regenerate
    * `((event_id % 1000003) * 97) % 5000000` µs; a real feed binds
    * its arrival timestamp here. All integer; mean as floor-div. */
  def lagQuantiles(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val del = events.select($"event_type",
      expr("((event_id % 1000003) * 97) % 5000000").as("lag_us"))
    val h = del.groupBy($"event_type", $"lag_us")
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy($"event_type").orderBy($"lag_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
    cum.groupBy($"event_type")
      .agg(max($"n").as("n_events"),
        expr("sum(lag_us * c) div sum(c)").as("mean_us"),
        min(when($"cum" >= ceil(lit(0.5) * $"n"), $"lag_us")).as("p50_us"),
        min(when($"cum" >= ceil(lit(0.9) * $"n"), $"lag_us")).as("p90_us"),
        min(when($"cum" >= ceil(lit(0.99) * $"n"), $"lag_us")).as("p99_us"),
        max($"lag_us").as("max_us"))
      .orderBy($"event_type")
  }

  /** C63 sequence-GAP audit over the event-id space ("did the feed
    * lose messages" — the completeness check a CDC consumer runs
    * against a producer's monotonically-assigned ids; C60's feed
    * audit counts re-deliveries and inversions, this counts the
    * HOLES): islands over the distinct id space → gap count, total
    * missing ids, widest gap.
    *
    * Scale shape: NO global window (an unpartitioned lead over 10¹⁰
    * ids is one task) — the A45/F14 two-level decomposition: ids
    * bucket by id div 10⁴, within-bucket gaps from a PARTITIONED
    * lead, cross-bucket gaps from the bucket-summary frame (bucket
    * count-sized, its one ordered window runs on thousands of rows,
    * not the corpus; empty buckets between neighbors fold into the
    * boundary gap). All exact integers. */
  def gapDetect(events: DataFrame, bucketSize: Long = 10000L): DataFrame = {
    import events.sparkSession.implicits._
    val ids = events.select($"event_id".as("id")).distinct()
      .withColumn("bkt", expr(s"id div $bucketSize"))
      .localCheckpoint()
    val wIn = Window.partitionBy($"bkt").orderBy($"id")
    val inner = ids
      .withColumn("nxt", lead($"id", 1).over(wIn))
      .filter($"nxt".isNotNull && $"nxt" - $"id" > 1L)
      .agg(count(lit(1)).as("gaps_in"),
        sum($"nxt" - $"id" - 1L).as("miss_in"),
        max($"nxt" - $"id" - 1L).as("maxgap_in"))
    val summary = ids.groupBy($"bkt")
      .agg(min($"id").as("bmin"), max($"id").as("bmax"),
        count(lit(1)).as("bn"))
    val wB = Window.orderBy($"bkt")
    val cross = summary
      .withColumn("nmin", lead($"bmin", 1).over(wB))
      .filter($"nmin".isNotNull && $"nmin" - $"bmax" > 1L)
      .agg(count(lit(1)).as("gaps_x"),
        sum($"nmin" - $"bmax" - 1L).as("miss_x"),
        max($"nmin" - $"bmax" - 1L).as("maxgap_x"))
    val bounds = ids.agg(count(lit(1)).as("n_ids"), min($"id").as("id_min"),
      max($"id").as("id_max"))
    bounds.crossJoin(inner).crossJoin(cross)
      .select($"n_ids", $"id_min", $"id_max",
        (coalesce($"gaps_in", lit(0L)) + coalesce($"gaps_x", lit(0L)))
          .as("n_gaps"),
        (coalesce($"miss_in", lit(0L)) + coalesce($"miss_x", lit(0L)))
          .as("n_missing"),
        greatest(coalesce($"maxgap_in", lit(0L)),
          coalesce($"maxgap_x", lit(0L))).as("max_gap"))
  }

  /** C77 SLIDING-HOUR BURST detection per user (the rate-limit /
    * abuse audit C65's per-TYPE interarrival profile cannot answer:
    * "which USERS hit us hardest in any one hour" — the question a
    * token-bucket tuner or bot hunter asks first): max over t of
    * |events in (t−1h, t]| per user, via a microsecond RANGE window
    * PARTITIONED by user (the frame grows with per-user activity,
    * never the corpus — the SURVEY §5 keyed-window contract), then
    * one keyed max. Top-k rides (burst DESC, user) — a total
    * order. */
  def burstUsers(events: DataFrame, topK: Int = 20): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.select($"user_id", unix_micros($"ts").as("us"))
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600000000L, 0)
    e.withColumn("b", count(lit(1)).over(w))
      .groupBy($"user_id")
      .agg(max($"b").as("max_burst_1h"), count(lit(1)).as("n_events"))
      .orderBy(desc("max_burst_1h"), $"user_id")
      .limit(topK)
  }

  /** C65 INTER-ARRIVAL burstiness profile per event type (the
    * ops-monitor companion of C63's id-space gaps: C63 audits WHAT
    * arrived, this audits WHEN — a Poisson-ish feed has CV ≈ 1;
    * CV ≫ 1 means bursts + silences, the regime where per-second
    * autoscaling and watermark settings both need headroom): gap
    * count, mean gap, coefficient of variation, and the
    * Goh-Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1).
    *
    * 100 TB shape: NO per-type global sort — the gap multiset of a
    * sorted sequence decomposes exactly by the A45/F14 two-level
    * split (within-day gaps from a (type, day)-keyed window +
    * day-boundary gaps from the day-summary frame: min_us(next) −
    * max_us(prev) — tie order inside equal timestamps permutes only
    * zero gaps, so the multiset is order-invariant). Σg and Σg² are
    * exact BIGINT/decimal(38,0); sample variance
    * (n·Σg²−(Σg)²)/(n(n−1)) is one decimal→double division, then a
    * pinned sqrt/divide tail. */
  def interarrival(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.select($"event_type", unix_micros($"ts").as("us"),
      to_date($"ts").as("day"), $"event_id")
    val wIn = Window.partitionBy($"event_type", $"day")
      .orderBy($"us", $"event_id")
    val inner = e.withColumn("g", $"us" - lag($"us", 1).over(wIn))
      .filter($"g".isNotNull).select($"event_type", $"g")
    val daySum = e.groupBy($"event_type", $"day")
      .agg(min($"us").as("mn"), max($"us").as("mx"))
    val wD = Window.partitionBy($"event_type").orderBy($"day")
    val bound = daySum
      .withColumn("g", $"mn" - lag($"mx", 1).over(wD))
      .filter($"g".isNotNull).select($"event_type", $"g")
    inner.unionByName(bound)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"), sum($"g").as("sg"),
        sum($"g".cast("decimal(38,0)") * $"g").as("sq"))
      .filter($"n_gaps" >= 2L && $"sg" > 0L)
      .withColumn("mean_us",
        $"sg".cast("double") / $"n_gaps".cast("double"))
      .withColumn("sd", sqrt(expr(
        "cast(cast(n_gaps as decimal(38,0)) * sq - cast(sg as " +
          "decimal(38,0)) * sg as double)" +
          " / cast(n_gaps * (n_gaps - 1) as double)")))
      .select($"event_type", $"n_gaps",
        // exported mean is EXACT-integer-derived: (sg·10⁶ div n) is an
        // exact decimal floor-div, its int→double conversion and the
        // one ÷10⁶ are correctly rounded in both engines — round(x, 6)
        // on a ~1e10 double needs 17 significant digits and the two
        // engines pick different neighbors (the sf0.001 lesson)
        (expr("cast((cast(sg as decimal(38,0)) * 1000000) div n_gaps " +
          "as double)") / 1e6).as("mean_us"),
        round($"sd" / $"mean_us", 6).as("cv"),
        round(($"sd" - $"mean_us") / ($"sd" + $"mean_us"), 6)
          .as("burstiness"))
      .orderBy($"event_type")
  }

  /** C66 McNEMAR paired-proportion test (McNemar 1947 — the paired
    * twin of A47's two-sample z: each USER is their own control, so
    * "do more users click than purchase" is decided ONLY by the
    * discordant pairs b = click-only, c = purchase-only;
    * χ² = (|b−c|−1)²/(b+c) with Edwards' continuity correction —
    * the concordant mass that swamps an unpaired test cancels out).
    * One hash aggregate per user then one global row: every count
    * exact integer, the statistic ONE integer²/integer division. */
  def mcnemar(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val flags = events.groupBy($"user_id")
      .agg(max(($"event_type" === "click").cast("long")).as("a"),
        max(($"event_type" === "purchase").cast("long")).as("b"))
    flags
      .agg(count(lit(1)).as("n_users"),
        sum($"a" * $"b").as("n_both"),
        sum($"a" * (lit(1L) - $"b")).as("n_click_only"),
        sum((lit(1L) - $"a") * $"b").as("n_purchase_only"))
      .withColumn("chi2", when($"n_click_only" + $"n_purchase_only" > 0L,
        round(((abs($"n_click_only" - $"n_purchase_only") - 1L) *
          (abs($"n_click_only" - $"n_purchase_only") - 1L)).cast("double")
          / ($"n_click_only" + $"n_purchase_only").cast("double"), 6)))
      .withColumn("significant",
        coalesce(($"chi2" > 3.841).cast("long"), lit(0L)))
  }

  /** C68 per-state DWELL-TIME profile (the DURATION face of C44's
    * transition COUNTS: a funnel that converts in the same
    * click→purchase graph can still be dying if users now dwell 10×
    * longer in 'view' — time-in-state is the metric; each event's
    * dwell is the gap to the SAME user's next event, attributed to
    * the state being left). Terminal events (no successor) carry no
    * dwell and drop — stated. One keyed window on the
    * high-cardinality user axis + one aggregate; all integers to
    * one mean division. */
  def dwell(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("next_us", lead(unix_micros($"ts"), 1).over(w))
      .filter($"next_us".isNotNull)
      .withColumn("g", $"next_us" - $"us")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_dwells"), sum($"g").as("total_us"),
        max($"g").as("max_us"))
      .withColumn("mean_us", round(
        $"total_us".cast("double") / $"n_dwells".cast("double"), 6))
      .select($"event_type", $"n_dwells", $"total_us", $"max_us",
        $"mean_us")
      .orderBy($"event_type")
  }

  private[graft] val SloPpm = 250000L

  /** C69 SLO ERROR-BUDGET BURN monitor (the Google-SRE multi-window
    * burn alert, batch-replayed: a 1-day error-rate spike alone can
    * be a blip, a high 7-day rate alone is old news — paging fires
    * only when BOTH the fast and slow windows burn past the SLO,
    * here 25% expressed as [[SloPpm]] with 1× burn thresholds for
    * simplicity, stated): per day the event/error counts, the 1-day
    * and trailing-7-day error rates (integer ppm), and the
    * two-window alert flag.
    *
    * The trailing window RANGES over the integer day index, so
    * calendar gaps shrink the denominator instead of silently
    * stretching the window (a ROWS frame would look 7 PRESENT days
    * back); the alert compares exact integer cross-products, never
    * the divided ppm. Day-grid-sized frame throughout. */
  def sloBurn(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val daily = events.groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(($"event_type" === "error").cast("long")).as("n_errors"))
      .withColumn("di", datediff($"day", lit("1970-01-01")))
    val w7 = Window.orderBy($"di").rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("e7", sum($"n_errors").over(w7))
      .withColumn("t7", sum($"n_events").over(w7))
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_events", $"n_errors",
        expr("n_errors * 1000000 div n_events").as("rate1_ppm"),
        expr("e7 * 1000000 div t7").as("rate7_ppm"),
        (($"n_errors" * 1000000L > $"n_events" * SloPpm) &&
          ($"e7" * 1000000L > $"t7" * SloPpm)).cast("long")
          .as("burn_alert"))
      .orderBy($"day")
  }

  /** C70 CUPED variance-reduced experiment readout (Deng et al.
    * 2013 — the adjustment every mature experimentation platform
    * applies before reading A47's z: a user's PRE-period activity
    * explains much of their post-period variance, so regressing it
    * out shrinks the CI by the squared correlation ρ² at zero cost
    * in bias): users split by the A47 id-parity arms, the observed
    * window splits at its midpoint day into pre (covariate x) and
    * post (metric y), θ = Cov(x,y)/Var(x) pooled across arms, and
    * the readout carries the raw and CUPED-adjusted arm deltas plus
    * the variance-reduction share ρ².
    *
    * Exactness: per-user counts are integers; Cov/Var clear
    * denominators (n·Σxy − ΣxΣy etc., exact decimal(38,0) ==
    * HUGEINT), θ is ONE division of two exact integers, and the
    * adjusted deltas are a pinned IEEE chain over exact arm sums —
    * textually mirrored in the twin. Zero pre-period variance
    * (θ undefined) nulls the adjusted columns, raw delta stays. */
  /** C76 mSPRT — the ALWAYS-VALID A/B monitor (Johari-Pekelis-Walsh
    * mixture sequential probability ratio test; the fix for the
    * peeking problem every live experiment dashboard has: a fixed-n
    * test read daily inflates false positives several-fold, while
    * the mSPRT's Λ_n is a martingale under H0, so P(ever cross 1/α)
    * ≤ α no matter how often anyone looks): users split by the A47
    * id-parity arms, daily diff S_n = Σ(a_t − b_t) and volume
    * V_n = Σ(a_t + b_t) accumulate per event type, and with the
    * normal mixture τ² the log statistic is
    * lnΛ_n = ½·ln(V/(V+τ²)) + τ²·S²/(2V(V+τ²)). Readout: the final
    * and max lnΛ plus the FIRST day index crossing ln(1/α) at
    * α = 0.05 — the day the experiment could have stopped.
    *
    * Determinism: S and V are exact BIGINT ordered cumsums (S² fits
    * int64 to ~3·10⁹ events/arm; decimal past that); lnΛ is the
    * identical IEEE chain on identical integers in both engines,
    * maxed (not summed) across rows; export rounds absorb the ulp.
    * All windows run over the frame-bounded daily grid. */
  def msprt(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val tau2 = 10000.0
    val daily = events
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("a"),
        sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("b"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vD = $"v".cast("double")
    val cum = daily
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("s", sum($"a" - $"b").over(wCum))
      .withColumn("v", sum($"a" + $"b").over(wCum))
      .withColumn("lln",
        lit(0.5) * log(vD / (vD + lit(tau2))) +
          lit(tau2) * ($"s" * $"s").cast("double") /
            (lit(2.0) * vD * (vD + lit(tau2))))
      .withColumn("cross", when($"lln" >= log(lit(20.0)), $"i"))
    cum.groupBy($"event_type")
      .agg(max($"i").as("n_days"),
        max(struct($"i", $"s")).getField("s").as("s_final"),
        max(struct($"i", $"v")).getField("v").as("v_final"),
        round(max(struct($"i", $"lln")).getField("lln"), 6)
          .as("lln_final"),
        round(max($"lln"), 6).as("max_lln"),
        min($"cross").as("first_cross_day"))
      .orderBy($"event_type")
  }

  def cuped(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.withColumn("di",
      datediff(to_date($"ts"), lit("1970-01-01")))
    val bounds = e.agg(min($"di").as("lo"), max($"di").as("hi"))
    val perUser = e.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("(lo + hi + 1) div 2"))
      .groupBy($"user_id")
      .agg(sum(when($"di" < $"mid", 1L).otherwise(0L)).as("x"),
        sum(when($"di" >= $"mid", 1L).otherwise(0L)).as("y"))
      .select(($"user_id" % 2).as("cohort"), $"x", $"y")
    val mom = perUser.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
      sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
      sum($"y".cast("decimal(38,0)") * $"y").as("syy"))
    val arms = perUser.groupBy($"cohort")
      .agg(count(lit(1)).as("na"), sum($"x").as("sxa"),
        sum($"y").as("sya"))
    val a = arms.filter($"cohort" === 0)
      .select($"na".as("n_a"), $"sxa".as("sx_a"), $"sya".as("sy_a"))
    val b = arms.filter($"cohort" === 1)
      .select($"na".as("n_b"), $"sxa".as("sx_b"), $"sya".as("sy_b"))
    a.crossJoin(b).crossJoin(mom)
      .withColumn("covn", expr(
        "cast(cast(n as decimal(38,0)) * sxy - " +
          "cast(sx as decimal(38,0)) * sy as double)"))
      .withColumn("varx", expr(
        "cast(cast(n as decimal(38,0)) * sxx - " +
          "cast(sx as decimal(38,0)) * sx as double)"))
      .withColumn("vary", expr(
        "cast(cast(n as decimal(38,0)) * syy - " +
          "cast(sy as decimal(38,0)) * sy as double)"))
      .withColumn("theta", when($"varx" > 0.0, $"covn" / $"varx"))
      .withColumn("meanx",
        $"sx".cast("double") / $"n".cast("double"))
      .withColumn("diff_raw",
        $"sy_b".cast("double") / $"n_b".cast("double") -
          $"sy_a".cast("double") / $"n_a".cast("double"))
      .withColumn("diff_cuped",
        ($"sy_b".cast("double") - $"theta" *
          ($"sx_b".cast("double") - $"n_b".cast("double") * $"meanx"))
          / $"n_b".cast("double") -
        ($"sy_a".cast("double") - $"theta" *
          ($"sx_a".cast("double") - $"n_a".cast("double") * $"meanx"))
          / $"n_a".cast("double"))
      .select($"n".as("n_users"), $"n_a", $"n_b",
        round($"theta", 6).as("theta"),
        when($"varx" > 0.0 && $"vary" > 0.0,
          round($"covn" * $"covn" / ($"varx" * $"vary"), 6))
          .as("rho2"),
        round($"diff_raw", 6).as("diff_raw"),
        round($"diff_cuped", 6).as("diff_cuped"))
  }

  /** C71 SAMPLE-RATIO-MISMATCH gate (the #1 A/B sanity check in
    * practice — a 50/50 split that arrives 48/52 means assignment,
    * logging, or bot filtering is broken and EVERY downstream
    * readout is garbage; run before A47/C70, not after):
    * χ² = (n_a − n_b)²/(n_a + n_b) over the user split vs
    * χ²(1) = 3.841. All integers to one division; the flag compares
    * the ROUNDED χ² (the C66 lesson). */
  def srm(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"),
        sum(($"user_id" % 2 === 0).cast("long")).as("n_a"),
        sum(($"user_id" % 2 =!= 0).cast("long")).as("n_b"))
      .withColumn("chi2", round(
        (($"n_a" - $"n_b") * ($"n_a" - $"n_b")).cast("double") /
          ($"n_a" + $"n_b").cast("double"), 6))
      .select($"n_users", $"n_a", $"n_b", $"chi2",
        ($"chi2" > 3.841).cast("long").as("srm_flag"))
  }

  /** C73 GROWTH-ACCOUNTING ledger per calendar month (the
    * new/retained/resurrected/churned decomposition every
    * subscription/DAU review runs — a flat "active users" line can
    * hide a leaky bucket where heavy acquisition masks heavy churn;
    * the ledger makes the four flows explicit): per month the
    * active count, first-ever users (new), users also active the
    * PREVIOUS calendar month (retained), users returning after a
    * gap (resurrected), and users active last month who went silent
    * (churned_in, attributed to the month they failed to appear
    * in — reported only for months that exist in the activity
    * frame, stated).
    *
    * All counts are exact integers from one distinct user-month
    * frame: new/retained/resurrected from a per-user lag, churned
    * from one anti-join of the month-shifted frame — no float
    * anywhere. */
  def growthAccounting(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val um = events
      .select($"user_id",
        date_trunc("month", $"ts").cast("date").as("month"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"month")
    val flags = um
      .withColumn("prev", lag($"month", 1).over(w))
      .withColumn("is_new", $"prev".isNull.cast("long"))
      // null prev must read as 0, not null (a month of only new
      // users would otherwise sum its retained flag to NULL)
      .withColumn("is_retained", coalesce(
        ($"prev" === add_months($"month", -1)).cast("long"), lit(0L)))
      .withColumn("is_resurrected",
        ($"prev".isNotNull && $"prev" < add_months($"month", -1))
          .cast("long"))
    val monthly = flags.groupBy($"month")
      .agg(count(lit(1)).as("n_active"), sum($"is_new").as("n_new"),
        sum($"is_retained").as("n_retained"),
        sum($"is_resurrected").as("n_resurrected"))
    val churned = um
      .select($"user_id", add_months($"month", 1).as("month"))
      .join(um, Seq("user_id", "month"), "left_anti")
      .groupBy($"month").agg(count(lit(1)).as("ch"))
    monthly.join(churned, Seq("month"), "left")
      .select(date_format($"month", "yyyy-MM").as("month"),
        $"n_active", $"n_new", $"n_retained", $"n_resurrected",
        coalesce($"ch", lit(0L)).as("n_churned_in"))
      .orderBy($"month")
  }

  /** C74 DAU/MAU STICKINESS per calendar month (the engagement
    * companion of C73's flow ledger: the ledger says WHO moved,
    * stickiness says how OFTEN the actives come back — mean daily
    * actives over monthly actives, the ratio every consumer product
    * reports): per month the MAU, the mean DAU over the month's
    * PRESENT days (absent days are capture gaps, not zeros —
    * stated), and stickiness as exact integer ppm via cross-
    * multiplication (Σdau·10⁶ div (n_days·mau)), never a divided
    * float. Two distinct-frames and two aggregates — all integer. */
  def stickiness(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ud = events.select($"user_id", to_date($"ts").as("day"),
      date_trunc("month", $"ts").cast("date").as("month")).distinct()
    val dau = ud.groupBy($"month", $"day")
      .agg(count(lit(1)).as("dau"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_days"), sum($"dau").as("sum_dau"))
    val mau = ud.select($"user_id", $"month").distinct()
      .groupBy($"month").agg(count(lit(1)).as("mau"))
    dau.join(mau, "month")
      .select(date_format($"month", "yyyy-MM").as("month"),
        $"n_days", $"mau",
        expr("sum_dau * 1000000 div (n_days * mau)")
          .as("stickiness_ppm"))
      .orderBy($"month")
  }

  /** C78 QUEUE DEPTH via the Lindley recursion (Lindley 1952 — the
    * backlog curve every ingest/consumer-lag dashboard is secretly
    * plotting: with hourly arrivals aₜ against fixed service capacity
    * c, the waiting work obeys Wₜ = max(0, Wₜ₋₁ + aₜ − c), whose
    * closed form Wₜ = Sₜ − min₀≤ₖ≤ₜ Sₖ over prefix sums Sₜ = Σ(aᵢ−c)
    * turns the sequential recursion into TWO windowed passes — the
    * reason this runs distributed at all): per event type over the
    * densified hour grid, capacity = ceil(mean hourly arrivals)
    * (integer, from exact sums); readout = peak backlog, its hour,
    * hours backlogged, final backlog — all exact BIGINT. */
  def queueDepth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.events(s, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("a"))
    val spans = pts.groupBy($"event_type")
      .agg(min($"hr").as("h0"), max($"hr").as("h1"),
        sum($"a").as("tot"))
    val grid = spans
      .select($"event_type", $"tot",
        explode(expr(
          "sequence(h0, h1, interval 1 hour)")).as("hr"))
      .join(pts, Seq("event_type", "hr"), "left")
      .withColumn("a", coalesce($"a", lit(0L)))
    val w = Window.partitionBy($"event_type").orderBy($"hr")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = grid
      .withColumn("n_hours", count(lit(1)).over(
        Window.partitionBy($"event_type")))
      .withColumn("c", ceil($"tot".cast("double") /
        $"n_hours".cast("double")).cast("long"))
      .withColumn("s", sum($"a" - $"c").over(wCum))
      .withColumn("smin", least(min($"s").over(wCum), lit(0L)))
      .withColumn("depth", $"s" - $"smin")
    walked.groupBy($"event_type")
      .agg(max($"c").as("capacity"), max($"n_hours").as("n_hours"),
        max(struct($"depth", $"hr")).getField("depth").as("peak_backlog"),
        unix_micros(max(struct($"depth", $"hr")).getField("hr"))
          .as("peak_hour_us"),
        sum(when($"depth" > 0, 1L).otherwise(0L)).as("hours_backlogged"),
        max(struct($"hr", $"depth")).getField("depth").as("final_backlog"))
      .orderBy($"event_type")
  }

  /** C79 EXPONENTIAL-DECAY ENGAGEMENT SCORE (the recency-weighted
    * activity ranking every growth/notification system runs — C74's
    * stickiness is a ratio of calendar windows, this is the smooth
    * version: each event contributes 2^(−age/7d), so last week ≈
    * half of today): ages bound to the ≤~100-value day grid, so the
    * score folds EXACTLY — per (user, age) counts are integers and
    * the per-age weight is the FIXED-POINT integer round(2^(−age/7)·
    * 10⁹) (the A82 convention), making the sum an exact BIGINT in
    * both engines and the ranking total-ordered by (score desc,
    * user). Top-20 via TakeOrdered, never a global sort. */
  def decayScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day"))
    val horizon = ev.agg(max($"day")).collect()(0).getDate(0)
    val perAge = ev
      .withColumn("age", datediff(lit(horizon), $"day").cast("long"))
      .groupBy($"user_id", $"age")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w",
        round(pow(lit(0.5), $"age".cast("double") / lit(7.0)) * 1e9)
          .cast("long"))
    perAge.groupBy($"user_id")
      .agg(sum($"cnt").as("n_events"),
        sum($"cnt" * $"w").as("score_fp"))
      .orderBy($"score_fp".desc, $"user_id")
      .limit(20)
      .select($"user_id", $"n_events",
        round($"score_fp".cast("double") / 1e9, 6).as("decay_score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_queue_depth" -> queueDepth,
    "cdc_decay_score" -> decayScore,
    "cdc_stickiness" -> onEvents(stickiness),
    "cdc_growth_accounting" -> onEvents(growthAccounting),
    "cdc_cuped" -> onEvents(cuped),
    "cdc_msprt" -> onEvents(msprt),
    "cdc_srm" -> onEvents(srm),
    "cdc_slo_burn" -> onEvents(sloBurn),
    "cdc_dwell" -> onEvents(dwell),
    "cdc_interarrival" -> onEvents(interarrival),
    "cdc_burst_users" -> onEvents(e => burstUsers(e)),
    "cdc_mcnemar" -> onEvents(mcnemar),
    "cdc_gap_detect" -> onEvents(e => gapDetect(e)),
    "cdc_lag_quantiles" -> onEvents(lagQuantiles),
    "cdc_intervals" -> onEvents(e => intervalUnion(e)),
    "cdc_markov_pi" -> onEvents(e => markovStationary(e)),
    "cdc_markov_entropy" -> onEvents(e => markovEntropy(e)),
    "cdc_paths" -> onEvents(e => sessionPaths(e)),
    "cdc_feed_audit" -> onEvents(feedAudit),
    "cdc_rfm" -> ((s, dir) => rfm(Tables.events(s, dir))),
    "cdc_transitions" -> onEvents(transitions),
    "cdc_forget" -> onEvents(e =>
      forget(e, e.filter(col("user_id") % 10 === 3))),
    "cdc_session_attrib" -> onEvents(sessionAttrib),
    "cdc_dow_histogram" -> onEvents(dowHistogram),
    "cdc_asof_join" -> onEvents(asofJoin),
    "cdc_asof_interp" -> onEvents(asofInterp),
    "cdc_compact_changelog" -> onEvents(compactChangelog),
    "cdc_latest_state" -> onEvents(latestState),
    "cdc_apply_deletes" -> onEvents(applyDeletes),
    "cdc_scd2" -> onEvents(scd2),
    "cdc_event_counts" -> onEvents(eventCounts),
    "cdc_sessionize" -> onEvents(sessionize),
    "cdc_concurrency" -> onEvents(concurrency),
    "cdc_funnel" -> onEvents(funnel),
    "cdc_cohort" -> onEvents(cohortRetention),
    "cdc_parse_envelope" -> onEvents(e =>
      parseEnvelope(toEnvelopes(e)).orderBy(col("event_id"))),
    "cdc_schema_drift" -> onEvents(e =>
      schemaDrift(e.withColumn("props", driftedProps))),
    "cdc_bitemporal" -> onEvents(bitemporal),
    "cdc_funnel_window" -> onEvents(e => funnelWindow(e)),
    "cdc_late_audit" -> onEvents(lateAudit),
    "cdc_reorder_depth" -> onEvents(reorderDepth),
    "cdc_watermark_plan" -> onEvents(e => watermarkPlan(e)),
    "cdc_offset_islands" -> onEvents(offsetIslands),
    "cdc_incr_agg" -> (incrAggEntry(_, _)),
    "cdc_snapshot_diff" -> (snapshotDiffEntry(_, _)))

  /** Shared session-sequence CTEs (t → flagged → seq) — the DuckDB
    * twin of [[withSessionSeq]]. */
  private val sessionSeqCteSql =
    """t AS (
      |  SELECT *, epoch_us(ts) AS us,
      |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM t),
      |seq AS (
      |  SELECT *, sum(is_new) OVER (
      |    PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |    AS session_seq
      |  FROM flagged)""".stripMargin

  /** C47 twin: unrolled power-iteration CTEs over the identical
    * session-bounded counts — HUGEINT products, same floor leak. */
  private def markovSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT s.state, coalesce(c.s, 0)::BIGINT AS r
         |  FROM states s LEFT JOIN (
         |    SELECT t.to_type AS state,
         |      sum(p.r::HUGEINT * t.n // t.row_total)::BIGINT AS s
         |    FROM ct t JOIN p${i - 1} p ON p.state = t.from_type
         |    GROUP BY 1) c ON s.state = c.state)""".stripMargin
    }.mkString(",\n")
    s"""WITH $sessionSeqCteSql,
       |lagged AS (
       |  SELECT user_id, session_seq, event_type,
       |    lag(event_type) OVER w AS prev_type,
       |    lag(session_seq) OVER w AS prev_session
       |  FROM seq
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |counts AS (
       |  SELECT prev_type AS from_type, event_type AS to_type,
       |    count(*)::BIGINT AS n
       |  FROM lagged
       |  WHERE prev_type IS NOT NULL AND prev_session = session_seq
       |  GROUP BY 1, 2),
       |ct AS (
       |  SELECT from_type, to_type, n,
       |    (sum(n) OVER (PARTITION BY from_type))::BIGINT AS row_total
       |  FROM counts),
       |states AS (
       |  SELECT from_type AS state FROM ct
       |  UNION SELECT to_type FROM ct),
       |p0 AS (SELECT state, 1000000000000::BIGINT AS r FROM states),
       |$steps
       |SELECT state, r AS pi_fp, round(r::DOUBLE / 1e12, 6) AS pi
       |FROM p$iters ORDER BY state""".stripMargin
  }

  /** C58 twin: the C43 CTE chain verbatim + the identical per-(i,j)
    * IEEE term folded in the same (from, to) order. */
  private def markovEntropySql(iters: Int): String = {
    val base = markovSql(iters)
    val ctes = base.substring(0, base.lastIndexOf("SELECT state"))
    s"""${ctes.trim},
       |terms AS (
       |  SELECT t.from_type, t.to_type,
       |    (p.r::DOUBLE / 1e12) * (t.n::DOUBLE / t.row_total::DOUBLE)
       |      * ln(t.n::DOUBLE / t.row_total::DOUBLE) AS tt
       |  FROM ct t JOIN p$iters p ON p.state = t.from_type),
       |f AS (SELECT
       |  (SELECT count(*) FROM states)::BIGINT AS n_states,
       |  count(*)::BIGINT AS n_transitions,
       |  -list_reduce(list_prepend(0.0::DOUBLE,
       |     list(tt ORDER BY from_type, to_type)), (a, x) -> a + x) AS h
       |  FROM terms)
       |SELECT n_states, n_transitions, round(h, 6) AS entropy_rate_nats,
       |  round(exp(h), 4) AS perplexity FROM f""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // C78 twin: same densified hour grid, the same two-window Lindley
    // closed form on exact integers
    "cdc_queue_depth" ->
      """WITH pts AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*)::BIGINT AS a
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, min(hr) AS h0, max(hr) AS h1,
        |    sum(a)::BIGINT AS tot
        |  FROM pts GROUP BY 1),
        |grid_hours AS (
        |  SELECT event_type, tot,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM spans),
        |grid AS (
        |  SELECT g.event_type, g.tot, g.hr, coalesce(p.a, 0)::BIGINT AS a
        |  FROM grid_hours g
        |  LEFT JOIN pts p
        |    ON p.event_type = g.event_type AND p.hr = g.hr),
        |caps AS (
        |  SELECT event_type,
        |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n_hours,
        |    hr, a, tot
        |  FROM grid),
        |caps2 AS (
        |  SELECT *, ceil(tot::DOUBLE / n_hours::DOUBLE)::BIGINT AS c
        |  FROM caps),
        |sums AS (
        |  SELECT event_type, n_hours, c, hr,
        |    sum(a - c) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS UNBOUNDED PRECEDING) AS s
        |  FROM caps2),
        |walked AS (
        |  SELECT event_type, n_hours, c, hr, s,
        |    least(min(s) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS UNBOUNDED PRECEDING), 0) AS smin
        |  FROM sums),
        |d AS (
        |  SELECT event_type, n_hours, c, hr, (s - smin)::BIGINT AS depth
        |  FROM walked)
        |SELECT event_type, max(c)::BIGINT AS capacity,
        |  max(n_hours)::BIGINT AS n_hours,
        |  (max(struct_pack(depth := depth, hr := hr))).depth
        |    AS peak_backlog,
        |  epoch_us((max(struct_pack(depth := depth, hr := hr))).hr)
        |    ::BIGINT AS peak_hour_us,
        |  sum(CASE WHEN depth > 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS hours_backlogged,
        |  (max(struct_pack(hr := hr, depth := depth))).depth
        |    AS final_backlog
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // C79 twin: same fixed-point per-age weights, exact BIGINT score
    "cdc_decay_score" ->
      """WITH ev AS (
        |  SELECT user_id, ts::DATE AS day FROM events),
        |h AS (SELECT max(day) AS horizon FROM ev),
        |per_age AS (
        |  SELECT user_id,
        |    date_diff('day', day, (SELECT horizon FROM h))::BIGINT
        |      AS age,
        |    count(*)::BIGINT AS cnt
        |  FROM ev GROUP BY 1, 2),
        |wt AS (
        |  SELECT user_id, cnt,
        |    round(pow(0.5, age::DOUBLE / 7.0) * 1e9)::BIGINT AS w
        |  FROM per_age)
        |SELECT user_id, sum(cnt)::BIGINT AS n_events,
        |  round(sum(cnt * w)::DOUBLE / 1e9, 6) AS decay_score
        |FROM wt GROUP BY 1
        |ORDER BY sum(cnt * w) DESC, user_id LIMIT 20""".stripMargin,
    // C74 twin: same two distinct frames, same integer ppm
    // cross-multiplication
    "cdc_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, ts::DATE AS day,
        |    date_trunc('month', ts)::DATE AS month
        |  FROM events),
        |d AS (
        |  SELECT month, count(*)::BIGINT AS n_days,
        |    sum(dau)::BIGINT AS sum_dau
        |  FROM (SELECT month, day, count(*)::BIGINT AS dau
        |        FROM ud GROUP BY 1, 2) x
        |  GROUP BY 1),
        |m AS (
        |  SELECT month, count(*)::BIGINT AS mau
        |  FROM (SELECT DISTINCT user_id, month FROM ud) y
        |  GROUP BY 1)
        |SELECT strftime(d.month, '%Y-%m') AS month, d.n_days, m.mau,
        |  d.sum_dau * 1000000 // (d.n_days * m.mau) AS stickiness_ppm
        |FROM d JOIN m ON d.month = m.month
        |ORDER BY month""".stripMargin,
    // C73 twin: same distinct user-month frame, per-user lag flags,
    // month-shifted anti-join churn, all exact integers
    "cdc_growth_accounting" ->
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    date_trunc('month', ts)::DATE AS month
        |  FROM events),
        |f AS (
        |  SELECT user_id, month,
        |    lag(month, 1) OVER (PARTITION BY user_id ORDER BY month)
        |      AS prev
        |  FROM um),
        |m AS (
        |  SELECT month, count(*)::BIGINT AS n_active,
        |    sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_new,
        |    sum(CASE WHEN prev = (month - INTERVAL 1 MONTH)::DATE
        |      THEN 1 ELSE 0 END)::BIGINT AS n_retained,
        |    sum(CASE WHEN prev IS NOT NULL
        |      AND prev < (month - INTERVAL 1 MONTH)::DATE
        |      THEN 1 ELSE 0 END)::BIGINT AS n_resurrected
        |  FROM f GROUP BY 1),
        |ch AS (
        |  SELECT s.month, count(*)::BIGINT AS ch
        |  FROM (SELECT user_id,
        |          (month + INTERVAL 1 MONTH)::DATE AS month
        |        FROM um) s
        |  LEFT JOIN um ON s.user_id = um.user_id
        |    AND s.month = um.month
        |  WHERE um.user_id IS NULL GROUP BY 1)
        |SELECT strftime(m.month, '%Y-%m') AS month, m.n_active,
        |  m.n_new, m.n_retained, m.n_resurrected,
        |  coalesce(ch.ch, 0)::BIGINT AS n_churned_in
        |FROM m LEFT JOIN ch ON m.month = ch.month
        |ORDER BY month""".stripMargin,
    // C76 twin: same exact S/V cumsums in day order, same IEEE lnΛ
    // chain, same ln(20) crossing rule
    "cdc_msprt" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS b
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      ::BIGINT AS i,
        |    sum(a - b) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS s,
        |    sum(a + b) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS v
        |  FROM daily),
        |lam AS (
        |  SELECT *,
        |    0.5 * ln(v::DOUBLE / (v::DOUBLE + 10000.0))
        |      + 10000.0 * (s * s)::DOUBLE
        |        / (2.0 * v::DOUBLE * (v::DOUBLE + 10000.0)) AS lln
        |  FROM cum),
        |fin AS (
        |  SELECT event_type, max(i)::BIGINT AS n_days,
        |    round(max(lln), 6) AS max_lln,
        |    min(CASE WHEN lln >= ln(20.0) THEN i END)::BIGINT
        |      AS first_cross_day
        |  FROM lam GROUP BY 1)
        |SELECT f.event_type, f.n_days, c.s AS s_final, c.v AS v_final,
        |  round(c.lln, 6) AS lln_final, f.max_lln, f.first_cross_day
        |FROM fin f JOIN lam c
        |  ON c.event_type = f.event_type AND c.i = f.n_days
        |ORDER BY f.event_type""".stripMargin,
    // C70 twin: same midpoint split, same cleared-denominator
    // HUGEINT moments, one-division theta, pinned adjusted-delta
    // chain
    "cdc_cuped" ->
      """WITH e AS (
        |  SELECT user_id,
        |    datediff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS di
        |  FROM events),
        |b AS (SELECT min(di)::BIGINT AS lo, max(di)::BIGINT AS hi
        |      FROM e),
        |pu AS (
        |  SELECT e.user_id % 2 AS cohort,
        |    sum(CASE WHEN e.di < (b.lo + b.hi + 1) // 2
        |      THEN 1 ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN e.di >= (b.lo + b.hi + 1) // 2
        |      THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM e, b GROUP BY 1, e.user_id),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
        |    sum(x::HUGEINT * y) AS sxy, sum(y::HUGEINT * y) AS syy
        |  FROM pu),
        |ar AS (
        |  SELECT cohort, count(*)::BIGINT AS na, sum(x)::BIGINT AS sxa,
        |    sum(y)::BIGINT AS sya
        |  FROM pu GROUP BY 1),
        |ab AS (
        |  SELECT a.na AS n_a, a.sxa AS sx_a, a.sya AS sy_a,
        |    bb.na AS n_b, bb.sxa AS sx_b, bb.sya AS sy_b
        |  FROM (SELECT * FROM ar WHERE cohort = 0) a,
        |    (SELECT * FROM ar WHERE cohort = 1) bb),
        |c AS (
        |  SELECT ab.*, m.n, m.sx,
        |    (m.n::HUGEINT * m.sxy - m.sx::HUGEINT * m.sy)::DOUBLE
        |      AS covn,
        |    (m.n::HUGEINT * m.sxx - m.sx::HUGEINT * m.sx)::DOUBLE
        |      AS varx,
        |    (m.n::HUGEINT * m.syy - m.sy::HUGEINT * m.sy)::DOUBLE
        |      AS vary
        |  FROM ab, m),
        |t AS (
        |  SELECT *,
        |    CASE WHEN varx > 0.0 THEN covn / varx END AS theta,
        |    sx::DOUBLE / n::DOUBLE AS meanx,
        |    sy_b::DOUBLE / n_b::DOUBLE - sy_a::DOUBLE / n_a::DOUBLE
        |      AS diff_raw
        |  FROM c)
        |SELECT n AS n_users, n_a, n_b, round(theta, 6) AS theta,
        |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
        |    round(covn * covn / (varx * vary), 6) END AS rho2,
        |  round(diff_raw, 6) AS diff_raw,
        |  round((sy_b::DOUBLE - theta
        |      * (sx_b::DOUBLE - n_b::DOUBLE * meanx)) / n_b::DOUBLE
        |    - (sy_a::DOUBLE - theta
        |      * (sx_a::DOUBLE - n_a::DOUBLE * meanx)) / n_a::DOUBLE, 6)
        |    AS diff_cuped
        |FROM t""".stripMargin,
    // C71 twin: one distinct-user aggregate, one division, rounded
    // flag both engines
    "cdc_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (
        |  SELECT count(*)::BIGINT AS n_users,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_a,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_b
        |  FROM u)
        |SELECT n_users, n_a, n_b,
        |  round(((n_a - n_b) * (n_a - n_b))::DOUBLE
        |    / (n_a + n_b)::DOUBLE, 6) AS chi2,
        |  (round(((n_a - n_b) * (n_a - n_b))::DOUBLE
        |    / (n_a + n_b)::DOUBLE, 6) > 3.841)::BIGINT AS srm_flag
        |FROM t""".stripMargin,
    // C69 twin: same day-index RANGE window, same integer ppm and
    // cross-multiplied alert (SloPpm = 250000 interpolated from the
    // one shared constant — the CmsW lesson)
    "cdc_slo_burn" ->
      s"""WITH daily AS (
         |  SELECT ts::DATE AS day, count(*)::BIGINT AS n_events,
         |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |      ::BIGINT AS n_errors,
         |    datediff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS di
         |  FROM events GROUP BY 1, 4),
         |w AS (
         |  SELECT day, n_events, n_errors,
         |    sum(n_errors) OVER w7 AS e7, sum(n_events) OVER w7 AS t7
         |  FROM daily
         |  WINDOW w7 AS (ORDER BY di
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT strftime(day, '%Y-%m-%d') AS day, n_events, n_errors,
         |  (n_errors * 1000000 // n_events)::BIGINT AS rate1_ppm,
         |  (e7 * 1000000 // t7)::BIGINT AS rate7_ppm,
         |  (n_errors * 1000000 > n_events * $SloPpm
         |    AND e7 * 1000000 > t7 * $SloPpm)::BIGINT AS burn_alert
         |FROM w ORDER BY day""".stripMargin,
    // C68 twin: same keyed lead on (ts, event_id), ties give zero
    // dwells whichever way they order (C65 argument), integer sums
    // to one division
    "cdc_dwell" ->
      """WITH g AS (
        |  SELECT event_type,
        |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS g
        |  FROM events)
        |SELECT event_type, count(*)::BIGINT AS n_dwells,
        |  sum(g)::BIGINT AS total_us, max(g)::BIGINT AS max_us,
        |  round(sum(g)::DOUBLE / count(*)::DOUBLE, 6) AS mean_us
        |FROM g WHERE g IS NOT NULL GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    // C65 twin: one global per-type lag (oracle-scale) — the gap
    // multiset equals the two-level day decomposition exactly
    // (sorted-sequence differences; tie order permutes only zeros),
    // so the integer sums and the one-division tail replay
    // C77 twin: the same per-user microsecond RANGE window, one
    // keyed max, the same (burst DESC, user) total order
    "cdc_burst_users" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS us
        |  FROM events),
        |b AS (
        |  SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS b
        |  FROM e)
        |SELECT user_id, max(b)::BIGINT AS max_burst_1h,
        |  count(*)::BIGINT AS n_events
        |FROM b GROUP BY 1
        |ORDER BY max_burst_1h DESC, user_id LIMIT 20""".stripMargin,
    "cdc_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
        |      AS g
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(*)::BIGINT AS n_gaps,
        |    sum(g)::BIGINT AS sg, sum(g::HUGEINT * g) AS sq
        |  FROM g WHERE g IS NOT NULL GROUP BY 1),
        |s AS (
        |  SELECT event_type, n_gaps, sg,
        |    sg::DOUBLE / n_gaps::DOUBLE AS mean_us,
        |    sqrt((n_gaps::HUGEINT * sq - sg::HUGEINT * sg)::DOUBLE
        |      / (n_gaps * (n_gaps - 1))::DOUBLE) AS sd
        |  FROM a WHERE n_gaps >= 2 AND sg > 0)
        |SELECT event_type, n_gaps,
        |  (sg::HUGEINT * 1000000 // n_gaps)::DOUBLE / 1000000.0
        |    AS mean_us,
        |  round(sd / mean_us, 6) AS cv,
        |  round((sd - mean_us) / (sd + mean_us), 6) AS burstiness
        |FROM s ORDER BY event_type""".stripMargin,
    // C66 twin: identical per-user flag aggregate, integer discordant
    // counts, the same continuity-corrected one-division statistic
    "cdc_mcnemar" ->
      """WITH f AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      ::BIGINT AS a,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      ::BIGINT AS b
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT count(*)::BIGINT AS n_users,
        |    sum(a * b)::BIGINT AS n_both,
        |    sum(a * (1 - b))::BIGINT AS n_click_only,
        |    sum((1 - a) * b)::BIGINT AS n_purchase_only
        |  FROM f)
        |SELECT n_users, n_both, n_click_only, n_purchase_only,
        |  CASE WHEN n_click_only + n_purchase_only > 0 THEN
        |    round(((abs(n_click_only - n_purchase_only) - 1)
        |      * (abs(n_click_only - n_purchase_only) - 1))::DOUBLE
        |      / (n_click_only + n_purchase_only)::DOUBLE, 6) END AS chi2,
        |  coalesce((CASE WHEN n_click_only + n_purchase_only > 0 THEN
        |    round(((abs(n_click_only - n_purchase_only) - 1)
        |      * (abs(n_click_only - n_purchase_only) - 1))::DOUBLE
        |      / (n_click_only + n_purchase_only)::DOUBLE, 6) > 3.841
        |    END)::BIGINT, 0) AS significant
        |FROM t""".stripMargin,
    // C63 twin: one global lead over distinct ids (oracle-scale) —
    // equals the two-level decomposition exactly in integers
    "cdc_gap_detect" ->
      """WITH ids AS (SELECT DISTINCT event_id AS id FROM events),
        |g AS (
        |  SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids),
        |gaps AS (
        |  SELECT count(*)::BIGINT AS n_gaps,
        |    sum(nxt - id - 1)::BIGINT AS n_missing,
        |    max(nxt - id - 1)::BIGINT AS max_gap
        |  FROM g WHERE nxt IS NOT NULL AND nxt - id > 1)
        |SELECT (SELECT count(*) FROM ids)::BIGINT AS n_ids,
        |  (SELECT min(id) FROM ids)::BIGINT AS id_min,
        |  (SELECT max(id) FROM ids)::BIGINT AS id_max,
        |  coalesce(n_gaps, 0)::BIGINT AS n_gaps,
        |  coalesce(n_missing, 0)::BIGINT AS n_missing,
        |  coalesce(max_gap, 0)::BIGINT AS max_gap
        |FROM gaps""".stripMargin,
    // C61 twin: same regenerated delay, same cumulative histogram
    // and type-1 ceil ranks, floor-div mean
    "cdc_lag_quantiles" ->
      """WITH del AS (
        |  SELECT event_type,
        |    ((event_id % 1000003) * 97) % 5000000 AS lag_us
        |  FROM events),
        |h AS (
        |  SELECT event_type, lag_us, count(*)::BIGINT AS c
        |  FROM del GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, lag_us, c,
        |    (sum(c) OVER (PARTITION BY event_type
        |      ORDER BY lag_us))::BIGINT AS cum,
        |    (sum(c) OVER (PARTITION BY event_type))::BIGINT AS n
        |  FROM h)
        |SELECT event_type, max(n) AS n_events,
        |  (sum(lag_us * c) // sum(c))::BIGINT AS mean_us,
        |  min(CASE WHEN cum >= ceil(0.5 * n) THEN lag_us END)::BIGINT
        |    AS p50_us,
        |  min(CASE WHEN cum >= ceil(0.9 * n) THEN lag_us END)::BIGINT
        |    AS p90_us,
        |  min(CASE WHEN cum >= ceil(0.99 * n) THEN lag_us END)::BIGINT
        |    AS p99_us,
        |  max(lag_us)::BIGINT AS max_us
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,
    // C48 twin: same exclusive-prefix max sweep, same strict-greater
    // island rule, all-integer
    "cdc_intervals" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 600000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM m),
        |isl AS (
        |  SELECT *, (sum(is_new) OVER (PARTITION BY user_id ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS island
        |  FROM f),
        |g AS (
        |  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*)::BIGINT AS n_islands,
        |  sum(i_e - i_s)::BIGINT AS covered_us,
        |  max(i_e - i_s)::BIGINT AS longest_us
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin,
    "cdc_markov_pi" -> markovSql(5),
    "cdc_markov_entropy" -> markovEntropySql(5),
    // C60 twin: same dup/inversion/backjump definitions, all integer
    "cdc_feed_audit" ->
      """WITH dups AS (
        |  SELECT count(*)::BIGINT AS n_ids,
        |    sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::BIGINT
        |      AS n_dup_deliveries
        |  FROM (SELECT event_id, count(*)::BIGINT AS c
        |        FROM events GROUP BY 1)),
        |iv AS (
        |  SELECT epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY event_id) AS prev_us
        |  FROM events),
        |inv AS (
        |  SELECT count(*)::BIGINT AS n_events,
        |    sum(CASE WHEN prev_us IS NOT NULL AND us < prev_us
        |      THEN 1 ELSE 0 END)::BIGINT AS n_inversions,
        |    max(CASE WHEN prev_us IS NOT NULL AND us < prev_us
        |      THEN prev_us - us ELSE 0 END)::BIGINT AS max_backjump_us
        |  FROM iv)
        |SELECT n_events, n_ids, n_dup_deliveries, n_inversions,
        |  (CASE WHEN n_events > 0
        |    THEN n_inversions * 1000000 // n_events END)::BIGINT
        |    AS inversion_ppm,
        |  max_backjump_us,
        |  (n_dup_deliveries = 0 AND n_inversions = 0)::BIGINT
        |    AS feed_clean
        |FROM inv, dups""".stripMargin,
    // C59 twin: same session-bounded trigram lags, same
    // (count DESC, path) top-20
    "cdc_paths" ->
      s"""WITH $sessionSeqCteSql,
         |lagged AS (
         |  SELECT event_type,
         |    lag(event_type, 1) OVER w AS p1,
         |    lag(event_type, 2) OVER w AS p2,
         |    lag(session_seq, 1) OVER w AS s1,
         |    lag(session_seq, 2) OVER w AS s2, session_seq
         |  FROM seq
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |tri AS (
         |  SELECT p2 || '>' || p1 || '>' || event_type AS path
         |  FROM lagged
         |  WHERE p2 IS NOT NULL AND s1 = session_seq
         |    AND s2 = session_seq),
         |top AS (
         |  SELECT path, count(*)::BIGINT AS n FROM tri GROUP BY 1
         |  ORDER BY n DESC, path LIMIT 20)
         |SELECT row_number() OVER (ORDER BY n DESC, path)::BIGINT
         |    AS rank, path, n
         |FROM top ORDER BY rank""".stripMargin,
    // C46 twin: plain global row_number is fine at oracle scale; the
    // bucket formula is the identical integer arithmetic
    "cdc_rfm" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    count(*)::BIGINT AS frequency,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS monetary_cents
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT user_id,
        |    ((max(last_us) OVER ()) - last_us) // 3600000000 AS recency_h,
        |    frequency, monetary_cents,
        |    (count(*) OVER ())::BIGINT AS n
        |  FROM u),
        |rk AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency_h, user_id) AS rk_r,
        |    row_number() OVER (ORDER BY frequency, user_id) AS rk_f,
        |    row_number() OVER (ORDER BY monetary_cents, user_id) AS rk_m
        |  FROM r)
        |SELECT user_id, recency_h, frequency, monetary_cents,
        |  6 - ((rk_r - 1) * 5 // n + 1) AS r_score,
        |  (rk_f - 1) * 5 // n + 1 AS f_score,
        |  (rk_m - 1) * 5 // n + 1 AS m_score,
        |  (6 - ((rk_r - 1) * 5 // n + 1)) * 100
        |    + ((rk_f - 1) * 5 // n + 1) * 10
        |    + ((rk_m - 1) * 5 // n + 1) AS rfm_code
        |FROM rk ORDER BY user_id""".stripMargin,
    // C44 twin: same session boundary, same (ts, event_id) lag
    // order, integer ppm probabilities
    "cdc_transitions" ->
      s"""WITH $sessionSeqCteSql,
         |lagged AS (
         |  SELECT user_id, session_seq, event_type,
         |    lag(event_type) OVER w AS prev_type,
         |    lag(session_seq) OVER w AS prev_session
         |  FROM seq
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |counts AS (
         |  SELECT prev_type AS from_type, event_type AS to_type,
         |    count(*)::BIGINT AS n
         |  FROM lagged
         |  WHERE prev_type IS NOT NULL AND prev_session = session_seq
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT from_type, to_type, n,
         |    (sum(n) OVER (PARTITION BY from_type))::BIGINT AS row_total
         |  FROM counts)
         |SELECT from_type, to_type, n, row_total,
         |  n * 1000000 // row_total AS p_ppm
         |FROM tot ORDER BY from_type, to_type""".stripMargin,
    // C42 twin: per-user windows make pre- vs post-window purge
    // equivalent; the twin filters first (cheaper), same rows out
    "cdc_forget" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
        |  (lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id)) IS NULL AS is_current
        |FROM events WHERE user_id % 10 <> 3
        |ORDER BY user_id, event_id""".stripMargin,
    // lateness of each row vs the running event-time max in ARRIVAL
    // (event_id) order — exact integer µs both engines
    // C75 twin: the same two per-key rank ladders and displacement
    // folds — all BIGINT
    "cdc_reorder_depth" ->
      """WITH r AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS a_rank,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t_rank
        |  FROM events)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  max(greatest(a_rank - t_rank, 0))::BIGINT AS buffer_depth,
        |  sum(CASE WHEN a_rank <> t_rank THEN 1 ELSE 0
        |    END)::BIGINT AS n_displaced,
        |  sum(abs(a_rank - t_rank))::BIGINT AS total_abs_depth
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "cdc_late_audit" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |w AS (
        |  SELECT *, max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM t)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  count(CASE WHEN prev_max > us THEN 1 END)::BIGINT AS n_late,
        |  max(CASE WHEN prev_max > us THEN prev_max - us END) AS max_late_us
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    // C40 twin: the same event_id − row_number() islands trick
    "cdc_offset_islands" ->
      """WITH t AS (
        |  SELECT user_id % 8 AS shard, event_id FROM events),
        |iz AS (
        |  SELECT shard, event_id,
        |    event_id - row_number() OVER (PARTITION BY shard
        |      ORDER BY event_id) AS isl,
        |    event_id - lag(event_id) OVER (PARTITION BY shard
        |      ORDER BY event_id) - 1 AS gap
        |  FROM t),
        |runs AS (
        |  SELECT shard, isl, count(*)::BIGINT AS run FROM iz
        |  GROUP BY 1, 2),
        |ra AS (
        |  SELECT shard, count(*)::BIGINT AS n_islands,
        |    max(run) AS longest_run
        |  FROM runs GROUP BY 1)
        |SELECT iz.shard, count(*)::BIGINT AS n_rows,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  max(gap) AS max_gap, max(ra.n_islands) AS n_islands,
        |  max(ra.longest_run) AS longest_run
        |FROM iz JOIN ra ON iz.shard = ra.shard
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-shard running event-time max in arrival order; drop/absorb
    // counts per candidate delay — exact integer µs and ppm
    "cdc_watermark_plan" ->
      """WITH t AS (
        |  SELECT user_id % 8 AS shard, event_id, epoch_us(ts) AS us
        |  FROM events),
        |w AS (
        |  SELECT *, max(us) OVER (PARTITION BY shard ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM t),
        |l AS (
        |  SELECT coalesce(CASE WHEN prev_max > us THEN prev_max - us END,
        |    0) AS late_us FROM w),
        |d AS (
        |  SELECT late_us, unnest([0, 1000000, 10000000, 60000000]) AS delay_us
        |  FROM l)
        |SELECT delay_us::BIGINT AS delay_us, count(*)::BIGINT AS n_events,
        |  sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
        |  sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dropped,
        |  (sum(CASE WHEN late_us > delay_us THEN 1 ELSE 0 END) * 1000000
        |    // count(*))::BIGINT AS drop_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // split-UNAWARE full recompute: latest state per key in commit
    // (event_id) order, live keys aggregated per cohort — the Spark
    // side must reproduce this through the base+delta merge algebra
    "cdc_incr_agg" ->
      """WITH last AS (
        |  SELECT user_id,
        |    arg_max(round(value * 100)::BIGINT, event_id) AS cents,
        |    arg_max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END,
        |      event_id) AS deleted
        |  FROM events GROUP BY user_id)
        |SELECT user_id % 100 AS cohort, count(*)::BIGINT AS n_keys,
        |  sum(cents)::BIGINT AS sum_cents
        |FROM last WHERE deleted = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // full-outer diff twin; IS DISTINCT FROM is the <=> negation
    "cdc_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS cents
        |  FROM orders),
        |olds AS (SELECT * FROM base WHERE o_orderkey % 10 <> 7),
        |news AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN cents + 1 ELSE cents END AS cents
        |  FROM base WHERE o_orderkey % 10 <> 3),
        |j AS (
        |  SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
        |    o.cents AS old_cents, n.cents AS new_cents
        |  FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey),
        |d AS (
        |  SELECT coalesce(nk, ok) AS o_orderkey,
        |    CASE WHEN ok IS NULL THEN 'i' WHEN nk IS NULL THEN 'd'
        |      WHEN old_cents IS DISTINCT FROM new_cents THEN 'u' END AS op,
        |    old_cents, new_cents
        |  FROM j)
        |SELECT * FROM d WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    // C53 twin: same window predicates in exact µs, same struct_pack
    // minima, same depth CASE
    "cdc_funnel_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |users AS (SELECT DISTINCT user_id FROM ev),
        |v AS (SELECT user_id, us AS tv FROM ev WHERE event_type = 'view'),
        |c AS (SELECT user_id, us AS tc FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, us AS tp FROM ev
        |      WHERE event_type = 'purchase'),
        |vc AS (
        |  SELECT v.user_id, tv, min(tc)::BIGINT AS tc
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  WHERE tc > tv AND tc <= tv + 3600000000
        |  GROUP BY 1, 2),
        |vcp AS (
        |  SELECT vc.user_id, tv, tc, min(tp)::BIGINT AS tp
        |  FROM vc JOIN p ON vc.user_id = p.user_id
        |  WHERE tp > tc AND tp <= tv + 3600000000
        |  GROUP BY 1, 2, 3),
        |d1 AS (SELECT user_id, min(tv)::BIGINT AS first_tv
        |       FROM v GROUP BY 1),
        |d2 AS (
        |  SELECT user_id,
        |    (min(struct_pack(tv := tv, tc := tc))).tv AS tv2,
        |    (min(struct_pack(tv := tv, tc := tc))).tc AS tc2
        |  FROM vc GROUP BY 1),
        |d3 AS (
        |  SELECT user_id,
        |    (min(struct_pack(tv := tv, tc := tc, tp := tp))).tv AS tv3,
        |    (min(struct_pack(tv := tv, tc := tc, tp := tp))).tc AS tc3,
        |    (min(struct_pack(tv := tv, tc := tc, tp := tp))).tp AS tp3
        |  FROM vcp GROUP BY 1)
        |SELECT u.user_id,
        |  CASE WHEN tp3 IS NOT NULL THEN 3
        |    WHEN tc2 IS NOT NULL THEN 2
        |    WHEN first_tv IS NOT NULL THEN 1
        |    ELSE 0 END::BIGINT AS depth,
        |  tv3 AS chain_tv, tc3 AS chain_tc, tp3 AS chain_tp
        |FROM users u
        |LEFT JOIN d1 ON u.user_id = d1.user_id
        |LEFT JOIN d2 ON u.user_id = d2.user_id
        |LEFT JOIN d3 ON u.user_id = d3.user_id
        |ORDER BY u.user_id""".stripMargin,
    // C52 twin: same arithmetic cuts, same struct_pack extremum per
    // clock pair, same null-safe restatement compare
    "cdc_bitemporal" ->
      """WITH ch AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'error' THEN NULL
        |      ELSE round(value * 100)::BIGINT END AS cents
        |  FROM events),
        |cuts AS (
        |  SELECT (max(event_id) * 4 // 5)::BIGINT AS tx_cut,
        |    (min(us) + (max(us) - min(us)) * 3 // 5)::BIGINT AS valid_cut
        |  FROM ch),
        |thenv AS (
        |  SELECT user_id,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).cents AS then_cents,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).event_id AS then_event_id,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).us AS then_us
        |  FROM ch, cuts
        |  WHERE event_id <= tx_cut AND us <= valid_cut
        |  GROUP BY user_id),
        |nowv AS (
        |  SELECT user_id,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).cents AS now_cents,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).event_id AS now_event_id,
        |    (max(struct_pack(us := us, event_id := event_id,
        |      cents := cents))).us AS now_us
        |  FROM ch, cuts WHERE us <= valid_cut
        |  GROUP BY user_id)
        |SELECT coalesce(t.user_id, n.user_id) AS user_id,
        |  then_cents, then_event_id, then_us,
        |  now_cents, now_event_id, now_us,
        |  (then_cents IS DISTINCT FROM now_cents)
        |    OR (then_event_id IS DISTINCT FROM now_event_id) AS restated
        |FROM thenv t FULL OUTER JOIN nowv n ON t.user_id = n.user_id
        |ORDER BY user_id""".stripMargin,
    // C50 twin: identical payload construction, the same key-extract
    // regex, and the same two-level registry aggregation
    "cdc_schema_drift" ->
      """WITH pay AS (
        |  SELECT ts::DATE AS day,
        |    '{"k": 1'
        |    || CASE WHEN day(ts) >= 10 THEN ', "v2_score": 2' ELSE '' END
        |    || CASE WHEN day(ts) >= 20
        |         THEN ', "exp_' || event_type || '": 3' ELSE '' END
        |    || '}' AS props
        |  FROM events),
        |ks AS (
        |  SELECT day, unnest(regexp_extract_all(props,
        |    '"([a-z0-9_]+)"\s*:', 1)) AS key
        |  FROM pay),
        |kd AS (
        |  SELECT key, day, count(*)::BIGINT AS n
        |  FROM ks GROUP BY 1, 2)
        |SELECT key,
        |  strftime(min(day), '%Y-%m-%d') AS first_day,
        |  strftime(max(day), '%Y-%m-%d') AS last_day,
        |  count(*)::BIGINT AS n_days,
        |  sum(n)::BIGINT AS n_rows
        |FROM kd GROUP BY key ORDER BY key""".stripMargin,
    // straight relational twin of the envelope round-trip: any field
    // the serialize→parse cycle drops or garbles breaks the hash
    "cdc_parse_envelope" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'signup' THEN 'I'
        |       WHEN event_type = 'error' THEN 'D'
        |       ELSE 'U' END AS op,
        |  user_id,
        |  round(value, 2) AS val,
        |  epoch_us(ts) // 1000 AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_funnel" ->
      s"""WITH $sessionSeqCteSql,
         |sess AS (
         |  SELECT user_id, session_seq,
         |    min(CASE WHEN event_type = 'view' THEN us END) AS t_view,
         |    min(CASE WHEN event_type = 'click' THEN us END) AS t_click,
         |    min(CASE WHEN event_type = 'purchase' THEN us END) AS t_purchase
         |  FROM seq GROUP BY 1, 2),
         |r AS (SELECT
         |    count(*) FILTER (WHERE t_view IS NOT NULL) AS n1,
         |    count(*) FILTER (WHERE t_click >= t_view) AS n2,
         |    count(*) FILTER (WHERE t_click >= t_view
         |      AND t_purchase >= t_click) AS n3
         |  FROM sess)
         |SELECT 1::BIGINT AS step, 'view' AS step_name, n1 AS n_sessions,
         |  NULL::DOUBLE AS conv_from_prev FROM r
         |UNION ALL SELECT 2::BIGINT, 'click', n2,
         |  CASE WHEN n1 = 0 THEN NULL ELSE n2::DOUBLE / n1 END FROM r
         |UNION ALL SELECT 3::BIGINT, 'purchase', n3,
         |  CASE WHEN n2 = 0 THEN NULL ELSE n3::DOUBLE / n2 END FROM r
         |ORDER BY step""".stripMargin,
    "cdc_cohort" ->
      """WITH f AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.user_id,
        |    date_trunc('week', f.first_ts)::DATE AS cohort_week,
        |    date_trunc('week', e.ts)::DATE AS act_week
        |  FROM events e JOIN f USING (user_id))
        |SELECT (cohort_week - DATE '1970-01-01')::BIGINT AS cohort_week_days,
        |  ((act_week - cohort_week) // 7)::BIGINT AS week_idx,
        |  count(DISTINCT user_id) AS n_users
        |FROM d GROUP BY 1, 2
        |ORDER BY cohort_week_days, week_idx""".stripMargin,
    "cdc_dow_histogram" ->
      """SELECT isodow(ts)::BIGINT AS iso_dow, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY iso_dow, event_type""".stripMargin,
    "cdc_session_attrib" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM t),
        |seq AS (
        |  SELECT *, sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS session_seq
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, session_seq,
        |    min(us) AS start_us, max(us) AS end_us
        |  FROM seq GROUP BY 1, 2)
        |SELECT e.event_id, s.session_seq, s.start_us
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) e
        |JOIN sess s ON s.user_id = e.user_id
        |  AND e.us BETWEEN s.start_us AND s.end_us
        |ORDER BY e.event_id""".stripMargin,
    "cdc_asof_join" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(value, 2) AS value,
        |  round(last_value(CASE WHEN event_type = 'signup' THEN value END
        |    IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS state_value_asof
        |FROM events
        |QUALIFY event_type <> 'signup'
        |ORDER BY user_id, event_id""".stripMargin,
    // C32 twin: same union-trick windows (ref rows sort before query
    // rows at equal timestamps), same µs-BIGINT deltas and single
    // double ratio — op-sequence identical
    "cdc_asof_interp" ->
      """WITH u AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value, event_type,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_ref
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |b AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_ref = 1 THEN value END IGNORE NULLS)
        |      OVER w1 AS v_prev,
        |    last_value(CASE WHEN is_ref = 1 THEN us END IGNORE NULLS)
        |      OVER w1 AS us_prev,
        |    first_value(CASE WHEN is_ref = 1 THEN value END IGNORE NULLS)
        |      OVER w2 AS v_next,
        |    first_value(CASE WHEN is_ref = 1 THEN us END IGNORE NULLS)
        |      OVER w2 AS us_next
        |  FROM u
        |  WINDOW
        |    w1 AS (PARTITION BY user_id ORDER BY us, is_ref DESC, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    w2 AS (PARTITION BY user_id ORDER BY us, is_ref DESC, event_id
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, us AS ts_us,
        |  round(CASE WHEN us_prev = us THEN v_prev
        |    WHEN us_next = us_prev THEN v_prev
        |    ELSE v_prev + (v_next - v_prev) *
        |      ((us - us_prev)::DOUBLE / (us_next - us_prev)::DOUBLE)
        |    END, 6) AS val_interp
        |FROM b WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    // C33 twin: IS DISTINCT FROM is Spark's !(a <=> b)
    "cdc_compact_changelog" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, cents
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    round(value * 100)::BIGINT AS cents,
        |    lag(round(value * 100)::BIGINT) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |WHERE cents IS DISTINCT FROM prev
        |ORDER BY user_id, event_id""".stripMargin,
    "cdc_latest_state" ->
      """SELECT user_id, event_type AS last_op,
        |  round(value, 2) AS last_value, epoch_us(ts) AS last_ts_us
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc_apply_deletes" ->
      """SELECT user_id,
        |  CASE WHEN event_type = 'signup' THEN 'I'
        |       WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS last_op,
        |  round(value, 2) AS last_value
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |  AND (CASE WHEN event_type = 'signup' THEN 'I'
        |       WHEN event_type = 'error' THEN 'D' ELSE 'U' END) <> 'D'
        |ORDER BY user_id""".stripMargin,
    "cdc_scd2" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
        |  (lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id)) IS NULL AS is_current
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "cdc_event_counts" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,
    // C41 twin: the single global window ORDER BY (t, d DESC) equals
    // the Spark side's day-bucketed decomposition exactly — day is a
    // monotone function of t, and the per-day MAX is permutation-
    // invariant within equal (t, d) runs
    "cdc_concurrency" ->
      s"""WITH $sessionSeqCteSql,
         |sess AS (
         |  SELECT user_id, session_seq,
         |    min(us)::BIGINT AS start_us, max(us)::BIGINT AS end_us
         |  FROM seq GROUP BY 1, 2),
         |deltas AS (
         |  SELECT start_us AS t, 1::BIGINT AS d FROM sess
         |  UNION ALL
         |  SELECT end_us AS t, -1::BIGINT AS d FROM sess),
         |r AS (
         |  SELECT t, d, make_timestamp(t)::DATE AS day FROM deltas),
         |run AS (
         |  SELECT day, t, d,
         |    (sum(d) OVER (ORDER BY t, d DESC
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         |       AS counter
         |  FROM r)
         |SELECT strftime(day, '%Y-%m-%d') AS day,
         |  max(counter) AS peak_concurrency,
         |  sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS sessions_started
         |FROM run GROUP BY 1 ORDER BY day""".stripMargin,
    "cdc_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM t),
        |sess AS (
        |  SELECT *, sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin)
}
