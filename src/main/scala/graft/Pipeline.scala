package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, TextAnalysis}
import graft.sources.Sink

/** End-to-end training-data pipeline — the reference's notebook shape
  * (ingest → clean → derive → export; CDCPROJECT ipynb cells 1-6)
  * composed from the library's operators at corpus scale:
  *
  *   documents → exact dedup → quality gate → split assignment →
  *   partitioned parquet (by split), plus a summary stats frame.
  *
  * Every stage is a DataFrame transformation, so the whole pipeline is
  * one Catalyst plan per output — no intermediate materialization
  * except the final writes.
  */
object Pipeline {

  case class Result(kept: Long, dropped_dupes: Long, dropped_quality: Long,
      train: Long, `val`: Long, test: Long)

  /** Single-pass observed corpus write: the QA counters every
    * production write needs (row count, null counts on contract
    * columns) ride the write job itself via the `Observation` API —
    * at 100 TB the alternative is a SECOND corpus scan per metric
    * batch. Metrics must be streaming aggregates (count/sum/min/max —
    * no distinct), which is exactly what ingest-contract checks are.
    * Returns the metric map after the write commits; PipelineSpec
    * pins the values against independently recomputed counts. */
  def observedWrite(df: DataFrame, path: String, partitionCols: Seq[String],
      nullCheckCols: Seq[String]): Map[String, Long] = {
    val obs = org.apache.spark.sql.Observation("graft_write_qa")
    val metrics = count(lit(1)).as("n_rows") +: nullCheckCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    Sink.partitioned(observed, path, partitionCols)
    obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
  }

  /** The reference notebook replayed TOP-TO-BOTTOM as one pipeline
    * (CDCPROJECT ipynb cells 1-5 + resilience.py:29-82): xlsx ingest
    * with preamble skip (H5) → drop-numbering/rename → melt to long
    * form (A1) → inner merge + permissive numeric coercion + dropna +
    * deflation to real values (A3/A4) → drawdown/recovery metrics
    * (B1-B3 via the faithful B23 replay) → xlsx and/or CSV hand-off
    * (the notebook's to_excel / to_csv cell). Returns the metric
    * frame.
    *
    * Ordering: the notebook's melt emits year-major rows, so within
    * an industry pandas order IS ascending year; with one row per
    * (industry, year) — what the merge produces from workbook-shaped
    * input — `Year` itself is the faithful `.values[0]` order, so no
    * ingest sequence number is needed. Scale posture: each workbook
    * parses where its bytes land (H5); everything after is one
    * shuffle per aggregate on the long frame — a LAKE of exports
    * would swap [[Excel.read]] for [[Excel.readMany]] unchanged. */
  def resilienceReport(spark: SparkSession,
      nominalXlsx: String, priceXlsx: String,
      nominalSheet: String, priceSheet: String, skipRows: Int,
      baseYear: Long, shockYear: Long, horizon: Long,
      outXlsx: Option[String] = None,
      outCsv: Option[String] = None): DataFrame = {
    import spark.implicits._
    def longForm(path: String, sheet: String, valueName: String) = {
      val wide = graft.sources.Excel.dropAndRename(
        graft.sources.Excel.read(spark, path, sheet, skipRows), "Industry")
      val yearCols = wide.columns.drop(1)
      wide.unpivot(Array($"Industry"), yearCols.map(col), "Year", valueName)
    }
    val merged = longForm(nominalXlsx, nominalSheet, "Nominal_Value")
      .join(longForm(priceXlsx, priceSheet, "Price_Index"),
        Seq("Industry", "Year"))
      // to_numeric(errors="coerce") twin: try_cast nulls the garbage
      // instead of raising under the repo's ANSI posture
      .withColumn("Nominal_Value", expr("try_cast(Nominal_Value as double)"))
      .withColumn("Price_Index", expr("try_cast(Price_Index as double)"))
      .withColumn("Year", expr("try_cast(Year as bigint)"))
      .na.drop(Seq("Year", "Nominal_Value", "Price_Index"))
      // numpy's x/0 → ±inf / 0/0 → NaN, branched explicitly because
      // ANSI raises on double division by zero (the B23 pattern)
      .withColumn("Real_Value",
        when($"Price_Index" === 0.0,
          when($"Nominal_Value" === 0.0, lit(Double.NaN))
            .when($"Nominal_Value" > 0.0, lit(Double.PositiveInfinity))
            .otherwise(lit(Double.NegativeInfinity)))
        .otherwise($"Nominal_Value" * 100.0 / $"Price_Index"))
    val metrics = graft.operators.Resilience.resilienceReplayOn(
      graft.operators.Resilience.Series(
        merged, "Industry", "Year", "Real_Value"),
      "Year", baseYear, shockYear, horizon)
    outXlsx.foreach(p => graft.sources.Excel.write(metrics, p, "Metrics"))
    outCsv.foreach(p => Sink.csv(metrics, p, single = true))
    metrics
  }

  /** Run the clean-corpus pipeline; writes `outDir/corpus`
    * partitioned by split and returns the stage counts. */
  def cleanCorpus(spark: SparkSession, docs: DataFrame, outDir: String): Result = {
    import org.apache.spark.storage.StorageLevel
    val total = docs.count()

    // persisted: the dedup chain feeds three downstream actions (gate
    // count, partitioned write, split counts) — without the cache each
    // one would recompute the dedup aggregate + semi-join from scratch
    val deduped = {
      import docs.sparkSession.implicits._
      val keepers = Dedup.exact(docs).select($"keeper_doc_id".as("doc_id"))
      docs.join(keepers, Seq("doc_id"), "left_semi")
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val nDeduped = deduped.count()

    val gated = {
      import docs.sparkSession.implicits._
      deduped.join(
        TextAnalysis.quality(deduped).filter($"keep").select($"doc_id"),
        Seq("doc_id"), "left_semi")
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val nGated = gated.count()

    val withSplit = gated.join(
      TextAnalysis.splitAssign(gated), Seq("doc_id"))

    Sink.partitioned(withSplit, s"$outDir/corpus", Seq("split"))

    val splits = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    deduped.unpersist()
    gated.unpersist()
    Result(
      kept = nGated,
      dropped_dupes = total - nDeduped,
      dropped_quality = nDeduped - nGated,
      train = splits.getOrElse("train", 0L),
      `val` = splits.getOrElse("val", 0L),
      test = splits.getOrElse("test", 0L))
  }

  case class IncrementalResult(appended: Long, dropped_seen: Long,
      dropped_dupes: Long, dropped_quality: Long)

  /** Daily-ingest mode of [[cleanCorpus]]: process ONLY the new
    * documents against persistent dedup state, instead of recomputing
    * the whole corpus per run — what a real 100 TB ingest loop does.
    *
    * State = the set of content hashes already ingested (one 16-byte
    * hash per distinct doc ever seen; ~TB-class at 10¹⁰ docs), kept as
    * parquet under `stateDir`. A delta run is three hash-keyed steps:
    * anti-join the delta against the state (drops docs whose content
    * is already in the corpus), exact-dedup within the delta, then
    * quality-gate + split + APPEND the survivors — the existing corpus
    * is never read, so run cost scales with the delta, not the corpus.
    *
    * Output equality with a full [[cleanCorpus]] recompute holds under
    * the ingest-loop contract that doc_ids are monotonically assigned
    * (a later copy never has a smaller id): the full run's keeper
    * (min doc_id per hash) is then exactly the first-ingested doc,
    * which is what the state preserved. Quality and split are pure
    * per-doc functions, so they agree run-for-run. Every distinct
    * delta hash enters the state — including quality-rejects, whose
    * later copies would fail the same content-determined gate — so
    * re-sends cost one anti-join probe, not a re-evaluation.
    * Spec-pinned (PipelineSpec): base + deltas == one full run. */
  def incrementalCorpus(spark: SparkSession, delta: DataFrame,
      stateDir: String, outDir: String,
      maxStateFiles: Int = 64): IncrementalResult = {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val total = delta.count()
    val hashed = delta.withColumn("content_hash",
      Dedup.contentHash($"text"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val hasState = fs.exists(new org.apache.hadoop.fs.Path(stateDir))
    // hash-keyed anti join: at scale both sides shuffle on the hash —
    // the same single-key shuffle shape as exact dedup itself
    val unseen = (if (hasState)
        hashed.join(spark.read.parquet(stateDir), Seq("content_hash"),
          "left_anti")
      else hashed).persist(StorageLevel.MEMORY_AND_DISK)
    val nUnseen = unseen.count()

    // within-delta exact dedup: first (lowest-id) copy wins
    val keepers = unseen.groupBy($"content_hash")
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val deduped = unseen.join(keepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDeduped = deduped.count()

    val gated = deduped.join(
      TextAnalysis.quality(deduped).filter($"keep").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val withSplit = gated.join(
      TextAnalysis.splitAssign(gated), Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nAppended = withSplit.count()
    Sink.partitionedAppend(withSplit.drop("content_hash"),
      s"$outDir/corpus", Seq("split"))

    // record every distinct delta hash — seen is seen, kept or not
    unseen.select($"content_hash").distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(stateDir)
    // each run appends a file-set; bound the state's file count so a
    // daily cadence doesn't turn the anti-join scan into a listing
    // storm (VERDICT r3 #5)
    val stFiles = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .count(_.getPath.getName.startsWith("part-"))
    if (stFiles > maxStateFiles) compactInPlace(spark, stateDir)
    unseen.unpersist(); deduped.unpersist(); withSplit.unpersist()
    IncrementalResult(
      appended = nAppended,
      dropped_seen = total - nUnseen,
      dropped_dupes = nUnseen - nDeduped,
      dropped_quality = nDeduped - nAppended)
  }

  case class TrainingResult(kept: Long, dropped_cluster_dupes: Long,
      dropped_quality: Long, dropped_repetition: Long,
      train: Long, `val`: Long, test: Long)

  /** The FULL LLM training-data pipeline, every stage from this
    * library:
    *
    *   documents → near-dup cluster canonicalization (exact ∪ jaccard
    *   components; the keeper is the HIGHEST-QUALITY member of each
    *   cluster, ties to lowest doc_id — a garbled copy must not shadow
    *   a clean one) → quality gate → repetition gate (Gopher-style
    *   top-token/diversity bounds) → PII scrub (text rewritten in
    *   place, n_chars recomputed) → deterministic split → partitioned
    *   parquet by split.
    *
    * Thresholds are the measured-sane defaults for the test corpus;
    * both gates are plain filters over per-doc metric frames, so
    * retuning them is a config change, not a pipeline change. */
  def trainingCorpus(spark: SparkSession, docs: DataFrame,
      outDir: String): TrainingResult = {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val total = docs.count()

    // keeper per cluster = best quality score (window over cluster_id
    // — high-cardinality key, one shuffle)
    val keepers = Dedup.nearDupClusters(docs)
      .select($"doc_id", $"cluster_id")
      .join(TextAnalysis.quality(docs).select($"doc_id", $"score_ppm"),
        "doc_id")
      .withColumn("rk", row_number().over(Window.partitionBy($"cluster_id")
        .orderBy($"score_ppm".desc, $"doc_id")))
      .filter($"rk" === 1).select($"doc_id")
    val canonical = docs.join(keepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCanon = canonical.count()

    val qualityKeep = TextAnalysis.quality(canonical)
      .filter($"keep").select($"doc_id")
    val afterQuality = canonical.join(qualityKeep, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nQuality = afterQuality.count()

    // repetition gate: drop docs where one token takes >30% of the
    // text or fewer than 10% of tokens are distinct
    val repKeep = TextAnalysis.repetition(afterQuality)
      .filter($"top_token_ppm" <= 300000L && $"distinct_ppm" >= 100000L)
      .select($"doc_id")
    val gated = afterQuality.join(repKeep, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nGated = gated.count()

    // rewrite text in place and keep the length metadata truthful
    val scrubbed = gated.withColumn("text", TextAnalysis.scrubText($"text"))
      .withColumn("n_chars", length($"text"))
    val withSplit = scrubbed.join(
      TextAnalysis.splitAssign(scrubbed), Seq("doc_id"))
    Sink.partitioned(withSplit, s"$outDir/corpus", Seq("split"))

    val splits = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    canonical.unpersist(); afterQuality.unpersist(); gated.unpersist()
    TrainingResult(
      kept = nGated,
      dropped_cluster_dupes = total - nCanon,
      dropped_quality = nCanon - nQuality,
      dropped_repetition = nQuality - nGated,
      train = splits.getOrElse("train", 0L),
      `val` = splits.getOrElse("val", 0L),
      test = splits.getOrElse("test", 0L))
  }

  /** In-place parquet compaction: rewrite `dir` into ~targetMB files
    * through a sibling temp dir, then swap. */
  def compactInPlace(spark: SparkSession, dir: String,
      targetMB: Int = 512): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact")
    Sink.compact(spark, dir, tmp.toString, targetMB)
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  case class IncrementalTrainingResult(delta_docs: Long, appended: Long,
      tombstoned: Long, merged_clusters: Long)

  /** Daily-ingest mode of [[trainingCorpus]] — NEAR-dup cluster
    * canonicalization extended incrementally (VERDICT r3 #4): a delta
    * run matches new docs against PERSISTED derived state, never
    * re-reading corpus text.
    *
    * State under `stateDir` (all derived, all append-only):
    *   - `postings/` (shingle-hash, doc_id): the inverted shingle
    *     index — candidate generation for delta-vs-history pairs is a
    *     posting-list equi-join, EXACT pair recall (same inter counts
    *     as [[Dedup.ngramJaccard]]'s index), work ∝ Σ df over the
    *     delta's shingles;
    *   - `sizes/` (doc_id, sz): Jaccard denominators;
    *   - `hashes/` (content_hash, rep): exact-dup pairs vs history;
    *   - `members/` (doc_id, cid0, run): each doc's component at
    *     ingest time; never rewritten;
    *   - `remaps/` (from_cid, to_cid): cluster merges — when a delta
    *     doc bridges two existing clusters, one remap row supersedes
    *     both ids (resolution follows the chain; ids only decrease, so
    *     no cycles);
    *   - `keepers/` (cid, keeper_doc_id, score_ppm, emitted, run):
    *     current canonical per cluster, latest run wins.
    *
    * The output corpus is an UPSERT LOG — the only shape that stays
    * append-only when a better canonical can arrive later: winners
    * passing the gates are appended; dethroned emitted keepers land in
    * `outDir/tombstones`. [[trainingSnapshot]] resolves the effective
    * corpus (rows minus tombstones); a periodic [[compactInPlace]] on
    * the corpus after applying tombstones is the CDC-style compaction
    * step.
    *
    * Equality contract (PipelineSpec pins base + deltas ==
    * [[trainingCorpus]] on the merged corpus): doc_ids monotone across
    * runs, and the stop-shingle DF cap never bites (delta pair
    * generation is uncapped — at scale the stop-shingle list is a
    * static broadcast input computed offline, like a stopword list;
    * a cap that newly engulfs a shingle cannot retroactively unpair
    * documents an earlier run already clustered, so corpora where the
    * cap matters need the batch pipeline's global view anyway).
    * Quality/repetition/scrub/split are pure per-doc functions, so
    * delta-time evaluation agrees with recompute-time evaluation. */
  def incrementalTraining(spark: SparkSession, delta: DataFrame,
      stateDir: String, outDir: String): IncrementalTrainingResult = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def hasState(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/$sub"))
    def st(sub: String) = spark.read.parquet(s"$stateDir/$sub")
    def appendTo(df: DataFrame, sub: String): Unit =
      df.write.mode(SaveMode.Append).parquet(s"$stateDir/$sub")

    val run = if (hasState("members"))
      st("members").agg(max($"run")).collect()(0).getLong(0) + 1 else 1L

    val d0 = delta
      .withColumn("content_hash", Dedup.contentHash($"text"))
      .withColumn("sh", Dedup.hashedShingleCol($"text"))
      .withColumn("sz", size($"sh").cast("long"))
      .localCheckpoint()
    val nDelta = d0.count()
    val postings = d0.select($"doc_id", explode($"sh").as("shingle"))
      .localCheckpoint()
    val szs = d0.select($"doc_id", $"sz")

    // ---- verified pairs: intra-delta and delta-vs-history ----
    val jacT = Dedup.jaccardThreshold
    def verify(inter: DataFrame, szA: DataFrame, szB: DataFrame) = inter
      .join(szA, "doc_a").join(szB, "doc_b")
      .withColumn("jac", $"inter".cast("double") /
        ($"sz_a" + $"sz_b" - $"inter").cast("double"))
      .filter($"jac" >= jacT).select($"doc_a", $"doc_b")
    val intraJac = verify(
      postings.select($"doc_id".as("doc_a"), $"shingle")
        .join(postings.select($"doc_id".as("doc_b"), $"shingle"), "shingle")
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter")),
      szs.select($"doc_id".as("doc_a"), $"sz".as("sz_a")),
      szs.select($"doc_id".as("doc_b"), $"sz".as("sz_b")))
    val repPerHash = d0.groupBy($"content_hash").agg(min($"doc_id").as("rep"))
      .localCheckpoint()
    val intraExact = d0.select($"doc_id", $"content_hash")
      .join(repPerHash, "content_hash")
      .filter($"doc_id" =!= $"rep")
      .select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val oldJac = if (hasState("postings")) verify(
      st("postings").select($"doc_id".as("doc_a"), $"shingle")
        .join(postings.select($"doc_id".as("doc_b"), $"shingle"), "shingle")
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter")),
      st("sizes").select($"doc_id".as("doc_a"), $"sz".as("sz_a")),
      szs.select($"doc_id".as("doc_b"), $"sz".as("sz_b")))
      else emptyPairs
    val oldExact = if (hasState("hashes"))
      d0.select($"doc_id", $"content_hash")
        .join(st("hashes"), "content_hash")
        .select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
      else emptyPairs
    val oldPairs = oldJac.union(oldExact).distinct()
      .localCheckpoint()

    // ---- map matched history docs to their EFFECTIVE cluster ids ----
    // remap log is merge-event sized; chains resolve DISTRIBUTED
    // (pointer-doubling self-joins — round-7 fix: the old driver
    // collect here was the one unbounded driver structure left)
    val closureDf = (if (hasState("remaps"))
        resolveRemapClosure(st("remaps"))
      else Seq.empty[(Long, Long)].toDF("__from", "__eff"))
      .toDF("cid0", "eff")
    val oldEff = (if (hasState("members"))
        oldPairs.select($"doc_a").distinct()
          .join(st("members").select($"doc_id".as("doc_a"), $"cid0"), "doc_a")
          .join(closureDf, Seq("cid0"), "left")
          .withColumn("ecid", coalesce($"eff", $"cid0"))
          .select($"doc_a", $"ecid")
      else Seq.empty[(Long, Long)].toDF("doc_a", "ecid"))
      .localCheckpoint()

    // ---- components over delta docs + affected cluster nodes ----
    // history docs enter as their cluster id, so the merged component
    // id = min(old cluster ids, delta ids) — with monotone doc_ids
    // exactly the id a full recompute assigns the merged cluster
    val edges = intraJac.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(intraExact.select($"doc_a".as("src"), $"doc_b".as("dst")))
      .union(oldPairs.join(oldEff, "doc_a")
        .select($"ecid".as("src"), $"doc_b".as("dst")))
    val comp = Graph.connectedComponents(edges, d0.select($"doc_id".as("id")))
    val deltaComp = comp.join(d0.select($"doc_id".as("id")), Seq("id"), "left_semi")
      .select($"id".as("doc_id"), $"component".as("comp"))
      .localCheckpoint()
    val oldCidComp = comp
      .join(oldEff.select($"ecid".as("id")).distinct(), Seq("id"), "left_semi")
      .select($"id".as("ecid"), $"component".as("comp"))
      .localCheckpoint()
    val merges = oldCidComp.filter($"ecid" =!= $"comp")
    val nMerges = merges.count()

    // ---- keeper election per affected component ----
    val deltaCand = deltaComp
      .join(TextAnalysis.quality(d0).select($"doc_id", $"score_ppm"), "doc_id")
      .select($"comp", $"doc_id", $"score_ppm",
        lit(false).as("is_old"), lit(false).as("old_emitted"))
    val oldCand = if (hasState("keepers"))
      st("keepers")
        .join(broadcast(closureDf.withColumnRenamed("cid0", "cid")),
          Seq("cid"), "left")
        .withColumn("ecid", coalesce($"eff", $"cid"))
        .join(oldCidComp, "ecid")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ecid").orderBy($"run".desc)))
        .filter($"rn" === 1)
        .select($"comp", $"keeper_doc_id".as("doc_id"), $"score_ppm",
          lit(true).as("is_old"), $"emitted".as("old_emitted"))
      else deltaCand.limit(0)
    val cand = deltaCand.union(oldCand)
    val winners = cand.withColumn("rn", row_number().over(
        Window.partitionBy($"comp")
          .orderBy($"score_ppm".desc, $"doc_id")))
      .filter($"rn" === 1)
      .select($"comp", $"doc_id".as("win"), $"score_ppm".as("win_score"),
        $"is_old".as("win_is_old"), $"old_emitted".as("win_old_emitted"))
      .localCheckpoint()

    // dethroned emitted keepers leave the corpus via tombstones
    val tomb = cand.filter($"is_old" && $"old_emitted")
      .join(winners, "comp").filter($"doc_id" =!= $"win")
      .select($"doc_id").distinct()
      .localCheckpoint()
    val nTomb = tomb.count()

    // ---- gates + scrub + split on NEW winners only ----
    val winDocs = d0.join(winners.filter(!$"win_is_old")
      .select($"win".as("doc_id")), Seq("doc_id"), "left_semi")
    val qKeep = TextAnalysis.quality(winDocs).filter($"keep").select($"doc_id")
    val afterQ = winDocs.join(qKeep, Seq("doc_id"), "left_semi")
    val repKeep = TextAnalysis.repetition(afterQ)
      .filter($"top_token_ppm" <= 300000L && $"distinct_ppm" >= 100000L)
      .select($"doc_id")
    val gated = afterQ.join(repKeep, Seq("doc_id"), "left_semi")
    val scrubbed = gated.withColumn("text", TextAnalysis.scrubText($"text"))
      .withColumn("n_chars", length($"text"))
    val withSplit = scrubbed
      .join(TextAnalysis.splitAssign(scrubbed), Seq("doc_id"))
      .drop("content_hash", "sh", "sz")
      .localCheckpoint()
    val nAppend = withSplit.count()
    Sink.partitionedAppend(withSplit, s"$outDir/corpus", Seq("split"))
    tomb.write.mode(SaveMode.Append).parquet(s"$outDir/tombstones")

    // ---- extend state ----
    // every frame that READS state was eagerly localCheckpoint-ed
    // above, so the appends below cannot feed back into their plans;
    // checkpointing (vs persist) also cuts lineage, keeping downstream
    // plans LogicalRDD-small — with persist, the cache manager's
    // plan-matching on the delta run's big plans dominated wall time
    // (measured 230 s of uncacheQuery on a 20k-doc state)
    val emittedDelta = withSplit.select($"doc_id".as("win"))
      .withColumn("em", lit(true))
    val keeperRows = winners.join(emittedDelta, Seq("win"), "left")
      .withColumn("emitted", when($"win_is_old", $"win_old_emitted")
        .otherwise(coalesce($"em", lit(false))))
      .select($"comp".as("cid"), $"win".as("keeper_doc_id"),
        $"win_score".as("score_ppm"), $"emitted", lit(run).as("run"))
    appendTo(keeperRows, "keepers")
    appendTo(merges.select($"ecid".as("from_cid"), $"comp".as("to_cid")),
      "remaps")
    appendTo(deltaComp.select($"doc_id", $"comp".as("cid0"),
      lit(run).as("run")), "members")
    appendTo(postings, "postings")
    appendTo(szs, "sizes")
    val newHashes = repPerHash.select($"content_hash", $"rep")
    val hashAppend = (if (hasState("hashes"))
        newHashes.join(st("hashes").select($"content_hash"),
          Seq("content_hash"), "left_anti")
      else newHashes).localCheckpoint() // snapshot BEFORE the self-append
    appendTo(hashAppend, "hashes")

    // the remap log is merge-event sized PER RUN but append-only
    // ACROSS runs — bound it so the per-run driver collect above
    // stays bounded over years of deltas
    compactRemaps(spark, stateDir)

    IncrementalTrainingResult(nDelta, nAppend, nTomb, nMerges)
  }

  /** Fold resolved remap chains into the `members`/`keepers` state and
    * truncate the remap log once it exceeds `maxRemapRows`. Without
    * this, `remaps/` grows without bound across runs on a high-dup
    * corpus — and [[incrementalTraining]] collects it to the driver
    * every run (the one unbounded driver structure the round-4 audit
    * flagged). Folding rewrites each cid to its chain-terminal
    * effective id, which is exactly what the per-run closure computes;
    * an id absent from the (now empty) log resolves to itself, so
    * subsequent runs see identical effective clusters.
    * Crash ordering: members is swapped first, then keepers, then the
    * log is truncated. Every intermediate state is safe because
    * folding is IDEMPOTENT — chain terminals are never log keys, so
    * re-applying the surviving log to already-folded rows is a no-op,
    * and a crash before truncation just means the next call folds
    * again. Each individual swap is write-aside + rename (the
    * [[compactInPlace]] pattern). */
  def compactRemaps(spark: SparkSession, stateDir: String,
      maxRemapRows: Long = 100000L): Unit = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def path(sub: String) = new org.apache.hadoop.fs.Path(s"$stateDir/$sub")
    if (!fs.exists(path("remaps"))) return
    val remaps = spark.read.parquet(s"$stateDir/remaps")
    if (remaps.count() <= maxRemapRows) return
    val closureDf = resolveRemapClosure(remaps).localCheckpoint()
    def foldCids(sub: String, cidCol: String): Unit = {
      val df = spark.read.parquet(s"$stateDir/$sub")
      val folded = df
        .join(closureDf.withColumnRenamed("__from", cidCol),
          Seq(cidCol), "left")
        .withColumn(cidCol, coalesce($"__eff", col(cidCol)))
        .select(df.columns.map(col).toIndexedSeq: _*)
      folded.write.parquet(s"$stateDir/${sub}__compact")
      fs.delete(path(sub), true)
      fs.rename(path(s"${sub}__compact"), path(sub))
    }
    foldCids("members", "cid0")
    foldCids("keepers", "cid")
    val empty = Seq.empty[(Long, Long)].toDF("from_cid", "to_cid")
    empty.write.parquet(s"$stateDir/remaps__compact")
    fs.delete(path("remaps"), true)
    fs.rename(path("remaps__compact"), path("remaps"))
  }

  /** Resolve every remap chain to its terminal id DISTRIBUTED, by
    * POINTER DOUBLING over the functional graph (from_cid → to_cid;
    * terminals are never keys): each round joins the closure-so-far
    * with itself, doubling the hop distance every pointer covers, so
    * a storm of L chained merges resolves in ⌈log₂ L⌉ self-joins —
    * never a driver-side materialization of the log (the round-4
    * audit's last unbounded driver structure; the
    * Graph.connectedComponents star-contraction shape applied to a
    * functional graph). Each round localCheckpoints to truncate
    * lineage (the Graph iterative-join posture). Returns
    * (__from, __eff) for every log key. */
  private[graft] def resolveRemapClosure(remaps: DataFrame): DataFrame = {
    import remaps.sparkSession.implicits._
    val keys = remaps.select($"from_cid".as("__k")).localCheckpoint()
    var cur = remaps.select($"from_cid".as("__from"), $"to_cid".as("__eff"))
      .localCheckpoint()
    var pending = cur.join(keys, $"__eff" === $"__k", "left_semi").count()
    var rounds = 0
    while (pending > 0) {
      // 64 doubling rounds cover chains of 2⁶⁴ hops; only a CYCLE —
      // impossible under the merge-to-min-id invariant — survives
      // them, and failing beats spinning
      require(rounds < 64, "remap log contains a cycle")
      cur = cur
        .join(cur.select($"__from".as("__eff"), $"__eff".as("__eff2")),
          Seq("__eff"), "left")
        .select($"__from", coalesce($"__eff2", $"__eff").as("__eff"))
        .localCheckpoint()
      pending = cur.join(keys, $"__eff" === $"__k", "left_semi").count()
      rounds += 1
    }
    cur
  }

  /** Effective corpus of an [[incrementalTraining]] output dir:
    * appended rows minus tombstoned keepers. */
  def trainingSnapshot(spark: SparkSession, outDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val corpus = spark.read.parquet(s"$outDir/corpus")
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/tombstones")))
      corpus.join(spark.read.parquet(s"$outDir/tombstones"),
        Seq("doc_id"), "left_anti")
    else corpus
  }

  /** CDC-style compaction of the upsert-log corpus: apply the
    * tombstones and rewrite, so the corpus dir IS the snapshot again
    * and the tombstone log resets. Run periodically (cost ∝ live
    * corpus bytes), exactly like a Hudi/Iceberg table service; delta
    * runs keep appending either way. */
  def compactTrainingCorpus(spark: SparkSession, outDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val snap = trainingSnapshot(spark, outDir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    snap.count() // materialize before overwriting what it reads
    val tmp = s"$outDir/corpus__compact"
    Sink.partitioned(snap, tmp, Seq("split"))
    snap.unpersist()
    fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/corpus"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$outDir/corpus"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/tombstones"), true)
  }
}
