package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
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
      stateDir: String, outDir: String): IncrementalResult = {
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
}
