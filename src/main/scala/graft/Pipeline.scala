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
