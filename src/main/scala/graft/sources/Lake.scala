package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-read conveniences over evolving parquet layouts. */
object Lake {

  /** Read a parquet dataset whose files were written across schema
    * GENERATIONS (columns added over time — the normal life of a
    * long-lived ingest directory): union the files' footer schemas
    * (`mergeSchema`) so old-generation files surface late-added
    * columns as nulls instead of the default single-footer read,
    * which silently drops columns whenever the sampled file happens
    * to be old-generation. Cost is a footer read per file —
    * distributed, and proportional to file COUNT, not data bytes, so
    * it stays cheap at 100 TB if the layout is compacted (Sink
    * .compact); predicate pushdown and partition pruning work
    * unchanged on the merged schema, including filters on late-added
    * columns (parquet readers treat a missing column as all-null and
    * row-group stats prune accordingly). */
  def parquetEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
