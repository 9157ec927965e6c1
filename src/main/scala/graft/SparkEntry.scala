package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each operator module contributes its `queries` (Spark plans) and
  * `oracles` (DuckDB-runnable ANSI SQL twins). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core pipeline: merge + clean + real-value
    * (reference: CDCPROJECT ipynb cell 3). */
  def entry(spark: SparkSession): DataFrame =
    Relational.cleanReal(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Resilience.queries ++ Cdc.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Multimodal.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Resilience.oracles ++ Cdc.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
      Multimodal.oracles ++ Graph.oracles
}
