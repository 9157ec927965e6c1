package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks (reference: ipynb cell 5 `df.to_excel(...)`,
  * resilience.py:82 `merged.to_csv(...)` — re-expressed as columnar,
  * partition-pruned layouts). */
object Sink {

  /** Plain parquet (the Verify contract uses this shape). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned parquet: readers filtering on the
    * partition columns scan only matching directories (partition
    * pruning — the difference between reading 100 TB and reading one
    * key's slice). */
  def partitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** CSV export (the `merged.to_csv(...)` twin, resilience.py:82) —
    * headered, one part per task. At 100 TB this stays distributed;
    * `single = true` coalesces to one file for the reference's
    * hand-off shape (Streamlit reads a single CSV) — only sane for
    * driver-scale result tables like the 25-row resilience metrics. */
  def csv(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}
