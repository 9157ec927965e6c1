package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion with explicit schema + permissive error capture —
  * the Spark-native analog of the reference's Excel ingest
  * (reference: CDCPROJECT ipynb cell 1: `pd.read_excel(...,
  * skiprows=5)` + drop/rename; pandas silently coerces bad cells,
  * Spark routes them to a corrupt-record column so a 100 TB load can
  * quarantine rather than abort). */
object Csv {

  val CorruptCol = "_corrupt_record"

  /** Schema-checked permissive read: malformed rows land in
    * [[CorruptCol]] instead of failing the job. */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .csv(path)

  /** Rows that parsed cleanly (reference's post-clean frame).
    *
    * Caveat shared with [[quarantine]]: Spark disallows queries over
    * an UNCACHED raw CSV read whose scan would need only the corrupt
    * column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — e.g. a bare
    * `clean(df).count()`. Queries selecting data columns are fine;
    * for count-only health checks either cache the parsed frame
    * first or use the [[Jsonl]] source, whose text+from_json read has
    * no such restriction (per-line from_csv cannot express CSV
    * headers, so the CSV reader keeps the raw relation). */
  def clean(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined rows for inspection (what pandas would silently
    * coerce to NaN). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNotNull)
}
