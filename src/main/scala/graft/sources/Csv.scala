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

  /** Rows that parsed cleanly (reference's post-clean frame). */
  def clean(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined rows for inspection (what pandas would silently
    * coerce to NaN). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNotNull)
}
