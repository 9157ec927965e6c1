package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion (SURVEY.md §2.H7) — the de-facto interchange
  * format for LLM training corpora (one document object per line).
  * Same quarantine posture as [[Csv]]: an explicit schema (no
  * inference pass over 100 TB) and PERMISSIVE mode so malformed lines
  * land in a corrupt-record column instead of failing the load; a
  * splittable line format parallelizes across input splits like any
  * text source. */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Schema-checked permissive read: malformed lines land in
    * [[CorruptCol]] instead of failing the job. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .json(path)

  /** Rows that parsed cleanly. */
  def clean(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Malformed lines, for quarantine/repair (raw line preserved). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNotNull).select(df(CorruptCol))
}
