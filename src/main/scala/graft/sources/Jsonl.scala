package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion (SURVEY.md §2.H7) — the de-facto interchange
  * format for LLM training corpora (one document object per line).
  * Same quarantine posture as [[Csv]]: an explicit schema (no
  * inference pass over 100 TB) and PERMISSIVE parsing so malformed
  * lines land in a corrupt-record column instead of failing the load.
  *
  * Parsing is a text scan + `from_json` rather than the raw json
  * relation: identical permissive semantics (bad cast → null fields +
  * corrupt column carrying the raw line), but none of the raw-file
  * restriction that forbids uncached queries touching only the
  * corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — so
  * `clean(df).count()` / `quarantine(df).count()` work straight off
  * the load, cache or no cache, at any scale. A line-delimited text
  * scan splits across input blocks like any other source.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** The permissive line→row projection shared by the batch and
    * streaming readers (one parser, two execution modes — the
    * batch/stream symmetry Structured Streaming is built on). */
  def parse(lines: DataFrame, schema: StructType): DataFrame = {
    val full = schema.add(CorruptCol, "string")
    lines
      .select(from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(full.fieldNames.toIndexedSeq.map(n => col(s"r.`$n`")): _*)
  }

  /** Schema-checked permissive read: malformed lines land in
    * [[CorruptCol]] (raw line preserved) instead of failing the job. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parse(spark.read.text(path), schema)

  /** Streaming twin of [[read]]: tail a landing directory of jsonl
    * files (the shape of a continuous crawl/CDC drop zone). Identical
    * parse + quarantine semantics; new files become micro-batches. */
  def readStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    parse(spark.readStream.text(path), schema)

  /** Rows that parsed cleanly. */
  def clean(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Malformed lines for quarantine/repair (raw line preserved). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNotNull).select(df(CorruptCol))
}
