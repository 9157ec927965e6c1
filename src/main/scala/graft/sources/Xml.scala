package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_xml, lit}
import org.apache.spark.sql.types.StructType

/** XML ingestion (SURVEY.md §2.H21) — feeds, sitemaps, and legacy
  * enterprise exports are the XML edge a crawl/ETL pipeline still
  * meets (Spark 4 ships the former spark-xml as a built-in source).
  * Same posture as [[Jsonl]]: an EXPLICIT schema (no inference pass
  * over 100 TB) and PERMISSIVE parsing, so malformed records land in
  * a corrupt-record column instead of failing the load.
  *
  * Two entry points, one semantics:
  *  - [[read]] — the `xml` file source with `rowTag` (multi-record
  *    documents split into rows; Spark's StaxXmlParser handles
  *    multi-line records, which a text scan cannot);
  *  - [[parse]] — `from_xml` over an existing string COLUMN (the
  *    envelope shape: XML payloads inside a CDC/queue row, parsed
  *    without ever hitting the file-source path).
  *
  * `from_xml` carries no PERMISSIVE corrupt-column contract the way
  * `from_json` does — a malformed fragment nulls the whole struct —
  * so [[parse]] rebuilds the quarantine contract explicitly: null
  * struct + non-null input ⇒ the raw fragment lands in
  * [[Jsonl.CorruptCol]], keeping [[Jsonl.clean]]/[[Jsonl.quarantine]]
  * reusable verbatim on XML frames. */
object Xml {

  /** Permissive rowTag file read: one row per `<rowTag>` element,
    * malformed records quarantined to [[Jsonl.CorruptCol]].
    *
    * Caveat (differs from [[Jsonl.read]]): XML records are multi-line,
    * so this must use the raw xml relation — and Spark disallows
    * quarantine-ONLY queries against raw relations
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN: a corrupt-only scan could
    * skip parsing and lie). Run [[Jsonl.quarantine]] on a cached or
    * otherwise materialized frame; [[Jsonl.clean]] and mixed
    * projections are unrestricted, and the [[parse]] column path
    * carries no restriction at all. */
  def read(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame = {
    val full = schema.add(Jsonl.CorruptCol, "string")
    spark.read
      .format("xml")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Jsonl.CorruptCol)
      .schema(full)
      .load(path)
  }

  /** Parse an XML-fragment string column into `schema` fields with an
    * explicit quarantine column. `from_xml` has no corrupt-record
    * contract — a malformed fragment yields a struct of ALL-NULL
    * fields (measured; so does `garbage`) — so the quarantine rule
    * here is: a NON-NULL fragment that produced no parsed field at
    * all lands raw in [[Jsonl.CorruptCol]] (this also sweeps up
    * empty `<r/>` records, which carry nothing a consumer could
    * use); a null input stays null-row, not quarantined. */
  def parse(df: DataFrame, xmlCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("_x",
      from_xml(col(xmlCol), schema, Map.empty[String, String].asJava))
    val fields = schema.fieldNames.toIndexedSeq.map(n => col(s"_x.`$n`"))
    val allNull = schema.fieldNames.toIndexedSeq
      .map(n => col(s"_x.`$n`").isNull).reduce(_ && _)
    val corrupt = org.apache.spark.sql.functions
      .when((col("_x").isNull || allNull) && col(xmlCol).isNotNull,
        col(xmlCol))
      .otherwise(lit(null).cast("string"))
    parsed.select(df.columns.filter(_ != xmlCol).toIndexedSeq.map(col) ++
      fields :+ corrupt.as(Jsonl.CorruptCol): _*)
  }

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val j = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => j.put(k, v) }
      j
    }
  }
}
