package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native xlsx ingestion — the reference reads `Business.xlsx` with
  * `pd.read_excel(sheet_name=..., skiprows=5)` then drops the
  * numbering column and renames the first real column (reference:
  * CDCPROJECT ipynb cells 1-2). This is the Spark twin, built on
  * nothing but the JDK (xlsx = ZIP of SpreadsheetML): workbook →
  * sheet-name → worksheet part via the rels table, shared-strings
  * resolved, sparse cells (the `r="B2"` addresses) expanded to their
  * true column positions.
  *
  * All cells surface as strings; numeric coercion stays downstream in
  * the engine's permissive-coercion operators (q_coerce), exactly
  * where the pandas flow does `to_numeric(errors="coerce")`.
  *
  * Scale posture: ONE workbook is an inherently single-stream format
  * (a zip with one XML per sheet) — `read` parses it where the bytes
  * are. A LAKE of workbooks (the realistic 100 TB shape: thousands of
  * exported files) goes through `readMany`, which distributes whole
  * files to executors via Spark's binaryFile source and parses each in
  * place — per-file parallelism, no driver bottleneck; land the result
  * in parquet and never re-touch the xlsx.
  */
object Excel {

  private val xif = XMLInputFactory.newInstance()
  xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
  xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)

  /** All (name → bytes) entries of a zip archive. */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += (e.getName -> zin.readAllBytes())
      zin.closeEntry()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** "B2" → 0-based column index 1. */
  private def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** Concatenated text content of the current element (handles rich
    * runs: <si><r><t>a</t></r><r><t>b</t></r></si>). */
  private def collectText(r: javax.xml.stream.XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case _ =>
      }
    }
    sb.toString
  }

  private def sharedStrings(bytes: Option[Array[Byte]]): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    bytes.foreach { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "si") {
          out += collectText(r)
        }
      }
      r.close()
    }
    out.toIndexedSeq
  }

  /** sheet name → worksheet part path, via workbook.xml + its rels. */
  private def sheetPath(entries: Map[String, Array[Byte]],
      sheetName: String): String = {
    val wb = entries.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    var rId: String = null
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(wb))
    while (r.hasNext && rId == null) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet" &&
          r.getAttributeValue(null, "name") == sheetName) {
        rId = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).orNull
      }
    }
    r.close()
    require(rId != null, s"sheet '$sheetName' not found in workbook")
    val rels = entries("xl/_rels/workbook.xml.rels")
    var target: String = null
    val rr = xif.createXMLStreamReader(new ByteArrayInputStream(rels))
    while (rr.hasNext && target == null) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
          rr.getLocalName == "Relationship" &&
          rr.getAttributeValue(null, "Id") == rId) {
        target = rr.getAttributeValue(null, "Target")
      }
    }
    rr.close()
    require(target != null, s"no relationship for sheet '$sheetName'")
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  /** Parse one sheet of an xlsx byte array into dense string rows
    * (null = empty cell); rows are padded to the widest row. */
  private[sources] def parseSheet(bytes: Array[Byte],
      sheetName: String): Vector[Vector[String]] = {
    val entries = zipEntries(bytes)
    val sst = sharedStrings(entries.get("xl/sharedStrings.xml"))
    val sheet = entries.getOrElse(sheetPath(entries, sheetName),
      throw new IllegalArgumentException(s"worksheet part missing"))
    val rows = ArrayBuffer.empty[ArrayBuffer[String]]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(sheet))
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var pendingInline = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            row = ArrayBuffer.empty[String]
          case "c" if row != null =>
            val ref = r.getAttributeValue(null, "r")
            cellCol = if (ref != null) colIndex(ref) else row.length
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            pendingInline = cellType == "inlineStr"
          case "v" if row != null && cellCol >= 0 =>
            val raw = collectText(r)
            val value =
              if (cellType == "s") sst(raw.trim.toInt) else raw
            while (row.length <= cellCol) row += null
            row(cellCol) = value
          case "is" if pendingInline && row != null && cellCol >= 0 =>
            val value = collectText(r)
            while (row.length <= cellCol) row += null
            row(cellCol) = value
            pendingInline = false
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "row" =>
          if (row != null) rows += row
          row = null
        case _ =>
      }
    }
    r.close()
    val width = if (rows.isEmpty) 0 else rows.map(_.length).max
    rows.map { rw =>
      while (rw.length < width) rw += null
      rw.toVector
    }.toVector
  }

  /** Header names pandas-style: the first post-skip row, blanks as
    * `Unnamed: i`, duplicates suffixed. */
  private def headerNames(header: Vector[String]): Vector[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    header.zipWithIndex.map { case (h, i) =>
      val base = Option(h).map(_.trim).filter(_.nonEmpty)
        .getOrElse(s"Unnamed: $i")
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"$base.$n"
    }
  }

  private def toDf(spark: SparkSession, sheets: Seq[Vector[Vector[String]]],
      skipRows: Int): DataFrame = {
    val first = sheets.head.drop(skipRows)
    require(first.nonEmpty, "no rows after skipRows")
    val names = headerNames(first.head)
    val schema = StructType(names.map(StructField(_, StringType)))
    val data = sheets.flatMap { s =>
      s.drop(skipRows + 1).map { rw =>
        Row.fromSeq(names.indices.map(i =>
          if (i < rw.length) rw(i) else null))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** Single-workbook read (the `pd.read_excel(path, sheet_name=...,
    * skiprows=n)` twin): rows after `skipRows`, first of them the
    * header, every column string-typed. */
  def read(spark: SparkSession, path: String, sheetName: String,
      skipRows: Int = 0): DataFrame = {
    val content = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    toDf(spark, Seq(parseSheet(content, sheetName)), skipRows)
  }

  /** Distributed read of MANY workbooks (a directory/glob of exports):
    * whole files ship to executors via the binaryFile source and each
    * parses where it lands — per-file parallelism, constant driver
    * memory. All files must share the sheet layout; the header is
    * taken from the first file. */
  def readMany(spark: SparkSession, pathGlob: String, sheetName: String,
      skipRows: Int = 0): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select($"path", $"content")
    val headBytes = files.orderBy($"path").select($"content")
      .limit(1).collect()
    require(headBytes.nonEmpty, s"no files match $pathGlob")
    val names = headerNames(
      parseSheet(headBytes(0).getAs[Array[Byte]](0), sheetName)
        .drop(skipRows).head)
    val schema = StructType(names.map(StructField(_, StringType)))
    val width = names.length
    val rowsRdd = files.select($"content").rdd.flatMap { r =>
      parseSheet(r.getAs[Array[Byte]](0), sheetName)
        .drop(skipRows + 1)
        .map(rw => Row.fromSeq((0 until width).map(i =>
          if (i < rw.length) rw(i) else null)))
    }
    spark.createDataFrame(rowsRdd, schema)
  }

  /** The reference's post-ingest normalization (ipynb cells 1-2):
    * drop the leading numbering column, rename the next one, keep the
    * rest (year columns) as-is. */
  def dropAndRename(df: DataFrame, renameFirstTo: String): DataFrame = {
    val cols = df.columns
    require(cols.length >= 2, "need at least 2 columns")
    df.drop(cols(0)).withColumnRenamed(cols(1), renameFirstTo)
  }

  // ---- writer ---------------------------------------------------------

  /** 0-based column index → spreadsheet letters ("A", …, "Z", "AA"). */
  private def colLetters(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val r = (i - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }

  /** Minimal XML text escape; control chars XML 1.0 forbids are
    * dropped rather than emitted broken. */
  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c >= 0x20 || c == '\t' || c == '\n' || c == '\r' =>
        sb.append(c)
      case _ =>
    }
    sb.toString
  }

  /** Native xlsx EXPORT — the reference's final hand-off is
    * `df.to_excel(...)` (CDCPROJECT ipynb cell 5); this is its Spark
    * twin on nothing but `java.util.zip`: one worksheet of inline
    * strings (the same encoding [[read]] parses back, so the
    * round-trip is closed without sharedStrings bookkeeping), header
    * row = column names, null cells omitted. Every value is written
    * via its Spark string form; typed re-ingest stays downstream in
    * q_coerce exactly like the read path.
    *
    * Scale posture: xlsx is a REPORT format — a single-stream zip
    * with a hard 1,048,575 data-row ceiling that no analytics sink
    * should stream corpus data into. The writer therefore collects
    * (bounded by the format's own ceiling, enforced) and is meant for
    * final metric frames (the reference exports 93 rows); bulk data
    * belongs in [[Sink.parquet]]. */
  def write(df: DataFrame, path: String,
      sheetName: String = "Sheet1"): Unit = {
    val names = df.columns.toVector
    val strDf = df.select(names.map(c =>
      org.apache.spark.sql.functions.col(c).cast(StringType).as(c)): _*)
    val rows = strDf.collect()
    require(rows.length <= 1048575,
      s"xlsx holds at most 1,048,575 data rows; got ${rows.length} — " +
        "export a report-sized frame (bulk data belongs in parquet)")

    def cell(rowNum: Int, colIdx: Int, v: String): String =
      if (v == null) ""
      else s"""<c r="${colLetters(colIdx)}$rowNum" t="inlineStr">""" +
        s"<is><t xml:space=\"preserve\">${xmlEscape(v)}</t></is></c>"
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/""")
      .append("""spreadsheetml/2006/main"><sheetData>""")
    sb.append("""<row r="1">""")
    names.zipWithIndex.foreach { case (n, i) => sb.append(cell(1, i, n)) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sb.append(s"""<row r="${ri + 2}">""")
      names.indices.foreach { i =>
        sb.append(cell(ri + 2, i, r.getString(i)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
      """</workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""

    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      def put(name: String, body: String): Unit = {
        zout.putNextEntry(new java.util.zip.ZipEntry(name))
        zout.write(body.getBytes("UTF-8"))
        zout.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zout.close()
  }
}
