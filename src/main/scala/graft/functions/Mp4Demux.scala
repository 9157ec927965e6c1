package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ISO-BMFF (mp4/mov/m4a) SAMPLE-TABLE demux as row-local byte math —
  * the buildable half of video support in an offline image (the JPEG
  * marker-walk precedent, G4): container demux needs no codec, only
  * the box tree. Walks ftyp→moov→trak→mdia→minf→stbl, reads the
  * stsc (sample-to-chunk runs), stsz (sizes, uniform or per-sample)
  * and stco (chunk offsets) tables, and resolves EVERY sample to its
  * absolute (chunk, file_offset, size) — exactly the per-sample
  * read plan a downstream decoder pool consumes, so a 100 TB video
  * corpus can be frame-ranged WITHOUT decoding a single frame.
  *
  * Reference boxes: ISO/IEC 14496-12 §8.5-8.7 (public spec). The
  * walk is first-trak (one video track per asset in the synthesis;
  * multi-track selection is a routing policy above this seam).
  * Malformed input — truncated boxes, missing stbl, 64-bit largesize
  * boxes, table overruns — returns an EMPTY array, never throws:
  * sniffing/demux run before any quality gate, so a corrupt asset
  * must degrade to "no samples", not kill the scan. */
object Mp4Demux {

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** FullBox version byte (payload byte 0 of a box headered at p). */
  private def ver(b: Array[Byte], p: Int): Int = b(p + 8) & 0xff

  private def typIs(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0).toByte && b(p + 1) == t.charAt(1).toByte &&
      b(p + 2) == t.charAt(2).toByte && b(p + 3) == t.charAt(3).toByte

  /** Payload offset of the first box of type `t` among the siblings
    * in [start, end), or -1; returns the offset of the box HEADER. */
  private def findBox(b: Array[Byte], start: Int, end: Int,
      t: String): Int = {
    var p = start
    while (p + 8 <= end) {
      val size = be32(b, p)
      // size 1 = 64-bit largesize (not produced by the synthesis,
      // unbounded to walk safely here), size 0 = box-to-EOF; both
      // abort the sibling walk rather than misparse
      if (size < 8 || p + size > end) return -1
      if (typIs(b, p + 4, t)) return p
      p += size.toInt
    }
    -1
  }

  /** (lo, hi) payload bounds of the first trak's stbl, or null. */
  private def stblBounds(bytes: Array[Byte]): (Int, Int) = {
    var lo = 0
    var hi = bytes.length
    for (container <- Seq("moov", "trak", "mdia", "minf", "stbl")) {
      val p = findBox(bytes, lo, hi, container)
      if (p < 0) return null
      hi = p + be32(bytes, p).toInt
      lo = p + 8
    }
    (lo, hi)
  }

  /** Per-sample read plan: array of (sample_idx, chunk_idx 1-based,
    * absolute file offset, size). Empty on any malformation. */
  def samples(bytes: Array[Byte]): ArrayData = {
    val empty = new GenericArrayData(Array.empty[Any])
    val b = stblBounds(bytes)
    if (b == null) return empty
    val (lo, hi) = b
    val stsc = findBox(bytes, lo, hi, "stsc")
    val stsz = findBox(bytes, lo, hi, "stsz")
    val stco = findBox(bytes, lo, hi, "stco")
    if (stsc < 0 || stsz < 0 || stco < 0) return empty
    // Only version 0 is defined for stsc/stsz/stco (ISO 14496-12;
    // the 64-bit chunk table is the separate co64 box) — an unknown
    // version means unknown layout, so quarantine rather than misparse
    if (ver(bytes, stsc) != 0 || ver(bytes, stsz) != 0 ||
        ver(bytes, stco) != 0) return empty
    // stsz: ver/flags, uniform sample_size, sample_count[, sizes]
    val uniform = be32(bytes, stsz + 12)
    val nSamples = be32(bytes, stsz + 16).toInt
    if (nSamples < 0 || nSamples > (1 << 24)) return empty
    if (uniform == 0 && stsz + 20 + 4L * nSamples > stsz + be32(bytes, stsz))
      return empty
    def sizeOf(i: Int): Long =
      if (uniform != 0) uniform else be32(bytes, stsz + 20 + 4 * i)
    // stco: ver/flags, entry_count, offsets
    val nChunks = be32(bytes, stco + 12).toInt
    if (nChunks <= 0 || stco + 16 + 4L * nChunks > stco + be32(bytes, stco))
      return empty
    def chunkOff(j: Int): Long = be32(bytes, stco + 16 + 4 * j)
    // stsc: ver/flags, entry_count, (first_chunk, spc, sdi) runs
    val nRuns = be32(bytes, stsc + 12).toInt
    if (nRuns <= 0 || stsc + 16 + 12L * nRuns > stsc + be32(bytes, stsc))
      return empty
    def runFirst(r: Int): Long = be32(bytes, stsc + 16 + 12 * r)
    def runSpc(r: Int): Long = be32(bytes, stsc + 16 + 12 * r + 4)
    val out = new Array[Any](nSamples)
    var i = 0        // sample index
    var run = 0      // current stsc run
    var chunk = 1L   // 1-based chunk index
    while (i < nSamples) {
      if (chunk > nChunks) return empty // tables disagree
      while (run + 1 < nRuns && runFirst(run + 1) <= chunk) run += 1
      val spc = runSpc(run)
      if (spc <= 0) return empty
      var within = 0L
      var off = chunkOff((chunk - 1).toInt)
      while (within < spc && i < nSamples) {
        val sz = sizeOf(i)
        out(i) = InternalRow(i.toLong, chunk, off, sz)
        off += sz
        within += 1
        i += 1
      }
      chunk += 1
    }
    new GenericArrayData(out)
  }

  /** Per-sample TIMING plan from stts (decode timestamps) + ctts
    * (composition offsets — the B-frame presentation reorder) + stss
    * (sync samples): array of (sample_idx, dts, pts, duration,
    * is_sync 0/1). Absent stss means EVERY sample is a sync sample;
    * absent ctts means pts = dts (ISO 14496-12 §8.6 — both boxes are
    * only written when needed). Empty on any malformation. This is
    * what a keyframe-aware frame sampler consumes: seek targets are
    * sync samples, presentation windows come from the pts ladder. */
  def timing(bytes: Array[Byte]): ArrayData = {
    val empty = new GenericArrayData(Array.empty[Any])
    val b = stblBounds(bytes)
    if (b == null) return empty
    val (lo, hi) = b
    val stts = findBox(bytes, lo, hi, "stts")
    val stsz = findBox(bytes, lo, hi, "stsz")
    if (stts < 0 || stsz < 0) return empty
    if (ver(bytes, stts) != 0 || ver(bytes, stsz) != 0) return empty
    val nSamples = be32(bytes, stsz + 16).toInt
    if (nSamples < 0 || nSamples > (1 << 24)) return empty
    val nRuns = be32(bytes, stts + 12).toInt
    if (nRuns <= 0 || stts + 16 + 8L * nRuns > stts + be32(bytes, stts))
      return empty
    // stss is optional; a present-but-corrupt table quarantines
    val stss = findBox(bytes, lo, hi, "stss")
    var sync: Array[Boolean] = null
    if (stss >= 0) {
      if (ver(bytes, stss) != 0) return empty
      val nk = be32(bytes, stss + 12).toInt
      if (nk < 0 || stss + 16 + 4L * nk > stss + be32(bytes, stss))
        return empty
      sync = new Array[Boolean](nSamples)
      var k = 0
      while (k < nk) {
        val idx = be32(bytes, stss + 16 + 4 * k) // 1-based
        if (idx >= 1 && idx <= nSamples) sync((idx - 1).toInt) = true
        k += 1
      }
    }
    // ctts is optional (pts = dts without it); a present-but-corrupt
    // table quarantines. Version 0 offsets are UNSIGNED, version 1
    // offsets are SIGNED (real muxers emit v1 for B-frame reorder
    // where early samples present before they decode) — reading a
    // v1 negative as unsigned be32 would make pts ≈ dts + 4.29e9,
    // silently wrong; unknown versions quarantine.
    val ctts = findBox(bytes, lo, hi, "ctts")
    var cttsRuns = 0
    var cttsSigned = false
    if (ctts >= 0) {
      val v = ver(bytes, ctts)
      if (v > 1) return empty
      cttsSigned = v == 1
      cttsRuns = be32(bytes, ctts + 12).toInt
      if (cttsRuns <= 0 ||
          ctts + 16 + 8L * cttsRuns > ctts + be32(bytes, ctts))
        return empty
    }
    def cttsOff(p: Int): Long = {
      val raw = be32(bytes, p)
      if (cttsSigned) raw.toInt.toLong else raw
    }
    val out = new Array[Any](nSamples)
    var i = 0
    var run = 0
    var left = be32(bytes, stts + 16) // samples left in current run
    var delta = be32(bytes, stts + 20)
    var cRun = 0
    var cLeft = if (ctts >= 0) be32(bytes, ctts + 16) else Long.MaxValue
    var cOff = if (ctts >= 0) cttsOff(ctts + 20) else 0L
    var dts = 0L
    while (i < nSamples) {
      while (left <= 0) {
        run += 1
        if (run >= nRuns) return empty // stts covers fewer samples
        left = be32(bytes, stts + 16 + 8 * run)
        delta = be32(bytes, stts + 20 + 8 * run)
      }
      while (cLeft <= 0) {
        cRun += 1
        if (cRun >= cttsRuns) return empty // ctts covers fewer samples
        cLeft = be32(bytes, ctts + 16 + 8 * cRun)
        cOff = cttsOff(ctts + 20 + 8 * cRun)
      }
      val isSync = if (sync == null) 1L else if (sync(i)) 1L else 0L
      out(i) = InternalRow(i.toLong, dts, dts + cOff, delta, isSync)
      dts += delta
      left -= 1
      cLeft -= 1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `mp4_samples(payload)` as a codegen-friendly Column. */
  def mp4Samples(c: Column): Column =
    GraftSqlBridge.column(Mp4SampleTable(GraftSqlBridge.expression(c)))

  /** `mp4_timing(payload)` as a codegen-friendly Column. */
  def mp4Timing(c: Column): Column =
    GraftSqlBridge.column(Mp4TimingTable(GraftSqlBridge.expression(c)))
}

/** Scalar wrapper: binary → array<struct<sample_idx, chunk_idx,
  * file_offset, sample_size>> inside whole-stage codegen (one static
  * call, the PolyHash pattern). */
case class Mp4SampleTable(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mp4_samples needs a binary input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_idx", LongType, nullable = false),
    StructField("chunk_idx", LongType, nullable = false),
    StructField("file_offset", LongType, nullable = false),
    StructField("sample_size", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Mp4Demux.samples(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.Mp4Demux.samples($in)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar wrapper: binary → array<struct<sample_idx, dts, pts,
  * duration, is_sync>> inside whole-stage codegen. */
case class Mp4TimingTable(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mp4_timing needs a binary input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_idx", LongType, nullable = false),
    StructField("dts", LongType, nullable = false),
    StructField("pts", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("is_sync", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Mp4Demux.timing(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.Mp4Demux.timing($in)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
