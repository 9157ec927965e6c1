package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Misra-Gries counter arithmetic as PLAIN functions over
  * mutable maps — shared verbatim by the Catalyst aggregate below
  * and the streaming operator (CdcStream.heavyHittersStream), and
  * testable without constructing an expression tree. */
object MisraGries {
  /** One observation: increment, insert, or the decrement-all step. */
  def add(buf: mutable.HashMap[String, Long], s: String, k: Int): Unit =
    buf.get(s) match {
      case Some(c) => buf(s) = c + 1
      case None if buf.size < k => buf(s) = 1L
      case None => // the MG decrement step: all counters down one
        // snapshot before mutating — updating a mutable.HashMap
        // mid-iteration corrupts the walk (measured; see merge)
        for ((key, c) <- buf.toArray) {
          if (c == 1L) buf.remove(key) else buf(key) = c - 1
        }
    }

  /** Summary merge (Agarwal et al., TODS 2013): pointwise addition,
    * then subtract the (k+1)-th largest count and drop
    * non-positives. Mutates and returns `a`. */
  def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long], k: Int): mutable.HashMap[String, Long] = {
    for ((key, c) <- b) a(key) = a.getOrElse(key, 0L) + c
    if (a.size > k) {
      // Snapshot first: mutating a mutable.HashMap mid-iteration is
      // undefined and measurably corrupts the walk (observed: an
      // 11-entry map "surviving" 10 entries where <= 9 is provable).
      val entries = a.toArray
      val counts = entries.map(_._2)
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      for ((key, c) <- entries) {
        if (c - d <= 0L) a.remove(key) else a(key) = c - d
      }
    }
    a
  }
}

/** Misra-Gries heavy-hitter sketch as ONE imperative aggregate — the
  * frequent-item pass that replaces an exact `groupBy` when the key
  * domain (tokens, n-grams, domains) won't fit anywhere at 100 TB:
  * per-partition state is AT MOST `k` (item, count) pairs no matter
  * how many distinct keys stream past, and merge is the summary
  * merge of Agarwal et al., "Mergeability of Summaries" (TODS 2013):
  * pointwise count addition, then subtract the (k+1)-th largest
  * count and drop non-positives — associative-in-bound, fully
  * map-side combinable.
  *
  * GUARANTEE (the one that makes the sketch exact-izable): every
  * item with true frequency > n/(k+1) SURVIVES in the summary
  * regardless of arrival or merge order; estimates are
  * undercounts by at most n/(k+1). Estimates themselves may vary
  * with partitioning — consumers needing deterministic output must
  * re-count the (≤ k) surviving candidates exactly in a second pass
  * (see TextAnalysis.heavyHitters), which restores bit-determinism
  * because the candidate → survivor filter is applied to EXACT
  * counts.
  *
  * Returns `array<struct<item string, est bigint>>`, count-desc,
  * item-asc.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"misra_gries k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      MisraGries.add(buf, s, k)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.merge(a, b, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c) })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + bytes.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m(new String(arr, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object MisraGriesAgg {
  /** `misra_gries(col, k)` as a Column aggregate. */
  def sketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGriesAgg(GraftSqlBridge.expression(c), k)
        .toAggregateExpression())
}
