package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `top_k((score, id), k)` → the k
  * highest-scoring (score, id) pairs per group, score desc / id asc.
  *
  * The window formulation (`row_number() OVER (ORDER BY score)`)
  * must shuffle AND SORT every candidate row per group; this
  * aggregate keeps a k-element min-heap per group (map-side
  * combinable: partial heaps merge), so per-group work is
  * O(n log k) with O(k) state — the shape a 10⁹-candidate ANN
  * query needs. Emits `array<struct<score:double, id:bigint>>`
  * in final rank order.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {
  import TopKAgg.Heap

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType),
      StructField("id", LongType))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k needs struct<double, bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: Heap, b: Heap): Heap = { a.absorb(b); a }

  override def eval(buf: Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: Heap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Heap = Heap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object TopKAgg {

  /** k-bounded collection with "score desc, id asc" ranking.
    * Backed by a simple array (k is small); `offer` is O(k) worst
    * case on eviction — fine for ANN-style k ≤ 100. */
  final class Heap(k: Int) {
    private var scores = new Array[Double](k)
    private var ids = new Array[Long](k)
    private var size = 0

    /** true if (s1,i1) ranks strictly better than (s2,i2). */
    @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long) =
      s1 > s2 || (s1 == s2 && i1 < i2)

    def offer(s: Double, id: Long): Unit = {
      // NaN compares false both ways in better(): once admitted it
      // could never be evicted (zero-norm vectors yield NaN cosines
      // upstream) — reject it outright
      if (s.isNaN) return
      if (size < k) { scores(size) = s; ids(size) = id; size += 1 }
      else {
        // find current worst; replace if the newcomer beats it
        var worst = 0
        var j = 1
        while (j < size) {
          if (better(scores(worst), ids(worst), scores(j), ids(j))) worst = j
          j += 1
        }
        if (better(s, id, scores(worst), ids(worst))) {
          scores(worst) = s; ids(worst) = id
        }
      }
    }

    def absorb(o: Heap): Unit = {
      var j = 0
      while (j < o.size) { offer(o.scores(j), o.ids(j)); j += 1 }
    }

    def sortedDesc: Seq[(Double, Long)] =
      (0 until size).map(j => (scores(j), ids(j)))
        .sortBy { case (s, i) => (-s, i) }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * size)
      bb.putInt(size)
      var j = 0
      while (j < size) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(k: Int, bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new Heap(k)
      var j = 0
      while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
      h
    }
  }

  /** `top_k(struct(score, id), k)` as a Column aggregate. */
  def topK(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
