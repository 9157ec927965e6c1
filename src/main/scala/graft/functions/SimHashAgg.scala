package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash fingerprint as ONE imperative aggregate.
  *
  * The composed form needs 64 `sum(when(bit_j, 1, -1))` aggregate
  * columns; this keeps a single `Array[Int](64)` of bit balances,
  * adds each token's hash bits in one pass, and emits the sign
  * fingerprint. Map-side combinable (merge = elementwise add), so at
  * 100 TB the per-group state is 256 bytes regardless of doc length.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      // seeded poly hash (oracle-replayable, see PolyHash): 63-bit, so
      // bit 63's balance is always negative and fp bit 63 is always 0
      // — both engines agree by construction
      val h = PolyHash.hashSeeded(v.asInstanceOf[UTF8String],
        SimHashAgg.Seed)
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) fp |= (1L << j); j += 1 }
    java.lang.Long.valueOf(fp)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object SimHashAgg {
  /** Fingerprint hash seed — the 33rd golden-gamma multiple, disjoint
    * from the 32 MinHash permutation seeds; the DuckDB twin carries
    * the literal. */
  val Seed: Long = PolyHash.seed(32)

  /** `simhash(tokenCol)` aggregate → 64-bit fingerprint (bigint). */
  def simhash(c: Column): Column =
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
