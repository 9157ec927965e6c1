package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling polynomial gram hash.
  *
  * Emits the dense array of k-gram hashes h_i = (Σ_j c_{i+j} ·
  * 257^{k−1−j}) mod p (p = 10⁹+7) over a string's BYTES — the
  * canonical residues the D16 winnowing fingerprinter consumes. One
  * pass over the bytes with the O(1) rolling update
  * h' = ((h − c_out·257^{k−1} mod p + p)·257 + c_in) mod p, inside
  * whole-stage codegen.
  *
  * This replaces winnow's previous derivation — a character
  * posexplode (|text| rows) plus k stacked lead() windows whose
  * partition sort carried every character of the corpus through an
  * Exchange — with zero extra rows and zero window passes: the
  * hashes materialize row-locally and only the GRAM rows (the same
  * count as before) leave the operator via the existing posexplode.
  * Same integers: the rolling update and the k-term dot product are
  * both the canonical residue of the same polynomial, so the D16
  * oracle and pair set are unchanged.
  *
  * Contract: byte-level hashing — identical to the previous
  * codepoint form for the ASCII alphabet the D16 normalizer emits
  * ([a-z0-9 ]); callers hashing raw multi-byte text get
  * byte-polynomial semantics (deterministic, just not
  * codepoint-aligned). Overflow bound: every intermediate is
  * < 2.6·10¹¹·257 ≈ 6.7·10¹³, safely int64. */
case class RollingPolyHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be positive, got $k")

  private val P = 1000000007L
  private val Base = 257L
  /** 257^(k−1) mod p — the coefficient retired as the window slides. */
  private val topCoef = BigInt(Base).modPow(k - 1, P).toLong

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_poly_hash needs a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xffL)) % P; i += 1 }
    out(0) = h
    while (i < n) {
      h = ((h - (bytes(i - k) & 0xffL) * topCoef % P + P) * Base +
        (bytes(i) & 0xffL)) % P
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |byte[] $b = $in.getBytes();
         |int $n = $b.length;
         |int $m = $n >= $k ? $n - $k + 1 : 0;
         |long[] $out = new long[$m];
         |if ($m > 0) {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $k; $i++) {
         |    $h = ($h * ${Base}L + ($b[$i] & 0xffL)) % ${P}L;
         |  }
         |  $out[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = (($h - ($b[$i - $k] & 0xffL) * ${topCoef}L % ${P}L
         |      + ${P}L) * ${Base}L + ($b[$i] & 0xffL)) % ${P}L;
         |    $out[$i - $k + 1] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHash {
  /** Dense k-gram rolling polynomial hashes of a string's bytes, as
    * array<long>, inside whole-stage codegen. */
  def rollingPolyHash(c: Column, k: Int): Column =
    GraftSqlBridge.column(RollingPolyHash(GraftSqlBridge.expression(c), k))
}
