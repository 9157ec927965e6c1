package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Seeded polynomial string hash, mod 2⁶³ — the ORACLE-REPLAYABLE
  * per-shingle hash the MinHash/SimHash sketches consume.
  *
  * h(s, seed) = fold over the string's Unicode CODEPOINTS of
  * h ← (h·1000003 + cp) mod 2⁶³, starting from h = seed. Codepoint
  * (not byte) iteration matches DuckDB's character semantics, so the
  * DuckDB twin is exactly
  *
  *   list_reduce(list_prepend(SEED::HUGEINT,
  *     list_transform(range(1, len(s)+1), i -> unicode(s[i])::HUGEINT)),
  *     (a, c) -> (a * 1000003 + c) % 9223372036854775808)
  *
  * — HUGEINT mod 2⁶³ equals the JVM's wrapping multiply-add masked to
  * 63 bits (each step's mask is a mod-2⁶³ residue, and mod is
  * multiplicative-homomorphic), so signatures replay BIT-FOR-BIT.
  * This is what lets dedup_minhash/dedup_simhash graduate from
  * rows-only to full oracle grading (the A62 count-min precedent:
  * exactly-graded sketches beat error-bounded ones).
  *
  * Seeds are golden-gamma multiples (Steele et al. 2014's SplitMix64
  * increment), masked to 63 bits — one literal per permutation, so
  * the oracle SQL carries them verbatim. Top bit is always 0: both
  * engines order the hashes identically (signed vs unsigned min never
  * diverges). */
object PolyHash {
  val Base = 1000003L
  /** 2⁶³−1 — the mod-2⁶³ mask. */
  val Mask: Long = Long.MaxValue
  /** Modulus literal for the DuckDB twin. */
  val ModSql = "9223372036854775808"
  private val Gold = 0x9E3779B97F4A7C15L

  /** Permutation seed i (63-bit golden-gamma multiple). */
  def seed(i: Int): Long = (Gold * (i + 1)) & Mask

  /** Static helper reachable from generated Java code. */
  def hashSeeded(s: UTF8String, seedV: Long): Long = {
    val str = s.toString
    var h = seedV
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) & Mask
      i += Character.charCount(cp)
    }
    h
  }

  /** (base, pow) parts: base = h(s, 0), pow = Base^|s| mod 2⁶³ —
    * h(s, seed) = (seed·pow + base) mod 2⁶³, so a per-doc aggregate
    * computes one string pass and numPerm multiply-adds. */
  def parts(s: UTF8String): (Long, Long) = {
    val str = s.toString
    var base = 0L
    var pow = 1L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      base = (base * Base + cp) & Mask
      pow = (pow * Base) & Mask
      i += Character.charCount(cp)
    }
    (base, pow)
  }

  /** Recombine parts under a seed: (seed·pow + base) mod 2⁶³. */
  def combine(seedV: Long, base: Long, pow: Long): Long =
    (seedV * pow + base) & Mask

  /** `poly_hash64(col, seed)` as a codegen'd scalar Column. */
  def polyHash64(c: Column, seedV: Long): Column =
    GraftSqlBridge.column(PolyHash64(GraftSqlBridge.expression(c), seedV))
}

/** Codegen'd scalar form of [[PolyHash.hashSeeded]]. */
case class PolyHash64(child: Expression, seedV: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash64 needs a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hashSeeded(input.asInstanceOf[UTF8String], seedV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      in => s"graft.functions.PolyHash.hashSeeded($in, ${seedV}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
