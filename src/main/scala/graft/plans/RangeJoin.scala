package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Custom whole-operator extension (SURVEY.md §4, preference tier (c)):
  * a point-in-interval range join, in two physical shapes.
  *
  * Spark plans `events JOIN intervals ON p BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin — O(|events|·|intervals|) comparisons.
  *
  *  - [[BroadcastRangeJoinExec]] broadcasts a SMALL interval side
  *    (calendars, validity windows) as an array sorted by `lo` with a
  *    running prefix-max of `hi`, probing each event row with binary
  *    search + a bounded leftward sweep — O(n·(log m + k)). The build
  *    side is SIZE-GUARDED: over `graft.rangeJoin.broadcastRowLimit`
  *    rows it fails fast with a clear message instead of OOMing the
  *    driver — an interval side that grows with the corpus (sessions!)
  *    must use the keyed variant.
  *  - [[ShuffledRangeJoinExec]] is the scale path for keyed range
  *    joins (event→session attribution: both sides carry a user key).
  *    It declares `ClusteredDistribution` on the key for both
  *    children, so Catalyst co-partitions them with ordinary shuffles
  *    (AQE-sizable); each task builds a per-key sorted interval index
  *    for its partition only. Nothing ever touches the driver, state
  *    is one partition's intervals, and the plan survives 10⁹
  *    intervals exactly like a shuffled hash join.
  *
  * Null semantics follow SQL BETWEEN: a null point, null bound, or
  * null key matches nothing (null interval bounds are dropped at build
  * time, null probes emit no row).
  *
  * Point/lo/hi are BIGINT (epoch micros — the engine's canonical
  * time export). Registered via [[graft.GraftExtensions]]; the
  * `RangeJoin.join`/`joinKeyed` APIs build the logical node from
  * resolved DataFrame columns so no analyzer rule is needed.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): RangeJoinPlan = copy(left = l, right = r)
}

/** Keyed variant: equi-key AND point-in-interval. */
case class KeyedRangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): KeyedRangeJoinPlan =
    copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, p, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case KeyedRangeJoinPlan(l, r, lk, rk, p, lo, hi) =>
      ShuffledRangeJoinExec(planLater(l), planLater(r), lk, rk, p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Interval index shared by both execs: arrays sorted by lo with a
  * prefix-max of hi, probed by binary search + bounded leftward sweep
  * (stop as soon as no earlier interval can still reach p). */
private[plans] final class IntervalIndex(
    val los: Array[Long], val his: Array[Long],
    val rows: Array[InternalRow], val prefixMaxHi: Array[Long])
  extends Serializable {

  /** All interval rows covering p (any order; callers re-sort). */
  def probe(p: Long, out: ArrayBuffer[InternalRow]): Unit = {
    var idx = java.util.Arrays.binarySearch(los, p)
    if (idx < 0) idx = -idx - 2
    else { while (idx + 1 < los.length && los(idx + 1) == p) idx += 1 }
    var j = idx
    while (j >= 0 && prefixMaxHi(j) >= p) {
      if (his(j) >= p) out += rows(j)
      j -= 1
    }
  }
}

private[plans] object IntervalIndex {
  /** Build from (lo, hi, row) triples; sorts by lo in place. */
  def build(triples: ArrayBuffer[(Long, Long, InternalRow)]): IntervalIndex = {
    val sorted = triples.sortBy(_._1)
    val n = sorted.length
    val los = new Array[Long](n)
    val his = new Array[Long](n)
    val rows = new Array[InternalRow](n)
    val maxHi = new Array[Long](n)
    var m = Long.MinValue
    var i = 0
    while (i < n) {
      val t = sorted(i)
      los(i) = t._1; his(i) = t._2; rows(i) = t._3
      if (t._2 > m) m = t._2
      maxHi(i) = m
      i += 1
    }
    new IntervalIndex(los, his, rows, maxHi)
  }
}

case class BroadcastRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): BroadcastRangeJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val limit = conf.getConfString(
      RangeJoin.BroadcastRowLimitKey, "5000000").toLong
    // fail fast before materializing an unbounded interval side on the
    // driver: take limit+1 rows and refuse if the side exceeds it
    val collected = right.executeTake((limit + 1).toInt)
    if (collected.length > limit) {
      throw new IllegalStateException(
        s"range-join interval side exceeds ${RangeJoin.BroadcastRowLimitKey}" +
          s"=$limit rows; it likely grows with the corpus — use " +
          "RangeJoin.joinKeyed (shuffled per-key variant) instead")
    }
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val triples = new ArrayBuffer[(Long, Long, InternalRow)](collected.length)
    collected.foreach { row =>
      val l = loB.eval(row)
      val h = hiB.eval(row)
      if (l != null && h != null) {  // null-bounded intervals match nothing
        triples += ((l.asInstanceOf[Long], h.asInstanceOf[Long], row))
      }
    }
    val bc = sparkContext.broadcast(IntervalIndex.build(triples))
    val pointExpr = point
    val leftOutput = left.output
    val allOutput = output
    left.execute().mapPartitions { iter =>
      val index = bc.value
      val pB = BindReferences.bindReference(pointExpr, leftOutput)
      val joiner = new JoinedRow
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val hits = new ArrayBuffer[InternalRow]
      iter.flatMap { lrow =>
        val pv = pB.eval(lrow)
        if (pv == null) Iterator.empty  // null point matches nothing
        else {
          hits.clear()
          index.probe(pv.asInstanceOf[Long], hits)
          if (hits.isEmpty) Iterator.empty
          else {
            val lCopy = lrow.copy()
            hits.toArray.iterator.map(r => resultProj(joiner(lCopy, r)))
          }
        }
      }
    }
  }
}

/** Shuffle variant: both sides clustered on their key; each task
  * builds a per-key [[IntervalIndex]] over its partition's intervals
  * and streams the probe side through it. Driver traffic: zero. */
case class ShuffledRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): ShuffledRangeJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkE = leftKey; val rkE = rightKey
    val pE = point; val loE = lo; val hiE = hi
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rk = BindReferences.bindReference(rkE, rightOutput)
      val loB = BindReferences.bindReference(loE, rightOutput)
      val hiB = BindReferences.bindReference(hiE, rightOutput)
      // build: this partition's intervals, grouped by key
      val perKey = new java.util.HashMap[Any, ArrayBuffer[(Long, Long, InternalRow)]]
      rIter.foreach { row =>
        val k = rk.eval(row)
        val l = loB.eval(row)
        val h = hiB.eval(row)
        if (k != null && l != null && h != null) {
          val kc = k match { case s: UTF8String => s.copy(); case x => x }
          var buf = perKey.get(kc)
          if (buf == null) { buf = new ArrayBuffer; perKey.put(kc, buf) }
          buf += ((l.asInstanceOf[Long], h.asInstanceOf[Long], row.copy()))
        }
      }
      val index = new java.util.HashMap[Any, IntervalIndex](perKey.size())
      perKey.forEach((k, buf) => index.put(k, IntervalIndex.build(buf)))
      // probe
      val lk = BindReferences.bindReference(lkE, leftOutput)
      val pB = BindReferences.bindReference(pE, leftOutput)
      val joiner = new JoinedRow
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val hits = new ArrayBuffer[InternalRow]
      lIter.flatMap { lrow =>
        val k = lk.eval(lrow)
        val pv = pB.eval(lrow)
        val idx = if (k == null || pv == null) null else index.get(k)
        if (idx == null) Iterator.empty
        else {
          hits.clear()
          idx.probe(pv.asInstanceOf[Long], hits)
          if (hits.isEmpty) Iterator.empty
          else {
            val lCopy = lrow.copy()
            hits.toArray.iterator.map(r => resultProj(joiner(lCopy, r)))
          }
        }
      }
    }
  }
}

object RangeJoin {

  /** Broadcast-side row guard for [[BroadcastRangeJoinExec]]. */
  val BroadcastRowLimitKey = "graft.rangeJoin.broadcastRowLimit"

  private def checkedExpr(c: Column): Expression = {
    import org.apache.spark.sql.GraftSqlBridge
    val e = GraftSqlBridge.expression(c)
    require(e.resolved && e.dataType == LongType,
      s"range-join bound must be a resolved BIGINT column: $e")
    e
  }

  /** `events ⨝ intervals ON point BETWEEN lo AND hi` through the
    * broadcast operator — for interval sides that are genuinely small
    * (calendars, validity windows); guarded by
    * [[BroadcastRowLimitKey]]. Columns must come from the two frames
    * (already resolved) and be BIGINT. */
  def join(events: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val plan = RangeJoinPlan(
      events.queryExecution.analyzed, intervals.queryExecution.analyzed,
      checkedExpr(point), checkedExpr(lo), checkedExpr(hi))
    GraftSqlBridge.ofRows(events.sparkSession, plan)
  }

  /** `events ⨝ intervals ON eventKey = intervalKey AND point BETWEEN
    * lo AND hi` through the shuffled per-key operator — the scale path
    * when the interval side grows with the corpus (sessions, per-key
    * validity chains). Keys may be any equatable type; point/lo/hi
    * must be BIGINT. */
  def joinKeyed(events: DataFrame, intervals: DataFrame,
      eventKey: Column, intervalKey: Column,
      point: Column, lo: Column, hi: Column): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val lk = GraftSqlBridge.expression(eventKey)
    val rk = GraftSqlBridge.expression(intervalKey)
    require(lk.resolved && rk.resolved && lk.dataType == rk.dataType,
      s"range-join keys must be resolved and same-typed: $lk vs $rk")
    val plan = KeyedRangeJoinPlan(
      events.queryExecution.analyzed, intervals.queryExecution.analyzed,
      lk, rk, checkedExpr(point), checkedExpr(lo), checkedExpr(hi))
    GraftSqlBridge.ofRows(events.sparkSession, plan)
  }
}
