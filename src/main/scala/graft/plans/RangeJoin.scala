package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator extension (SURVEY.md §4, preference tier (c)):
  * a point-in-interval range join.
  *
  * Spark plans `events JOIN intervals ON p BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin — O(|events|·|intervals|) comparisons. This
  * operator broadcasts the (small) interval side as an array sorted by
  * `lo` with a running prefix-max of `hi`, and probes each event row
  * with binary search + a bounded leftward sweep — O(n·(log m + k)).
  * The classic use is event-to-session / event-to-validity-window
  * attribution at CDC scale (10⁹ events × 10⁵ windows).
  *
  * Point/lo/hi are BIGINT (epoch micros — the engine's canonical
  * time export). Registered via [[graft.GraftExtensions]]; the
  * `RangeJoin.join` API builds the logical node from resolved
  * DataFrame columns so no analyzer rule is needed.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): RangeJoinPlan = copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, p, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
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
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    // build: interval rows sorted by lo, with prefix-max(hi) so the
    // leftward sweep can stop as soon as no earlier interval can reach
    val intervals = right.executeCollect().map { row =>
      (loB.eval(row).asInstanceOf[Long], hiB.eval(row).asInstanceOf[Long],
        row.copy())
    }.sortBy(_._1)
    val los = intervals.map(_._1)
    val prefixMaxHi = new Array[Long](intervals.length)
    var m = Long.MinValue
    var i = 0
    while (i < intervals.length) {
      if (intervals(i)._2 > m) m = intervals(i)._2
      prefixMaxHi(i) = m
      i += 1
    }
    val bc = sparkContext.broadcast((intervals, los, prefixMaxHi))
    val pointExpr = point
    val leftOutput = left.output
    val allOutput = output
    left.execute().mapPartitions { iter =>
      val (ivs, loArr, maxHi) = bc.value
      val pB = BindReferences.bindReference(pointExpr, leftOutput)
      val joiner = new JoinedRow
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      iter.flatMap { lrow =>
        val p = pB.eval(lrow).asInstanceOf[Long]
        // rightmost interval with lo <= p
        var idx = java.util.Arrays.binarySearch(loArr, p)
        if (idx < 0) idx = -idx - 2
        else { while (idx + 1 < loArr.length && loArr(idx + 1) == p) idx += 1 }
        val hits = Seq.newBuilder[InternalRow]
        var j = idx
        // sweep left while some earlier interval could still cover p
        while (j >= 0 && maxHi(j) >= p) {
          if (ivs(j)._2 >= p) hits += ivs(j)._3
          j -= 1
        }
        val lCopy = lrow.copy()
        hits.result().iterator.map(r => resultProj(joiner(lCopy, r)))
      }
    }
  }
}

object RangeJoin {
  /** `events ⨝ intervals ON point BETWEEN lo AND hi` through the
    * custom operator. Columns must come from the two frames (already
    * resolved) and be BIGINT. */
  def join(events: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    def expr(c: Column): Expression = {
      val e = GraftSqlBridge.expression(c)
      require(e.resolved && e.dataType == LongType,
        s"range-join bound must be a resolved BIGINT column: $e")
      e
    }
    val plan = RangeJoinPlan(
      events.queryExecution.analyzed, intervals.queryExecution.analyzed,
      expr(point), expr(lo), expr(hi))
    GraftSqlBridge.ofRows(events.sparkSession, plan)
  }
}
