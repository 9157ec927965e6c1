package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** decimal(38,0) aggregate twin: same values as the BIGINT path on
  * in-range data (the swap-in for >10¹⁰-row groups). */
class ExactDecimalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("revenueExactBig equals the long-path revenue per group") {
    import spark.implicits._
    val li = Tables.lineitem(spark, GraftTestSession.sf)
    val longPath = li.groupBy($"l_returnflag")
      .agg(expr("sum(cast(round(l_extendedprice * 100) as bigint) * " +
        "(100 - cast(round(l_discount * 100) as bigint)))").cast("double")
        ./(10000.0).as("rev"))
    val decPath = li.groupBy($"l_returnflag")
      .agg(graft.operators.Relational.revenueExactBig.as("rev"))
    val a = longPath.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = decPath.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}
