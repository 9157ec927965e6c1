package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Resilience
import graft.operators.Resilience.Series

/** Replays the reference's own scenario (resilience.py:29-70) on a
  * hand-built (Industry, Year, Real_Value) frame through the generic
  * Series API, asserting the exact values the pandas code produces:
  * Drawdown_2020 = (v2020-v2019)/v2019; Recovered_Years = first year
  * in 2020..2023 with value >= v2019, else None. */
class ReferenceReplicaSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def frame() = {
    import spark.implicits._
    // Three industries, 2019-2023:
    //  - Satellites: drops 20% in 2020, recovers in 2022
    //  - Launch: drops 50%, never recovers by 2023
    //  - Ground: no drop at all (recovers immediately in 2020)
    Seq(
      ("Satellites", 2019L, 100.0), ("Satellites", 2020L, 80.0),
      ("Satellites", 2021L, 95.0), ("Satellites", 2022L, 104.0),
      ("Satellites", 2023L, 110.0),
      ("Launch", 2019L, 200.0), ("Launch", 2020L, 100.0),
      ("Launch", 2021L, 120.0), ("Launch", 2022L, 150.0),
      ("Launch", 2023L, 180.0),
      ("Ground", 2019L, 50.0), ("Ground", 2020L, 55.0),
      ("Ground", 2021L, 60.0), ("Ground", 2022L, 65.0),
      ("Ground", 2023L, 70.0),
      // NoBaseline has no 2019 row → reference's IndexError→continue
      ("NoBaseline", 2020L, 10.0), ("NoBaseline", 2021L, 12.0)
    ).toDF("Industry", "Year", "Real_Value")
  }

  private val series = () => Series(frame(), "Industry", "Year", "Real_Value")

  test("Drawdown_2020 matches resilience.py:39 per industry") {
    val got = Resilience.drawdownOn(series(), 2019L, 2020L)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got("Satellites").get == -0.2)
    assert(got("Launch").get == -0.5)
    assert(got("Ground").get == 0.1)
    assert(got("NoBaseline").isEmpty) // null drawdown without baseline
  }

  test("Recovered_Years matches resilience.py:59-66 per industry") {
    val got = Resilience.recoveryOn(series(), 2019L)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got("Satellites").get == 3L) // 2022 first >= 100
    assert(got("Launch").isEmpty)      // never back to 200
    assert(got("Ground").get == 1L)    // 2020 already >= 50
    assert(!got.contains("NoBaseline")) // dropped like the reference
  }

  test("combined outer merge matches resilience.py:76 shape") {
    val df = Resilience.resilienceOn(series(), 2019L, 2020L)
    assert(df.columns.toSeq == Seq("Industry", "drawdown", "recovered_years"))
    assert(df.count() == 4) // outer: NoBaseline kept with null recovery
  }

  test("shock simulator projects the trend and prices in the shock") {
    val got = Resilience.shockSimOn(series(), 2019L,
      projectOffset = 5, shock = 0.40)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // Ground grows exactly +5/yr from 50: projection 2024 = 75 ($M/1e? —
    // values are already small so slope_m units are value/1e6; compare
    // ratio instead of absolute): shocked = projected * 0.6
    got.foreach { case (_, proj, shocked) =>
      assert(math.abs(shocked - proj * 0.6) < 1e-12)
    }
  }
}
