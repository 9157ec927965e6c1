package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Csv, Sink, Tables}
import java.nio.file.Files

/** H2/H3: CSV permissive ingestion and partitioned parquet sink. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("H2: permissive CSV read parses clean rows and quarantines bad ones") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath,
      """industry,year,value
        |Satellites,2019,1234.5
        |Launch,2020,not_a_number
        |Ground,2021,99.0
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("industry", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType)))
    val df = Csv.read(spark, f.getAbsolutePath, schema).cache()
    assert(Csv.clean(df).count() == 2)
    assert(Csv.quarantine(df).count() == 1)
    val q = Csv.quarantine(df).collect().head.getAs[String](Csv.CorruptCol)
    assert(q.contains("not_a_number"))
    df.unpersist()
  }

  test("H3: partitioned sink enables partition pruning on read") {
    val out = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath + "/ev"
    Sink.partitioned(
      Tables.events(spark, GraftTestSession.sf), out, Seq("event_type"))
    val back = spark.read.parquet(out)
    val one = back.filter(col("event_type") === "purchase")
    // pruning: the physical scan carries a partition filter (so only
    // the purchase= directory is read)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan.take(2000))
    assert(one.count() ==
      Tables.events(spark, GraftTestSession.sf)
        .filter(col("event_type") === "purchase").count())
  }
}
