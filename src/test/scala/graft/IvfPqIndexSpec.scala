package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** E8 persisted IVF-PQ index (VERDICT r3 #1: split build from serve).
  * The build half is a batch job writing centroids + codebooks + a
  * cell-partitioned code table; the serve half must (a) return results
  * bit-identical to the in-memory `annIvfPq` path, and (b) plan as a
  * partition-PRUNED scan of only the probed cells with no training
  * stage and no vector scan. */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  private val sf = GraftTestSession.sf

  private lazy val idxDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    Similarity.buildIvfPqIndex(Tables.embeddings(spark, sf), d)
    d
  }

  private def collectAll(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("query-after-reload parity: served results == in-memory annIvfPq") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val q = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".cast("array<double>").as("qv"))
    val served = collectAll(Similarity.queryIvfPqIndex(spark, idxDir, q))
    val inMem = collectAll(Similarity.annIvfPq(vecs))
    assert(served == inMem)
  }

  test("serve plan prunes to probed cell partitions; no training, no vector scan") {
    import spark.implicits._
    // literal query vectors: the only parquet in this plan can be the
    // code table — any embeddings/vector scan would be a regression
    val q = Seq((0L, Array.fill(64)(0.5)), (1L, Array.fill(64)(-0.25)))
      .toDF("q_id", "qv")
    val df = Similarity.queryIvfPqIndex(spark, idxDir, q)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+ (IN|INSET)".r
      .findFirstIn(plan).isDefined,
      s"cell partition filter missing:\n$plan")
    assert(!plan.contains("embeddings.parquet"), "serve path scans vectors")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "serve path should read exactly one table: the cell-partitioned codes")
    assert(df.count() > 0)
  }

  test("served path scans fewer code files than the index holds (pruning is real)") {
    import spark.implicits._
    val codesDir = new java.io.File(s"$idxDir/codes")
    val allCells = codesDir.listFiles().count(_.getName.startsWith("cell="))
    val q = Tables.embeddings(spark, sf).filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".cast("array<double>").as("qv"))
    val served = Similarity.queryIvfPqIndex(spark, idxDir, q)
    // 5 queries × nProbe=2 probe ≤ 10 distinct cells of the 16 built
    val probed = served.queryExecution.executedPlan.toString
    val in = "IN \\(([^)]*)\\)".r.findFirstMatchIn(probed)
    assert(allCells >= 10, s"expected ≥10 cell dirs, found $allCells")
    in.foreach { m =>
      val n = m.group(1).split(",").length
      assert(n <= 10 && n < allCells, s"probed $n of $allCells cells")
    }
  }
}
