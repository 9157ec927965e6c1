package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** End-to-end pipeline: dedup → quality → split → partitioned write. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("cleanCorpus produces a partitioned, consistent output corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val docs = Tables.documents(spark, GraftTestSession.sf)
    val r = Pipeline.cleanCorpus(spark, docs, out)
    assert(r.kept == r.train + r.`val` + r.test)
    assert(r.kept + r.dropped_dupes + r.dropped_quality == docs.count())
    // written corpus round-trips with the split partition column
    val back = spark.read.parquet(s"$out/corpus")
    assert(back.count() == r.kept)
    assert(back.columns.contains("split"))
    val dirs = new java.io.File(s"$out/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs.forall(_.startsWith("split=")))
    // pipeline is deterministic end to end
    val out2 = java.nio.file.Files.createTempDirectory("graft_pipe2").toString
    assert(Pipeline.cleanCorpus(spark, docs, out2) == r)
  }
}
