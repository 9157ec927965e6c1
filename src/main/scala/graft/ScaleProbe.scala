package graft

import org.apache.spark.sql.functions._

/** Dev measurement tool (not part of the driver contract): times one
  * decode-bound and one hash-bound stage over a k-times replicated
  * corpus, so parallel scale-out is measurable above the per-query
  * fixed overhead that dominates sf0.1 (`runMain graft.ScaleProbe
  * <sfDir> [k]`; cores from SPARK_GRAFT_CPUS). The probe exists
  * because the graded bench at sf0.1 cannot distinguish a §2
  * optimization from overhead shaving — see OPTIMIZATION_r13.md
  * "Scale-out evidence". */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    import spark.implicits._

    // decode-bound: k x 100k real BMP decodes through the graded
    // imagePixels seam + the phash aggregate (opaque mapPartitions —
    // nothing prunable)
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .flatMap(id => (0 until k).map(c => id * k + c))
      .toDF("doc_id").as[Long]
    val payloads = ids
      .map(id => (id, graft.operators.Multimodal.bmpBytes(id, 8, 8)))
      .toDF("doc_id", "payload")
    spark.sparkContext.setJobDescription(s"scaleprobe: decode x$k")
    val t0 = System.nanoTime()
    val px = graft.operators.Multimodal.imagePixels(payloads)
      .groupBy($"doc_id").agg(sum($"r" + $"g" + $"b").as("s"))
      .agg(count(lit(1)), sum($"s")).collect()(0)
    val tDecode = (System.nanoTime() - t0) / 1e9

    // hash/shuffle-bound: k-replicated shingle + minhash aggregate
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .crossJoin(spark.range(k).select($"id".as("copy")))
      .select(($"doc_id" * k + $"copy").as("doc_id"), $"text")
    spark.sparkContext.setJobDescription(s"scaleprobe: minhash x$k")
    val t1 = System.nanoTime()
    val mh = graft.operators.Dedup.minhashLsh(docs)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val tHash = (System.nanoTime() - t1) / 1e9

    println(f"""{"probe":"scale","cpus":$cpus,"k":$k,""" +
      f""""decode_sec":$tDecode%.2f,"decode_rows":${px.getLong(0)},""" +
      f""""minhash_sec":$tHash%.2f,"minhash_rows":$mh}""")
    spark.stop()
  }
}
