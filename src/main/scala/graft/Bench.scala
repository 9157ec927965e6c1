package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    // warmup on the SAME dataset the timed queries read (JIT/codegen +
    // FS metadata outside the timed region; a host that only carries
    // sfDir must not abort here)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => }
    // per-query best-of-2: the first run of the whole suite pays
    // first-touch costs (file listing, codegen of shared subtrees)
    // that would otherwise be attributed to whichever query the Map
    // iteration order puts first
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout capture has truncated the tail three rounds running; keep a
    // durable copy of the full artifact in the working tree
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }
    spark.stop()
  }
}
