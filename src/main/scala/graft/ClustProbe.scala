import org.apache.spark.sql.functions._
object ClustProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_partkey")
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("src"),
          col("y.l_partkey").cast("long").as("dst"))
      val canon = edges
        .select(least($"src",$"dst").as("a"), greatest($"src",$"dst").as("b"))
        .filter($"a" =!= $"b").distinct()
      val deg = canon.select($"a".as("node"))
        .union(canon.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("d"))
      val withDeg = canon
        .join(deg.select($"node".as("a"), $"d".as("da")), "a")
        .join(deg.select($"node".as("b"), $"d".as("db")), "b")
      val fwd = withDeg.select(
        when(struct($"da",$"a") < struct($"db",$"b"), $"a").otherwise($"b").as("u"),
        when(struct($"da",$"a") < struct($"db",$"b"), $"b").otherwise($"a").as("v"),
        when(struct($"da",$"a") < struct($"db",$"b"), $"db").otherwise($"da").as("dv"))
      val wedges = fwd.select($"u", $"v".as("x"), $"dv".as("dx"))
        .join(broadcast(fwd.select($"u", $"v".as("y"), $"dv".as("dy"))), Seq("u"))
        .filter(struct($"dx",$"x") < struct($"dy",$"y"))
      val tri = wedges.join(
        broadcast(fwd.select($"u".as("x"), $"v".as("y"))),
        Seq("x","y"), "left_semi")
      val perNode = tri.select(explode(array($"u",$"x",$"y")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("triangles"))
      val out = deg.join(perNode, Seq("node"), "left")
        .filter($"d" >= 5L)
        .select($"node", $"d".as("degree"),
          coalesce($"triangles", lit(0L)).as("triangles"))
        .withColumn("clustering_ppm",
          expr("2 * triangles * 1000000 div (degree * (degree - 1))"))
        .orderBy(desc("clustering_ppm"), $"node").limit(20)
      val rows = out.collect()
      println(f"[stage] bcast rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s rows=${rows.length}")
    }
    spark.stop()
  }
}
