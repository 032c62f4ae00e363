package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries
  * (`runMain graft.Explain [name-substrings...]`) — the per-round
  * plan audit: pushed filters reach the scans, small dims broadcast,
  * whole-stage codegen spans stay wide, no accidental shuffles. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.lake.LakeExtensions)
      .withExtensions(new graft.mv.MvExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = SparkEntry.queries.filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    wanted.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n===== $name =====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"<failed: ${e.getMessage}>") }
    }
    spark.stop()
  }
}
