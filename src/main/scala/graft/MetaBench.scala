package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-measurement for the driver-side metadata fast path
  * (graft.lake.LakeMeta) vs the SQL metadata surfaces it replaced in
  * the streaming epoch loops: per-call latency of the replay guard
  * (main-ancestor tag walk) and the trigger's live-file count, over a
  * table with a realistic snapshot history. Prints one JSON line.
  *
  * Usage: runMain graft.MetaBench <sfDir> [snapshots=20] [iters=50]
  */
object MetaBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nSnaps = if (args.length > 1) args(1).toInt else 20
    require(nSnaps >= 2,
      s"snapshots must be >= 2 (got $nSnaps): the probe tag is the " +
        "middle epoch's, which needs at least one tagged append")
    val iters = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.lakeq",
      classOf[graft.lake.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeq.warehouse",
      java.nio.file.Files.createTempDirectory("graft-metabench").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakeq.db")
    val t = "metabench_" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      docs.limit(100).writeTo(s"lakeq.db.$t").using("lake").create()
      (1 until nSnaps).foreach { i =>
        graft.CommitTag.run(Some(s"epoch-$i")) {
          docs.filter(col("doc_id") % nSnaps === i).limit(50)
            .writeTo(s"lakeq.db.$t").append()
        }
      }
      def time(f: () => Unit): Double = {
        f() // warm
        val t0 = System.nanoTime()
        (0 until iters).foreach(_ => f())
        (System.nanoTime() - t0) / 1e6 / iters
      }
      val tag = s"epoch-${nSnaps / 2}"
      // driver-side fast path (what the loops use now)
      val fastGuard = time(() => {
        val hit = graft.lake.LakeMeta
          .mainAncestors(spark, Seq("lakeq", "db", t))
          .exists(_.summary.get("graft.commit.tag").contains(tag))
        require(hit)
      })
      val fastFiles = time(() => {
        require(graft.lake.LakeMeta
          .liveFileCount(spark, Seq("lakeq", "db", t)) > 0)
      })
      // the SQL spelling the loops used before
      val sqlGuard = time(() => {
        val anc = spark.sql(
          s"CALL lakeq.system.ancestors_of(table => 'db.$t')")
          .select(col("snapshot_id"))
        val hit = !spark.table(s"lakeq.db.$t.snapshots")
          .join(anc, Seq("snapshot_id"))
          .filter(element_at(col("summary"), lit("graft.commit.tag")) === tag)
          .isEmpty
        require(hit)
      })
      val sqlFiles = time(() => {
        require(spark.table(s"lakeq.db.$t.files").count() > 0)
      })
      def r3(v: Double) = math.round(v * 1000) / 1000.0
      println(s"""{"harness":"meta_bench","snapshots":$nSnaps,""" +
        s""""iters":$iters,"guard_fast_ms":${r3(fastGuard)},""" +
        s""""guard_sql_ms":${r3(sqlGuard)},""" +
        s""""files_fast_ms":${r3(fastFiles)},""" +
        s""""files_sql_ms":${r3(sqlFiles)}}""")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
      spark.stop()
    }
  }
}
