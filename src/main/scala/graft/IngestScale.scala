package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the STREAMING ingest twin
  * (graft.streaming.IngestStreams.dedupIngest): build the group index
  * on (100 - nBatches·pct)% of a corpus, then stream nBatches
  * micro-batches of pct% each through a real Structured-Streaming
  * query, timing every epoch. Prints one JSON line with per-epoch
  * wall times plus the equivalent BATCH-path refresh times over the
  * same splits on a second index, and asserts the two indexes' final
  * labels are identical — the scale companion to
  * IngestStreamsSuite's correctness pins.
  *
  * What the numbers mean at 100 TB: a micro-batch epoch pays the
  * nightly-refresh cost at the batch's size plus the streaming
  * engine's per-epoch overhead (offset tracking, one foreachBatch
  * dispatch) plus the epoch-guard metadata reads (ancestors walk ×
  * 4 tables). Epoch cost minus batch-refresh cost IS that overhead —
  * if it stays flat as corpus scale grows, the streaming twin
  * inherits the batch path's scaling story wholesale.
  *
  * Usage: runMain graft.IngestScale <sfDir> [batchPct=1] [nBatches=3]
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pct = if (args.length > 1) args(1).toInt else 1
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var built: Seq[graft.queries.TextOps.GroupIndex] = Nil
    try {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val baseFilter = col("doc_id") % 100 >= (pct * nBatches)
      def batchFilter(i: Int) =
        col("doc_id") % 100 >= (pct * i) && col("doc_id") % 100 < (pct * (i + 1))
      def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

      // streaming index
      val sIdx = graft.queries.TextOps.buildGroupIndex(
        spark, docs.filter(baseFilter))
      built = Seq(sIdx)
      val epochSecs = scala.collection.mutable.ArrayBuffer[Double]()
      val sp = spark
      import sp.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val ckpt = java.nio.file.Files
        .createTempDirectory("ingest-scale-ckpt").toString
      val q = graft.streaming.IngestStreams.dedupIngest(
        mem.toDF().toDF("doc_id", "text"), sIdx, ckpt)
      try {
        (0 until nBatches).foreach { i =>
          val rows = docs.filter(batchFilter(i)).collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          val t0 = System.nanoTime()
          mem.addData(rows)
          q.processAllAvailable()
          epochSecs += secs(t0)
        }
      } finally q.stop()

      // batch-path reference over the same splits
      val bIdx = graft.queries.TextOps.buildGroupIndex(
        spark, docs.filter(baseFilter))
      built = Seq(sIdx, bIdx)
      val batchSecs = (0 until nBatches).map { i =>
        val t0 = System.nanoTime()
        graft.queries.TextOps.refreshGroupIndexMined(
          spark, bIdx, docs.filter(batchFilter(i)))
        secs(t0)
      }

      val sLab = spark.table(s"lakeq.db.${sIdx.labels}")
        .select(col("doc_id"), col("group_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val bLab = spark.table(s"lakeq.db.${bIdx.labels}")
        .select(col("doc_id"), col("group_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      require(sLab == bLab,
        s"streamed labels diverge from batch labels: ${sLab.size} vs " +
          s"${bLab.size} rows")
      def r3(v: Double) = math.round(v * 1000) / 1000.0
      println(s"""{"harness":"ingest_scale","sf":"$dir","batch_pct":$pct,""" +
        s""""n_batches":$nBatches,""" +
        s""""epoch_secs":[${epochSecs.map(r3).mkString(",")}],""" +
        s""""batch_refresh_secs":[${batchSecs.map(r3).mkString(",")}],""" +
        s""""labels_equal":true,"docs":${sLab.size}}""")
    } finally {
      built.foreach(i => Seq(i.post, i.df, i.size, i.labels).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")))
      spark.stop()
    }
  }
}
