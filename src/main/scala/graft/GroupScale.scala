package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the stored dedup-group index under a
  * REALISTIC nightly: build on (100-pct)% of a corpus, refresh with a
  * pct% batch, print the stage split as one JSON line. The driver
  * gate's 90/10 split keeps the oracle exercise meaningful at tiny
  * scale factors; THIS harness answers the 100 TB question — which
  * refresh stages are batch-proportional (mine/cap/advance/labels)
  * and which pay the index-read floor (the SPJ posting probe) — at
  * whatever corpus and batch fraction the measurement needs.
  *
  * Multi-run protocol: `runs > 1` repeats the full build+refresh on
  * fresh tables and reports per-stage MEDIAN plus (min–max) — the
  * sf10 refresh measured 37–59 s across runs of identical code (disk
  * cache state), so single-run decade numbers are structural-only;
  * the median makes them citable as numbers.
  *
  * Also reports the labels table's per-snapshot commit footprint
  * (operation, files added/removed, table file total) so the relabel
  * MERGE's rewrite amplification is measurable per nightly — the
  * labels table buckets by doc_id while the MERGE keys on group_id,
  * so no file skips are expected and the question is how many files
  * each nightly actually rewrites.
  *
  * Usage: runMain graft.GroupScale <sfDir> [batchPct=1] [runs=1]
  */
object GroupScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pct = if (args.length > 1) args(1).toInt else 1
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = Tables.documents(spark, dir)
      val nBatch = docs.filter(col("doc_id") % 100 < pct).count()
      val nCorpus = docs.count() - nBatch
      val samples =
        scala.collection.mutable.Map[String, List[Double]]()
          .withDefaultValue(Nil)
      var footprint: Seq[(String, Long, Long, Long)] = Nil
      (1 to runs).foreach { _ =>
        graft.StageTimes.drain()
        var idx: graft.queries.TextOps.GroupIndex = null
        // build/refresh failures (e.g. a straddle guard trip) must not
        // leak the run's index tables into the warehouse between runs
        try {
          idx = graft.StageTimes.timed("build") {
            graft.queries.TextOps.buildGroupIndex(spark,
              docs.filter(col("doc_id") % 100 >= pct))
          }
          graft.StageTimes.timed("refresh") {
            graft.queries.TextOps.refreshGroupIndexMined(spark, idx,
              docs.filter(col("doc_id") % 100 < pct))
          }
          footprint = labelCommitFootprint(spark, idx.labels)
        } finally {
          if (idx != null)
            Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
              spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
        }
        graft.StageTimes.drain().foreach { case (k, v) =>
          samples(k) = v :: samples(k) }
      }
      def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      def median(xs: List[Double]): Double = {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      val stageJson = samples.toSeq.sortBy(_._1).map { case (k, vs) =>
        "\"" + k + "\":{\"median\":" + r3(median(vs)) +
          ",\"min\":" + r3(vs.min) + ",\"max\":" + r3(vs.max) + "}"
      }.mkString(",")
      val fpJson = footprint.map { case (op, add, rm, tot) =>
        s"""{"op":"$op","files_added":$add,"files_removed":$rm,""" +
          s""""files_total":$tot}"""
      }.mkString(",")
      println(s"""{"harness":"group_scale","sf":"$dir","batch_pct":$pct,""" +
        s""""runs":$runs,"corpus_docs":$nCorpus,"batch_docs":$nBatch,""" +
        s""""stages":{$stageJson},"label_commits":[$fpJson]}""")
    } finally spark.stop()
  }

  /** Per-snapshot data-file diff of the labels table: for every commit
    * in its history, how many files it added, how many it removed
    * (the rewrite footprint), and the table's file total afterwards —
    * read entirely from the `snapshots` + time-traveled `files`
    * metadata tables. */
  private def labelCommitFootprint(spark: SparkSession,
      labels: String): Seq[(String, Long, Long, Long)] = {
    val snaps = spark.sql(
      s"""SELECT snapshot_id, parent_id, operation
         |FROM lakeq.db.$labels.snapshots ORDER BY committed_at"""
        .stripMargin).collect()
    def filesAt(sid: Long): Set[String] =
      spark.sql(s"SELECT file_path FROM lakeq.db.$labels.files " +
        s"VERSION AS OF $sid").collect().map(_.getString(0)).toSet
    snaps.toSeq.map { r =>
      val sid = r.getLong(0)
      val parent = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val now = filesAt(sid)
      val before = parent.map(filesAt).getOrElse(Set.empty)
      (r.getString(2), (now -- before).size.toLong,
        (before -- now).size.toLong, now.size.toLong)
    }
  }
}
