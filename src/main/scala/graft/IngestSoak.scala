package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-horizon soak for the two streaming ingest twins with their
  * in-loop maintenance triggers ON — the measured curve behind the
  * claim "epoch cost is bounded by the maintenance cadence, not by
  * stream age". IngestScale proves 2–3 epochs per scale; this runs
  * ~50 consecutive 1 % epochs per twin and records, per epoch, the
  * wall seconds and the post-epoch live file counts, so a slow drift
  * (file-count creep the trigger misses, metadata walks growing with
  * snapshot history, state accumulating anywhere) shows up as a slope
  * instead of being extrapolated away.
  *
  *  - dedup twin: build the group index on the 50 % base, stream 50
  *    epochs of 1 % each through dedupIngest with the canary-spread
  *    maintenance trigger; end-state labels must equal the ONE-SHOT
  *    full-corpus build (the same truth the driver gate serves).
  *  - IVF twin: build the even-id inverted file, stream the odd ids
  *    as 50 epochs through ivfIngest with the compaction trigger;
  *    the end-state probe must equal the untriggered batch-path
  *    incremental index's probe bit-for-bit.
  *
  * Epoch walls include the maintenance epochs (the sawtooth IS the
  * cadence); file counts are the max across the four dedup index
  * tables / the IVF index table. Prints one JSON line per twin.
  *
  * Usage: runMain graft.IngestSoak <sfDir> [nEpochs=50]
  */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nEpochs = if (args.length > 1) args(1).toInt else 50
    // the epoch split is doc_id % 100: AT 100 the base filter
    // (doc_id % 100 < 100 - nEpochs) is `< 0` and the build corpus is
    // empty, and past 100 epoch filters target negative residues —
    // either way the soak would measure a degenerate ring and only
    // fail at the end-state require
    require(nEpochs >= 1 && nEpochs <= 99,
      s"nEpochs must be in [1, 99] (doc_id % 100 split needs a " +
        s"non-empty build residue), got $nEpochs")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    import sp.implicits._
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    def fileCount(t: String): Long =
      spark.table(s"lakeq.db.$t.files").count()
    var cleanup: Seq[String] = Nil
    try {
      // ---------------- dedup twin ----------------
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val idx = graft.queries.TextOps.buildGroupIndex(
        spark, docs.filter(col("doc_id") % 100 < 100 - nEpochs))
      cleanup = Seq(idx.post, idx.df, idx.size, idx.labels)
      def idxMaxFiles: Long =
        Seq(idx.post, idx.df, idx.size, idx.labels).map(fileCount).max
      // threshold: ~100 files of headroom past the build — per-epoch
      // append width varies with the batch's shuffle fan-out, so the
      // cadence lands wherever the data puts it (the recorded
      // max_files sawtooth shows the realized period; the CLAIM under
      // measurement is only that the cost curve is cadence-shaped,
      // not age-shaped)
      val threshold = (idxMaxFiles + 100).toInt
      val dWalls = scala.collection.mutable.ArrayBuffer[Double]()
      val dFiles = scala.collection.mutable.ArrayBuffer[Long]()
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val ckpt = java.nio.file.Files
        .createTempDirectory("ingest-soak-ckpt").toString
      val q = graft.streaming.IngestStreams.dedupIngest(
        mem.toDF().toDF("doc_id", "text"), idx, ckpt,
        maintainFileThreshold = threshold)
      try {
        (0 until nEpochs).foreach { i =>
          val rows = docs
            .filter(col("doc_id") % 100 === (100 - nEpochs + i)).collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          val t0 = System.nanoTime()
          mem.addData(rows)
          q.processAllAvailable()
          dWalls += secs(t0)
          dFiles += idxMaxFiles
        }
      } finally q.stop()
      // end state answers to the one-shot full-corpus truth
      val streamed = spark.table(s"lakeq.db.${idx.labels}")
        .select(col("doc_id"), col("group_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val oneShot = graft.queries.TextOps.buildGroupIndex(spark, docs)
      cleanup ++= Seq(oneShot.post, oneShot.df, oneShot.size, oneShot.labels)
      val truth = spark.table(s"lakeq.db.${oneShot.labels}")
        .select(col("doc_id"), col("group_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      require(streamed == truth,
        s"soaked labels diverge from the one-shot truth: " +
          s"${streamed.size} vs ${truth.size} rows")
      println(s"""{"harness":"ingest_soak","twin":"dedup","sf":"$dir",""" +
        s""""n_epochs":$nEpochs,"maintain_threshold":$threshold,""" +
        s""""epoch_secs":[${dWalls.map(r3).mkString(",")}],""" +
        s""""max_files":[${dFiles.mkString(",")}],""" +
        s""""labels_equal":true,"docs":${streamed.size}}""")

      // ---------------- IVF twin ----------------
      val (t, evens) = graft.queries.VectorOps.buildEvenIvf(spark, dir)
      cleanup ++= Seq(t)
      val emb = Tables.embeddings(spark, dir)
      val ivfThreshold = (fileCount(t) + 5 * 8).toInt
      val vWalls = scala.collection.mutable.ArrayBuffer[Double]()
      val vFiles = scala.collection.mutable.ArrayBuffer[Long]()
      val vMem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](spark)
      val vCkpt = java.nio.file.Files
        .createTempDirectory("ingest-soak-ivf-ckpt").toString
      val nIvf = math.min(nEpochs, 50)
      val vq = graft.streaming.IngestStreams.ivfIngest(
        vMem.toDF().toDF("vec_id", "embedding"), t, vCkpt,
        maintainFileThreshold = ivfThreshold)
      try {
        (0 until nIvf).foreach { i =>
          val rows = emb.filter(col("vec_id") % 100 === (2 * i + 1))
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
          val t0 = System.nanoTime()
          vMem.addData(rows)
          vq.processAllAvailable()
          vWalls += secs(t0)
          vFiles += fileCount(t)
        }
      } finally vq.stop()
      // end-state probe answers to the untriggered batch-path twin
      // over the SAME slice union (one build + one batch ingest)
      val (refT, refW) = graft.queries.VectorOps.buildEvenIvf(spark, dir)
      cleanup ++= Seq(refT)
      graft.queries.VectorOps.ingestVectorBatch(spark, refT,
        emb.filter(col("vec_id") % 2 === 1 &&
            (col("vec_id") % 100) < 2 * nIvf)
          .select(col("vec_id"), col("embedding")))
      val got = graft.queries.VectorOps.probeStoredIvf(spark, t, evens, 0L)
        .collect().map(_.toString).toSeq
      val want = graft.queries.VectorOps
        .probeStoredIvf(spark, refT, refW, 0L)
        .collect().map(_.toString).toSeq
      require(got == want,
        s"soaked IVF probe diverges from the batch twin:\n$got\nvs\n$want")
      println(s"""{"harness":"ingest_soak","twin":"ivf","sf":"$dir",""" +
        s""""n_epochs":$nIvf,"maintain_threshold":$ivfThreshold,""" +
        s""""epoch_secs":[${vWalls.map(r3).mkString(",")}],""" +
        s""""index_files":[${vFiles.mkString(",")}],""" +
        s""""probe_equal":true}""")

      // ---------------- IVF twin, drift stat ON ----------------
      // Same clean slices with driftRepairThreshold armed: the
      // per-epoch walls vs the twin above price the drift statistic
      // (one extra batch-scale aggregation per epoch), and a clean
      // stream must never trigger the repair at soak length.
      val (td, evensD) = graft.queries.VectorOps.buildEvenIvf(spark, dir)
      cleanup ++= Seq(td)
      val dWallsD = scala.collection.mutable.ArrayBuffer[Double]()
      val dMem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](spark)
      val dCkpt = java.nio.file.Files
        .createTempDirectory("ingest-soak-ivfdrift-ckpt").toString
      val dq = graft.streaming.IngestStreams.ivfIngest(
        dMem.toDF().toDF("vec_id", "embedding"), td, dCkpt,
        maintainFileThreshold = ivfThreshold,
        driftRepairThreshold = 0.6)
      try {
        (0 until nIvf).foreach { i =>
          val rows = emb.filter(col("vec_id") % 100 === (2 * i + 1))
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
          val t0 = System.nanoTime()
          dMem.addData(rows)
          dq.processAllAvailable()
          dWallsD += secs(t0)
        }
      } finally dq.stop()
      val repairs = graft.lake.LakeMeta
        .mainAncestors(spark, Seq("lakeq", "db", td))
        .count(_.summary.get("graft.commit.tag")
          .contains(graft.lake.ReplayGuard.IvfRepairTag))
      require(repairs == 0,
        s"clean soak stream must never trigger the drift repair, got $repairs")
      val gotD = graft.queries.VectorOps.probeStoredIvf(spark, td, evensD, 0L)
        .collect().map(_.toString).toSeq
      require(gotD == want,
        s"drift-stat soak probe diverges from the batch twin:\n$gotD\nvs\n$want")
      println(s"""{"harness":"ingest_soak","twin":"ivf_drift_stat",""" +
        s""""sf":"$dir","n_epochs":$nIvf,"drift_threshold":0.6,""" +
        s""""epoch_secs":[${dWallsD.map(r3).mkString(",")}],""" +
        s""""repairs":0,"probe_equal":true}""")
    } finally {
      cleanup.foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
      spark.stop()
    }
  }
}
