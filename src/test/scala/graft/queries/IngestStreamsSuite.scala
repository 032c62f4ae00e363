package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest twin (graft.streaming.IngestStreams): a
  * documents stream maintains the SAME stored group index the nightly
  * refresh does, micro-batch by micro-batch, with exactly-once
  * semantics per table under foreachBatch's at-least-once replay.
  *
  * The batch-path algebra (mined refresh == one-shot miner) is pinned
  * in GroupIndexSuite; here the pins are the streaming-specific
  * claims: stream == sequential batch refreshes bit-for-bit, a fully
  * applied epoch replays as a no-op, and a partially applied epoch
  * (simulated crash between substrate commits) replays to the exact
  * clean-run state — skipped appends, df double-count adjustment,
  * label publish included.
  */
class IngestStreamsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ingest-streams")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LakeOps.cat(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  private def docs: DataFrame = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def labelsOf(t: String): Map[Long, Long] =
    spark.table(s"lakeq.db.$t").select(col("doc_id"), col("group_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def snapCount(t: String): Long =
    spark.table(s"lakeq.db.$t.snapshots").count()

  private def dropIdx(idx: TextOps.GroupIndex): Unit =
    Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed micro-batches equal sequential nightly refreshes") {
    assume(ready)
    val base = docs.filter(col("doc_id") % 10 =!= 1 && col("doc_id") % 10 =!= 2)
    val b1 = docs.filter(col("doc_id") % 10 === 1)
    val b2 = docs.filter(col("doc_id") % 10 === 2)
    // reference: the pinned batch path, two sequential refreshes
    val ref = TextOps.buildGroupIndex(spark, base)
    TextOps.refreshGroupIndexMined(spark, ref, b1)
    TextOps.refreshGroupIndexMined(spark, ref, b2)
    // stream: same batches as two micro-batch epochs
    val idx = TextOps.buildGroupIndex(spark, base)
    val sp = spark
    import sp.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val ckpt = tmpDir("ingest-ckpt")
    val q = graft.streaming.IngestStreams.dedupIngest(
      mem.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      mem.addData(b1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
      mem.addData(b2.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    assert(labelsOf(idx.labels).keySet ===
      (base.unionByName(b1).unionByName(b2))
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    // every epoch's commits carry its QUERY-ID-SCOPED tag on main
    // history — the scope digests the persistent streaming query id
    // the engine wrote to <checkpoint>/metadata, keeping a later
    // stream generation (new checkpoint → new id, epochs restarting
    // at 0) out of this one's tag space while surviving a driver
    // restart from a different working directory (same metadata file
    // → same id → same scope)
    val scope = graft.streaming.IngestStreams.scopeOf(spark, ckpt)
    val tags = spark.table(s"lakeq.db.${idx.labels}.snapshots")
      .select(element_at(col("summary"), lit("graft.commit.tag")))
      .collect().flatMap(r => Option(r.getString(0))).toSet
    assert(tags === Set(s"dedup-ingest-$scope-0", s"dedup-ingest-$scope-1"))
    // a fresh checkpoint carries a fresh engine-assigned query id —
    // simulate the engine's metadata write with a different uuid
    val other = tmpDir("other-ckpt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(other, "metadata"),
      s"""{"id":"${java.util.UUID.randomUUID()}"}"""
        .getBytes("UTF-8"))
    assert(graft.streaming.IngestStreams.scopeOf(spark, other)
      !== scope, "a fresh checkpoint must open a fresh tag space")
    dropIdx(ref); dropIdx(idx)
  }

  test("fully applied epoch replays as a no-op on every table") {
    assume(ready)
    val base = docs.filter(col("doc_id") % 10 =!= 1)
    val b1 = docs.filter(col("doc_id") % 10 === 1)
    val idx = TextOps.buildGroupIndex(spark, base)
    TextOps.refreshGroupIndexMined(spark, idx, b1,
      epochTag = Some("epoch-7"))
    val before = Seq(idx.post, idx.df, idx.size, idx.labels)
      .map(t => t -> snapCount(t)).toMap
    val labels = labelsOf(idx.labels)
    TextOps.refreshGroupIndexMined(spark, idx, b1,
      epochTag = Some("epoch-7"))
    Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
      assert(snapCount(t) === before(t), s"replay committed to $t"))
    assert(labelsOf(idx.labels) === labels)
    dropIdx(idx)
  }

  test("partial replay: post+df landed, crash before size/labels") {
    assume(ready)
    val base = docs.filter(col("doc_id") % 10 =!= 1)
    val b1 = docs.filter(col("doc_id") % 10 === 1)
    // clean single application — the state every replay must reach
    val ref = TextOps.buildGroupIndex(spark, base)
    TextOps.refreshGroupIndexMined(spark, ref, b1)
    // crashed epoch: the post and df appends landed (tagged), then the
    // run died before the size append and the label publish
    val idx = TextOps.buildGroupIndex(spark, base)
    val bPost = TextOps.shinglePostings(b1)
    val bDf = bPost.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    spark.conf.set("spark.graft.commit.tag", "epoch-3")
    try {
      bPost.writeTo(s"lakeq.db.${idx.post}").append()
      bDf.writeTo(s"lakeq.db.${idx.df}").append()
    } finally spark.conf.unset("spark.graft.commit.tag")
    // replay: must skip the landed appends, subtract the df double
    // count from the cap lookup, append sizes once, publish labels
    TextOps.refreshGroupIndexMined(spark, idx, b1,
      epochTag = Some("epoch-3"))
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    def table(t: String) = spark.table(s"lakeq.db.$t")
    // postings exactly once: identical multiset vs the clean run
    assert(table(idx.post).count() === table(ref.post).count())
    // df sums exactly once per shingle
    val dfSums = (t: String) => table(t).toDF("sh", "df")
      .groupBy("sh").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfSums(idx.df) === dfSums(ref.df))
    // sizes exactly once
    val sizes = (t: String) => table(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(idx.size) === sizes(ref.size))
    // and the replayed epoch composes: a later normal refresh over a
    // second batch still equals the batch path
    val b2 = docs.filter(col("doc_id") % 10 === 2)
    TextOps.refreshGroupIndexMined(spark, idx, b2)
    TextOps.refreshGroupIndexMined(spark, ref, b2)
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    dropIdx(ref); dropIdx(idx)
  }

  private def textDocs(docs: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text")
  }

  test("maintainFileThreshold bounds side-table file counts without " +
      "changing labels, and survives a stream restart") {
    assume(ready)
    val base = docs.filter(col("doc_id") % 10 < 5)
    def slice(i: Int) = docs.filter(col("doc_id") % 10 === 5 + i)
    def feed(mem: MemoryStream[(Long, String)], i: Int): Unit =
      mem.addData(slice(i).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    def fileCount(t: String): Long =
      spark.table(s"lakeq.db.$t.files").count()
    // twin WITHOUT the trigger — the file-count baseline + label truth
    val ref = TextOps.buildGroupIndex(spark, base)
    (0 until 5).foreach(i =>
      TextOps.refreshGroupIndexMined(spark, ref, slice(i)))
    // streamed twin WITH the durable file-count trigger
    val idx = TextOps.buildGroupIndex(spark, base)
    val threshold = (fileCount(idx.df) + 2).toInt
    val sp = spark
    import sp.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val ckpt = tmpDir("maint-ckpt")
    def start() = graft.streaming.IngestStreams.dedupIngest(
      mem.toDF().toDF("doc_id", "text"), idx, ckpt,
      maintainFileThreshold = threshold)
    val q1 = start()
    try (0 until 4).foreach { i => feed(mem, i); q1.processAllAvailable() }
    finally q1.stop()
    // RESTART on the same checkpoint (the trigger reads durable table
    // state, so no in-memory cadence is lost — the failure mode an
    // every-K-refreshes counter has under crash-looped deployments),
    // then one more epoch that must still maintain when crossed
    val q2 = start()
    try { feed(mem, 4); q2.processAllAvailable() } finally q2.stop()
    // the cadence is row-preserving: labels equal the untriggered twin
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    // and it BOUNDS the accumulation across the whole 5-epoch,
    // one-restart run: un-maintained nightly appends accumulate a
    // delta file set per epoch, so the triggered twin must hold
    // strictly fewer df files than the append-only twin AND stay at
    // most one epoch's appends past its threshold
    assert(fileCount(idx.df) < fileCount(ref.df),
      s"trigger should fold df deltas: ${fileCount(idx.df)} vs " +
        s"${fileCount(ref.df)}")
    assert(fileCount(idx.df) <= threshold + 4,
      s"file count must stay near the threshold: ${fileCount(idx.df)} " +
        s"vs threshold $threshold")
    dropIdx(ref); dropIdx(idx)
  }

  test("maintenance canary spreads across all four index tables: a " +
      "posting-only skew still fires the fold") {
    assume(ready)
    val base = docs.filter(col("doc_id") % 10 < 8)
    val b1 = docs.filter(col("doc_id") % 10 === 8)
    def fileCount(t: String): Long =
      spark.table(s"lakeq.db.$t.files").count()
    // untriggered twin — the label truth
    val ref = TextOps.buildGroupIndex(spark, base)
    TextOps.refreshGroupIndexMined(spark, ref, b1)
    // skew-append fixture: split ONLY the posting table into many tiny
    // files (a row-preserving rewrite-all), modeling a repair-heavy
    // workload growing one side table ahead of the others
    val idx = TextOps.buildGroupIndex(spark, base)
    val postBytes = spark.table(s"lakeq.db.${idx.post}.files")
      .agg(sum(col("file_size_in_bytes"))).head().getLong(0)
    spark.sql(s"CALL lakeq.system.rewrite_data_files(" +
      s"table => 'db.${idx.post}', options => map(" +
      s"'rewrite-all','true'," +
      s"'target-file-size-bytes','${math.max(1L, postBytes / 400)}'))")
    val othersMax = Seq(idx.df, idx.size, idx.labels).map(fileCount).max
    val inflated = fileCount(idx.post)
    assert(inflated > othersMax + 4,
      s"fixture must skew: post $inflated vs others $othersMax")
    // threshold sits ABOVE every non-posting table (+epoch headroom):
    // a df-only canary would never cross it — only the max does
    val threshold = (othersMax + 3).toInt
    val sp = spark
    import sp.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val ckpt = tmpDir("canary-ckpt")
    val q = graft.streaming.IngestStreams.dedupIngest(
      mem.toDF().toDF("doc_id", "text"), idx, ckpt,
      maintainFileThreshold = threshold)
    try {
      mem.addData(b1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    assert(fileCount(idx.post) < inflated,
      s"posting-only skew must fire maintenance: ${fileCount(idx.post)} " +
        s"files vs $inflated before the epoch")
    dropIdx(ref); dropIdx(idx)
  }

  test("crashed straddle-repair epoch: flag-off refuses, flag-on " +
      "rolls back and converges") {
    // cap=2 split fixture (GroupIndexSuite's): docs 0/2 pair only
    // through shingle "p q r"; the batch doc pushes df("p q r")
    // past the cap, so the replay is a REPAIR epoch
    val corpus = textDocs(
      0L -> "p q r s t u",
      2L -> "p q r s t v",
      4L -> "one two three four five six seven")
    val batch = textDocs(1L -> "p q r aa bb")
    // clean single application — the state every replay must reach
    val ref = TextOps.buildGroupIndex(spark, corpus, cap = 2)
    TextOps.refreshGroupIndexMined(spark, ref, batch, cap = 2)
    // crashed repair epoch: tagged post + df appends landed, then the
    // run died before the size MERGE and the label publish
    val idx = TextOps.buildGroupIndex(spark, corpus, cap = 2)
    val bPost = TextOps.shinglePostings(batch)
    val bDf = bPost.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    graft.CommitTag.run(Some("epoch-9")) {
      bPost.writeTo(s"lakeq.db.${idx.post}").append()
      bDf.writeTo(s"lakeq.db.${idx.df}").append()
    }
    // flag off: the diagnosable refusal stays pinned
    val e = intercept[IllegalStateException] {
      TextOps.refreshGroupIndexMined(spark, idx, batch, cap = 2,
        epochTag = Some("epoch-9"))
    }
    assert(e.getMessage.contains("crashed inside a straddle repair"),
      s"wrong failure: ${e.getMessage}")
    // flag on: the replay rolls the touched tables back to their
    // pre-epoch ancestors and re-runs the repair — labels AND
    // substrate converge to the clean run, no manual step
    TextOps.refreshGroupIndexMined(spark, idx, batch, cap = 2,
      epochTag = Some("epoch-9"), rollbackCrashedRepair = true)
    assert(labelsOf(idx.labels) === labelsOf(ref.labels))
    def dfSums(t: String) = spark.table(s"lakeq.db.$t").toDF("sh", "df")
      .groupBy("sh").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfSums(idx.df) === dfSums(ref.df))
    assert(spark.table(s"lakeq.db.${idx.post}").count() ===
      spark.table(s"lakeq.db.${ref.post}").count())
    val sizes = (t: String) => spark.table(s"lakeq.db.$t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(idx.size) === sizes(ref.size))
    // and a replay of the NOW-COMPLETED epoch is a no-op
    val before = Seq(idx.post, idx.df, idx.size, idx.labels)
      .map(t => t -> snapCount(t)).toMap
    TextOps.refreshGroupIndexMined(spark, idx, batch, cap = 2,
      epochTag = Some("epoch-9"), rollbackCrashedRepair = true)
    Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
      assert(snapCount(t) === before(t), s"replay committed to $t"))
    dropIdx(ref); dropIdx(idx)
  }

  test("auto-rollback refuses when a foreign commit interleaved") {
    // an untagged commit ABOVE the epoch's first snapshot would be
    // destroyed by a rollback — that reconciliation must stay manual
    val corpus = textDocs(
      0L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = textDocs(1L -> "p q r aa bb")
    val idx = TextOps.buildGroupIndex(spark, corpus, cap = 2)
    val bPost = TextOps.shinglePostings(batch)
    graft.CommitTag.run(Some("epoch-11")) {
      bPost.writeTo(s"lakeq.db.${idx.post}").append()
    }
    // foreign writer lands on the same table after the crash
    TextOps.shinglePostings(textDocs(6L -> "totally foreign doc text"))
      .writeTo(s"lakeq.db.${idx.post}").append()
    val e = intercept[IllegalStateException] {
      TextOps.refreshGroupIndexMined(spark, idx, batch, cap = 2,
        epochTag = Some("epoch-11"), rollbackCrashedRepair = true)
    }
    assert(e.getMessage.contains("untagged commit"),
      s"wrong failure: ${e.getMessage}")
    dropIdx(idx)
  }

  private def ivfRows(t: String): Set[(Long, Long)] =
    spark.table(s"lakeq.db.$t").select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed IVF ingest equals the batch ingest; replay is a no-op") {
    assume(ready)
    val odds = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    // reference: the pinned batch path (build + one-shot odd ingest)
    val (refT, _) = VectorOps.buildIncrementalIvf(spark, sfDir)
    // stream: even-id build, then the odd ids in two micro-batches
    val (strT, _) = VectorOps.buildEvenIvf(spark, sfDir)
    val sp = spark
    import sp.implicits._
    val oddRows = odds.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (half1, half2) = oddRows.splitAt(oddRows.length / 2)
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val ckpt = tmpDir("ivf-ckpt")
    val q = graft.streaming.IngestStreams.ivfIngest(
      mem.toDF().toDF("vec_id", "embedding"), strT, ckpt)
    try {
      mem.addData(half1); q.processAllAvailable()
      mem.addData(half2); q.processAllAvailable()
    } finally q.stop()
    assert(ivfRows(strT) === ivfRows(refT))
    // replayed epoch: the tag is on main, so the body is a no-op
    val before = snapCount(strT)
    graft.streaming.IngestStreams.ivfIngestEpoch(strT,
      half1.toDF("vec_id", "embedding"), epoch = 0L,
      scope = graft.streaming.IngestStreams.scopeOf(spark, ckpt))
    assert(snapCount(strT) === before, "replayed epoch committed again")
    assert(ivfRows(strT) === ivfRows(refT))
    Seq(refT, strT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
  }

  test("IVF maintainFileThreshold bounds index file count without " +
      "changing probes, keeps cell pruning, and survives a restart") {
    assume(ready)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val sp = spark
    import sp.implicits._
    def sliceRows(i: Int): Seq[(Long, Seq[Float])] = emb
      .filter(col("vec_id") % 2 === 1 && col("vec_id") % 10 === (2 * i + 1))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    def fileCount(t: String): Long =
      spark.table(s"lakeq.db.$t.files").count()
    def probeOf(t: String, ws: DataFrame): Seq[String] =
      VectorOps.probeStoredIvf(spark, t, ws, qVecId = 0)
        .collect().map(_.toString).toSeq
    // twin WITHOUT the trigger — the file-count baseline + probe truth
    val (refT, refW) = VectorOps.buildEvenIvf(spark, sfDir)
    (0 until 5).foreach(i => graft.streaming.IngestStreams
      .ivfIngestEpoch(refT, sliceRows(i).toDF("vec_id", "embedding"),
        epoch = i.toLong, scope = "untriggered"))
    // streamed twin WITH the durable file-count trigger
    val (t, ws) = VectorOps.buildEvenIvf(spark, sfDir)
    val threshold = (fileCount(t) + 2).toInt
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val ckpt = tmpDir("ivf-maint-ckpt")
    def start() = graft.streaming.IngestStreams.ivfIngest(
      mem.toDF().toDF("vec_id", "embedding"), t, ckpt,
      maintainFileThreshold = threshold)
    val q1 = start()
    try (0 until 4).foreach { i =>
      mem.addData(sliceRows(i)); q1.processAllAvailable()
    } finally q1.stop()
    // RESTART on the same checkpoint (durable trigger state — no
    // in-memory cadence to lose), one more epoch
    val q2 = start()
    try { mem.addData(sliceRows(4)); q2.processAllAvailable() }
    finally q2.stop()
    // row-preserving: same resident rows and the bit-identical probe
    assert(ivfRows(t) === ivfRows(refT))
    assert(probeOf(t, ws) === probeOf(refT, refW))
    // BOUNDS the accumulation: the untriggered twin holds one file
    // set per epoch forever; the triggered twin folds them and stays
    // at most one epoch's appends past its threshold
    assert(fileCount(t) < fileCount(refT),
      s"trigger should compact: ${fileCount(t)} vs ${fileCount(refT)}")
    assert(fileCount(t) <= threshold + 8,
      s"file count must stay near the threshold: ${fileCount(t)} " +
        s"vs threshold $threshold")
    // compaction preserved the identity(cell) layout: the probe's
    // `cell IN` still plans a strict subset of the index's files
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    spark.table(s"lakeq.db.$t").collect()
    val total = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    assert(VectorOps.probeStoredIvf(spark, t, ws, 0L).collect().length == 5)
    val probed = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    assert(probed >= 1 && probed <= total / 2,
      s"probe planned $probed of $total files after compaction — the " +
        "rewrite must stay within cell partitions so footer stats prune")
    Seq(refT, t).foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$x PURGE"))
  }

  test("IVF centroid source survives expire_snapshots via the " +
      "build-snapshot tag") {
    assume(ready)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val odds = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    def snapIds(t: String): Set[Long] =
      spark.table(s"lakeq.db.$t.snapshots")
        .select(col("snapshot_id")).collect().map(_.getLong(0)).toSet
    def expireAll(t: String): Unit = spark.sql(
      s"CALL lakeq.system.expire_snapshots(table => 'db.$t', " +
        "older_than => TIMESTAMP '2100-01-01 00:00:00', retain_last => 1)")
    // clean truth: build + all odds in one batch
    val (refT, _) = VectorOps.buildEvenIvf(spark, sfDir)
    VectorOps.ingestVectorBatch(spark, refT, odds)
    // expire-cadence twin: ingest half, expire everything retention
    // no longer covers (the 100 TB nightly), then ingest the rest
    // THROUGH THE STORAGE PATH (centroid cache cleared): the build
    // snapshot must still be readable and later assignments unchanged
    val (t, _) = VectorOps.buildEvenIvf(spark, sfDir)
    val half = odds.select("vec_id").collect().map(_.getLong(0))
      .sorted.apply(odds.count().toInt / 2)
    VectorOps.ingestVectorBatch(spark, t, odds.filter(col("vec_id") < half))
    // the full nightly reality: COMPACT first (rewrites the small
    // build+epoch files into fresh ones, so the original build files
    // are no longer referenced by the current snapshot), THEN expire —
    // the tag must keep both the build snapshot's metadata AND its
    // physical files alive for the centroid read
    spark.sql(s"CALL lakeq.system.rewrite_data_files(table => 'db.$t', " +
      "options => map('rewrite-all','true'))")
    expireAll(t)
    assert(snapIds(t).contains(1L),
      "the tagged build snapshot must survive the expire")
    VectorOps.clearCentroidCache()
    VectorOps.ingestVectorBatch(spark, t, odds.filter(col("vec_id") >= half))
    assert(ivfRows(t) === ivfRows(refT))
    // counterfactual: without the tag the same cadence DESTROYS the
    // centroid source — the protection is load-bearing, not decorative
    val (t2, _) = VectorOps.buildEvenIvf(spark, sfDir)
    graft.lake.LakeRefCommand(Seq("lakeq", "db", t2), "DROP", isTag = true,
      VectorOps.IvfBuildTag, version = None, ifNotExists = false,
      ifExists = false).run(spark)
    VectorOps.ingestVectorBatch(spark, t2, odds.filter(col("vec_id") < half))
    expireAll(t2)
    assert(!snapIds(t2).contains(1L),
      "fixture: without the tag the build snapshot must expire")
    // and the ingest path must fail LOUDLY on that state — the oldest
    // surviving snapshot contains ingested rows, so a silent fallback
    // would mis-assign every later batch
    VectorOps.clearCentroidCache()
    val e = intercept[IllegalStateException] {
      VectorOps.ingestVectorBatch(spark, t2,
        odds.filter(col("vec_id") >= half))
    }
    assert(e.getMessage.contains("build snapshot is expired"),
      s"wrong failure: ${e.getMessage}")
    Seq(refT, t, t2).foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$x PURGE"))
  }

  test("IVF centroids are pinned to the build snapshot under ingestion") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val odds = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    // clean reference: build, ingest all odds, record their cells
    val (t1, _) = VectorOps.buildEvenIvf(spark, sfDir)
    VectorOps.ingestVectorBatch(spark, t1, odds)
    val clean = ivfRows(t1).toMap
    // pick an odd vector NOT in cell 4 and ingest a doppelganger of
    // it under centroid id 4 ("re-embedded doc with an id inside the
    // centroid range") — if centroids drifted to current table state,
    // that odd vector would now assign to cell 4 with csim exactly 1
    val x = clean.collect { case (id, cell) if id % 2 == 1 && cell != 4 => id }
      .min
    val (t2, _) = VectorOps.buildEvenIvf(spark, sfDir)
    VectorOps.ingestVectorBatch(spark, t2,
      emb.filter(col("vec_id") === x)
        .select(lit(4L).as("vec_id"), col("embedding")))
    VectorOps.ingestVectorBatch(spark, t2, odds)
    val polluted = ivfRows(t2).toMap
    assert(polluted(x) === clean(x),
      s"vec $x re-assigned after centroid-range pollution — centroids " +
        "drifted to current table state instead of the build snapshot")
    assert(odds.collect().map(_.getLong(0))
      .forall(id => polluted(id) == clean(id)))
    Seq(t1, t2).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
  }

  test("expire_snapshots refuses to expire a scope's newest " +
      "epoch-tagged snapshot; the override stamps a watermark that " +
      "fails the bad replay loudly") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    val odds = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    val oddRows = odds.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (half1, half2) = oddRows.splitAt(oddRows.length / 2)
    val (t, _) = VectorOps.buildEvenIvf(spark, sfDir)
    // epoch 0 through the guarded ingest path (tagged commit)
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      half1.toDF("vec_id", "embedding"), epoch = 0L, scope = "guardspec")
    // untagged maintenance on top pushes the tagged snapshot out of
    // the retain_last=1 window — the exact nightly cadence that used
    // to strand a crash replay
    spark.sql(s"CALL lakeq.system.rewrite_data_files(table => 'db.$t', " +
      "options => map('rewrite-all','true'))")
    val before = snapCount(t)
    val rowsBefore = ivfRows(t)
    def expire(extra: String = ""): Unit = spark.sql(
      s"CALL lakeq.system.expire_snapshots(table => 'db.$t', " +
        "older_than => TIMESTAMP '2100-01-01 00:00:00', " +
        s"retain_last => 1$extra)")
    val e = intercept[IllegalStateException] { expire() }
    assert(e.getMessage.contains("ignore_replay_guard") &&
      e.getMessage.contains("ivf-ingest-guardspec"),
      s"wrong refusal: ${e.getMessage}")
    // the refusal is pre-commit: nothing expired, nothing deleted
    assert(snapCount(t) === before, "refusal must not commit")
    // override: proceeds, forgets the tagged snapshot, stamps the
    // watermark atomically with the expire commit
    expire(", ignore_replay_guard => true")
    assert(snapCount(t) < before, "override must expire")
    val m = graft.lake.LakeMeta.of(spark, Seq("lakeq", "db", t))
    assert(graft.lake.ReplayGuard.watermarkOf(m, "ivf-ingest-guardspec")
      === Some(0L), "override must stamp the replay watermark")
    // the bad replay (epoch 0 again, tag forgotten) fails LOUDLY
    // instead of silently re-appending
    val r = intercept[IllegalStateException] {
      graft.streaming.IngestStreams.ivfIngestEpoch(t,
        half1.toDF("vec_id", "embedding"), epoch = 0L,
        scope = "guardspec")
    }
    assert(r.getMessage.contains("cannot prove idempotence"),
      s"wrong replay failure: ${r.getMessage}")
    assert(ivfRows(t) === rowsBefore,
      "the refused replay must not duplicate rows")
    // epochs past the watermark ingest normally — the ring converges
    // forward once the operator restarts past the forgotten epoch
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      half2.toDF("vec_id", "embedding"), epoch = 1L, scope = "guardspec")
    assert(ivfRows(t).size === rowsBefore.size + half2.size)
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }
  test("expire_snapshots equally refuses to SEVER the newest " +
      "epoch-tagged snapshot from main history (mid-ancestry " +
      "snapshot_ids expire); the override still stamps the watermark") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    val oddRows = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (half1, half2) = oddRows.splitAt(oddRows.length / 2)
    val (t, _) = VectorOps.buildEvenIvf(spark, sfDir)
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      half1.toDF("vec_id", "embedding"), epoch = 0L, scope = "sevspec")
    // two untagged row-preserving commits ABOVE the tagged epoch, so
    // the epoch snapshot sits mid-ancestry with room to cut between
    // it and head
    (1 to 2).foreach(_ => spark.sql(
      s"CALL lakeq.system.rewrite_data_files(table => 'db.$t', " +
        "options => map('rewrite-all','true'))"))
    val anc = graft.lake.LakeMeta.mainAncestors(spark,
      Seq("lakeq", "db", t))
    // ancestry nearest-first: [compact2, compact1, epoch0, build];
    // cut the untagged compact1 BETWEEN the tag and head
    val cut = anc(1).snapshotId
    assert(!anc(1).summary.contains("graft.commit.tag"))
    val before = snapCount(t)
    val rowsBefore = ivfRows(t)
    def expire(extra: String = ""): Unit = spark.sql(
      s"CALL lakeq.system.expire_snapshots(table => 'db.$t', " +
        s"snapshot_ids => array($cut)$extra)")
    // the tagged snapshot is NOT in snapshot_ids — pre-fix this
    // passed the guard, silently severed the tag from main history,
    // and re-opened the silent-duplicate replay window
    val e = intercept[IllegalStateException] { expire() }
    assert(e.getMessage.contains("ivf-ingest-sevspec") &&
      e.getMessage.contains("ignore_replay_guard"),
      s"wrong refusal: ${e.getMessage}")
    assert(snapCount(t) === before, "refusal must not commit")
    expire(", ignore_replay_guard => true")
    val m = graft.lake.LakeMeta.of(spark, Seq("lakeq", "db", t))
    assert(graft.lake.ReplayGuard.watermarkOf(m, "ivf-ingest-sevspec")
      === Some(0L),
      "severing override must stamp the replay watermark too")
    // the severed replay fails loudly, no duplicates
    val r = intercept[IllegalStateException] {
      graft.streaming.IngestStreams.ivfIngestEpoch(t,
        half1.toDF("vec_id", "embedding"), epoch = 0L, scope = "sevspec")
    }
    assert(r.getMessage.contains("cannot prove idempotence"),
      s"wrong replay failure: ${r.getMessage}")
    assert(ivfRows(t) === rowsBefore,
      "the refused replay must not duplicate rows")
    // the ring converges forward past the watermark
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      half2.toDF("vec_id", "embedding"), epoch = 1L, scope = "sevspec")
    assert(ivfRows(t).size === rowsBefore.size + half2.size)
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("repair publish is a CAS: an epoch appended mid-repair " +
      "survives, the repair detects the race and retries over it") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    val odds = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (h1, h2) = odds.splitAt(odds.length / 2)
    val (t, _) = VectorOps.buildEvenIvf(spark, sfDir)
    val evens = spark.table(s"lakeq.db.$t").count()
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      h1.toDF("vec_id", "embedding"), epoch = 0L, scope = "racespec")
    // inject a concurrent scope's epoch BETWEEN the repair's branch
    // write and its fast-forward publish — the exact window where the
    // old direct-overwrite publish silently truncated the append away
    // while its tag survived (a permanently lost epoch the replay
    // guard would swear had committed)
    var injections = 0
    VectorOps.repairStoredIvf(spark, t, iters = 2, afterWrite = () => {
      if (injections == 0) {
        injections += 1
        graft.streaming.IngestStreams.ivfIngestEpoch(t,
          h2.toDF("vec_id", "embedding"), epoch = 0L, scope = "racer")
      }
    })
    assert(injections == 1)
    // nothing lost: build + both epochs all present after the repair
    assert(spark.table(s"lakeq.db.$t").count() ===
      evens + h1.size + h2.size,
      "the mid-repair epoch's rows must survive the repair publish")
    val ids = spark.table(s"lakeq.db.$t").select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(h2.map(_._1).forall(ids), "every interleaved row survives")
    // the interleaved epoch's guard still holds (tag on main)
    assert(TextOps.epochCommittedOnMain(spark, t, "ivf-ingest-racer-0"))
    // exactly ONE repair published (the lost first attempt's branch
    // was dropped, not fast-forwarded)
    val repairs = graft.lake.LakeMeta
      .mainAncestors(spark, Seq("lakeq", "db", t))
      .count(_.summary.get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag))
    assert(repairs === 1, s"one published repair expected, got $repairs")
    // probes serve the repaired centroids over the complete row set
    assert(VectorOps.probeStoredIvf(spark, t,
      VectorOps.storedWithSims(spark, t,
        h2.take(1).toDF("vec_id", "embedding")),
      h2.head._1).collect().length == 5)
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("two concurrent IVF ingest streams (distinct scopes) over ONE " +
      "index converge to the union; each scope's replay still no-ops") {
    assume(ready)
    // The IVF epoch is a single append against fixed centroids, so
    // unlike the dedup ring (multi-table read-modify-write,
    // single-flight per index by contract — TextOps.
    // rollbackEpochCommits) TWO streams may legally feed one index:
    // scope-distinct tags never collide, appends serialize through
    // the commit CAS, and each scope's replay guard reads only its
    // own tags off the shared main history.
    val sp = spark
    import sp.implicits._
    val odds = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // writer A takes vec_id % 4 == 1, writer B takes % 4 == 3, two
    // epochs each, epochs interleaved A0 B0 A1 B1
    val aRows = odds.filter(_._1 % 4 == 1)
    val bRows = odds.filter(_._1 % 4 == 3)
    val (a1, a2) = aRows.splitAt(aRows.length / 2)
    val (b1, b2) = bRows.splitAt(bRows.length / 2)
    val (t, ws) = VectorOps.buildEvenIvf(spark, sfDir)
    val memA = MemoryStream[(Long, Seq[Float])](spark)
    val memB = MemoryStream[(Long, Seq[Float])](spark)
    val ckptA = tmpDir("ivf-two-a")
    val qA = graft.streaming.IngestStreams.ivfIngest(
      memA.toDF().toDF("vec_id", "embedding"), t, ckptA)
    val qB = graft.streaming.IngestStreams.ivfIngest(
      memB.toDF().toDF("vec_id", "embedding"), t, tmpDir("ivf-two-b"))
    try {
      memA.addData(a1); qA.processAllAvailable()
      memB.addData(b1); qB.processAllAvailable()
      memA.addData(a2); qA.processAllAvailable()
      memB.addData(b2); qB.processAllAvailable()
    } finally { qA.stop(); qB.stop() }
    // union of both writers, nothing lost between interleaved commits
    assert(ivfRows(t) === {
      val (refT, _) = VectorOps.buildEvenIvf(spark, sfDir)
      VectorOps.ingestVectorBatch(spark, refT,
        (aRows ++ bRows).toDF("vec_id", "embedding"))
      val r = ivfRows(refT)
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$refT PURGE")
      r
    })
    // replay of A's epoch 0 is a no-op even though B's commits now
    // interleave above it on the shared history
    val before = snapCount(t)
    graft.streaming.IngestStreams.ivfIngestEpoch(t,
      a1.toDF("vec_id", "embedding"), epoch = 0L,
      scope = graft.streaming.IngestStreams.scopeOf(spark, ckptA))
    assert(snapCount(t) === before,
      "a replayed epoch must no-op under interleaved foreign scopes")
    assert(VectorOps.probeStoredIvf(spark, t, ws, 0L).collect().length == 5)
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("both IVF triggers in ONE stream: a drifted epoch repairs " +
      "in-loop, the file trigger still bounds files around the " +
      "repair, and probes stay cell-pruned") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    // clustered corpus — drift is a geometric event (see the drift
    // spec's isotropy note)
    val dim = 32
    val rnd = new scala.util.Random(23)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(8)(unit())
    def member(c: Int): Seq[Float] =
      centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
    val rows: Seq[(Long, Seq[Float])] = (0 until 400).map { i =>
      val c = (i % 16) / 2
      val emb = if (i < 16 && i % 2 == 0) centers(c).map(_.toFloat).toSeq
                else member(c)
      (i.toLong, emb)
    }
    val corpusDir = tmpDir("ivf-combo-corpus")
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    val odds = rows.filter(_._1 % 2 == 1)
    val mask = Seq.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val thirds = odds.grouped((odds.length + 2) / 3).toSeq
    val epochs = Seq(
      thirds(0),                                          // clean
      thirds(1).map { case (id, v) =>                     // drifted
        (id, v.zip(mask).map { case (x, m) => x * m }) },
      thirds(2))                                          // clean
    def fileCount(t: String): Long =
      spark.table(s"lakeq.db.$t.files").count()
    def repairCount(t: String): Long = graft.lake.LakeMeta
      .mainAncestors(spark, Seq("lakeq", "db", t))
      .count(_.summary.get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag))
    val (t, _) = VectorOps.buildEvenIvf(spark, corpusDir)
    val threshold = (fileCount(t) + 2).toInt
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val q = graft.streaming.IngestStreams.ivfIngest(
      mem.toDF().toDF("vec_id", "embedding"), t, tmpDir("ivf-combo-ckpt"),
      maintainFileThreshold = threshold, driftRepairThreshold = 0.8)
    try epochs.foreach { e => mem.addData(e); q.processAllAvailable() }
    finally q.stop()
    // the drifted middle epoch triggered the in-loop repair
    assert(repairCount(t) >= 1, "drifted epoch must trigger repair")
    // no rows lost or invented across repair + compactions
    assert(spark.table(s"lakeq.db.$t").count() ===
      rows.count(_._1 % 2 == 0) + odds.length)
    // the file trigger still bounds accumulation around the repair's
    // full overwrite (compaction commits and the repair are both
    // untagged, both outside the epoch scope — neither starves the
    // other's trigger state)
    assert(fileCount(t) <= threshold + 8,
      s"file count must stay near the threshold: ${fileCount(t)} " +
        s"vs threshold $threshold")
    // probes after repair + compaction: repair-aware assignment, and
    // the cell IN pushdown still plans a strict file subset
    val qv = epochs(1).take(4).toDF("vec_id", "embedding")
    val ws = VectorOps.storedWithSims(spark, t, qv)
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    spark.table(s"lakeq.db.$t").collect()
    val total = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    assert(VectorOps.probeStoredIvf(spark, t, ws,
      epochs(1).head._1).collect().length == 5)
    val probed = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    assert(probed >= 1 && probed <= total / 2,
      s"probe planned $probed of $total files after repair+compaction")
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("drift trigger: a Rademacher-masked stream repairs in place " +
      "and recovers recall; a clean stream never triggers") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    // Manufactured CLUSTERED corpus: the testdata embeddings are
    // isotropic random vectors, where a Rademacher mask is
    // UNDETECTABLE IN PRINCIPLE (sign-flipping an isotropic
    // distribution yields the same distribution, so no assignment
    // statistic separates clean from masked — measured: mean
    // best-csim ratio 0.87 clean vs 0.83 masked). Real embedding
    // corpora live on a manifold, which is what makes drift a
    // geometric event — so the spec builds one: 8 unit centers,
    // members = center + noise, with the even ids < 16 placed ON the
    // centers (the buildEvenIvf centroid convention).
    val dim = 32
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(8)(unit())
    def member(c: Int): Seq[Float] =
      centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
    val rows: Seq[(Long, Seq[Float], Int)] = (0 until 400).map { i =>
      val c = (i % 16) / 2
      val emb = if (i < 16 && i % 2 == 0) centers(c).map(_.toFloat).toSeq
                else member(c)
      (i.toLong, emb, c)
    }
    val corpusDir = tmpDir("ivf-drift-corpus")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    val odds = rows.filter(_._1 % 2 == 1).map(r => (r._1, r._2))
    val mask = Seq.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val masked = odds.map { case (id, v) =>
      (id, v.zip(mask).map { case (x, m) => x * m }) }
    def repairCount(t: String): Long = graft.lake.LakeMeta
      .mainAncestors(spark, Seq("lakeq", "db", t))
      .count(_.summary.get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag))
    def stream(t: String, rs: Seq[(Long, Seq[Float])],
        threshold: Double): Unit = {
      val (h1, h2) = rs.splitAt(rs.length / 2)
      val mem = MemoryStream[(Long, Seq[Float])](spark)
      val q = graft.streaming.IngestStreams.ivfIngest(
        mem.toDF().toDF("vec_id", "embedding"), t,
        tmpDir("ivf-drift-ckpt"), driftRepairThreshold = threshold)
      try {
        mem.addData(h1); q.processAllAvailable()
        mem.addData(h2); q.processAllAvailable()
      } finally q.stop()
    }
    // clean stream: same-manifold epochs score ~the reference quality
    // and must NEVER trigger
    val (tc, _) = VectorOps.buildEvenIvf(spark, corpusDir)
    stream(tc, odds, threshold = 0.8)
    assert(repairCount(tc) === 0, "no-drift stream must never trigger")
    // drifted stream: the mask tears the batch off the manifold (best
    // csim ~N(0, 1/sqrt(dim)) vs ~0.95 reference) and the loop
    // repairs IN the loop
    val (td, _) = VectorOps.buildEvenIvf(spark, corpusDir)
    stream(td, masked, threshold = 0.8)
    assert(repairCount(td) >= 1, "drifted stream must trigger repair")
    // the build ref moved onto a repair snapshot (expiry protection
    // restored for the new centroid source)
    val md = graft.lake.LakeMeta.of(spark, Seq("lakeq", "db", td))
    val refSnap = md.refs(VectorOps.IvfBuildTag).snapshotId
    assert(md.snapshotById(refSnap).exists(_.summary
        .get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag)),
      "IvfBuildTag must move onto the repair snapshot")
    // counterfactual twin: same drifted stream, trigger OFF — recall
    // against exact driver-side truth must not beat the repaired twin
    val (toff, _) = VectorOps.buildEvenIvf(spark, corpusDir)
    val memOff = MemoryStream[(Long, Seq[Float])](spark)
    val qOff = graft.streaming.IngestStreams.ivfIngest(
      memOff.toDF().toDF("vec_id", "embedding"), toff,
      tmpDir("ivf-driftoff-ckpt"))
    try {
      memOff.addData(masked); qOff.processAllAvailable()
    } finally qOff.stop()
    val all: Map[Long, Array[Double]] =
      (rows.filter(_._1 % 2 == 0).map(r => (r._1, r._2)) ++ masked)
        .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dt(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s0, i) => s0 + x(i) * y(i))
      dt(a, b) / (math.sqrt(dt(a, a)) * math.sqrt(dt(b, b)))
    }
    def truth(q: Long): Set[Long] = all.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, BigDecimal(cos(all(q), v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    val queries = masked.map(_._1).sorted.take(8)
    def recall(t: String): Double = {
      val qv = masked.filter(q => queries.contains(q._1))
        .toDF("vec_id", "embedding")
      val ws = VectorOps.storedWithSims(spark, t, qv)
      queries.map { q =>
        val got = VectorOps.probeStoredIvf(spark, t, ws, q).collect()
          .map(_.getLong(0)).toSet
        (got intersect truth(q)).size / 5.0
      }.sum / queries.length
    }
    val (before, after) = (recall(toff), recall(td))
    info(f"in-loop drift repair recall@5: $before%.2f -> $after%.2f")
    assert(after >= before,
      f"triggered repair must not lose recall: $before%.2f -> $after%.2f")
    // row preservation: the repair rewrites, never drops or invents
    assert(spark.table(s"lakeq.db.$td").count() ===
      spark.table(s"lakeq.db.$toff").count())
    Seq(tc, td, toff).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
  }

  /** Register a second LakeCatalog over its own warehouse and point
    * `spark.graft.lake.namespace` at it — the deployment move the
    * conf exists for. Callers provision catalog + namespace exactly
    * as LakeOps.cat does for the default. */
  // one warehouse for the suite: a session instantiates a catalog
  // ONCE from conf, so re-registering altcat with a different
  // warehouse mid-session would split cached instances from clones
  private lazy val altWh = tmpDir("altwh")

  private def withAltNamespace[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.altcat",
      classOf[graft.lake.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.altcat.warehouse", altWh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS altcat.ml")
    spark.conf.set(graft.lake.Names.ConfKey, "altcat.ml")
    try body finally spark.conf.unset(graft.lake.Names.ConfKey)
  }

  test("namespace conf: IVF build + streamed epoch + probe run in an " +
      "alternate catalog, bit-equal to the default-namespace ring") {
    assume(ready)
    val sp = spark
    import sp.implicits._
    val oddRows = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    def lifecycle(scope: String): (String, Seq[(Long, Long, Double)]) = {
      val (t, ws) = VectorOps.buildEvenIvf(spark, sfDir)
      graft.streaming.IngestStreams.ivfIngestEpoch(t,
        oddRows.toDF("vec_id", "embedding"), epoch = 0L, scope = scope)
      val rows = VectorOps.probeStoredIvf(spark, t, ws, qVecId = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      (t, rows)
    }
    val (defT, defRows) = lifecycle("nsdef")
    val (altT, altRows) = withAltNamespace {
      val (t, rows) = lifecycle("nsalt")
      // the whole ring landed in the alternate namespace...
      assert(spark.table(s"altcat.ml.$t").count() > 0)
      // ...and nothing leaked into the default one
      intercept[Exception](spark.table(s"lakeq.db.$t").count())
      (t, rows)
    }
    // the ring is equivalent wherever the conf points it
    assert(altRows === defRows)
    spark.sql(s"DROP TABLE IF EXISTS altcat.ml.$altT PURGE")
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$defT PURGE")
  }

  test("namespace conf: the dedup group-index ring (build, mined " +
      "refresh, maintenance) follows the conf, labels bit-equal") {
    assume(ready)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    def ring(maintain: Boolean): (TextOps.GroupIndex, Map[Long, Long]) = {
      val idx = TextOps.buildGroupIndex(spark, corpus)
      TextOps.refreshGroupIndexMined(spark, idx, batch)
      // exercises the conf-resolved system-procedure calls too
      if (maintain) TextOps.maintainGroupIndex(spark, idx)
      val labels = spark.table(graft.lake.Names.q(spark, idx.labels))
        .select(col("doc_id"), col("group_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (idx, labels)
    }
    val (defIdx, defLabels) = ring(maintain = false)
    val (altIdx, altLabels) = withAltNamespace {
      val (idx, labels) = ring(maintain = true)
      assert(spark.table(s"altcat.ml.${idx.labels}").count() > 0)
      intercept[Exception](spark.table(s"lakeq.db.${idx.labels}").count())
      (idx, labels)
    }
    assert(altLabels === defLabels)
    Seq(defIdx.post, defIdx.df, defIdx.size, defIdx.labels).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
    Seq(altIdx.post, altIdx.df, altIdx.size, altIdx.labels).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS altcat.ml.$t PURGE"))
  }
}
