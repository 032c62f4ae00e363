package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The stored MinHash dedup index ([[TextOps.tIncrementalDedupIndexed]])
  * — the oracle gate proves the probe's ROWS; this suite pins the three
  * properties that make the stored index the 100 TB shape and drives
  * the full nightly maintenance cycle the gate's doc promises:
  *
  *  - the posting probe is a storage-partitioned join (both sides
  *    bucketed by band_hash) — NO exchange on the corpus-scale index;
  *  - the signature fetch broadcasts candidate ID pairs only, and the
  *    runtime filter prunes the range-clustered sig files on disk;
  *  - probe → drop dups → append survivors → re-probe: appended docs
  *    are self-findable at est_jaccard 1.0, and round-1 duplicates
  *    keep their corpus match (append never disturbs existing rows).
  */
class DedupIndexSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-index")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  test("stored-index probe returns exactly the in-memory result") {
    assume(ready)
    val mem = TextOps.tIncrementalDedup(spark, sfDir).collect().toSeq
    val idx = TextOps.tIncrementalDedupIndexed(spark, sfDir).collect().toSeq
    assert(mem.nonEmpty, "fixture should contain mixed-parity near-dups")
    assert(idx == mem,
      s"storage round-trip changed the result:\nmem=$mem\nidx=$idx")
  }

  // -- shared index fixture for the plan/cycle tests ------------------

  private var postT: String = _
  private var sigT: String = _
  private var batchT: String = _
  private var sigs: DataFrame = _

  private def buildIndex(): Unit = synchronized {
    if (postT != null) return
    LakeOps.cat(spark)
    sigs = TextOps.minhashSigs(spark, sfDir)
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    val post = sigs.select(col("doc_id"),
      explode(TextOps.minhashBands).as("band_hash"))
    postT = LakeOps.fresh("specidx_post")
    sigT = LakeOps.fresh("specidx_sig")
    batchT = LakeOps.fresh("specidx_batch")
    post.filter(col("doc_id") % 2 === 0)
      .writeTo(s"lakeq.db.$postT").using("lake")
      .partitionedBy(bucket(8, col("band_hash"))).create()
    sigs.filter(col("doc_id") % 2 === 0)
      .repartitionByRange(8, col("doc_id"))
      .writeTo(s"lakeq.db.$sigT").using("lake")
      .tableProperty("write.parquet.bloom-filter-enabled.column.doc_id",
        "true")
      .tableProperty("write.parquet.bloom-filter-expected-ndv.column.doc_id",
        "16384")
      .tableProperty("write.parquet.dict-enabled.column.doc_id", "false")
      .create()
    post.filter(col("doc_id") % 2 === 1)
      .writeTo(s"lakeq.db.$batchT").using("lake")
      .partitionedBy(bucket(8, col("band_hash"))).create()
  }

  /** The gate's probe stage: candidates as (doc_id, dup_of) ids only. */
  private def mineCandidates(): DataFrame =
    spark.table(s"lakeq.db.$batchT")
      .join(spark.table(s"lakeq.db.$postT").toDF("dup_of", "band_hash"),
        Seq("band_hash"))
      .select(col("doc_id"), col("dup_of"))
      .distinct()

  /** The gate's verify stage over an id-pair candidate frame. */
  private def score(cand: DataFrame): DataFrame =
    spark.table(s"lakeq.db.$sigT")
      .select(col("doc_id").as("dup_of"), col("sig").as("sig_b"))
      .join(broadcast(cand.filter(col("dup_of") >= 0)), Seq("dup_of"))
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")), Seq("doc_id"))
      .select(col("doc_id"), col("dup_of"),
        round(aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / 16.0,
          4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)

  test("posting probe is a storage-partitioned join: no exchange") {
    assume(ready)
    buildIndex()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = mineCandidates()
      assert(cand.count() > 0, "probe found no band collisions")
      val plan = cand.queryExecution.executedPlan.toString
      // the distinct's pair-keyed aggregate may exchange (pair-scale);
      // the JOIN itself must not shuffle either bucketed posting table
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!joinPart.contains("Exchange"),
        s"bucket-co-partitioned probe must not shuffle the index:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("sig fetch prunes range-clustered sig files via runtime filter") {
    assume(ready)
    buildIndex()
    val cand = mineCandidates()
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    val total = spark.sql(s"SELECT count(*) FROM lakeq.db.$sigT.files")
      .collect()(0).getLong(0)
    assert(total == 8, s"sig store should be 8 range-clustered files, saw $total")
    val nCorpus = cand.select(col("dup_of")).distinct().count()
    graft.lake.LakeBatchScan.lastRuntimeFileCount.set(-1)
    assert(score(cand).collect().nonEmpty)
    val survived = graft.lake.LakeBatchScan.lastRuntimeFileCount.get()
    assert(survived >= 1, "runtime filter never reached the sig scan")
    // soundness either way; strict only when candidates cannot span
    // every file (each candidate corpus doc lives in exactly one range)
    if (nCorpus < total)
      assert(survived <= nCorpus,
        s"$nCorpus candidate corpus docs must plan <= $nCorpus of " +
          s"$total sig files, planned $survived")
    info(s"sig fetch planned $survived of $total files " +
      s"for $nCorpus candidate corpus docs")
  }

  test("streaming ingestion probes the stored index per micro-batch") {
    assume(ready)
    buildIndex()
    // batch-mode truth: every batch doc's best corpus match
    val expect = score(mineCandidates()
      .localCheckpoint(true, StorageLevel.DISK_ONLY))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("est_jaccard").as("j"), (-col("dup_of")).as("nd")))
        .as("m"))
      .select(col("doc_id"), (-col("m.nd")).cast("long").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expect.nonEmpty)

    // the nightly batch arrives as a STREAM instead: signatures land
    // in files (2 files → 2 micro-batches), each micro-batch computes
    // its postings and probes the SAME stored index. A doc's
    // candidates come only from the stored corpus, never from other
    // batch docs, so micro-batching must be invisible: the union of
    // per-batch results is exactly the batch-mode result.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sigs")
      .toString
    sigs.filter(col("doc_id") % 2 === 1).repartition(2)
      .write.mode("overwrite").parquet(dir)
    val got = scala.collection.mutable.Map[Long, Long]()
    var batches = 0
    val q = spark.readStream
      .schema(sigs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        val post = mb.select(col("doc_id"),
          explode(TextOps.minhashBands).as("band_hash"))
        val cand = post
          .join(spark.table(s"lakeq.db.$postT").toDF("dup_of", "band_hash"),
            Seq("band_hash"))
          .select(col("doc_id"), col("dup_of")).distinct()
        val scored = spark.table(s"lakeq.db.$sigT")
          .select(col("doc_id").as("dup_of"), col("sig").as("sig_b"))
          .join(broadcast(cand.filter(col("dup_of") >= 0)), Seq("dup_of"))
          .join(mb.select(col("doc_id"), col("sig").as("sig_a")),
            Seq("doc_id"))
          .select(col("doc_id"), col("dup_of"),
            round(aggregate(
              zip_with(col("sig_a"), col("sig_b"),
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, x) => acc + x).cast("double") / 16.0,
              4).as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.5)
          .groupBy(col("doc_id"))
          .agg(max(struct(col("est_jaccard").as("j"),
            (-col("dup_of")).as("nd"))).as("m"))
          .select(col("doc_id"), (-col("m.nd")).cast("long").as("dup_of"))
        got ++= scored.collect().map(r => r.getLong(0) -> r.getLong(1))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
    assert(got.toMap == expect,
      s"streamed probe diverged from batch probe:\n" +
        s"stream=${got.toMap}\nbatch=$expect")
    info(s"$batches micro-batches reproduced ${expect.size} matches exactly")
  }

  test("nightly cycle: probe, drop dups, append survivors, re-probe") {
    assume(ready)
    buildIndex()
    val bestOf = (scored: DataFrame) => scored
      .groupBy(col("doc_id"))
      .agg(max(struct(col("est_jaccard").as("j"), (-col("dup_of")).as("nd")))
        .as("m"))
      .select(col("doc_id"), (-col("m.nd")).cast("long").as("dup_of"),
        col("m.j").as("est_jaccard"))
    val round1 = bestOf(score(mineCandidates())).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(round1.nonEmpty)

    // survivors: batch docs that are NOT near-dups of the corpus
    val dupIds = round1.keySet
    val survivors = sigs.filter(col("doc_id") % 2 === 1)
      .filter(!col("doc_id").isin(dupIds.toSeq: _*))
    val nSurv = survivors.count()
    assert(nSurv > 0, "every batch doc was a dup — fixture too small")
    survivors.select(col("doc_id"),
        explode(TextOps.minhashBands).as("band_hash"))
      .writeTo(s"lakeq.db.$postT").append()
    survivors.repartitionByRange(2, col("doc_id"))
      .writeTo(s"lakeq.db.$sigT").append()

    val round2 = bestOf(score(mineCandidates())).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // every survivor now finds a perfect match (itself, or an exact
    // twin with a smaller id); every round-1 dup keeps a match
    survivors.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val (dupOf, j) = round2.getOrElse(id,
        fail(s"appended doc $id not found on re-probe"))
      assert(j == 1.0, s"doc $id re-probed at $j, expected 1.0 (self)")
      assert(dupOf <= id, s"doc $id matched $dupOf > itself")
    }
    round1.foreach { case (id, (dupOf, j)) =>
      val (dupOf2, j2) = round2.getOrElse(id,
        fail(s"round-1 dup $id lost its match after append"))
      assert(j2 >= j,
        s"append weakened doc $id's best match: $j -> $j2")
      if (j2 == j && dupOf2 != dupOf)
        assert(dupOf2 < dupOf,
          s"equal-score tie must keep the smallest id: $dupOf -> $dupOf2")
    }
    info(s"cycle: ${round1.size} dups dropped, $nSurv survivors " +
      "appended, all self-findable at 1.0")
  }
}
