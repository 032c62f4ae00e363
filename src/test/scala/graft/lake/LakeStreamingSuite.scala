package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming read (snapshot-incremental micro-batches) and streaming
  * write (append snapshots per epoch) — reference:
  * docs/spark-structured-streaming.md. */
class LakeStreamingSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var ckpt: String = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("lakestream_wh").toString
    ckpt = java.nio.file.Files.createTempDirectory("lakestream_ckpt").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("lake-streaming-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming read: appends arrive as incremental micro-batches") {
    spark.sql("CREATE TABLE lake.db.src (id bigint) USING lake")
    spark.sql("INSERT INTO lake.db.src VALUES (1),(2)")

    val q = spark.readStream.table("lake.db.src")
      .writeStream.format("memory").queryName("sink1")
      .option("checkpointLocation", s"$ckpt/q1")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sink1").count() == 2)

      spark.sql("INSERT INTO lake.db.src VALUES (3)")
      q.processAllAvailable()
      assert(spark.table("sink1").count() == 3)

      // compaction must not re-emit rows
      spark.sql("CALL lake.system.rewrite_data_files(table => 'db.src', options => map('min-input-files','1'))")
      spark.sql("INSERT INTO lake.db.src VALUES (4)")
      q.processAllAvailable()
      assert(spark.table("sink1").count() == 4)
    } finally q.stop()
  }

  test("streaming CDC source: tbl.changes emits per-commit change events") {
    spark.sql("""CREATE TABLE lake.db.cdc (id bigint NOT NULL, v string)
        |USING lake TBLPROPERTIES (
        |  'identifier-fields'='id', 'write.upsert.enabled'='true')""".stripMargin)
    spark.sql("INSERT INTO lake.db.cdc VALUES (1,'a'),(2,'b')")

    val q = spark.readStream.table("lake.db.cdc.changes")
      .writeStream.format("memory").queryName("cdc_sink")
      .option("checkpointLocation", s"$ckpt/qcdc")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      // bootstrap: the initial insert arrives as insert events
      assert(spark.table("cdc_sink").count() == 2)

      // an upsert commit emits its inserts AND the delete of the
      // replaced row
      spark.sql("INSERT INTO lake.db.cdc VALUES (2,'B'),(3,'c')")
      q.processAllAvailable()
      val events = spark.table("cdc_sink")
        .select("id", "v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(events.count(_._3 == "insert") == 4) // 2 bootstrap + 2 upsert
      assert(events.contains((2L, "b", "delete")),
        s"upsert must emit the replaced row as a delete: $events")

      // a MoR-free CoW delete emits the removed rows as deletes
      spark.sql("DELETE FROM lake.db.cdc WHERE id = 1")
      q.processAllAvailable()
      val all = spark.table("cdc_sink")
        .select("id", "v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(all.contains((1L, "a", "delete")), s"CoW delete event missing: $all")

      // compaction is row-preserving: the STREAM must emit nothing for
      // it (the batch relation keeps raw carryover parity)
      val before = spark.table("cdc_sink").count()
      spark.sql("CALL lake.system.rewrite_data_files(table => 'db.cdc', " +
        "options => map('rewrite-all','true','min-input-files','1'))")
      q.processAllAvailable()
      assert(spark.table("cdc_sink").count() == before,
        "replace commits must not flood the CDC stream")
    } finally q.stop()
  }

  test("streaming CDC source: RTAS is a real change, not a skipped rewrite") {
    spark.sql("CREATE TABLE lake.db.cdcrtas (id bigint, v string) USING lake")
    spark.sql("INSERT INTO lake.db.cdcrtas VALUES (1,'a'),(2,'b')")
    val q = spark.readStream.table("lake.db.cdcrtas.changes")
      .writeStream.format("memory").queryName("cdcrtas_sink")
      .option("checkpointLocation", s"$ckpt/qcdcrtas")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdcrtas_sink").count() == 2)
      // an RTAS replaces every row — it must flow to the consumer as
      // deletes of the old rows + inserts of the new (before the op
      // rename it recorded "replace" and the stream's row-preserving
      // skip silently dropped the whole-table replacement). Values
      // follow FIELD-ID LINEAGE under the consumer's schema, pinned
      // at stream start: the delete events read the pre-RTAS files
      // with full values, while the inserts — written under the
      // replaced schema's FRESH ids (schema replaced, not merged) —
      // surface as null-valued events. Counts and change types stay
      // exact, so the consumer can reconcile and restart on the new
      // schema contract.
      spark.sql("CREATE OR REPLACE TABLE lake.db.cdcrtas USING lake AS " +
        "SELECT * FROM VALUES (7, 'x'), (8, 'y') AS t(id, v)")
      q.processAllAvailable()
      val events = spark.table("cdcrtas_sink")
        .select("id", "v", "_change_type").collect()
        .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
          r.getString(1), r.getString(2))).toSeq
      assert(events.contains((1L, "a", "delete")) &&
          events.contains((2L, "b", "delete")),
        s"RTAS must emit the replaced rows as delete events: $events")
      assert(events.count(_._3 == "insert") == 4, // 2 bootstrap + 2 RTAS
        s"RTAS must emit its new rows as insert events: $events")
    } finally q.stop()
  }

  test("streaming CDC source: admission cap drains history in bounded batches") {
    spark.sql("CREATE TABLE lake.db.cdcap (id bigint) USING lake")
    for (i <- 1 to 5) spark.sql(s"INSERT INTO lake.db.cdcap VALUES ($i)")
    val progress = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .option("streaming-max-snapshots-per-micro-batch", "2")
      .table("lake.db.cdcap.changes")
      .writeStream.format("memory").queryName("cdcap_sink")
      .option("checkpointLocation", s"$ckpt/qcdcap")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      assert(spark.table("cdcap_sink").count() == 5)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3, // 5 snapshots / cap 2 -> >= 3 batches
        s"expected >=3 bounded batches, got ${batches.length}")
      progress.set(batches.length)
    } finally q.stop()
  }

  test("streaming CDC source: stream-from-timestamp skips older commits") {
    spark.sql("CREATE TABLE lake.db.cdcts (id bigint) USING lake")
    spark.sql("INSERT INTO lake.db.cdcts VALUES (1)")
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO lake.db.cdcts VALUES (2)")
    val q = spark.readStream
      .option("stream-from-timestamp", cut.toString)
      .table("lake.db.cdcts.changes")
      .writeStream.format("memory").queryName("cdcts_sink")
      .option("checkpointLocation", s"$ckpt/qcdcts")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val ids = spark.table("cdcts_sink").select("id").collect()
        .map(_.getLong(0)).toSeq
      assert(ids == Seq(2L), s"only the post-cut commit must stream: $ids")
    } finally q.stop()
  }

  test("streaming write: each epoch commits an append snapshot") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE lake.db.snk (value bigint) USING lake")
    val mem = MemoryStream[Long](spark)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$ckpt/q2")
      .toTable("lake.db.snk")
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM lake.db.snk").collect()(0).getLong(0) == 2)
      mem.addData(3L)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM lake.db.snk").collect()(0).getLong(0) == 3)
      val ops = spark.sql("SELECT operation FROM lake.db.snk.snapshots")
        .collect().map(_.getString(0)).toSeq
      assert(ops.forall(_ == "append") && ops.size == 2)
    } finally q.stop()
  }

  test("streaming upsert: foreachBatch MERGE into a merge-on-read table") {
    val s = spark
    import s.implicits._
    spark.sql("""CREATE TABLE lake.db.upsert (id bigint, v string) USING lake
        |TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO lake.db.upsert VALUES (1,'a'),(2,'b')")
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", s"$ckpt/q3")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("upsert_batch")
        batch.sparkSession.sql(
          """MERGE INTO lake.db.upsert t USING upsert_batch s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        ()
      }
      .start()
    try {
      mem.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, v FROM lake.db.upsert ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "B"), (3L, "c")), rows.toString)
      // the upsert landed as deltas: merge snapshot, no rewritten files
      val ops = spark.sql("SELECT operation FROM lake.db.upsert.snapshots ORDER BY snapshot_id")
        .collect().map(_.getString(0)).toSeq
      assert(ops.last == "merge", ops.toString)
      assert(spark.sql("SELECT * FROM lake.db.upsert.delete_files").count() >= 1)
    } finally q.stop()
  }

  test("rate limit: max-files splits one snapshot into bounded batches") {
    spark.sql("CREATE TABLE lake.db.rlf (id bigint) USING lake")
    // ONE snapshot, 4 data files (range with 4 partitions)
    spark.sql("INSERT INTO lake.db.rlf SELECT id FROM range(0, 400, 1, 4)")
    assert(spark.sql("SELECT * FROM lake.db.rlf.files").count() == 4)

    val q = spark.readStream
      .option("streaming-max-files-per-micro-batch", "1")
      .table("lake.db.rlf")
      .writeStream.format("memory").queryName("sink_rlf")
      .option("checkpointLocation", s"$ckpt/q_rlf")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sink_rlf").count() == 400)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4, s"expected 4 one-file batches: " +
        batches.map(_.numInputRows).mkString(","))
      assert(batches.forall(_.numInputRows == 100),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("rate limit: max-rows is a soft max over whole files") {
    spark.sql("CREATE TABLE lake.db.rlr (id bigint) USING lake")
    for (_ <- 0 until 6)
      spark.sql("INSERT INTO lake.db.rlr SELECT id FROM range(0, 10, 1, 1)")

    val q = spark.readStream
      .option("streaming-max-rows-per-micro-batch", "25")
      .table("lake.db.rlr")
      .writeStream.format("memory").queryName("sink_rlr")
      .option("checkpointLocation", s"$ckpt/q_rlr")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sink_rlr").count() == 60)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      // 10-row files, soft max 25 -> whole files only, 2 per batch
      assert(batches.forall(_.numInputRows <= 25),
        batches.map(_.numInputRows).mkString(","))
      assert(batches.length == 3, batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the table in rate-limited batches, then stops") {
    spark.sql("CREATE TABLE lake.db.ran (id bigint) USING lake")
    spark.sql("INSERT INTO lake.db.ran SELECT id FROM range(0, 300, 1, 3)")

    val q = spark.readStream
      .option("streaming-max-files-per-micro-batch", "1")
      .table("lake.db.ran")
      .writeStream.format("memory").queryName("sink_ran")
      .option("checkpointLocation", s"$ckpt/q_ran")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(spark.table("sink_ran").count() == 300)
  }

  test("streaming backlog across renames reads every epoch by field id") {
    // the micro-batch source reads files from SNAPSHOT history, which
    // spans schema epochs the moment a rename lands — one
    // current-schema scan (the old implementation) silently nulled
    // renamed columns (top-level AND nested) for pre-evolution files,
    // and a multi-epoch batch died in Scan.toMicroBatchStream
    spark.sql("CREATE TABLE lake.db.sevo (id bigint, v bigint, " +
      "p struct<a: bigint, b: bigint>) USING lake")
    spark.sql("INSERT INTO lake.db.sevo SELECT id, id + 50, " +
      "named_struct('a', id, 'b', id + 100) FROM range(3)")
    spark.sql("ALTER TABLE lake.db.sevo RENAME COLUMN v TO renamed_v")
    spark.sql("ALTER TABLE lake.db.sevo RENAME COLUMN p.b TO nb")
    spark.sql("INSERT INTO lake.db.sevo SELECT id + 10, id + 60, " +
      "named_struct('a', id + 10, 'nb', id + 200) FROM range(2)")
    val q = spark.readStream.table("lake.db.sevo")
      .writeStream.format("memory").queryName("sink_sevo")
      .option("checkpointLocation", s"$ckpt/q_sevo")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sink_sevo")
        .selectExpr("id", "renamed_v", "p.a", "p.nb").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(rows == Seq(
        (0L, 50L, 0L, 100L), (1L, 51L, 1L, 101L), (2L, 52L, 2L, 102L),
        (10L, 60L, 10L, 200L), (11L, 61L, 11L, 201L)),
        s"backlog across renames must keep values by field id: $rows")

      // mid-stream evolution: new epochs arriving AFTER query start
      // map into the query's pinned schema by id
      spark.sql("ALTER TABLE lake.db.sevo RENAME COLUMN renamed_v TO v2")
      spark.sql("INSERT INTO lake.db.sevo SELECT 20, 99, " +
        "named_struct('a', 20L, 'nb', 300L)")
      q.processAllAvailable()
      val late = spark.table("sink_sevo").where("id = 20")
        .selectExpr("renamed_v", "p.nb").collect()(0)
      assert((late.getLong(0), late.getLong(1)) == (99L, 300L),
        "post-start epochs must map into the pinned stream schema by id")
    } finally q.stop()
  }
}
