package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var ckpt: String = _

  override def beforeAll(): Unit = {
    ckpt = java.nio.file.Files.createTempDirectory("evstream_ckpt").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("event-streams-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // offset past the initial watermark (0): a row AT the watermark is
  // already considered late and dropped
  private val Base = 86400000L
  private def ts(minute: Long) = new java.sql.Timestamp(Base + minute * 60000L)
  private def m(t: java.sql.Timestamp): Long = (t.getTime - Base) / 60000L

  test("watermarked hourly counts emit finalized windows") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/hourly")
      .start()
    try {
      mem.addData(
        EventStreams.Event(1, ts(10), "click"),
        EventStreams.Event(2, ts(20), "click"),
        EventStreams.Event(1, ts(30), "view"))
      q.processAllAvailable()
      // append mode: nothing final until the watermark passes hour 0
      mem.addData(EventStreams.Event(3, ts(200), "click")) // wm -> 140
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .collect().map(r => (m(r.getTimestamp(0)),
          r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((0L, "click", 2L), (0L, "view", 1L)), rows.toString)
    } finally q.stop()
  }

  test("sliding windows: each event counts in its 4 covering windows") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/sliding")
      .start()
    try {
      // minute 30 lands in the 1-hour windows starting at -15,0,15,30
      // ([start, start+60) half-open: start=-30 excludes it)
      mem.addData(EventStreams.Event(1, ts(30), "click"))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(2, ts(300), "view")) // wm -> 240
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .collect().map(r => (m(r.getTimestamp(0)), r.getString(1),
          r.getLong(2))).toSet
      assert(rows == Set((-15L, "click", 1L), (0L, "click", 1L),
        (15L, "click", 1L), (30L, "click", 1L)),
        s"one event must finalize into exactly 4 sliding windows: $rows")
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/dedup")
      .start()
    try {
      mem.addData(
        EventStreams.Event(1, ts(10), "click"),
        EventStreams.Event(1, ts(10), "click"), // exact dup, same batch
        EventStreams.Event(2, ts(10), "click"))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(1, ts(10), "click")) // dup, later batch
      q.processAllAvailable()
      val rows = spark.table("dedup")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(rows.sorted == Seq((1L, "click"), (2L, "click")),
        s"dups inside the watermark must drop: $rows")
      // past the watermark horizon the key re-admits (state evicted)
      mem.addData(EventStreams.Event(9, ts(500), "z")) // wm -> 440
      q.processAllAvailable()
      mem.addData(EventStreams.Event(1, ts(450), "click"))
      q.processAllAvailable()
      assert(spark.table("dedup").collect()
        .count(r => r.getLong(0) == 1L) == 2,
        "same key past the watermark is a new event, not a dup")
    } finally q.stop()
  }

  test("stream-stream attribution join matches clicks to purchases") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.attribution(mem.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/attrib")
      .start()
    try {
      mem.addData(
        EventStreams.Event(1, ts(10), "click"),
        EventStreams.Event(1, ts(40), "purchase"),  // joins the 10' click
        EventStreams.Event(1, ts(120), "purchase"), // >1h after it: no match
        EventStreams.Event(2, ts(30), "click"),     // user 2 never purchases
        EventStreams.Event(3, ts(50), "purchase"))  // user 3 never clicks
      q.processAllAvailable()
      mem.addData(EventStreams.Event(9, ts(500), "view")) // advance wm
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .collect().map(r => (r.getLong(0), m(r.getTimestamp(1)),
          m(r.getTimestamp(2)))).toSet
      assert(rows == Set((1L, 40L, 10L)),
        s"only the in-window (purchase, click) pair joins: $rows")
    } finally q.stop()
  }

  test("stateful ops run on the RocksDB state store (off-heap state)") {
    // At 100 TB streaming state (dedup keys, open sessions) outgrows
    // executor heaps; Spark's RocksDB provider keeps it on local disk
    // with changelog checkpointing. Prove the engine's stateful
    // operators run unchanged on it — the provider is a conf swap,
    // not a code path, and THAT is the claim worth pinning.
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventStreams.Event](spark)
      val q = EventStreams.dedup(mem.toDF())
        .writeStream.format("memory").queryName("rocksdedup")
        .outputMode("append")
        .option("checkpointLocation", s"$ckpt/rocksdedup")
        .start()
      try {
        mem.addData(
          EventStreams.Event(1, ts(10), "click"),
          EventStreams.Event(1, ts(10), "click"),
          EventStreams.Event(2, ts(10), "view"))
        q.processAllAvailable()
        mem.addData(EventStreams.Event(1, ts(10), "click")) // cross-batch dup
        q.processAllAvailable()
        val rows = spark.table("rocksdedup")
          .collect().map(r => (r.getLong(0), r.getString(2))).toSeq.sorted
        assert(rows == Seq((1L, "click"), (2L, "view")),
          s"dedup state must behave identically on RocksDB: $rows")
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbSstFileSize"),
          "progress must report rocksdb metrics (proof the provider ran)")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-static enrich joins the customer dim without state") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val customers = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val q = EventStreams.enrich(mem.toDF(), customers)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/enrich")
      .start()
    try {
      mem.addData(
        EventStreams.Event(1, ts(10), "click"),
        EventStreams.Event(2, ts(20), "view"),
        EventStreams.Event(7, ts(30), "click")) // no dim row: inner-drops
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3)))
        .toSet
      assert(rows == Set((1L, "click", "AUTOMOBILE"), (2L, "view", "BUILDING")),
        s"stateless enrichment join: $rows")
      // no watermark required: a second batch joins immediately (the
      // static side re-plans per micro-batch)
      mem.addData(EventStreams.Event(2, ts(40), "click"))
      q.processAllAvailable()
      assert(spark.table("enrich").count() == 3)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes on gap and watermark") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.sessionize(mem.toDS(), java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/sessions")
      .start()
    try {
      // user 1: two sessions split by a >30min gap inside one batch;
      // user 2: one session
      mem.addData(
        EventStreams.Event(1, ts(0), "a"),
        EventStreams.Event(1, ts(10), "b"),
        EventStreams.Event(1, ts(60), "c"),
        EventStreams.Event(2, ts(5), "a"))
      q.processAllAvailable()
      // session (0,10) closed batch-internally by the 60' event; the
      // post-batch watermark (60') already times out user 2's session
      // (end 5' + 30' gap = 35')
      val first = spark.table("sessions")
        .collect().map(r => (r.getLong(0), m(r.getTimestamp(1)),
          m(r.getTimestamp(2)), r.getLong(3))).toSet
      assert(first == Set((1L, 0L, 10L, 2L), (2L, 5L, 5L, 1L)), first.toString)
      // advance the watermark past every open session's end + gap
      mem.addData(EventStreams.Event(3, ts(1000), "z"))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(3, ts(2000), "z"))
      q.processAllAvailable()
      val all = spark.table("sessions")
        .collect().map(r => (r.getLong(0), m(r.getTimestamp(1)),
          m(r.getTimestamp(2)), r.getLong(3))).toSet
      assert(all.contains((1L, 60L, 60L, 1L)) && all.contains((2L, 5L, 5L, 1L)),
        s"watermark-timed-out sessions must flush: $all")
    } finally q.stop()
  }
}
