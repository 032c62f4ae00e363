package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Commit auto-retry under contention (SURVEY.md §9 scope notes).
  *
  * Iceberg — the runtime the reference ships — transparently retries a
  * commit that loses the optimistic CAS: the metadata is reloaded, the
  * snapshot re-derived, the serializable validation re-run against the
  * new head, and only a TRUE conflict (validation failure) surfaces.
  * These specs prove the same property end to end: clean concurrent
  * writers all succeed; a detected isolation violation still throws;
  * retries are bounded.
  */
class ConcurrencySuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: String = _

  override def beforeAll(): Unit = {
    wh = java.nio.file.Files.createTempDirectory("lake_cc").toString
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("concurrency-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String) = spark.sql(s)
  private def count(s: String): Long = sql(s).collect()(0).getLong(0)

  /** Run one closure per element concurrently; rethrow the first
    * failure (after all threads finish, so no work is left in flight). */
  private def inThreads[T](items: Seq[T])(f: T => Unit): Unit = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = items.map(i => new Thread(() =>
      try f(i) catch { case t: Throwable => errors.add(t) }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
  }

  test("concurrent INSERTs all succeed via commit auto-retry") {
    sql("CREATE TABLE lake.db.ccins (id bigint, writer int) USING lake")
    inThreads(0 until 4) { t =>
      spark.sql("INSERT INTO lake.db.ccins " +
        s"SELECT id, $t FROM range(${t * 100}, ${t * 100 + 10}, 1, 1)")
    }
    assert(count("SELECT count(*) FROM lake.db.ccins") == 40)
    assert(count("SELECT count(DISTINCT writer) FROM lake.db.ccins") == 4)
    // every writer produced exactly one snapshot; none was lost or doubled
    assert(count("SELECT count(*) FROM lake.db.ccins.snapshots") == 4)
  }

  test("contention stress: mixed appends + deletes equal a serial schedule") {
    sql("CREATE TABLE lake.db.ccmix (id bigint, writer int) USING lake")
    // Each writer appends its own id range, then deletes the upper half
    // of that range. Domains are disjoint, so every interleaving is
    // serializable — with auto-retry, every commit must land.
    inThreads(0 until 4) { t =>
      val lo = t * 100
      spark.sql("INSERT INTO lake.db.ccmix " +
        s"SELECT id, $t FROM range($lo, ${lo + 10}, 1, 1)")
      spark.sql(s"DELETE FROM lake.db.ccmix WHERE id >= ${lo + 5} AND id < ${lo + 100}")
    }
    val ids = sql("SELECT id FROM lake.db.ccmix ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    val expected = (0 until 4).flatMap(t => (t * 100) until (t * 100 + 5))
      .map(_.toLong)
    assert(ids == expected, s"serial-equivalent state expected, got $ids")
    // 4 appends + 4 deletes = 8 snapshots, each committed exactly once
    assert(count("SELECT count(*) FROM lake.db.ccmix.snapshots") == 8)
  }

  test("commit CAS stays atomic under a tight metadata hammer") {
    // Tiny driver-side commits maximize create() collisions — this is
    // the test that catches a check-then-act commit protocol (local
    // create(overwrite=false) is not atomic; O_EXCL is). Every lost
    // CAS must surface as a retryable conflict, never a silent erase.
    sql("""CREATE TABLE lake.db.cchammer (id bigint) USING lake
        |TBLPROPERTIES ('commit.retry.num-retries'='64')""".stripMargin)
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "cchammer")
    inThreads(0 until 8) { t =>
      (0 until 10).foreach { i =>
        cat.commitRetrying(ident) { fresh =>
          val snap = SnapshotMeta(fresh.lastSnapshotId + 1,
            fresh.currentSnapshotId("main"), System.currentTimeMillis(),
            "append", Map("writer" -> s"$t-$i"), Nil,
            fresh.currentSchemaEpoch)
          fresh.withSnapshot(snap, Some("main"))
        }
      }
    }
    // 80 commits → 80 snapshots and 80 metadata versions after create
    assert(count("SELECT count(*) FROM lake.db.cchammer.snapshots") == 80)
  }

  test("contention stress: concurrent merge-on-read deletes on disjoint rows") {
    sql("""CREATE TABLE lake.db.ccmor (id bigint, writer int) USING lake
        |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO lake.db.ccmor SELECT id, CAST(id / 100 AS int) " +
      "FROM range(0, 400, 1, 4)")
    inThreads(0 until 4) { t =>
      val lo = t * 100
      spark.sql(s"DELETE FROM lake.db.ccmor WHERE id >= ${lo + 50} AND id < ${lo + 100}")
    }
    assert(count("SELECT count(*) FROM lake.db.ccmor") == 200)
    assert(count("SELECT count(*) FROM lake.db.ccmor WHERE id % 100 >= 50") == 0)
  }

  test("a true write-skew conflict still throws after retries") {
    sql("""CREATE TABLE lake.db.ccskew (id bigint, v string) USING lake
        |TBLPROPERTIES ('write.update.mode'='merge-on-read',
        |  'write.delete.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO lake.db.ccskew SELECT id, concat('v', id) FROM range(0, 10, 1, 1)")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val stale = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "ccskew")).asInstanceOf[LakeTable]
    val scanned = stale.meta.currentSnapshot("main").get.files.map(_.path)
    // a concurrent MoR DELETE masks rows in the stale operation's read set
    sql("DELETE FROM lake.db.ccskew WHERE id = 3")
    val loc = stale.meta.location
    val stageDir = s"$loc/data/cc-skew"
    sql("SELECT CAST(100 AS bigint) AS id, 'x' AS v")
      .coalesce(1).write.parquet(stageDir)
    // auto-retry must NOT paper over this: the validation re-runs
    // against the new head on every attempt and keeps failing
    intercept[java.util.ConcurrentModificationException] {
      LakeWriteUtil.commitDelta(stale, stageDir,
        s"$loc/metadata/deletes/none", "merge", Some(scanned))
    }
    assert(count("SELECT count(*) FROM lake.db.ccskew") == 9)
  }

  test("concurrent compaction does not falsely abort an unrelated delta commit") {
    sql("""CREATE TABLE lake.db.ccfc (id bigint, v string) USING lake
        |TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO lake.db.ccfc SELECT id, concat('v', id) FROM range(0, 10, 1, 1)")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "ccfc")
    // the operation's scan planned ONLY the low-range file
    val lowFiles = cat.loadTable(ident).asInstanceOf[LakeTable]
      .meta.currentSnapshot("main").get.files.map(_.path)
    sql("INSERT INTO lake.db.ccfc SELECT id, concat('v', id) " +
      "FROM range(1000, 1020, 1, 4)")
    val stale = cat.loadTable(ident).asInstanceOf[LakeTable]
    // a concurrent compaction rewrites the high-range files (operation
    // "replace": new paths, zero new rows)
    val res = sql("""CALL lake.system.rewrite_data_files(table => 'db.ccfc',
        |`where` => 'id >= 1000')""".stripMargin).collect()
    assert(res(0).getInt(0) >= 2, s"compaction must have rewritten: ${res.toSeq}")
    val loc = stale.meta.location
    val stageDir = s"$loc/data/cc-fc"
    sql("SELECT CAST(5000 AS bigint) AS id, 'x' AS v")
      .coalesce(1).write.parquet(stageDir)
    // an unpushable MERGE condition prunes nothing — before the
    // lineage-aware phantom check this threw a false conflict on the
    // compaction's rewritten outputs
    LakeWriteUtil.commitDelta(stale, stageDir,
      s"$loc/metadata/deletes/none", "merge", Some(lowFiles))
    assert(count("SELECT count(*) FROM lake.db.ccfc") == 31)
    // but a genuine concurrent append in the same window still conflicts
    val stale2 = cat.loadTable(ident).asInstanceOf[LakeTable]
    val scanned2 = stale2.meta.currentSnapshot("main").get.files.map(_.path)
    sql("INSERT INTO lake.db.ccfc VALUES (7777, 'p')")
    val stageDir2 = s"$loc/data/cc-fc2"
    sql("SELECT CAST(5001 AS bigint) AS id, 'y' AS v")
      .coalesce(1).write.parquet(stageDir2)
    intercept[java.util.ConcurrentModificationException] {
      LakeWriteUtil.commitDelta(stale2, stageDir2,
        s"$loc/metadata/deletes/none", "merge", Some(scanned2))
    }
  }

  test("auto-retry is bounded: a persistent CAS blocker fails after num-retries") {
    sql("""CREATE TABLE lake.db.ccblock (id bigint) USING lake
        |TBLPROPERTIES ('commit.retry.num-retries'='1')""".stripMargin)
    sql("INSERT INTO lake.db.ccblock VALUES (1)")
    val loc = s"$wh/db/ccblock"
    val conf = spark.sessionState.newHadoopConf()
    val v = MetadataLog.currentVersion(loc, conf)
    // occupy the next version slot; since the hint still points at v,
    // every reload re-derives the same collision
    val cur = new java.io.File(loc, f"metadata/v$v%05d.json")
    val blocker = new java.io.File(loc, f"metadata/v${v + 1}%05d.json")
    java.nio.file.Files.copy(cur.toPath, blocker.toPath)
    intercept[java.util.ConcurrentModificationException] {
      sql("INSERT INTO lake.db.ccblock VALUES (2)")
    }
    blocker.delete()
    sql("INSERT INTO lake.db.ccblock VALUES (3)")
    assert(sql("SELECT id FROM lake.db.ccblock ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("concurrent upserts on disjoint keys all land; latest values win") {
    sql("""CREATE TABLE lake.db.ccups (id bigint NOT NULL, v string)
        |USING lake TBLPROPERTIES (
        |  'identifier-fields'='id', 'write.upsert.enabled'='true')""".stripMargin)
    sql("INSERT INTO lake.db.ccups SELECT id, 'v0' FROM range(0, 40, 1, 1)")
    // 4 writers concurrently upsert disjoint 10-key slices; every
    // commit is an append + equality-delete pair racing on the CAS —
    // auto-retry must land all four, each key keeping its writer's value
    inThreads(0 until 4) { t =>
      spark.sql("INSERT INTO lake.db.ccups " +
        s"SELECT id, 'w$t' FROM range(${t * 10}, ${t * 10 + 10}, 1, 1)")
    }
    assert(count("SELECT count(*) FROM lake.db.ccups") == 40)
    val byWriter = sql(
      "SELECT v, count(*) FROM lake.db.ccups GROUP BY v ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byWriter == Seq(("w0", 10L), ("w1", 10L), ("w2", 10L), ("w3", 10L)),
      s"every slice must carry its upserting writer's value: $byWriter")
  }

  test("commit tags survive CAS retries and stay session-scoped") {
    // the epoch-tag stamp (LakeCatalog.stampCommitTag) runs INSIDE the
    // commit retry loop, re-stamping against the reloaded head — so a
    // racing writer that loses the CAS and re-derives its snapshot
    // must still publish its own session's tag, and two cloned
    // sessions with different tags must never cross-contaminate
    // (session conf, not global state)
    sql("CREATE TABLE lake.db.tagrace (id bigint, v string) USING lake")
    val sessions = Seq("tag-a", "tag-b").map { tag =>
      val c = spark.newSession()
      c.conf.set("spark.graft.commit.tag", tag)
      (tag, c)
    }
    inThreads(sessions) { case (tag, c) =>
      c.sql(s"INSERT INTO lake.db.tagrace VALUES (1, '$tag'), (2, '$tag')")
    }
    assert(count("SELECT count(*) FROM lake.db.tagrace") == 4)
    val tags = sql("SELECT summary['graft.commit.tag'] " +
        "FROM lake.db.tagrace.snapshots")
      .collect().map(_.getString(0)).toSeq
    assert(tags.sorted == Seq("tag-a", "tag-b"),
      s"each racing commit must carry exactly its own session's tag: $tags")
    // an untagged session's commit stays unstamped (default-off)
    sql("INSERT INTO lake.db.tagrace VALUES (3, 'plain')")
    val untagged = sql("SELECT summary['graft.commit.tag'] " +
        "FROM lake.db.tagrace.snapshots ORDER BY committed_at DESC LIMIT 1")
      .collect()(0)
    assert(untagged.isNullAt(0), "untagged commit must carry no tag")
  }

  test("operation-scoped tag: an untagged writer racing a tagged " +
      "epoch on the SAME session is never stamped") {
    // graft.CommitTag binds the tag to the operation's THREAD (with
    // Par.all propagating it to its worker pool), not to the session
    // conf — so a concurrent unrelated writer on the same session
    // cannot inherit the epoch's tag, be stamped, and later be
    // skipped on a replay as if it were the epoch's own commit
    sql("CREATE TABLE lake.db.tagopa (id bigint) USING lake")
    sql("CREATE TABLE lake.db.tagopb (id bigint) USING lake")
    inThreads(Seq(true, false)) { taggedSide =>
      if (taggedSide)
        graft.CommitTag.run(Some("epoch-42")) {
          // two commits from Par worker threads + one from the epoch's
          // own thread: all three must carry the scope
          graft.Par.all(2, Seq[() => Unit](
            () => spark.sql("INSERT INTO lake.db.tagopa VALUES (1)"),
            () => spark.sql("INSERT INTO lake.db.tagopa VALUES (2)")))
          spark.sql("INSERT INTO lake.db.tagopa VALUES (3)")
        }
      else
        (0 until 3).foreach(i =>
          spark.sql(s"INSERT INTO lake.db.tagopb VALUES ($i)"))
    }
    val aTags = sql("SELECT summary['graft.commit.tag'] " +
        "FROM lake.db.tagopa.snapshots")
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(aTags.length == 3 && aTags.forall(_.contains("epoch-42")),
      s"every commit inside the scoped operation must be stamped: $aTags")
    val bRows = sql("SELECT summary['graft.commit.tag'] " +
        "FROM lake.db.tagopb.snapshots").collect()
    assert(bRows.length == 3 && bRows.forall(_.isNullAt(0)),
      "a concurrent untagged writer on the same session must stay " +
        "unstamped while a tagged epoch runs")
  }

  test("cross-INSTANCE writers: two independent catalog instances " +
      "over one warehouse serialize through the commit CAS") {
    // Same warehouse, two separately registered catalog names — two
    // LakeCatalog INSTANCES with nothing shared in-process except the
    // filesystem. The thread specs above share one catalog object
    // (and whatever caching it carries); this pins that the commit
    // protocol never depended on that sharing.
    spark.conf.set("spark.sql.catalog.lakexa", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakexa.warehouse", wh)
    spark.conf.set("spark.sql.catalog.lakexb", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakexb.warehouse", wh)
    sql("CREATE TABLE lakexa.db.ccxi (id bigint, writer int) USING lake")
    inThreads(0 until 4) { t =>
      val cat = if (t % 2 == 0) "lakexa" else "lakexb"
      val lo = t * 100
      spark.sql(s"INSERT INTO $cat.db.ccxi " +
        s"SELECT id, $t FROM range($lo, ${lo + 10}, 1, 1)")
      spark.sql(s"DELETE FROM $cat.db.ccxi " +
        s"WHERE id >= ${lo + 5} AND id < ${lo + 100}")
    }
    // serial-equivalent final state, readable through EITHER instance
    for (cat <- Seq("lakexa", "lakexb")) {
      val ids = sql(s"SELECT id FROM $cat.db.ccxi ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      val expected = (0 until 4).flatMap(t => (t * 100) until (t * 100 + 5))
        .map(_.toLong)
      assert(ids == expected, s"via $cat: expected $expected, got $ids")
      assert(count(s"SELECT count(*) FROM $cat.db.ccxi.snapshots") == 8,
        "4 appends + 4 deletes, each exactly once")
    }
  }

  test("cross-PROCESS writers: two independent drivers (forked JVMs) " +
      "racing one warehouse equal a serial schedule") {
    // The real 100 TB deployment shape: many drivers, one warehouse,
    // no shared JVM state at all. Each CrossProcWriter subprocess
    // builds its own SparkSession + LakeCatalog over `wh` and runs
    // 3 appends + a row-level DELETE; the only arbitration left is
    // MetadataLog's O_CREAT|O_EXCL version-file CAS on the shared
    // filesystem. (Deployment matrix: kernel-atomic on local POSIX,
    // NameNode-atomic on HDFS; plain S3A lacks create-if-absent — see
    // the COVERAGE round-14 note.)
    sql("CREATE TABLE lake.db.ccxp (id bigint, writer int) USING lake")
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def launch(writerId: Int): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        CrossProcWriter.getClass.getName.stripSuffix("$"),
        wh, "ccxp", writerId.toString, "3")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"xproc$writerId", ".log"))
      pb.start()
    }
    val procs = Seq(launch(0), launch(1))
    // release the barrier only once BOTH sessions are up, so the
    // commit windows overlap rather than serialize on startup skew
    val whDir = java.nio.file.Paths.get(wh)
    val ready = Seq(0, 1).map(i => whDir.resolve(s"xproc-ready-$i"))
    val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
    while (!ready.forall(java.nio.file.Files.exists(_))) {
      assert(System.nanoTime() < deadline, "writers never became ready")
      Thread.sleep(100)
    }
    java.nio.file.Files.write(whDir.resolve("xproc-go"),
      Array.emptyByteArray)
    procs.foreach { p =>
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "cross-process writer timed out")
      assert(p.exitValue() == 0,
        "a writer lost a commit or exhausted retries — see its temp log")
    }
    // serial schedule: per writer, 3 decades of 10 minus the deleted
    // upper halves = 15 rows each
    val ids = sql("SELECT id FROM lake.db.ccxp ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    val expected = Seq(0, 1).flatMap { w =>
      (0 until 3).flatMap(i => (w * 1000 + i * 100) until (w * 1000 + i * 100 + 5))
    }.map(_.toLong)
    assert(ids == expected, s"serial-equivalent state expected, got $ids")
    // every commit landed exactly once: (3 appends + 1 delete) × 2
    assert(count("SELECT count(*) FROM lake.db.ccxp.snapshots") == 8)
    assert(count("SELECT count(DISTINCT writer) FROM lake.db.ccxp") == 2)
  }
}
