package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planning-time pruning under schema evolution: footer stats live
  * under EPOCH names, pushed filters under CURRENT names. Probing
  * without the per-epoch rename map is unsound two ways — a rename
  * swap matches a different column's stats, and a dropped-and-
  * re-added column's `IS NULL` sees the dead column's zero null
  * count — both silently dropped matching rows before the fix
  * (FileStats.prune renames parameter). */
class EvolutionPruneSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("evoprune_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("evolution-prune-suite")
      .config("spark.sql.shuffle.partitions", "2")
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

  test("rename swap: range filter must probe the epoch's stats names") {
    sql("CREATE TABLE lake.db.swap (x bigint, y bigint) USING lake")
    sql("INSERT INTO lake.db.swap SELECT /*+ REPARTITION(1) */ id, id + 1000 FROM range(10)")
    sql("ALTER TABLE lake.db.swap RENAME COLUMN x TO tmp")
    sql("ALTER TABLE lake.db.swap RENAME COLUMN y TO x")
    sql("ALTER TABLE lake.db.swap RENAME COLUMN tmp TO y")
    // current x carries old y's values (1000..1009): the old file's
    // stats under the name "x" describe a DIFFERENT column
    assert(count("SELECT count(*) FROM lake.db.swap WHERE x = 1005") == 1L,
      "swap-renamed column: matching rows must not be pruned away")
    assert(count("SELECT count(*) FROM lake.db.swap WHERE y = 5") == 1L)
    // and pruning still fires when it is sound: no row has x = 5
    assert(count("SELECT count(*) FROM lake.db.swap WHERE x = 5") == 0L)
    assert(LakeScanBuilder.lastPlannedFileCount.get() == 0,
      "epoch-mapped stats (old y: 1000..1009) must still prune x = 5")
    sql("DROP TABLE lake.db.swap")
  }

  test("drop/re-add: IS NULL must not trust the dead column's stats") {
    sql("CREATE TABLE lake.db.readd (a bigint, b bigint) USING lake")
    sql("INSERT INTO lake.db.readd SELECT /*+ REPARTITION(1) */ id, id FROM range(5)")
    sql("ALTER TABLE lake.db.readd DROP COLUMN b")
    sql("ALTER TABLE lake.db.readd ADD COLUMN b bigint")
    // old files read NULL for the re-added b (fresh field id), but
    // their footers still carry the dead b's nullCount = 0
    assert(count("SELECT count(*) FROM lake.db.readd WHERE b IS NULL") == 5L,
      "re-added column reads as null; IS NULL must keep the old files")
    assert(count("SELECT count(*) FROM lake.db.readd WHERE b = 3") == 0L)
    sql("DROP TABLE lake.db.readd")
  }

  test("time travel after a swap reads and prunes under the OLD names") {
    sql("CREATE TABLE lake.db.ttswap (x bigint, y bigint) USING lake")
    sql("INSERT INTO lake.db.ttswap SELECT /*+ REPARTITION(1) */ id, id + 1000 FROM range(10)")
    val s1 = count("SELECT max(snapshot_id) FROM lake.db.ttswap.snapshots")
    sql("ALTER TABLE lake.db.ttswap RENAME COLUMN x TO tmp")
    sql("ALTER TABLE lake.db.ttswap RENAME COLUMN y TO x")
    sql("ALTER TABLE lake.db.ttswap RENAME COLUMN tmp TO y")
    // the pinned snapshot resolves ITS schema epoch: `x` is the
    // ORIGINAL x (0..9), names align with the files' stats directly
    assert(count(
      s"SELECT count(*) FROM lake.db.ttswap VERSION AS OF $s1 WHERE x = 5") == 1L)
    assert(count(
      s"SELECT count(*) FROM lake.db.ttswap VERSION AS OF $s1 WHERE x = 1005") == 0L)
    // while the current-schema read sees the swap
    assert(count("SELECT count(*) FROM lake.db.ttswap WHERE x = 1005") == 1L)
    sql("DROP TABLE lake.db.ttswap")
  }

  test("rename swap prunes correctly through spilled manifests") {
    sql("CREATE TABLE lake.db.swapspill (x bigint, y bigint) USING lake " +
      "TBLPROPERTIES ('write.metadata.manifest.spill-threshold'='1')")
    sql("INSERT INTO lake.db.swapspill SELECT /*+ REPARTITION(1) */ id, id + 1000 FROM range(10)")
    sql("ALTER TABLE lake.db.swapspill RENAME COLUMN x TO tmp")
    sql("ALTER TABLE lake.db.swapspill RENAME COLUMN y TO x")
    sql("ALTER TABLE lake.db.swapspill RENAME COLUMN tmp TO y")
    sql("INSERT INTO lake.db.swapspill SELECT /*+ REPARTITION(1) */ id + 100, id + 2000 FROM range(5)")
    Manifests.clearCacheForTesting()
    // distributed pruned planning must apply the same epoch mapping
    assert(count("SELECT count(*) FROM lake.db.swapspill WHERE x = 1005") == 1L,
      "distributed manifest pruning must map names per epoch")
    Manifests.clearCacheForTesting()
    assert(count("SELECT count(*) FROM lake.db.swapspill WHERE y = 103") == 1L)
    sql("DROP TABLE lake.db.swapspill")
  }

  test("compaction must not resurrect a dropped column's data") {
    // the round-7 soak find: epochProjection's name fallback matched
    // a re-added column against the DROPPED column's physical data
    // during rewrite_data_files, materializing dead values into
    // current-epoch files — id-based projection must null them
    sql("CREATE TABLE lake.db.cresur (id bigint, b bigint) USING lake")
    sql("INSERT INTO lake.db.cresur SELECT /*+ REPARTITION(1) */ id, id + 50 FROM range(5)")
    sql("INSERT INTO lake.db.cresur SELECT /*+ REPARTITION(1) */ id + 10, id + 60 FROM range(5)")
    sql("ALTER TABLE lake.db.cresur DROP COLUMN b")
    sql("ALTER TABLE lake.db.cresur ADD COLUMN b bigint")
    sql("CALL lake.system.rewrite_data_files(table => 'db.cresur', " +
      "options => map('rewrite-all','true','min-input-files','1'))")
    assert(count("SELECT count(*) FROM lake.db.cresur WHERE b IS NULL") == 10L,
      "compacted rows must keep the re-added column NULL")
    assert(count("SELECT count(*) FROM lake.db.cresur WHERE b = 52") == 0L,
      "dead-column values must not resurface through the rewrite")
    sql("DROP TABLE lake.db.cresur")
  }

  test("compaction after a rename swap keeps column identity") {
    sql("CREATE TABLE lake.db.cswap (x bigint, y bigint) USING lake")
    sql("INSERT INTO lake.db.cswap SELECT /*+ REPARTITION(1) */ id, id + 1000 FROM range(10)")
    sql("ALTER TABLE lake.db.cswap RENAME COLUMN x TO tmp")
    sql("ALTER TABLE lake.db.cswap RENAME COLUMN y TO x")
    sql("ALTER TABLE lake.db.cswap RENAME COLUMN tmp TO y")
    sql("CALL lake.system.rewrite_data_files(table => 'db.cswap', " +
      "options => map('rewrite-all','true','min-input-files','1'))")
    // current x = old y values; a name-matched rewrite would cross-wire
    assert(count("SELECT count(*) FROM lake.db.cswap WHERE x = 1005") == 1L)
    assert(count("SELECT count(*) FROM lake.db.cswap WHERE y = 5") == 1L)
    assert(count("SELECT count(*) FROM lake.db.cswap WHERE x = 5") == 0L)
    sql("DROP TABLE lake.db.cswap")
  }

  test("changelog reads evolved files by field id, not by name") {
    sql("CREATE TABLE lake.db.chevo (id bigint, b bigint) USING lake")
    sql("INSERT INTO lake.db.chevo SELECT /*+ REPARTITION(1) */ id, id + 50 FROM range(3)")
    sql("ALTER TABLE lake.db.chevo RENAME COLUMN b TO c")
    sql("DELETE FROM lake.db.chevo WHERE id = 1")
    spark.sql("CALL lake.system.create_changelog_view(" +
      "table => 'db.chevo', changelog_view => 'chevo_v')")
    val ev = sql("SELECT id, c, _change_type FROM chevo_v ORDER BY id, _change_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getString(2))).toSeq
    // pre-rename file events must carry the VALUES under the current
    // name (field-id identity) — a name-based read nulled them
    assert(ev.contains((0L, 50L, "insert")) && ev.contains((1L, 51L, "delete")),
      s"renamed column's history must keep its values: $ev")
    // drop/re-add: the re-added lineage reads NULL even though the
    // old files physically hold same-named data
    sql("ALTER TABLE lake.db.chevo DROP COLUMN c")
    sql("ALTER TABLE lake.db.chevo ADD COLUMN c bigint")
    sql("DELETE FROM lake.db.chevo WHERE id = 2")
    spark.sql("CALL lake.system.create_changelog_view(" +
      "table => 'db.chevo', changelog_view => 'chevo_v2')")
    val ev2 = sql("SELECT id, c, _change_type FROM chevo_v2 WHERE id = 2")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getString(2))).toSet
    assert(ev2.contains((2L, null, "delete")),
      s"dead-lineage values must not resurrect in change events: $ev2")
    sql("DROP TABLE lake.db.chevo")
  }

  test("nested drop/re-add: fresh nested id nulls dead data, stats consistent") {
    // Field ids are stamped at every struct level (NestedEvolutionSuite
    // covers the full matrix): a re-added struct leaf carries a FRESH
    // id, so old files read NULL for it — the same semantics as a
    // top-level re-add, and what Iceberg's nested field ids give. The
    // prune side maps the current path to an absent sentinel so the
    // dead column's footer stats (nullCount 0!) can never prune the
    // files whose rows now read NULL.
    sql("""CREATE TABLE lake.db.nreadd (
          |  id bigint, meta struct<a: bigint, b: bigint>
          |) USING lake""".stripMargin)
    sql("INSERT INTO lake.db.nreadd SELECT /*+ REPARTITION(1) */ id, " +
      "named_struct('a', id, 'b', id + 100) FROM range(5)")
    sql("ALTER TABLE lake.db.nreadd DROP COLUMN meta.b")
    sql("ALTER TABLE lake.db.nreadd ADD COLUMN meta.b bigint")
    // dead values must NOT resurface…
    assert(count(
      "SELECT count(*) FROM lake.db.nreadd WHERE meta.b = 103") == 0L)
    // …and pruning agrees with the reader (no stale-stats skip)
    assert(count(
      "SELECT count(*) FROM lake.db.nreadd WHERE meta.b IS NULL") == 5L)
    assert(count(
      "SELECT count(*) FROM lake.db.nreadd WHERE meta.b = 999") == 0L)
    sql("DROP TABLE lake.db.nreadd")
  }

  test("struct column rename: nested stats follow the top-level rename") {
    sql("""CREATE TABLE lake.db.nsren (
          |  id bigint, meta struct<region: string, score: bigint>
          |) USING lake""".stripMargin)
    sql("INSERT INTO lake.db.nsren SELECT /*+ REPARTITION(1) */ id, " +
      "named_struct('region', 'east', 'score', id) FROM range(100)")
    sql("ALTER TABLE lake.db.nsren RENAME COLUMN meta TO info")
    sql("INSERT INTO lake.db.nsren SELECT /*+ REPARTITION(1) */ id, " +
      "named_struct('region', 'west', 'score', id + 1000) FROM range(100)")
    // correctness across the rename
    assert(count(
      "SELECT count(*) FROM lake.db.nsren WHERE info.region = 'east'") == 100L)
    // precision: the dotted filter maps its first segment through the
    // epoch rename, so the pre-rename file's nested stats still prune
    assert(count(
      "SELECT count(*) FROM lake.db.nsren WHERE info.score >= 1000") == 100L)
    assert(LakeScanBuilder.lastPlannedFileCount.get() == 1,
      "nested stats must prune through the renamed struct column")
    sql("DROP TABLE lake.db.nsren")
  }

  test("renameFilter: partial And/Or mapping respects polarity") {
    import org.apache.spark.sql.sources
    // a filter shape renameFilter doesn't handle (collated compares
    // push down in Spark 4 but carry collation semantics footer stats
    // can't honor) — the real unmappable leaf the And/Or logic must
    // survive
    def Opaque() = sources.CollatedEqualTo("c", "v",
      org.apache.spark.sql.types.StringType)
    val rn = Map("x" -> "old_x")
    val eq = sources.EqualTo("x", 1)
    val mapped = sources.EqualTo("old_x", 1)
    // positive And: the mappable conjunct survives alone (pruning may
    // weaken a filter; And(l,r) ⇒ l)
    assert(LakeScans.renameFilter(sources.And(eq, Opaque()), rn)
      .contains(mapped))
    assert(LakeScans.renameFilter(sources.And(Opaque(), eq), rn)
      .contains(mapped))
    // positive Or: dropping a disjunct would STRENGTHEN — must fail
    assert(LakeScans.renameFilter(sources.Or(eq, Opaque()), rn).isEmpty)
    // negated And: partial mapping would strengthen Not(And(..)) —
    // must fail as a whole
    assert(LakeScans.renameFilter(
      sources.Not(sources.And(eq, Opaque())), rn).isEmpty)
    // negated Or: Not(Or(l,r)) ⇒ Not(l) — the mappable disjunct
    // survives under the Not
    assert(LakeScans.renameFilter(
      sources.Not(sources.Or(eq, Opaque())), rn)
      .contains(sources.Not(mapped)))
    // double negation restores positive polarity
    assert(LakeScans.renameFilter(
      sources.Not(sources.Not(sources.And(eq, Opaque()))), rn)
      .contains(sources.Not(sources.Not(mapped))))
    // fully-mappable trees are unchanged in shape
    assert(LakeScans.renameFilter(sources.And(eq, sources.IsNull("y")), rn)
      .contains(sources.And(mapped, sources.IsNull("y"))))
  }
}
