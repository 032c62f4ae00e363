package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Non-row-preserving "replace" snapshots from legacy metadata.
  *
  * Builds before the RTAS op-name fix recorded a whole-table
  * replacement as operation "replace" THROUGH the staged write path —
  * the same name compaction uses for its row-preserving rewrites.
  * Every consumer that skips "replace" as row-preserving (incremental
  * reads, CDC/changelog, streaming source, MV append fast path) would
  * silently drop the replacement for such tables. The discriminator
  * is summary provenance ([[SnapshotMeta.isRowPreservingReplace]]):
  * maintenance procedures stamp `rewritten-*`/`converted-*` keys and
  * never `added-records`; the staged path always stamps
  * `added-records`. These specs pin: legacy replaces FAIL LOUDLY or
  * surface as real changes; genuine compaction stays skippable.
  */
class LegacyReplaceSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("legacyrep_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("legacy-replace-suite")
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
  private def cat = spark.sessionState.catalogManager.catalog("lake")
    .asInstanceOf[LakeCatalog]

  /** RTAS the table, then rewrite that snapshot's op name to
    * "replace" — exactly what legacy metadata on disk looks like. */
  private def forgeLegacyReplace(name: String): Unit = {
    val ident = Identifier.of(Array("db"), name)
    val m = cat.loadMeta(ident)
    assert(m.snapshots.exists(_.operation == "overwrite"),
      "precondition: RTAS records overwrite post-fix")
    cat.commitMeta(m.copy(snapshots = m.snapshots.map(s =>
      if (s.operation == "overwrite") s.copy(operation = "replace") else s)))
  }

  test("summary provenance discriminates compaction from legacy RTAS") {
    val compaction = SnapshotMeta(2L, Some(1L), 0L, "replace",
      Map("rewritten-data-files" -> "3"), Nil, 0)
    val legacyRtas = SnapshotMeta(2L, Some(1L), 0L, "replace",
      Map("added-data-files" -> "1", "added-records" -> "5",
        "total-data-files" -> "1", "total-records" -> "5"), Nil, 0)
    assert(compaction.isRowPreservingReplace)
    assert(!legacyRtas.isRowPreservingReplace)
    assert(!compaction.copy(operation = "overwrite").isRowPreservingReplace)
  }

  test("incremental read fails loudly on a legacy replace, not silently") {
    sql("CREATE TABLE lake.db.legacyinc (id bigint) USING lake")
    sql("INSERT INTO lake.db.legacyinc SELECT id FROM range(5)")
    val v1 = sql("SELECT min(snapshot_id) FROM lake.db.legacyinc.snapshots")
      .collect()(0).getLong(0)
    sql("CREATE OR REPLACE TABLE lake.db.legacyinc USING lake AS " +
      "SELECT id + 100 AS id FROM range(5)")
    forgeLegacyReplace("legacyinc")
    sql("INSERT INTO lake.db.legacyinc SELECT id + 200 FROM range(3)")
    val e = intercept[IllegalArgumentException] {
      spark.read.option("start-snapshot-id", v1.toString)
        .table("lake.db.legacyinc").count()
    }
    assert(e.getMessage.contains("replace"),
      s"must name the offending snapshot type: ${e.getMessage}")
    sql("DROP TABLE lake.db.legacyinc")
  }

  test("incremental read still skips a genuine compaction replace") {
    sql("CREATE TABLE lake.db.comprep (id bigint) USING lake")
    sql("INSERT INTO lake.db.comprep SELECT id FROM range(0, 5, 1, 1)")
    val v1 = sql("SELECT max(snapshot_id) FROM lake.db.comprep.snapshots")
      .collect()(0).getLong(0)
    sql("INSERT INTO lake.db.comprep SELECT id + 10 FROM range(0, 5, 1, 1)")
    sql("CALL lake.system.rewrite_data_files(table => 'db.comprep', " +
      "options => map('rewrite-all','true','min-input-files','1'))")
    sql("INSERT INTO lake.db.comprep SELECT id + 20 FROM range(0, 3, 1, 1)")
    val rows = spark.read.option("start-snapshot-id", v1.toString)
      .table("lake.db.comprep")
    // second insert (5) + third insert (3); the compaction's rewritten
    // files contribute nothing
    assert(rows.count() == 8,
      "compaction must stay skippable in incremental ranges")
    sql("DROP TABLE lake.db.comprep")
  }

  test("changelog surfaces a legacy replace as delete+insert events") {
    sql("CREATE TABLE lake.db.legacycdc (id bigint) USING lake")
    sql("INSERT INTO lake.db.legacycdc SELECT id FROM range(4)")
    sql("CREATE OR REPLACE TABLE lake.db.legacycdc USING lake AS " +
      "SELECT id + 100 AS id FROM range(2)")
    forgeLegacyReplace("legacycdc")
    sql("CALL lake.system.create_changelog_view(table => 'db.legacycdc', " +
      "changelog_view => 'legacycdc_cl')")
    val byType = sql(
      "SELECT _change_type, count(*) FROM legacycdc_cl GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 initial inserts, then the replacement: 4 deletes + 2 inserts
    assert(byType.getOrElse("delete", 0L) == 4,
      s"legacy replace must emit its deletes, got $byType")
    assert(byType.getOrElse("insert", 0L) == 6, s"got $byType")
    sql("DROP TABLE lake.db.legacycdc")
  }
}
