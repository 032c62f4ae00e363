package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Branch/tag DDL, partition-spec evolution, write-order and
  * identifier-fields DDL (reference: iceberg_it.py:379-396, 617-860). */
class LakeDdlSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("lakeddl_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("lake-ddl-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .withExtensions(new LakeExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()
  private def sql(s: String) = spark.sql(s)
  private def count(s: String): Long = sql(s).collect()(0).getLong(0)

  test("branch and tag DDL lifecycle") {
    sql("CREATE TABLE lake.db.refs (id bigint) USING lake")
    sql("INSERT INTO lake.db.refs VALUES (1),(2)")
    sql("ALTER TABLE lake.db.refs CREATE BRANCH audit")
    sql("ALTER TABLE lake.db.refs CREATE BRANCH IF NOT EXISTS audit")
    sql("ALTER TABLE lake.db.refs CREATE TAG v1")
    sql("INSERT INTO lake.db.refs VALUES (3)")
    val snaps = sql("SELECT snapshot_id FROM lake.db.refs.snapshots ORDER BY snapshot_id")
      .collect().map(_.getLong(0))
    sql(s"ALTER TABLE lake.db.refs CREATE OR REPLACE BRANCH audit AS OF VERSION ${snaps(1)}")
    assert(count("SELECT count(*) FROM lake.db.refs.branch_audit") == 3)
    sql(s"ALTER TABLE lake.db.refs REPLACE BRANCH audit AS OF VERSION ${snaps(0)}")
    assert(count("SELECT count(*) FROM lake.db.refs.branch_audit") == 2)
    assert(count("SELECT count(*) FROM lake.db.refs VERSION AS OF 'v1'") == 2)
    sql("ALTER TABLE lake.db.refs DROP BRANCH audit")
    sql("ALTER TABLE lake.db.refs DROP TAG IF EXISTS v1")
    sql("ALTER TABLE lake.db.refs DROP BRANCH IF EXISTS nope")
    val refs = sql("SELECT name FROM lake.db.refs.refs").collect().map(_.getString(0))
    assert(refs.toSeq == Seq("main"))
    intercept[Exception](sql("ALTER TABLE lake.db.refs DROP BRANCH nope"))
  }

  test("partition field evolution") {
    sql("CREATE TABLE lake.db.pspec (id bigint, ts timestamp, cat string) USING lake")
    sql("INSERT INTO lake.db.pspec VALUES (1, TIMESTAMP '2024-03-01 10:00:00', 'a')")
    sql("ALTER TABLE lake.db.pspec ADD PARTITION FIELD days(ts)")
    sql("ALTER TABLE lake.db.pspec ADD PARTITION FIELD cat AS category")
    sql("INSERT INTO lake.db.pspec VALUES (2, TIMESTAMP '2024-03-02 11:00:00', 'b')")
    assert(count("SELECT count(*) FROM lake.db.pspec") == 2)
    sql("ALTER TABLE lake.db.pspec DROP PARTITION FIELD days(ts)")
    sql("INSERT INTO lake.db.pspec VALUES (3, TIMESTAMP '2024-03-03 12:00:00', 'c')")
    assert(count("SELECT count(*) FROM lake.db.pspec") == 3)
  }

  test("write order, distribution and identifier fields") {
    sql("CREATE TABLE lake.db.wo (id bigint, v string) USING lake")
    sql("ALTER TABLE lake.db.wo WRITE ORDERED BY id")
    sql("INSERT INTO lake.db.wo VALUES (3,'c'),(1,'a'),(2,'b')")
    assert(count("SELECT count(*) FROM lake.db.wo") == 3)
    sql("ALTER TABLE lake.db.wo WRITE UNORDERED")
    sql("ALTER TABLE lake.db.wo WRITE DISTRIBUTED BY PARTITION")
    sql("ALTER TABLE lake.db.wo SET IDENTIFIER FIELDS id")
    assert(sql("SHOW TBLPROPERTIES lake.db.wo").collect()
      .exists(r => r.getString(0) == "identifier-fields" && r.getString(1) == "id"))
    sql("ALTER TABLE lake.db.wo DROP IDENTIFIER FIELDS id")
  }

  test("branch retention: RETAIN ages refs out; SNAPSHOT RETENTION protects ancestry") {
    sql("CREATE TABLE lake.db.reften (id bigint) USING lake")
    (1 to 3).foreach(i => sql(s"INSERT INTO lake.db.reften VALUES ($i)"))
    sql("ALTER TABLE lake.db.reften CREATE BRANCH ephemeral RETAIN 0 DAYS")
    sql("ALTER TABLE lake.db.reften CREATE BRANCH keeper RETAIN 365 DAYS " +
      "WITH SNAPSHOT RETENTION 3 SNAPSHOTS 2 DAYS")
    val day = 24L * 3600 * 1000
    val refs = sql("""SELECT name, max_reference_age_in_ms,
                   |min_snapshots_to_keep, max_snapshot_age_in_ms
                   |FROM lake.db.reften.refs""".stripMargin).collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(refs("keeper") == (Some(365L * day), Some(3), Some(2L * day)))
    assert(refs("ephemeral") == (Some(0L), None, None))
    assert(refs("main") == (None, None, None))

    // a 0-day RETAIN means the ref is already older than its window;
    // the far-future older_than leaves only retention rules in play
    Thread.sleep(5)
    sql("CALL lake.system.expire_snapshots(table => 'db.reften', " +
      "older_than => TIMESTAMP '2099-01-01 00:00:00', retain_last => 1)")
    val after = sql("SELECT name FROM lake.db.reften.refs").collect()
      .map(_.getString(0)).toSet
    assert(after == Set("main", "keeper"),
      s"ephemeral should age out, got $after")
    // keeper's 3-SNAPSHOT retention out-protects retain_last = 1
    assert(sql("SELECT * FROM lake.db.reften.snapshots").count() == 3)
  }

}
