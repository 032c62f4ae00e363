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
}
