package graft.readonly

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Blocked/allowed matrix over v2 lake tables and v1 parquet tables
  * (reference: ReadOnlyTableSuite.scala:92-317, incl. the
  * case-insensitivity edge: property value TRUE/True also blocks). */
class ReadOnlySuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("ro_wh").toString
    val lakeWh = java.nio.file.Files.createTempDirectory("ro_lake_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("ro-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.catalog.lake", "graft.lake.LakeCatalog")
      .config("spark.sql.catalog.lake.warehouse", lakeWh)
      .withExtensions(new ReadOnlyExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String) = spark.sql(s)
  private def blocked(s: String): Boolean =
    try { sql(s); false }
    catch { case e: AnalysisException => e.getMessage.contains("read-only") }

  test("writes to a read-only lake table are vetoed; reads pass") {
    sql("CREATE TABLE lake.db.ro (id bigint, v string) USING lake")
    sql("INSERT INTO lake.db.ro VALUES (1,'a')")
    sql("ALTER TABLE lake.db.ro SET TBLPROPERTIES ('hive-ext.readOnly'='true')")

    assert(sql("SELECT * FROM lake.db.ro").count() == 1) // reads fine
    assert(blocked("INSERT INTO lake.db.ro VALUES (2,'b')"))
    assert(blocked("INSERT OVERWRITE lake.db.ro VALUES (9,'z')"))
    assert(blocked("DELETE FROM lake.db.ro WHERE id = 1"))
    assert(blocked("UPDATE lake.db.ro SET v = 'x' WHERE id = 1"))
    assert(blocked("""MERGE INTO lake.db.ro t USING (SELECT 1 AS id, 'm' AS v) s
                     |ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin))
    assert(blocked("DROP TABLE lake.db.ro"))
    assert(blocked("ALTER TABLE lake.db.ro ADD COLUMN extra int"))
    assert(sql("SELECT * FROM lake.db.ro").count() == 1) // untouched
  }

  test("unset property re-enables writes") {
    sql("CREATE TABLE lake.db.rw (id bigint) USING lake")
    sql("ALTER TABLE lake.db.rw SET TBLPROPERTIES ('hive-ext.readOnly'='true')")
    assert(blocked("INSERT INTO lake.db.rw VALUES (1)"))
    // unsetting the property itself is an ALTER — must also be vetoed
    assert(blocked("ALTER TABLE lake.db.rw UNSET TBLPROPERTIES ('hive-ext.readOnly')"))
  }

  test("case-insensitive property value") {
    sql("CREATE TABLE lake.db.ci (id bigint) USING lake")
    sql("ALTER TABLE lake.db.ci SET TBLPROPERTIES ('hive-ext.readOnly'='True')")
    assert(blocked("INSERT INTO lake.db.ci VALUES (1)"))
  }

  test("v1 parquet session table blocked") {
    sql("CREATE TABLE rov1 (id bigint) USING parquet TBLPROPERTIES ('hive-ext.readOnly'='true')")
    assert(blocked("INSERT INTO rov1 VALUES (1)"))
    assert(blocked("DROP TABLE rov1"))
    assert(sql("SELECT * FROM rov1").count() == 0)
  }

  test("non-read-only tables unaffected") {
    sql("CREATE TABLE lake.db.free (id bigint) USING lake")
    sql("INSERT INTO lake.db.free VALUES (1)")
    sql("DELETE FROM lake.db.free WHERE id = 1")
    assert(sql("SELECT * FROM lake.db.free").count() == 0)
  }
}
