package graft.readonly

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Blocked/allowed matrix over V1 Hive tables and V2 lake tables —
  * a 1:1 port of the reference's ReadOnlyTableSuite.scala:92-317
  * coverage: every write/DDL/statistics path blocked on read-only
  * tables, the same operations allowed on normal tables, reads always
  * allowed, property-value case-insensitivity, and DROP DATABASE
  * CASCADE protection. */
class ReadOnlySuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: String = _

  override def beforeAll(): Unit = {
    wh = java.nio.file.Files.createTempDirectory("ro_wh").toString
    val lakeWh = java.nio.file.Files.createTempDirectory("ro_lake_wh").toString
    // derby-backed metastore in a temp dir: the V1 half of the matrix
    // (partitions, MSCK, LOAD DATA, serde) needs real Hive tables
    System.setProperty("derby.system.home", wh)
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("ro-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .config("spark.sql.catalog.lake", "graft.lake.LakeCatalog")
      .config("spark.sql.catalog.lake.warehouse", lakeWh)
      .withExtensions(new ReadOnlyExtensions)
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
    spark.sql("CREATE DATABASE IF NOT EXISTS ro_test")
    sql("""CREATE TABLE ro_test.readonly_v1 (id INT, name STRING)
          |STORED AS PARQUET
          |TBLPROPERTIES ('hive-ext.readOnly' = 'true')""".stripMargin)
    sql("""CREATE TABLE ro_test.readonly_v1_part (id INT)
          |PARTITIONED BY (dt STRING) STORED AS PARQUET
          |TBLPROPERTIES ('hive-ext.readOnly' = 'true')""".stripMargin)
    sql("CREATE TABLE ro_test.normal_v1 (id INT, name STRING) STORED AS PARQUET")
    sql("""CREATE TABLE lake.db.readonly_v2 (id BIGINT, v STRING) USING lake
          |TBLPROPERTIES ('hive-ext.readOnly' = 'true')""".stripMargin)
    sql("CREATE TABLE lake.db.normal_v2 (id BIGINT, v STRING) USING lake")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String) = spark.sql(s)

  private def assertBlocked(stmt: String): Unit = {
    val ex = intercept[AnalysisException] { sql(stmt) }
    assert(ex.getMessage.contains("read-only"),
      s"expected a read-only veto for [$stmt], got: ${ex.getMessage}")
  }

  // ── V1 Hive table: data writes blocked ───────────────────────────

  test("V1: INSERT INTO read-only table is blocked") {
    assertBlocked("INSERT INTO ro_test.readonly_v1 VALUES (1, 'a')")
  }

  test("V1: INSERT OVERWRITE read-only table is blocked") {
    assertBlocked("INSERT OVERWRITE TABLE ro_test.readonly_v1 VALUES (1, 'a')")
  }

  // ── V1 Hive table: DDL blocked ────────────────────────────────────

  test("V1: ALTER TABLE ADD COLUMNS on read-only table is blocked") {
    assertBlocked("ALTER TABLE ro_test.readonly_v1 ADD COLUMNS (age INT)")
  }

  test("V1: ALTER TABLE SET TBLPROPERTIES on read-only table is blocked") {
    assertBlocked(
      "ALTER TABLE ro_test.readonly_v1 SET TBLPROPERTIES ('key' = 'value')")
  }

  test("V1: ALTER TABLE UNSET TBLPROPERTIES on read-only table is blocked") {
    assertBlocked(
      "ALTER TABLE ro_test.readonly_v1 UNSET TBLPROPERTIES ('hive-ext.readOnly')")
  }

  test("V1: ALTER TABLE SET LOCATION on read-only table is blocked") {
    assertBlocked(s"ALTER TABLE ro_test.readonly_v1 SET LOCATION '$wh/tmp'")
  }

  test("V1: ALTER TABLE SET SERDEPROPERTIES on read-only table is blocked") {
    assertBlocked(
      "ALTER TABLE ro_test.readonly_v1 SET SERDEPROPERTIES ('k' = 'v')")
  }

  test("V1: ALTER TABLE RENAME read-only table is blocked") {
    assertBlocked("ALTER TABLE ro_test.readonly_v1 RENAME TO ro_test.renamed_v1")
  }

  test("V1: DROP TABLE read-only table is blocked") {
    assertBlocked("DROP TABLE ro_test.readonly_v1")
  }

  test("V1: TRUNCATE TABLE read-only table is blocked") {
    assertBlocked("TRUNCATE TABLE ro_test.readonly_v1")
  }

  test("V1: ALTER TABLE ADD PARTITION on read-only table is blocked") {
    assertBlocked("ALTER TABLE ro_test.readonly_v1_part ADD PARTITION (dt='2024')")
  }

  test("V1: ALTER TABLE DROP PARTITION on read-only table is blocked") {
    assertBlocked("ALTER TABLE ro_test.readonly_v1_part DROP PARTITION (dt='2024')")
  }

  test("V1: ALTER TABLE RENAME PARTITION on read-only table is blocked") {
    assertBlocked("ALTER TABLE ro_test.readonly_v1_part PARTITION (dt='2024') " +
      "RENAME TO PARTITION (dt='2025')")
  }

  test("V1: MSCK REPAIR TABLE on read-only table is blocked") {
    assertBlocked("MSCK REPAIR TABLE ro_test.readonly_v1_part")
  }

  test("V1: LOAD DATA on read-only table is blocked") {
    val f = new java.io.File(wh, "load_test.txt")
    f.createNewFile()
    assertBlocked(
      s"LOAD DATA LOCAL INPATH '${f.getAbsolutePath}' INTO TABLE ro_test.readonly_v1")
  }

  // ── V1 Hive table: statistics blocked ─────────────────────────────

  test("V1: ANALYZE TABLE on read-only table is blocked") {
    assertBlocked("ANALYZE TABLE ro_test.readonly_v1 COMPUTE STATISTICS")
  }

  test("V1: ANALYZE TABLE COLUMNS on read-only table is blocked") {
    assertBlocked(
      "ANALYZE TABLE ro_test.readonly_v1 COMPUTE STATISTICS FOR COLUMNS id, name")
  }

  test("V1: ANALYZE TABLE PARTITION on read-only table is blocked") {
    assertBlocked("ANALYZE TABLE ro_test.readonly_v1_part PARTITION (dt='2024') " +
      "COMPUTE STATISTICS")
  }

  // ── Database scope ────────────────────────────────────────────────

  test("V1: DROP DATABASE CASCADE with read-only table is blocked") {
    sql("CREATE DATABASE IF NOT EXISTS ro_drop_db_test")
    sql("""CREATE TABLE ro_drop_db_test.readonly_tbl (id INT)
          |STORED AS PARQUET
          |TBLPROPERTIES ('hive-ext.readOnly' = 'true')""".stripMargin)
    assertBlocked("DROP DATABASE ro_drop_db_test CASCADE")
  }

  test("V1: DROP DATABASE CASCADE without read-only table is allowed") {
    sql("CREATE DATABASE IF NOT EXISTS ro_drop_db_ok")
    sql("CREATE TABLE ro_drop_db_ok.normal_tbl (id INT) STORED AS PARQUET")
    sql("DROP DATABASE ro_drop_db_ok CASCADE")
  }

  // ── V1 Hive table: allowed operations ─────────────────────────────

  test("V1: SELECT from read-only table is allowed") {
    sql("SELECT * FROM ro_test.readonly_v1").collect()
  }

  test("V1: INSERT INTO non-read-only table is allowed") {
    sql("INSERT INTO ro_test.normal_v1 VALUES (1, 'ok')")
    assert(sql("SELECT * FROM ro_test.normal_v1").count() == 1)
  }

  test("V1: ALTER TABLE on non-read-only table is allowed") {
    sql("ALTER TABLE ro_test.normal_v1 SET TBLPROPERTIES ('k' = 'v')")
  }

  test("V1: DROP TABLE non-read-only table is allowed") {
    sql("CREATE TABLE ro_test.droppable_v1 (id INT) STORED AS PARQUET")
    sql("DROP TABLE ro_test.droppable_v1")
  }

  test("V1: hive-ext.readOnly=false does not block writes") {
    sql("""CREATE TABLE ro_test.rw_v1 (id INT) STORED AS PARQUET
          |TBLPROPERTIES ('hive-ext.readOnly' = 'false')""".stripMargin)
    sql("INSERT INTO ro_test.rw_v1 VALUES (1)")
    assert(sql("SELECT * FROM ro_test.rw_v1").count() == 1)
  }

  // ── V2 lake table: data writes blocked ────────────────────────────

  test("V2: INSERT INTO read-only table is blocked") {
    assertBlocked("INSERT INTO lake.db.readonly_v2 VALUES (1, 'a')")
  }

  test("V2: INSERT OVERWRITE read-only table is blocked") {
    assertBlocked("INSERT OVERWRITE lake.db.readonly_v2 VALUES (1, 'a')")
  }

  test("V2: DELETE FROM read-only table is blocked") {
    assertBlocked("DELETE FROM lake.db.readonly_v2 WHERE id = 1")
  }

  test("V2: UPDATE read-only table is blocked") {
    assertBlocked("UPDATE lake.db.readonly_v2 SET v = 'x' WHERE id = 1")
  }

  test("V2: MERGE INTO read-only table is blocked") {
    assertBlocked(
      """MERGE INTO lake.db.readonly_v2 t USING (SELECT 1 AS id, 'm' AS v) s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
  }

  // ── V2 lake table: DDL blocked ────────────────────────────────────

  test("V2: ALTER TABLE ADD COLUMNS on read-only table is blocked") {
    assertBlocked("ALTER TABLE lake.db.readonly_v2 ADD COLUMN extra INT")
  }

  test("V2: ALTER TABLE SET TBLPROPERTIES on read-only table is blocked") {
    assertBlocked(
      "ALTER TABLE lake.db.readonly_v2 SET TBLPROPERTIES ('k' = 'v')")
  }

  test("V2: ALTER TABLE DROP COLUMN on read-only table is blocked") {
    assertBlocked("ALTER TABLE lake.db.readonly_v2 DROP COLUMN v")
  }

  test("V2: ALTER TABLE RENAME read-only table is blocked") {
    assertBlocked("ALTER TABLE lake.db.readonly_v2 RENAME TO lake.db.renamed_v2")
  }

  test("V2: DROP TABLE read-only V2 table is blocked") {
    assertBlocked("DROP TABLE lake.db.readonly_v2")
  }

  test("V2: TRUNCATE read-only table is blocked") {
    assertBlocked("TRUNCATE TABLE lake.db.readonly_v2")
  }

  // ── V2 lake table: allowed operations ─────────────────────────────

  test("V2: SELECT from read-only table is allowed") {
    sql("SELECT * FROM lake.db.readonly_v2").collect()
  }

  test("V2: INSERT INTO non-read-only V2 table is allowed") {
    sql("INSERT INTO lake.db.normal_v2 VALUES (1, 'ok')")
    assert(sql("SELECT * FROM lake.db.normal_v2").count() == 1)
  }

  test("V2: ALTER TABLE on non-read-only V2 table is allowed") {
    sql("ALTER TABLE lake.db.normal_v2 SET TBLPROPERTIES ('k' = 'v')")
  }

  test("V2: DROP TABLE non-read-only V2 table is allowed") {
    sql("CREATE TABLE lake.db.droppable_v2 (id BIGINT) USING lake")
    sql("DROP TABLE lake.db.droppable_v2")
  }

  // ── Property-value semantics ──────────────────────────────────────

  test("V2: property value is case-insensitive (TRUE)") {
    sql("""CREATE TABLE lake.db.ci_v2 (id BIGINT) USING lake
          |TBLPROPERTIES ('hive-ext.readOnly' = 'TRUE')""".stripMargin)
    assertBlocked("INSERT INTO lake.db.ci_v2 VALUES (1)")
  }

  test("V2: property value 'false' does not block writes") {
    sql("""CREATE TABLE lake.db.rw_v2 (id BIGINT) USING lake
          |TBLPROPERTIES ('hive-ext.readOnly' = 'false')""".stripMargin)
    sql("INSERT INTO lake.db.rw_v2 VALUES (1)")
    assert(sql("SELECT * FROM lake.db.rw_v2").count() == 1)
  }

  test("V2: table without property allows all operations") {
    sql("CREATE TABLE lake.db.free_v2 (id BIGINT) USING lake")
    sql("INSERT INTO lake.db.free_v2 VALUES (1)")
    sql("DELETE FROM lake.db.free_v2 WHERE id = 1")
    assert(sql("SELECT * FROM lake.db.free_v2").count() == 0)
    sql("DROP TABLE lake.db.free_v2")
  }

  test("V2: read-only survives as a veto mid-transaction state") {
    // the blocked statements above must not have mutated anything
    assert(sql("SELECT * FROM lake.db.readonly_v2").count() == 0)
  }
}
