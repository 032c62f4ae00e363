package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_timestamp}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 port of the reference integration suite (iceberg_it.py:2349-2508
  * case registry). One ScalaTest per reference case, same group/name,
  * sequential and state-sharing like the original; `cancel(...)` mirrors
  * the reference's SkipCase (iceberg_it.py:167-180) where a feature is
  * genuinely absent (uuid/time types, merge-on-read position deletes).
  * Bodies are re-expressed against the lake engine, not copied: the
  * reference drives `USING iceberg` through a session catalog; we drive
  * `USING lake` through the `lake` DSv2 catalog, with session-catalog
  * views/parquet sources where the original relies on Hive.
  */
class IcebergLikeSuiteIT extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: String = _
  private val db = "itdb"
  private def t(n: String) = s"lake.$db.$n"

  override def beforeAll(): Unit = {
    wh = java.nio.file.Files.createTempDirectory("lakeit_wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("iceberg-like-it")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .config("spark.sql.warehouse.dir", s"$wh/spark_warehouse")
      .withExtensions(new LakeExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = spark.sql(s)
  private def trySql(s: String): Either[String, DataFrame] =
    try Right(spark.sql(s)) catch { case e: Exception =>
      Left(Option(e.getMessage).getOrElse(e.toString)) }
  private def count(q: String): Long = sql(q).collect()(0).getLong(0)
  private def scalarStr(q: String): String = sql(q).collect()(0).getString(0)
  private def latestSnapshotId(tbl: String): Long =
    sql(s"SELECT snapshot_id FROM $tbl.snapshots ORDER BY committed_at DESC LIMIT 1")
      .collect()(0).getLong(0)
  private def unsupported(err: String): Boolean = {
    val e = err.toLowerCase
    Seq("unsupported_feature", "not supported", "does not support",
      "unsupported operation", "is not supported", "parse_syntax_error",
      "unsupported data type", "datatype").exists(e.contains)
  }

  // ----------------------------------------------------------------
  // 00_env
  // ----------------------------------------------------------------

  test("00_env/prepare") {
    sql(s"CREATE NAMESPACE IF NOT EXISTS lake.$db")
    for (vw <- Seq("sample_vw", "sample_vw_props", "cdc_changes",
        "sample_vw_if_not_exists", "sample_vw_with_metadata"))
      sql(s"DROP VIEW IF EXISTS $vw")
    for (tbl <- Seq("sample_unpart", "sample_part", "sample_ctas",
        "sample_rtas", "sample_alter", "sample_nested"))
      trySql(s"DROP TABLE IF EXISTS ${t(tbl)} PURGE")
  }

  test("00_env/seed_base_tables") {
    trySql(s"DROP TABLE IF EXISTS ${t("sample_unpart")} PURGE")
    sql(s"""CREATE TABLE ${t("sample_unpart")} (
        |  id bigint NOT NULL, data string) USING lake""".stripMargin)
    sql(s"INSERT INTO ${t("sample_unpart")} VALUES (1,'a'),(2,'b')")

    trySql(s"DROP TABLE IF EXISTS ${t("sample_part")} PURGE")
    sql(s"""CREATE TABLE ${t("sample_part")} (
        |  id bigint, data string, category string, ts timestamp)
        |USING lake
        |PARTITIONED BY (bucket(16, id), days(ts), category, truncate(4, data))
        |TBLPROPERTIES ('format-version'='2')""".stripMargin)
    sql(s"""INSERT INTO ${t("sample_part")} VALUES
        |(1, 'abcdefgh', 'c1', TIMESTAMP'2026-01-20 01:02:03'),
        |(2, 'abcdZZZZ', 'c2', TIMESTAMP'2026-01-21 01:02:03')""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("sample_part")}") == 2)
  }

  // ----------------------------------------------------------------
  // 10_ddl_core
  // ----------------------------------------------------------------

  test("10_ddl_core/create_table_as_select_basic") {
    sql(s"DROP TABLE IF EXISTS ${t("sample_ctas")}")
    sql(s"""CREATE TABLE ${t("sample_ctas")} USING lake
        |AS SELECT id, data FROM ${t("sample_unpart")}""".stripMargin)
    assert(sql(s"SELECT * FROM ${t("sample_ctas")} ORDER BY id").count() == 2)
  }

  test("10_ddl_core/create_table_as_select_with_props_and_partition") {
    sql(s"DROP TABLE IF EXISTS ${t("sample_ctas")}")
    sql(s"""CREATE TABLE ${t("sample_ctas")} USING lake
        |PARTITIONED BY (truncate(2, data))
        |TBLPROPERTIES ('key'='value')
        |AS SELECT id, data FROM ${t("sample_unpart")}""".stripMargin)
    val props = sql(s"SHOW TBLPROPERTIES ${t("sample_ctas")}").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("key").contains("value"), props.toString)
  }

  test("10_ddl_core/replace_table_as_select_existing_first") {
    sql(s"DROP TABLE IF EXISTS ${t("sample_rtas")}")
    sql(s"CREATE TABLE ${t("sample_rtas")} (id bigint, data string) USING lake")
    sql(s"""REPLACE TABLE ${t("sample_rtas")} USING lake
        |AS SELECT id, data FROM ${t("sample_unpart")} WHERE id = 1""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("sample_rtas")}") == 1)
  }

  test("10_ddl_core/create_or_replace_table_as_select") {
    sql(s"""CREATE OR REPLACE TABLE ${t("sample_rtas")} USING lake
        |AS SELECT id, data FROM ${t("sample_unpart")} WHERE id >= 1""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("sample_rtas")}") == 2)
  }

  test("10_ddl_core/create_table_with_comments") {
    val tbl = t("sample_with_comments")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  id bigint COMMENT 'Unique identifier',
        |  data string COMMENT 'Data payload',
        |  category string
        |) USING lake
        |COMMENT 'Sample table with comments for testing'""".stripMargin)
    val desc = sql(s"DESCRIBE TABLE EXTENDED $tbl").collect()
      .map(_.mkString("|")).mkString("\n")
    assert(desc.contains("Unique identifier"), desc)
    sql(s"DROP TABLE $tbl")
  }

  test("10_ddl_core/create_table_with_location") {
    val tbl = t("sample_with_location")
    sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = s"$wh/custom_location_${System.nanoTime()}"
    sql(s"CREATE TABLE $tbl (id bigint, data string) USING lake LOCATION '$loc'")
    sql(s"INSERT INTO $tbl VALUES (1, 'test')")
    assert(count(s"SELECT count(*) FROM $tbl") == 1)
    sql(s"DROP TABLE $tbl")
  }

  test("10_ddl_core/create_table_like_negative") {
    val newT = t("sample_like_test")
    trySql(s"DROP TABLE IF EXISTS $newT")
    trySql(s"CREATE TABLE $newT LIKE ${t("sample_unpart")}") match {
      case Left(_) => () // expected: CREATE TABLE LIKE unsupported, as reference
      case Right(_) =>
        trySql(s"DROP TABLE IF EXISTS $newT")
        cancel("CREATE TABLE LIKE succeeded unexpectedly")
    }
  }

  test("10_ddl_core/replace_table_with_partition_and_properties") {
    val tbl = t("sample_rtas_advanced")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (id bigint, data string, category string)
        |USING lake
        |TBLPROPERTIES ('old_prop'='old_value', 'common_prop'='original')""".stripMargin)
    sql(s"INSERT INTO $tbl VALUES (1, 'old', 'c1')")
    sql(s"""REPLACE TABLE $tbl USING lake
        |PARTITIONED BY (category)
        |TBLPROPERTIES ('new_prop'='new_value', 'common_prop'='updated')
        |AS SELECT id, data, category FROM ${t("sample_part")} WHERE id > 0""".stripMargin)
    assert(count(s"SELECT count(*) FROM $tbl") == 2)
    val props = sql(s"SHOW TBLPROPERTIES $tbl").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("common_prop").contains("updated"), props.toString)
  }

  test("10_ddl_core/alter_table_core_operations") {
    val tbl = t("sample_alter")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  id bigint NOT NULL, measurement int, data string,
        |  point struct<x: double, y: double>) USING lake""".stripMargin)
    sql(s"""ALTER TABLE $tbl SET TBLPROPERTIES (
        |  'read.split.target-size'='268435456', 'comment'='A table comment.')""".stripMargin)
    sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('read.split.target-size')")
    sql(s"ALTER TABLE $tbl ADD COLUMNS (new_column string comment 'docs')")
    sql(s"ALTER TABLE $tbl ADD COLUMN point.z double")
    sql(s"ALTER TABLE $tbl RENAME COLUMN data TO payload")
    sql(s"ALTER TABLE $tbl ALTER COLUMN measurement TYPE bigint")
    sql(s"ALTER TABLE $tbl ALTER COLUMN id DROP NOT NULL")
    sql(s"ALTER TABLE $tbl DROP COLUMN new_column")
    sql(s"ALTER TABLE $tbl DROP COLUMN point.z")
    val cols = spark.table(tbl).schema.fieldNames.toSeq
    assert(cols == Seq("id", "measurement", "payload", "point"), cols.toString)
  }

  test("10_ddl_core/alter_table_partition_evolution_and_write_order") {
    val tbl = t("sample_nested")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  id bigint NOT NULL, category string, data string, ts timestamp)
        |USING lake PARTITIONED BY (days(ts))""".stripMargin)
    sql(s"ALTER TABLE $tbl ADD PARTITION FIELD category")
    sql(s"ALTER TABLE $tbl ADD PARTITION FIELD bucket(16, id) AS shard")
    sql(s"ALTER TABLE $tbl ADD PARTITION FIELD truncate(4, data)")
    sql(s"ALTER TABLE $tbl ADD PARTITION FIELD year(ts)")
    sql(s"ALTER TABLE $tbl DROP PARTITION FIELD shard")
    trySql(s"ALTER TABLE $tbl REPLACE PARTITION FIELD ts_day WITH day(ts) AS day_of_ts") match {
      case Right(_) => ()
      case Left(e1) =>
        trySql(s"ALTER TABLE $tbl REPLACE PARTITION FIELD ts WITH day(ts) AS day_of_ts") match {
          case Right(_) => ()
          case Left(e2) => cancel(s"REPLACE PARTITION FIELD skipped: $e1; $e2")
        }
    }
    sql(s"ALTER TABLE $tbl WRITE ORDERED BY category ASC NULLS LAST, id DESC NULLS FIRST")
    sql(s"ALTER TABLE $tbl WRITE LOCALLY ORDERED BY category, id")
    sql(s"ALTER TABLE $tbl WRITE UNORDERED")
    sql(s"ALTER TABLE $tbl WRITE DISTRIBUTED BY PARTITION")
    sql(s"ALTER TABLE $tbl SET IDENTIFIER FIELDS id")
    sql(s"ALTER TABLE $tbl DROP IDENTIFIER FIELDS id")
  }

  test("10_ddl_core/alter_table_rename") {
    val oldT = t("sample_rename_old")
    val newT = t("sample_rename_new")
    sql(s"DROP TABLE IF EXISTS $oldT")
    sql(s"DROP TABLE IF EXISTS $newT")
    sql(s"CREATE TABLE $oldT (id bigint, data string) USING lake")
    sql(s"INSERT INTO $oldT VALUES (1, 'test')")
    sql(s"ALTER TABLE $oldT RENAME TO lake.$db.sample_rename_new")
    assert(count(s"SELECT count(*) FROM $newT") == 1)
    sql(s"ALTER TABLE $newT RENAME TO lake.$db.sample_rename_old")
    sql(s"DROP TABLE $oldT")
  }

  test("10_ddl_core/alter_column_comment") {
    val tbl = t("sample_alter_comment")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  id bigint COMMENT 'Original comment', data string) USING lake""".stripMargin)
    trySql(s"ALTER TABLE $tbl ALTER COLUMN id COMMENT 'Updated comment'") match {
      case Left(e) if unsupported(e) => cancel(s"ALTER COLUMN COMMENT not supported: $e")
      case Left(e) => fail(s"ALTER COLUMN COMMENT failed unexpectedly: $e")
      case Right(_) =>
        val desc = sql(s"DESCRIBE TABLE $tbl").collect().map(_.mkString("|")).mkString("\n")
        assert(desc.contains("Updated comment"), desc)
    }
    sql(s"DROP TABLE $tbl")
  }

  test("10_ddl_core/drop_table_and_purge") {
    val tbl = t("tmp_drop")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint) USING lake")
    sql(s"DROP TABLE $tbl")
    sql(s"CREATE TABLE $tbl (id bigint) USING lake")
    sql(s"DROP TABLE $tbl PURGE")
    assert(trySql(s"SELECT * FROM $tbl").isLeft)
  }

  // ----------------------------------------------------------------
  // 11_ddl_views (session-catalog views over lake tables; the
  // reference's Hive-session views map to Spark's catalog views here)
  // ----------------------------------------------------------------

  test("11_ddl_views/create_view_and_alter_view") {
    val base = t("sample_unpart")
    sql("DROP VIEW IF EXISTS sample_vw")
    sql("DROP VIEW IF EXISTS sample_vw_props")
    sql(s"CREATE VIEW sample_vw AS SELECT * FROM $base")
    sql(s"""CREATE VIEW sample_vw_props
        |TBLPROPERTIES ('key1'='val1','key2'='val2')
        |AS SELECT * FROM $base""".stripMargin)
    sql("SHOW TBLPROPERTIES sample_vw_props").collect()
    assert(sql("SHOW VIEWS").collect().map(_.getString(1)).contains("sample_vw"))
    sql("SHOW CREATE TABLE sample_vw").collect()
    sql("DESCRIBE EXTENDED sample_vw").collect()
    sql("DROP VIEW sample_vw_props")
    sql(s"""CREATE OR REPLACE VIEW sample_vw
        |TBLPROPERTIES ('key1'='new_val1')
        |AS SELECT id FROM $base""".stripMargin)
    sql("ALTER VIEW sample_vw SET TBLPROPERTIES ('key1'='val3','key4'='val4')")
    sql("ALTER VIEW sample_vw UNSET TBLPROPERTIES ('key4')")
    assert(sql("SELECT * FROM sample_vw").columns.toSeq == Seq("id"))
  }

  test("11_ddl_views/create_view_if_not_exists") {
    val base = t("sample_unpart")
    sql("DROP VIEW IF EXISTS sample_vw_if_not_exists")
    sql(s"CREATE VIEW IF NOT EXISTS sample_vw_if_not_exists AS SELECT * FROM $base")
    sql(s"CREATE VIEW IF NOT EXISTS sample_vw_if_not_exists AS SELECT id FROM $base")
    // original definition preserved
    assert(sql("SELECT * FROM sample_vw_if_not_exists").columns.length == 2)
    sql("DROP VIEW sample_vw_if_not_exists")
  }

  test("11_ddl_views/create_view_with_comments_and_aliases") {
    val base = t("sample_unpart")
    sql("DROP VIEW IF EXISTS sample_vw_with_metadata")
    trySql(s"""CREATE VIEW sample_vw_with_metadata
        |(identifier COMMENT 'The ID', payload COMMENT 'The data')
        |COMMENT 'View with column aliases and comments'
        |AS SELECT id AS identifier, data AS payload FROM $base""".stripMargin) match {
      case Left(e) if unsupported(e) => cancel(s"view column comments not supported: $e")
      case Left(e) => fail(s"failed to create view with metadata: $e")
      case Right(_) =>
        assert(sql("SELECT * FROM sample_vw_with_metadata").columns.toSeq ==
          Seq("identifier", "payload"))
        sql("DROP VIEW sample_vw_with_metadata")
    }
  }

  // ----------------------------------------------------------------
  // 12_ddl_branch_tag
  // ----------------------------------------------------------------

  test("12_ddl_branch_tag/create_branch_with_if_not_exists") {
    val tbl = t("sample_part")
    val b = "test_branch_if_not_exists"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH IF NOT EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH IF NOT EXISTS `$b`")
    assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$b'").count() == 1)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("12_ddl_branch_tag/create_or_replace_branch") {
    val tbl = t("sample_part")
    val b = "test_branch_cor"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"ALTER TABLE $tbl CREATE OR REPLACE BRANCH `$b`")
    assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$b'").count() == 1)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("12_ddl_branch_tag/create_branch_as_of_version") {
    val tbl = t("sample_part")
    val b = "test_branch_as_of"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    val sid = latestSnapshotId(tbl)
    trySql(s"ALTER TABLE $tbl CREATE BRANCH `$b` AS OF VERSION $sid") match {
      case Left(e) if unsupported(e) => cancel(s"CREATE BRANCH AS OF VERSION: $e")
      case Left(e) => fail(e)
      case Right(_) =>
        assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$b'").count() == 1)
        sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
    }
  }

  test("12_ddl_branch_tag/replace_branch") {
    val tbl = t("sample_part")
    val b = "test_branch_replace"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"""INSERT INTO $tbl.branch_$b
        |VALUES (9001, 'replace_test', 'c1', TIMESTAMP'2026-02-10 00:00:00')""".stripMargin)
    trySql(s"ALTER TABLE $tbl REPLACE BRANCH `$b`") match {
      case Right(_) => ()
      case Left(e1) =>
        trySql(s"ALTER TABLE $tbl CREATE OR REPLACE BRANCH `$b`") match {
          case Right(_) => ()
          case Left(e2) if unsupported(e1) || unsupported(e2) =>
            cancel(s"REPLACE BRANCH not supported: $e1; $e2")
          case Left(e2) => fail(s"REPLACE BRANCH failed: $e1; $e2")
        }
    }
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("12_ddl_branch_tag/drop_branch_if_exists") {
    val tbl = t("sample_part")
    val b = "test_branch_drop"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
  }

  test("12_ddl_branch_tag/create_tag_with_if_not_exists") {
    val tbl = t("sample_part")
    val tag = "test_tag_if_not_exists"
    trySql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    val sid = latestSnapshotId(tbl)
    sql(s"ALTER TABLE $tbl CREATE TAG IF NOT EXISTS `$tag` AS OF VERSION $sid")
    sql(s"ALTER TABLE $tbl CREATE TAG IF NOT EXISTS `$tag` AS OF VERSION $sid")
    assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$tag'").count() == 1)
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
  }

  test("12_ddl_branch_tag/create_or_replace_tag") {
    val tbl = t("sample_part")
    val tag = "test_tag_cor"
    trySql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    val sid = latestSnapshotId(tbl)
    sql(s"ALTER TABLE $tbl CREATE TAG `$tag` AS OF VERSION $sid")
    sql(s"ALTER TABLE $tbl CREATE OR REPLACE TAG `$tag` AS OF VERSION $sid")
    assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$tag'").count() == 1)
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
  }

  test("12_ddl_branch_tag/drop_tag_if_exists") {
    val tbl = t("sample_part")
    val tag = "test_tag_drop"
    val sid = latestSnapshotId(tbl)
    trySql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    sql(s"ALTER TABLE $tbl CREATE TAG `$tag` AS OF VERSION $sid")
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
  }

  test("12_ddl_branch_tag/create_branch_with_retention") {
    val tbl = t("sample_part")
    val b = "test_branch_retention"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    trySql(s"ALTER TABLE $tbl CREATE BRANCH `$b` RETAIN 7 DAYS") match {
      case Right(_) => ()
      case Left(e1) =>
        trySql(s"ALTER TABLE $tbl CREATE BRANCH `$b` WITH SNAPSHOT RETENTION 7 DAYS") match {
          case Right(_) => ()
          case Left(e2) => cancel(s"branch retention syntax not supported: $e1; $e2")
        }
    }
    assert(sql(s"SELECT * FROM $tbl.refs WHERE name = '$b'").count() == 1)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  // ----------------------------------------------------------------
  // 15_ddl_data_types
  // ----------------------------------------------------------------

  private def typeTable(name: String, colDef: String, inserts: String,
      expectRows: Long, extraChecks: String => Unit = _ => ()): Unit = {
    val tbl = t(name)
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, $colDef) USING lake")
    sql(s"INSERT INTO $tbl VALUES $inserts")
    assert(count(s"SELECT count(*) FROM $tbl") == expectRows)
    extraChecks(tbl)
    sql(s"DROP TABLE $tbl")
  }

  test("15_ddl_data_types/create_boolean_table") {
    typeTable("test_boolean_table", "bool_col boolean",
      "(1, true), (2, false), (3, NULL)", 3, tbl => {
        assert(count(s"SELECT count(*) FROM $tbl WHERE bool_col = true") == 1)
        assert(count(s"SELECT count(*) FROM $tbl WHERE bool_col = false") == 1)
      })
  }

  test("15_ddl_data_types/create_byte_table") {
    typeTable("test_byte_table", "byte_col tinyint",
      "(1, 127), (2, -128), (3, 0), (4, NULL)", 4, tbl => {
        assert(sql(s"SELECT byte_col FROM $tbl WHERE id = 1").collect()(0).getByte(0) == 127)
        assert(sql(s"SELECT byte_col FROM $tbl WHERE id = 2").collect()(0).getByte(0) == -128)
      })
  }

  test("15_ddl_data_types/create_short_table") {
    typeTable("test_short_table", "short_col smallint",
      "(1, 32767), (2, -32768), (3, 0), (4, NULL)", 4, tbl => {
        assert(sql(s"SELECT short_col FROM $tbl WHERE id = 1").collect()(0).getShort(0) == 32767)
      })
  }

  test("15_ddl_data_types/create_integer_table") {
    typeTable("test_integer_table", "int_col int",
      "(1, 2147483647), (2, -2147483648), (3, 0), (4, NULL)", 4, tbl => {
        assert(sql(s"SELECT int_col FROM $tbl WHERE id = 1").collect()(0).getInt(0) == Int.MaxValue)
      })
  }

  test("15_ddl_data_types/create_long_table") {
    typeTable("test_long_table", "long_col bigint",
      "(1, 9223372036854775807), (2, -9223372036854775808), (3, 0), (4, NULL)", 4, tbl => {
        assert(sql(s"SELECT long_col FROM $tbl WHERE id = 1").collect()(0).getLong(0) == Long.MaxValue)
      })
  }

  test("15_ddl_data_types/create_float_table") {
    typeTable("test_float_table", "float_col float",
      "(1, 3.14159), (2, -2.71828), (3, 0.0), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_double_table") {
    typeTable("test_double_table", "double_col double",
      "(1, 3.141592653589793), (2, -2.718281828459045), (3, 0.0), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_decimal_table") {
    typeTable("test_decimal_table", "decimal_col decimal(10, 2)",
      "(1, 12345.67), (2, -9999.99), (3, 0.00), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_date_table") {
    typeTable("test_date_table", "date_col date",
      "(1, DATE '2024-01-15'), (2, DATE '1970-01-01'), (3, DATE '2999-12-31'), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_timestamp_table") {
    typeTable("test_timestamp_table", "timestamp_col timestamp",
      "(1, TIMESTAMP '2024-01-15 12:30:45'), (2, TIMESTAMP '1970-01-01 00:00:00'), " +
        "(3, TIMESTAMP '2999-12-31 23:59:59'), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_char_table") {
    typeTable("test_char_table", "char_col char(10)",
      "(1, 'hello'), (2, 'test'), (3, 'a'), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_varchar_table") {
    typeTable("test_varchar_table", "varchar_col varchar(50)",
      "(1, 'hello world'), (2, 'test varchar'), (3, 'a'), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_string_table") {
    typeTable("test_string_table", "string_col string",
      "(1, 'hello world'), (2, 'test string with a longer text'), (3, ''), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_binary_table") {
    typeTable("test_binary_table", "binary_col binary",
      "(1, CAST('hello' AS BINARY)), (2, CAST('world' AS BINARY)), " +
        "(3, CAST('' AS BINARY)), (4, NULL)", 4)
  }

  test("15_ddl_data_types/create_uuid_table") {
    val tbl = t("test_uuid_table")
    sql(s"DROP TABLE IF EXISTS $tbl")
    trySql(s"CREATE TABLE $tbl (id bigint, uuid_col uuid) USING lake") match {
      case Left(e) => cancel(s"UUID type not supported: $e") // matches reference SKIP
      case Right(_) =>
        trySql(s"INSERT INTO $tbl VALUES (1, uuid()), (2, uuid()), (3, NULL)") match {
          case Left(e) => cancel(s"UUID function not supported: $e")
          case Right(_) =>
            assert(count(s"SELECT count(*) FROM $tbl") == 3)
            sql(s"DROP TABLE $tbl")
        }
    }
  }

  test("15_ddl_data_types/create_fixed_table") {
    val tbl = t("test_fixed_table")
    sql(s"DROP TABLE IF EXISTS $tbl")
    trySql(s"""CREATE TABLE $tbl (id bigint, fixed_col binary) USING lake
        |TBLPROPERTIES ('format-version'='2')""".stripMargin) match {
      case Left(e) => cancel(s"fixed binary not supported: $e")
      case Right(_) =>
        sql(s"INSERT INTO $tbl VALUES (1, CAST('12345' AS BINARY)), " +
          "(2, CAST('abcde' AS BINARY)), (3, NULL)")
        assert(count(s"SELECT count(*) FROM $tbl") == 3)
        sql(s"DROP TABLE $tbl")
    }
  }

  test("15_ddl_data_types/create_struct_table") {
    typeTable("test_struct_table",
      "struct_col struct<name: string, age: int, city: string>",
      "(1, named_struct('name', 'Alice', 'age', 30, 'city', 'NYC')), " +
        "(2, named_struct('name', 'Bob', 'age', 25, 'city', 'SF')), (3, NULL)", 3,
      tbl => assert(sql(s"SELECT struct_col.name FROM $tbl WHERE id = 1")
        .collect()(0).getString(0) == "Alice"))
  }

  test("15_ddl_data_types/create_array_table") {
    typeTable("test_array_table", "array_col array<string>",
      "(1, array('apple', 'banana', 'cherry')), (2, array('red', 'green', 'blue')), " +
        "(3, array()), (4, NULL)", 4,
      tbl => assert(sql(s"SELECT size(array_col) FROM $tbl WHERE id = 1")
        .collect()(0).getInt(0) == 3))
  }

  test("15_ddl_data_types/create_map_table") {
    val tbl = t("test_map_table")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, map_col map<string, int>) USING lake")
    sql(s"INSERT INTO $tbl VALUES (1, map('key1', 100, 'key2', 200))")
    sql(s"INSERT INTO $tbl VALUES (2, map('a', 1, 'b', 2, 'c', 3))")
    sql(s"INSERT INTO $tbl SELECT 3, map_from_arrays(array(), array())")
    sql(s"INSERT INTO $tbl VALUES (4, NULL)")
    assert(count(s"SELECT count(*) FROM $tbl") == 4)
    assert(sql(s"SELECT size(map_col) FROM $tbl WHERE id = 2").collect()(0).getInt(0) == 3)
    sql(s"DROP TABLE $tbl")
  }

  test("15_ddl_data_types/create_variant_table") {
    val tbl = t("test_variant_table")
    sql(s"DROP TABLE IF EXISTS $tbl")
    trySql(s"CREATE TABLE $tbl (id bigint, variant_col variant) USING lake") match {
      case Left(e) => cancel(s"VARIANT type not supported: $e")
      case Right(_) =>
        trySql(s"""INSERT INTO $tbl VALUES
            |(1, parse_json('"hello"')), (2, parse_json('123')),
            |(3, parse_json('{"key": "value"}')), (4, NULL)""".stripMargin) match {
          case Left(e) => cancel(s"VARIANT operations not supported: $e")
          case Right(_) =>
            assert(count(s"SELECT count(*) FROM $tbl") == 4)
            sql(s"DROP TABLE $tbl")
        }
    }
  }

  test("15_ddl_data_types/create_time_table") {
    val tbl = t("test_time_table")
    sql(s"DROP TABLE IF EXISTS $tbl")
    trySql(s"CREATE TABLE $tbl (id bigint, time_col time) USING lake") match {
      case Left(e) => cancel(s"TIME type not supported: $e")
      case Right(_) =>
        trySql(s"INSERT INTO $tbl VALUES (1, TIME '12:30:45'), " +
          "(2, TIME '00:00:00'), (3, TIME '23:59:59'), (4, NULL)") match {
          case Left(e) => cancel(s"TIME operations not supported: $e")
          case Right(_) =>
            assert(count(s"SELECT count(*) FROM $tbl") == 4)
            sql(s"DROP TABLE $tbl")
        }
    }
  }

  // ----------------------------------------------------------------
  // 20_writes_sql_core
  // ----------------------------------------------------------------

  test("20_writes_sql_core/insert_into_and_insert_select") {
    sql(s"DROP TABLE IF EXISTS ${t("write_target")}")
    sql(s"DROP TABLE IF EXISTS ${t("write_source")}")
    sql(s"CREATE TABLE ${t("write_target")} (id bigint, data string) USING lake")
    sql(s"CREATE TABLE ${t("write_source")} (id bigint, data string) USING lake")
    sql(s"INSERT INTO ${t("write_target")} VALUES (1,'a'),(2,'b')")
    sql(s"INSERT INTO ${t("write_source")} VALUES (3,'c'),(4,'d')")
    sql(s"INSERT INTO ${t("write_target")} SELECT * FROM ${t("write_source")}")
    assert(count(s"SELECT count(*) FROM ${t("write_target")}") == 4)
  }

  test("20_writes_sql_core/insert_overwrite_dynamic_and_static") {
    sql(s"DROP TABLE IF EXISTS ${t("logs")}")
    sql(s"""CREATE TABLE ${t("logs")} (
        |  uuid string NOT NULL, level string NOT NULL,
        |  ts timestamp NOT NULL, message string)
        |USING lake PARTITIONED BY (level, hours(ts))""".stripMargin)
    sql(s"""INSERT INTO ${t("logs")} VALUES
        |('u1','INFO', TIMESTAMP'2026-01-01 01:00:00','m1'),
        |('u2','INFO', TIMESTAMP'2026-01-01 01:00:00','m2'),
        |('u3','INFO', TIMESTAMP'2026-01-01 02:00:00','m3'),
        |('u4','WARN', TIMESTAMP'2026-01-01 01:00:00','m4'),
        |('u5','INFO', TIMESTAMP'2026-01-02 01:00:00','m5')""".stripMargin)
    sql("SET spark.sql.sources.partitionOverwriteMode=dynamic")
    sql(s"""INSERT OVERWRITE ${t("logs")}
        |SELECT uuid, level, ts, message FROM ${t("logs")}
        |WHERE level = 'INFO' AND cast(ts as date) = DATE'2026-01-01'""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("logs")}") > 0,
      "dynamic overwrite should not produce an empty table")
    sql("SET spark.sql.sources.partitionOverwriteMode=static")
    sql(s"""INSERT OVERWRITE ${t("logs")}
        |SELECT uuid, level, ts, message FROM ${t("logs")}
        |WHERE level = 'WARN'""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("logs")}") == 1)
  }

  test("20_writes_sql_core/delete_and_update") {
    sql(s"DROP TABLE IF EXISTS ${t("write_target")}")
    sql(s"CREATE TABLE ${t("write_target")} (id bigint, v int) USING lake")
    sql(s"INSERT INTO ${t("write_target")} VALUES (1,10),(2,20),(3,30)")
    sql(s"DELETE FROM ${t("write_target")} WHERE id = 1")
    assert(count(s"SELECT count(*) FROM ${t("write_target")}") == 2)
    sql(s"UPDATE ${t("write_target")} SET v = 999 WHERE id = 2")
    assert(sql(s"SELECT v FROM ${t("write_target")} WHERE id=2")
      .collect()(0).getInt(0) == 999)
  }

  // ----------------------------------------------------------------
  // 21_writes_sql_merge
  // ----------------------------------------------------------------

  test("21_writes_sql_merge/merge_into_basic") {
    sql(s"DROP TABLE IF EXISTS ${t("write_target")}")
    sql(s"DROP TABLE IF EXISTS ${t("write_source")}")
    sql(s"CREATE TABLE ${t("write_target")} (id bigint NOT NULL, data string, cnt int) USING lake")
    sql(s"INSERT INTO ${t("write_target")} VALUES (1,'a',10),(2,'b',20)")
    sql(s"CREATE TABLE ${t("write_source")} (id bigint, data string, cnt int, op string) USING lake")
    sql(s"INSERT INTO ${t("write_source")} VALUES (1,'a2',11,'update'),(3,'c',30,'insert')")
    sql(s"""MERGE INTO ${t("write_target")} t
        |USING (SELECT id, data, cnt, op FROM ${t("write_source")}) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'update' THEN UPDATE SET t.data = s.data, t.cnt = s.cnt
        |WHEN NOT MATCHED THEN INSERT (id, data, cnt) VALUES (s.id, s.data, s.cnt)""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("write_target")}") == 3)
    assert(scalarStr(s"SELECT data FROM ${t("write_target")} WHERE id=1") == "a2")
    assert(scalarStr(s"SELECT data FROM ${t("write_target")} WHERE id=3") == "c")
  }

  test("21_writes_sql_merge/merge_with_matched_delete") {
    sql(s"DROP TABLE IF EXISTS ${t("merge_del_target")}")
    sql(s"DROP TABLE IF EXISTS ${t("merge_del_source")}")
    sql(s"CREATE TABLE ${t("merge_del_target")} (id bigint, data string, status string) USING lake")
    sql(s"INSERT INTO ${t("merge_del_target")} VALUES (1,'a','active'),(2,'b','active'),(3,'c','inactive')")
    sql(s"CREATE TABLE ${t("merge_del_source")} (id bigint, status string) USING lake")
    sql(s"INSERT INTO ${t("merge_del_source")} VALUES (1,'delete'),(2,'keep')")
    sql(s"""MERGE INTO ${t("merge_del_target")} t
        |USING ${t("merge_del_source")} s
        |ON t.id = s.id
        |WHEN MATCHED AND s.status = 'delete' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.status = s.status""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("merge_del_target")}") == 2)
    assert(count(s"SELECT count(*) FROM ${t("merge_del_target")} WHERE id=1") == 0)
    assert(scalarStr(s"SELECT status FROM ${t("merge_del_target")} WHERE id=2") == "keep")
  }

  test("21_writes_sql_merge/merge_multiple_matched_clauses") {
    sql(s"DROP TABLE IF EXISTS ${t("merge_multi_target")}")
    sql(s"DROP TABLE IF EXISTS ${t("merge_multi_source")}")
    sql(s"CREATE TABLE ${t("merge_multi_target")} (id bigint, data string, value int) USING lake")
    sql(s"INSERT INTO ${t("merge_multi_target")} VALUES (1,'a',10),(2,'b',20),(3,'c',30)")
    sql(s"CREATE TABLE ${t("merge_multi_source")} (id bigint, op string, value int) USING lake")
    sql(s"INSERT INTO ${t("merge_multi_source")} VALUES (1,'delete',0),(2,'update',99),(3,'noop',0)")
    sql(s"""MERGE INTO ${t("merge_multi_target")} t
        |USING ${t("merge_multi_source")} s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'delete' THEN DELETE
        |WHEN MATCHED AND s.op = 'update' THEN UPDATE SET t.value = s.value
        |WHEN NOT MATCHED THEN INSERT (id, data, value) VALUES (s.id, 'new', s.value)""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("merge_multi_target")}") == 2)
    assert(count(s"SELECT count(*) FROM ${t("merge_multi_target")} WHERE id=1") == 0)
    assert(sql(s"SELECT value FROM ${t("merge_multi_target")} WHERE id=2")
      .collect()(0).getInt(0) == 99)
  }

  test("21_writes_sql_merge/merge_not_matched_by_source") {
    sql(s"DROP TABLE IF EXISTS ${t("merge_source_target")}")
    sql(s"DROP TABLE IF EXISTS ${t("merge_source_src")}")
    sql(s"CREATE TABLE ${t("merge_source_target")} (id bigint, status string) USING lake")
    sql(s"INSERT INTO ${t("merge_source_target")} VALUES (1,'old'),(2,'old'),(3,'old')")
    sql(s"CREATE TABLE ${t("merge_source_src")} (id bigint, status string) USING lake")
    sql(s"INSERT INTO ${t("merge_source_src")} VALUES (1,'new')")
    sql(s"""MERGE INTO ${t("merge_source_target")} t
        |USING ${t("merge_source_src")} s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.status = s.status
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.status = 'archived'""".stripMargin)
    assert(scalarStr(s"SELECT status FROM ${t("merge_source_target")} WHERE id=1") == "new")
    assert(count(s"SELECT count(*) FROM ${t("merge_source_target")} WHERE status='archived'") == 2)
  }

  // ----------------------------------------------------------------
  // 22_writes_sql_branch
  // ----------------------------------------------------------------

  test("22_writes_sql_branch/update_on_branch") {
    val tbl = t("sample_part")
    val b = "update_test_branch"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (701,'before_update','c1',TIMESTAMP'2026-02-07 00:00:00')")
    sql(s"UPDATE $tbl.branch_$b SET data='after_update' WHERE id=701")
    assert(scalarStr(s"SELECT data FROM $tbl.branch_$b WHERE id=701") == "after_update")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id=701") == 0,
      "main must not see the branch write")
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("22_writes_sql_branch/delete_on_branch") {
    val tbl = t("sample_part")
    val b = "delete_test_branch"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (702,'to_delete','c1',TIMESTAMP'2026-02-07 01:00:00')")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (703,'to_keep','c1',TIMESTAMP'2026-02-07 02:00:00')")
    sql(s"DELETE FROM $tbl.branch_$b WHERE id=702")
    assert(count(s"SELECT count(*) FROM $tbl.branch_$b WHERE id IN (702,703)") == 1)
    assert(count(s"SELECT count(*) FROM $tbl.branch_$b WHERE id=702") == 0)
    assert(count(s"SELECT count(*) FROM $tbl WHERE id IN (702,703)") == 0)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("22_writes_sql_branch/merge_into_on_branch") {
    val tbl = t("sample_part")
    val b = "merge_test_branch"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"DROP TABLE IF EXISTS ${t("branch_merge_source")}")
    sql(s"CREATE TABLE ${t("branch_merge_source")} (id bigint, data string, category string, ts timestamp) USING lake")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (704,'original','c1',TIMESTAMP'2026-02-07 03:00:00')")
    sql(s"INSERT INTO ${t("branch_merge_source")} VALUES " +
      "(704,'merged','c1',TIMESTAMP'2026-02-07 04:00:00')," +
      "(705,'new','c1',TIMESTAMP'2026-02-07 05:00:00')")
    sql(s"""MERGE INTO $tbl.branch_$b t
        |USING ${t("branch_merge_source")} s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.data = s.data
        |WHEN NOT MATCHED THEN INSERT (id, data, category, ts) VALUES (s.id, s.data, s.category, s.ts)""".stripMargin)
    assert(count(s"SELECT count(*) FROM $tbl.branch_$b WHERE id IN (704,705)") == 2)
    assert(scalarStr(s"SELECT data FROM $tbl.branch_$b WHERE id=704") == "merged")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id IN (704,705)") == 0)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
    sql(s"DROP TABLE IF EXISTS ${t("branch_merge_source")}")
  }

  // ----------------------------------------------------------------
  // 23_writes_wap
  // ----------------------------------------------------------------

  test("23_writes_wap/writes_to_branch_and_wap") {
    val tbl = t("sample_part")
    sql(s"ALTER TABLE $tbl CREATE OR REPLACE BRANCH `audit_branch`")
    sql(s"INSERT INTO $tbl.branch_audit_branch VALUES (100, 'branchdata', 'c9', TIMESTAMP'2026-02-01 00:00:00')")
    assert(count(s"SELECT count(*) FROM $tbl.branch_audit_branch WHERE id = 100") == 1)
    sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.conf.set("spark.wap.branch", "audit_branch")
    try sql(s"INSERT INTO $tbl VALUES (101, 'wapdata', 'c9', TIMESTAMP'2026-02-01 00:01:00')")
    finally spark.conf.unset("spark.wap.branch")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 101") == 0,
      "WAP write must land on the branch, not main")
    assert(count(s"SELECT count(*) FROM $tbl.branch_audit_branch WHERE id = 101") == 1)
  }

  // ----------------------------------------------------------------
  // 30_writes_dfv2_core
  // ----------------------------------------------------------------

  private def dfv2Src(): Unit = {
    val sp = spark; import sp.implicits._
    Seq((10L, "x"), (11L, "y")).toDF("id", "data")
      .createOrReplaceTempView("tmp_dfv2_src")
  }

  test("30_writes_dfv2_core/dfv2_create_table") {
    dfv2Src()
    sql(s"DROP TABLE IF EXISTS ${t("df_v2_target")}")
    spark.table("tmp_dfv2_src").writeTo(t("df_v2_target")).using("lake").create()
    assert(count(s"SELECT count(*) FROM ${t("df_v2_target")}") == 2)
  }

  test("30_writes_dfv2_core/dfv2_replace_table") {
    sql(s"CREATE TABLE IF NOT EXISTS ${t("df_v2_target")} (id bigint, data string) USING lake")
    dfv2Src()
    try {
      spark.table("tmp_dfv2_src").writeTo(t("df_v2_target")).replace()
      assert(count(s"SELECT count(*) FROM ${t("df_v2_target")}") == 2)
    } catch {
      case e: Exception if unsupported(Option(e.getMessage).getOrElse("")) =>
        cancel(s"dfv2 replace() not supported: ${e.getMessage}")
    }
  }

  test("30_writes_dfv2_core/dfv2_create_or_replace") {
    dfv2Src()
    spark.table("tmp_dfv2_src").writeTo(t("df_v2_target")).using("lake").createOrReplace()
    assert(count(s"SELECT count(*) FROM ${t("df_v2_target")}") == 2)
  }

  test("30_writes_dfv2_core/dfv2_append") {
    val sp = spark; import sp.implicits._
    Seq((12L, "z")).toDF("id", "data").writeTo(t("df_v2_target")).append()
    assert(count(s"SELECT count(*) FROM ${t("df_v2_target")}") == 3)
  }

  test("30_writes_dfv2_core/dfv2_overwrite_partitions") {
    val sp = spark; import sp.implicits._
    val before = count(s"SELECT count(*) FROM ${t("sample_part")}")
    Seq((999L, "op", "c1", "2026-03-01 00:00:00")).toDF("id", "data", "category", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .writeTo(t("sample_part")).overwritePartitions()
    assert(count(s"SELECT count(*) FROM ${t("sample_part")} WHERE id = 999") == 1)
  }

  // ----------------------------------------------------------------
  // 31_writes_df_advanced
  // ----------------------------------------------------------------

  test("31_writes_df_advanced/dfv2_overwrite_by_filter") {
    val sp = spark; import sp.implicits._
    val tbl = t("logs")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  uuid string NOT NULL, level string NOT NULL,
        |  ts timestamp NOT NULL, message string)
        |USING lake PARTITIONED BY (level)""".stripMargin)
    sql(s"""INSERT INTO $tbl VALUES
        |('u1','INFO', TIMESTAMP'2026-01-01 01:00:00','m1'),
        |('u2','INFO', TIMESTAMP'2026-01-01 02:00:00','m2'),
        |('u3','WARN', TIMESTAMP'2026-01-01 03:00:00','m3'),
        |('u4','ERROR', TIMESTAMP'2026-01-01 04:00:00','m4')""".stripMargin)
    Seq(("u99", "INFO", "2026-01-02 00:00:00", "overwritten"))
      .toDF("uuid", "level", "ts", "message")
      .withColumn("ts", to_timestamp(col("ts")))
      .writeTo(tbl).overwrite(col("level") === "INFO")
    assert(count(s"SELECT count(*) FROM $tbl WHERE level='INFO'") == 1)
    assert(count(s"SELECT count(*) FROM $tbl WHERE level='WARN'") == 1)
    assert(count(s"SELECT count(*) FROM $tbl WHERE level='ERROR'") == 1)
    assert(scalarStr(s"SELECT message FROM $tbl WHERE level='INFO'") == "overwritten")
  }

  test("31_writes_df_advanced/dfv2_schema_merge") {
    val sp = spark; import sp.implicits._
    val tbl = t("schema_merge_tbl")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, name string) USING lake")
    sql(s"INSERT INTO $tbl VALUES (1,'Alice'),(2,'Bob')")
    sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.spark.accept-any-schema'='true')")
    Seq((3L, "Charlie", 30), (4L, "Diana", 25)).toDF("id", "name", "age")
      .writeTo(tbl).option("mergeSchema", "true").append()
    assert(count(s"SELECT count(*) FROM $tbl") == 4)
    assert(spark.table(tbl).schema.fieldNames.contains("age"))
    assert(sql(s"SELECT age FROM $tbl WHERE id=1").collect()(0).isNullAt(0),
      "old rows must read NULL for the merged-in column")
    assert(sql(s"SELECT age FROM $tbl WHERE id=3").collect()(0).getInt(0) == 30)
  }

  // ----------------------------------------------------------------
  // 40_queries_metadata / time_travel / refs
  // ----------------------------------------------------------------

  test("40_queries_metadata/query_metadata_tables") {
    val tbl = t("sample_part")
    for (m <- Seq("history", "metadata_log_entries", "snapshots", "entries",
        "files", "manifests", "partitions", "refs", "all_data_files",
        "all_delete_files", "all_entries", "all_manifests"))
      sql(s"SELECT * FROM $tbl.$m LIMIT 20").collect()
  }

  test("40_queries_metadata/query_data_files_metadata") {
    assert(sql(s"SELECT * FROM ${t("sample_part")}.data_files LIMIT 20").count() > 0)
  }

  test("40_queries_metadata/query_delete_files_metadata") {
    sql(s"SELECT * FROM ${t("sample_part")}.delete_files LIMIT 20").collect()
  }

  test("40_queries_metadata/query_all_files_metadata") {
    assert(sql(s"SELECT * FROM ${t("sample_part")}.all_files LIMIT 20").count() > 0)
  }

  test("40_queries_time_travel/time_travel_basic") {
    val tbl = t("sample_part")
    sql(s"INSERT INTO $tbl VALUES (200,'tt','c1',TIMESTAMP'2026-02-02 00:00:00')")
    val ts = sql(s"SELECT made_current_at FROM $tbl.history ORDER BY made_current_at DESC LIMIT 1")
      .collect()(0).getTimestamp(0).toString
    val sid = latestSnapshotId(tbl)
    assert(sql(s"SELECT * FROM $tbl TIMESTAMP AS OF '$ts' LIMIT 10").count() > 0)
    assert(sql(s"SELECT * FROM $tbl VERSION AS OF $sid LIMIT 10").count() > 0)
    assert(sql(s"SELECT * FROM $tbl FOR SYSTEM_TIME AS OF '$ts' LIMIT 10").count() > 0)
    assert(sql(s"SELECT * FROM $tbl FOR SYSTEM_VERSION AS OF $sid LIMIT 10").count() > 0)
  }

  test("40_queries_time_travel/time_travel_on_metadata_tables") {
    val tbl = t("sample_part")
    val ts = sql(s"SELECT made_current_at FROM $tbl.history ORDER BY made_current_at DESC LIMIT 1")
      .collect()(0).getTimestamp(0).toString
    val sid = latestSnapshotId(tbl)
    sql(s"SELECT * FROM $tbl.manifests TIMESTAMP AS OF '$ts' LIMIT 10").collect()
    sql(s"SELECT * FROM $tbl.partitions VERSION AS OF $sid LIMIT 10").collect()
  }

  test("40_queries_time_travel/time_travel_with_branch_string") {
    val tbl = t("sample_part")
    val b = "test_query_branch"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (300, 'branch_data', 'c1', TIMESTAMP'2026-02-03 00:00:00')")
    assert(sql(s"SELECT * FROM $tbl VERSION AS OF '$b' WHERE id = 300 LIMIT 10").count() == 1)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("40_queries_time_travel/time_travel_with_tag_string") {
    val tbl = t("sample_part")
    val tag = "test_query_tag"
    trySql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    val sid = latestSnapshotId(tbl)
    sql(s"ALTER TABLE $tbl CREATE TAG `$tag` AS OF VERSION $sid")
    assert(sql(s"SELECT * FROM $tbl VERSION AS OF '$tag' LIMIT 10").count() > 0)
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
  }

  test("40_queries_refs/query_branch_with_identifier_form") {
    val tbl = t("sample_part")
    val b = "test_query_branch_id"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"INSERT INTO $tbl.`branch_$b` VALUES (400, 'branch_id_data', 'c1', TIMESTAMP'2026-02-04 00:00:00')")
    assert(sql(s"SELECT * FROM $tbl.`branch_$b` WHERE id = 400 LIMIT 10").count() == 1)
    sql(s"ALTER TABLE $tbl DROP BRANCH `$b`")
  }

  test("40_queries_refs/query_tag_with_identifier_form") {
    val tbl = t("sample_part")
    val tag = "test_query_tag_id"
    trySql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
    val sid = latestSnapshotId(tbl)
    sql(s"ALTER TABLE $tbl CREATE TAG `$tag` AS OF VERSION $sid")
    assert(sql(s"SELECT * FROM $tbl.`tag_$tag` LIMIT 10").count() > 0)
    sql(s"ALTER TABLE $tbl DROP TAG IF EXISTS `$tag`")
  }

  // ----------------------------------------------------------------
  // 50_proc_snapshot_mgmt
  // ----------------------------------------------------------------

  test("50_proc_snapshot_mgmt/rollback_and_set_current_snapshot") {
    val tbl = t("sample_part")
    sql(s"INSERT INTO $tbl VALUES (300,'p1','c1',TIMESTAMP'2026-02-03 00:00:00')")
    sql(s"INSERT INTO $tbl VALUES (301,'p2','c1',TIMESTAMP'2026-02-03 00:01:00')")
    val snaps = sql(s"SELECT snapshot_id, committed_at FROM $tbl.snapshots ORDER BY committed_at")
      .collect()
    assert(snaps.length >= 2)
    val firstSid = snaps.head.getLong(0)
    val lastSid = snaps.last.getLong(0)
    val lastTs = snaps.last.getTimestamp(1).toString
    sql(s"CALL lake.system.rollback_to_snapshot(table => '$db.sample_part', snapshot_id => $firstSid)")
    sql(s"CALL lake.system.set_current_snapshot(table => '$db.sample_part', snapshot_id => $lastSid)")
    sql(s"CALL lake.system.rollback_to_timestamp(table => '$db.sample_part', timestamp => TIMESTAMP '$lastTs')")
    sql(s"CALL lake.system.rollback_to_snapshot(table => '$db.sample_part', snapshot_id => $firstSid)")
    trySql(s"CALL lake.system.cherrypick_snapshot(table => '$db.sample_part', snapshot_id => $lastSid)") match {
      case Left(e) => cancel(s"cherrypick_snapshot not applicable: $e")
      case Right(_) => ()
    }
  }

  test("50_proc_snapshot_mgmt/snapshot_table") {
    sql(s"DROP TABLE IF EXISTS ${t("snapshot_target")}")
    spark.sql("CREATE DATABASE IF NOT EXISTS spark_catalog.itsrc")
    spark.sql("DROP TABLE IF EXISTS spark_catalog.itsrc.snapshot_source")
    spark.sql("CREATE TABLE spark_catalog.itsrc.snapshot_source (id bigint, value string) USING parquet")
    spark.sql("INSERT INTO spark_catalog.itsrc.snapshot_source VALUES (1,'a'),(2,'b'),(3,'c')")
    sql(s"""CALL lake.system.snapshot(
        |  source_table => 'spark_catalog.itsrc.snapshot_source',
        |  table => '$db.snapshot_target')""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("snapshot_target")}") == 3)
    sql(s"DROP TABLE IF EXISTS ${t("snapshot_target")} PURGE")
    spark.sql("DROP TABLE IF EXISTS spark_catalog.itsrc.snapshot_source")
  }

  test("50_proc_snapshot_mgmt/set_current_snapshot_with_ref") {
    val tbl = t("sample_part")
    val b = "snapshot_ref_branch"
    trySql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
    sql(s"ALTER TABLE $tbl CREATE BRANCH `$b`")
    sql(s"INSERT INTO $tbl.branch_$b VALUES (800,'ref_test','c1',TIMESTAMP'2026-02-08 00:00:00')")
    val branchSid = sql(s"SELECT snapshot_id FROM $tbl.refs WHERE name = '$b' LIMIT 1")
      .collect()(0).getLong(0)
    sql(s"CALL lake.system.set_current_snapshot(table => '$db.sample_part', ref => '$b')")
    val mainSid = sql(s"SELECT snapshot_id FROM $tbl.refs WHERE name = 'main'")
      .collect()(0).getLong(0)
    assert(mainSid == branchSid)
    sql(s"ALTER TABLE $tbl DROP BRANCH IF EXISTS `$b`")
  }

  test("50_proc_snapshot_mgmt/fast_forward_branch") {
    val tbl = t("sample_part")
    sql(s"ALTER TABLE $tbl CREATE OR REPLACE BRANCH `ff_branch`")
    sql(s"INSERT INTO $tbl.branch_ff_branch VALUES (500,'ff','c3',TIMESTAMP'2026-02-05 00:00:00')")
    sql(s"CALL lake.system.fast_forward(table => '$db.sample_part', branch => 'main', to => 'ff_branch')")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 500") == 1)
  }

  test("50_proc_snapshot_mgmt/publish_wap_changes") {
    val tbl = t("sample_part")
    sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.conf.set("spark.wap.id", "wap_test_1")
    try sql(s"INSERT INTO $tbl VALUES (400,'wap','c2',TIMESTAMP'2026-02-04 00:00:00')")
    finally spark.conf.unset("spark.wap.id")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 400") == 0, "staged, not visible")
    sql(s"CALL lake.system.publish_changes(table => '$db.sample_part', wap_id => 'wap_test_1')")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 400") == 1)
  }

  test("50_proc_snapshot_mgmt/ancestors_of_snapshot") {
    assert(sql(s"CALL lake.system.ancestors_of(table => '$db.sample_part')").count() > 0)
  }

  // ----------------------------------------------------------------
  // 51_proc_metadata_mgmt
  // ----------------------------------------------------------------

  test("51_proc_metadata_mgmt/rewrite_data_files_basic") {
    sql(s"CALL lake.system.rewrite_data_files(table => '$db.sample_part')").collect()
    sql(s"CALL lake.system.rewrite_manifests(table => '$db.sample_part')").collect()
    sql(s"CALL lake.system.remove_orphan_files(table => '$db.sample_part', dry_run => true)").collect()
    sql(s"CALL lake.system.expire_snapshots(table => '$db.sample_part', retain_last => 1)").collect()
    assert(count(s"SELECT count(*) FROM ${t("sample_part")}") > 0)
  }

  test("51_proc_metadata_mgmt/rewrite_data_files_with_options") {
    sql(s"""CALL lake.system.rewrite_data_files(
        |  table => '$db.sample_part', where => 'category = ''c1''')""".stripMargin).collect()
    sql(s"""CALL lake.system.rewrite_data_files(
        |  table => '$db.sample_part', strategy => 'sort',
        |  options => map('target-file-size-bytes', '134217728'))""".stripMargin).collect()
    assert(count(s"SELECT count(*) FROM ${t("sample_part")}") > 0)
  }

  test("51_proc_metadata_mgmt/rewrite_manifests_with_options") {
    sql(s"CALL lake.system.rewrite_manifests(table => '$db.sample_part', use_caching => true)").collect()
  }

  test("51_proc_metadata_mgmt/expire_snapshots_with_ids") {
    val tbl = t("expire_snap_temp")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, data string) USING lake")
    sql(s"INSERT INTO $tbl VALUES (1,'a')")
    sql(s"INSERT INTO $tbl VALUES (2,'b')")
    sql(s"INSERT INTO $tbl VALUES (3,'c')")
    val snaps = sql(s"SELECT snapshot_id FROM $tbl.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(snaps.length >= 2)
    sql(s"""CALL lake.system.expire_snapshots(
        |  table => '$db.expire_snap_temp', snapshot_ids => ARRAY(${snaps.head}))""".stripMargin)
    val remaining = sql(s"SELECT snapshot_id FROM $tbl.snapshots").collect().map(_.getLong(0))
    assert(!remaining.contains(snaps.head), "first snapshot expired")
    sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("51_proc_metadata_mgmt/rewrite_position_delete_files") {
    val tbl = t("sample_part")
    sql(s"""ALTER TABLE $tbl SET TBLPROPERTIES (
        |  'write.delete.mode'='merge-on-read',
        |  'write.update.mode'='merge-on-read',
        |  'write.merge.mode'='merge-on-read')""".stripMargin)
    sql(s"DELETE FROM $tbl WHERE id = 2")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 2") == 0)
    sql(s"CALL lake.system.rewrite_position_delete_files(" +
      s"table => '$db.sample_part', options => map('rewrite-all','true'))").collect()
    assert(sql(s"SELECT * FROM $tbl.delete_files").count() == 0,
      "position masks folded back into data files")
    assert(count(s"SELECT count(*) FROM $tbl WHERE id = 2") == 0)
    // back to copy-on-write for the remaining groups
    sql(s"""ALTER TABLE $tbl SET TBLPROPERTIES (
        |  'write.delete.mode'='copy-on-write',
        |  'write.update.mode'='copy-on-write',
        |  'write.merge.mode'='copy-on-write')""".stripMargin)
  }

  // ----------------------------------------------------------------
  // 52_proc_migration
  // ----------------------------------------------------------------

  private def migrationEnvPrepare(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS spark_catalog.itsrc")
    spark.sql("DROP TABLE IF EXISTS spark_catalog.itsrc.src_parquet_tbl")
    sql(s"DROP TABLE IF EXISTS ${t("addfiles_target_tbl")} PURGE")
    spark.sql("""CREATE TABLE spark_catalog.itsrc.src_parquet_tbl
        |(id bigint, data string, dt date) USING parquet""".stripMargin)
    spark.sql("""INSERT INTO spark_catalog.itsrc.src_parquet_tbl VALUES
        |(1,'a', DATE'2026-01-01'), (2,'b', DATE'2026-01-02'), (3,'c', DATE'2026-01-03')""".stripMargin)
    sql(s"""CREATE TABLE ${t("addfiles_target_tbl")} (id bigint, data string, dt date)
        |USING lake TBLPROPERTIES ('format-version'='2')""".stripMargin)
  }

  test("52_proc_migration/migration_env_prepare") {
    migrationEnvPrepare()
    assert(spark.sql("SELECT count(*) FROM spark_catalog.itsrc.src_parquet_tbl")
      .collect()(0).getLong(0) == 3)
  }

  test("52_proc_migration/migrate_table") {
    migrationEnvPrepare()
    // migrate keeps the source's name: the migrated lake table appears
    // under the same namespace/name inside the lake catalog
    sql("DROP TABLE IF EXISTS lake.itsrc.src_parquet_tbl PURGE")
    sql(s"""CALL lake.system.migrate(
        |  table => 'itsrc.src_parquet_tbl',
        |  backup_table_name => 'src_parquet_tbl_BACKUP',
        |  drop_backup => false)""".stripMargin)
    assert(count("SELECT count(*) FROM lake.itsrc.src_parquet_tbl") == 3)
  }

  test("52_proc_migration/add_files_to_table") {
    migrationEnvPrepare()
    val srcLoc = spark.sql("DESCRIBE FORMATTED spark_catalog.itsrc.src_parquet_tbl")
      .collect().find(_.getString(0) == "Location").map(_.getString(1)).get
    sql(s"""CALL lake.system.add_files(
        |  table => '$db.addfiles_target_tbl',
        |  source_table => '`parquet`.`$srcLoc`',
        |  check_duplicate_files => true)""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("addfiles_target_tbl")}") == 3)
  }

  test("52_proc_migration/rewrite_table_path") {
    val srcPrefix = s"$wh/$db/sample_part"
    val tgtPrefix = s"$wh/rewritten/sample_part"
    val staging = s"$wh/rewrite_staging_${System.nanoTime()}"
    val out = sql(s"""CALL lake.system.rewrite_table_path(
        |  table => '$db.sample_part',
        |  source_prefix => '$srcPrefix', target_prefix => '$tgtPrefix',
        |  staging_location => '$staging')""".stripMargin).collect()(0)
    assert(out.getString(0).startsWith("v"), out.toString)
    assert(new java.io.File(out.getString(1).stripPrefix("file:")).exists
      || new java.io.File(staging).exists, "staged file list written")
  }

  test("52_proc_migration/register_table") {
    migrationEnvPrepare()
    sql(s"INSERT INTO ${t("addfiles_target_tbl")} VALUES (9,'z', DATE'2026-01-09')")
    val metaDir = new java.io.File(s"$wh/$db/addfiles_target_tbl/metadata")
    val latest = metaDir.listFiles().filter(_.getName.matches("v\\d+\\.json"))
      .maxBy(_.getName)
    // stage a copy (register reads <dir>/metadata/vNNNNN.json shape)
    val stage = new java.io.File(s"$wh/regstage_${System.nanoTime()}/metadata")
    stage.mkdirs()
    java.nio.file.Files.copy(latest.toPath,
      new java.io.File(stage, latest.getName).toPath)
    sql(s"DROP TABLE ${t("addfiles_target_tbl")}") // keeps data files
    sql(s"""CALL lake.system.register_table(
        |  table => '$db.addfiles_target_tbl',
        |  metadata_file => '${stage.getAbsolutePath}/${latest.getName}')""".stripMargin)
    assert(count(s"SELECT count(*) FROM ${t("addfiles_target_tbl")}") == 1)
  }

  // ----------------------------------------------------------------
  // 54_proc_stats
  // ----------------------------------------------------------------

  test("54_proc_stats/compute_table_stats") {
    sql(s"CALL lake.system.compute_table_stats(table => '$db.sample_part')").collect()
    val props = sql(s"SHOW TBLPROPERTIES ${t("sample_part")}").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.keys.exists(_.startsWith("stats.ndv.")), props.keys.toString())
  }

  test("54_proc_stats/compute_partition_stats") {
    val f = sql(s"CALL lake.system.compute_partition_stats(table => '$db.sample_part')")
      .collect()(0).getString(0)
    assert(f != null && f.contains("partition-stats"), String.valueOf(f))
  }

  // ----------------------------------------------------------------
  // 55_proc_cdc
  // ----------------------------------------------------------------

  test("55_proc_cdc/create_changelog_view") {
    val tbl = t("cdc_tbl")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"""CREATE TABLE $tbl (
        |  id bigint NOT NULL, customer_id string NOT NULL, amount double,
        |  order_date date, region string)
        |USING lake TBLPROPERTIES ('format-version'='2')""".stripMargin)
    sql(s"""INSERT INTO $tbl VALUES
        |(1, 'CUST001', 10.0, DATE'2025-01-10', 'North'),
        |(2, 'CUST001', 20.0, DATE'2025-01-10', 'North'),
        |(3, 'CUST002', 30.0, DATE'2025-01-10', 'South')""".stripMargin)
    val startSid = latestSnapshotId(tbl)
    sql(s"INSERT INTO $tbl VALUES (4, 'CUST003', 40.0, DATE'2025-01-10', 'East')")
    sql(s"UPDATE $tbl SET amount = amount + 5 WHERE id IN (1,2)")
    sql(s"DELETE FROM $tbl WHERE id = 3")
    val endSid = latestSnapshotId(tbl)
    assert(endSid != startSid)
    sql(s"""CALL lake.system.create_changelog_view(
        |  table => '$db.cdc_tbl', changelog_view => 'cdc_changes',
        |  options => map('start-snapshot-id','$startSid','end-snapshot-id','$endSid'),
        |  identifier_columns => array('id'))""".stripMargin)
    val changes = sql("SELECT id, _change_type FROM cdc_changes ORDER BY _change_ordinal, id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(changes.exists(c => c._1 == 4L && c._2 == "insert"), changes.mkString(","))
    assert(changes.exists(c => c._1 == 3L && c._2 == "delete"), changes.mkString(","))
  }

  test("55_proc_cdc/changelog_removes_carryovers_by_default") {
    val tbl = t("cdc_carry")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, v string) USING lake")
    // one file holding BOTH rows (range with 1 partition), so the
    // delete below is a partial-file rewrite
    sql(s"INSERT INTO $tbl SELECT id, concat('r', id) FROM range(1, 3, 1, 1)")
    // CoW delete of id=2 rewrites the shared file: row 1 is re-emitted
    // as a delete+insert carry-over pair despite not changing
    sql(s"DELETE FROM $tbl WHERE id = 2")
    sql(s"""CALL lake.system.create_changelog_view(
        |  table => '$db.cdc_carry', changelog_view => 'cdc_carry_def')""".stripMargin)
    val def2 = sql("SELECT id, _change_type FROM cdc_carry_def " +
      "WHERE _change_ordinal = 1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(def2 == Seq((2L, "delete")),
      s"carry-over pair for id=1 must be dropped by default: $def2")
    // remove_carryovers => false exposes the raw per-commit file diff
    sql(s"""CALL lake.system.create_changelog_view(
        |  table => '$db.cdc_carry', changelog_view => 'cdc_carry_raw',
        |  remove_carryovers => false)""".stripMargin)
    val raw = sql("SELECT id, _change_type FROM cdc_carry_raw " +
      "WHERE _change_ordinal = 1 ORDER BY id, _change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(raw == Seq((1L, "delete"), (1L, "insert"), (2L, "delete")),
      s"raw view must keep the carry-over pair: $raw")
    sql(s"DROP TABLE IF EXISTS $tbl")
  }

  // ----------------------------------------------------------------
  // 99_cleanup (LAST)
  // ----------------------------------------------------------------

  test("99_cleanup/remove_orphan_files_safe") {
    val tbl = t("orphan_safe_temp")
    sql(s"DROP TABLE IF EXISTS $tbl")
    sql(s"CREATE TABLE $tbl (id bigint, data string) USING lake")
    sql(s"INSERT INTO $tbl VALUES (1,'test')")
    sql(s"CALL lake.system.remove_orphan_files(table => '$db.orphan_safe_temp', dry_run => false)").collect()
    assert(count(s"SELECT count(*) FROM $tbl") == 1,
      "table must keep its data after orphan removal")
    sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
