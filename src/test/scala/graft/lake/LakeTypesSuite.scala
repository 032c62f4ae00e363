package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-type coverage mirroring the reference's 15_ddl_data_types
  * group (iceberg_it.py:865-1262): every supported Spark type is
  * stored, read back, and filtered; uuid/time/variant follow the
  * reference's skip semantics (no native Spark type / not exercised).
  */
class LakeTypesSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("laketypes_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("lake-types-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()
  private def sql(s: String) = spark.sql(s)

  private def roundTrip(name: String, ddlType: String, values: Seq[String],
      filter: Option[(String, Int)] = None): Unit = {
    val t = s"ty_$name"
    sql(s"CREATE TABLE lake.db.$t (id int, v $ddlType) USING lake")
    values.zipWithIndex.foreach { case (v, i) =>
      sql(s"INSERT INTO lake.db.$t VALUES ($i, $v)")
    }
    assert(sql(s"SELECT * FROM lake.db.$t").count() == values.size,
      s"type $ddlType round-trip")
    filter.foreach { case (cond, expected) =>
      assert(sql(s"SELECT * FROM lake.db.$t WHERE $cond").count() == expected,
        s"type $ddlType filter $cond")
    }
  }

  test("boolean")  { roundTrip("bool", "boolean", Seq("true", "false", "NULL"),
    Some(("v = true", 1))) }
  test("tinyint")  { roundTrip("i8", "tinyint", Seq("127", "-128"),
    Some(("v > 0", 1))) }
  test("smallint") { roundTrip("i16", "smallint", Seq("32767", "-32768"),
    Some(("v > 0", 1))) }
  test("int")      { roundTrip("i32", "int", Seq("2147483647", "-2147483648"),
    Some(("v >= 2147483647", 1))) }
  test("bigint")   { roundTrip("i64", "bigint",
    Seq("9223372036854775807", "-9223372036854775808"), Some(("v > 0", 1))) }
  test("float")    { roundTrip("f32", "float", Seq("3.14159", "-2.71828", "0.0", "NULL")) }
  test("double")   { roundTrip("f64", "double",
    Seq("3.141592653589793", "-2.718281828459045"), Some(("v > 3", 1))) }
  test("decimal")  { roundTrip("dec", "decimal(10,2)",
    Seq("12345.67", "-9999.99"), Some(("v > 0", 1))) }
  test("date")     { roundTrip("dt", "date",
    Seq("DATE '1970-01-01'", "DATE '2999-12-31'"),
    Some(("v = DATE '1970-01-01'", 1))) }
  test("timestamp"){ roundTrip("ts", "timestamp",
    Seq("TIMESTAMP '2024-01-01 12:34:56'", "TIMESTAMP '1970-01-01 00:00:00'"),
    Some(("cast(v as date) = DATE '2024-01-01'", 1))) }
  test("char")     { roundTrip("ch", "char(10)", Seq("'abc'", "'exactly10c'")) }
  test("varchar")  { roundTrip("vc", "varchar(50)", Seq("'bounded'", "''")) }
  test("string")   { roundTrip("str", "string", Seq("'hello'", "''", "NULL"),
    Some(("v = 'hello'", 1))) }
  test("binary")   { roundTrip("bin", "binary",
    Seq("CAST('bytes' AS BINARY)", "CAST('' AS BINARY)")) }

  test("struct with nested access") {
    sql("CREATE TABLE lake.db.ty_struct (id int, s struct<name: string, x: int>) USING lake")
    sql("INSERT INTO lake.db.ty_struct VALUES (1, named_struct('name','a','x',7))")
    val r = sql("SELECT s.name, s.x FROM lake.db.ty_struct").collect()(0)
    assert(r.getString(0) == "a" && r.getInt(1) == 7)
  }

  test("array with size()") {
    sql("CREATE TABLE lake.db.ty_arr (id int, a array<string>) USING lake")
    sql("INSERT INTO lake.db.ty_arr VALUES (1, array('x','y')), (2, array())")
    val sizes = sql("SELECT size(a) FROM lake.db.ty_arr ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(2, 0))
  }

  test("map with map_from_arrays and size()") {
    sql("CREATE TABLE lake.db.ty_map (id int, m map<string,int>) USING lake")
    sql("INSERT INTO lake.db.ty_map VALUES (1, map('k', 1)), (2, map_from_arrays(array(), array()))")
    val sizes = sql("SELECT size(m) FROM lake.db.ty_map ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(1, 0))
  }

  test("fixed-length binary semantics via binary") {
    sql("CREATE TABLE lake.db.ty_fixed (id int, v binary) USING lake")
    sql("INSERT INTO lake.db.ty_fixed VALUES (1, CAST('16byte_fixed_val' AS BINARY))")
    assert(sql("SELECT length(v) FROM lake.db.ty_fixed").collect()(0).getInt(0) == 16)
  }

  test("not null constraint declared and droppable") {
    sql("CREATE TABLE lake.db.ty_nn (id bigint NOT NULL, v string) USING lake")
    sql("INSERT INTO lake.db.ty_nn VALUES (1, 'a')")
    sql("ALTER TABLE lake.db.ty_nn ALTER COLUMN id DROP NOT NULL")
    assert(sql("SELECT * FROM lake.db.ty_nn").count() == 1)
  }
}
