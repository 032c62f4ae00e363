package graft.mv

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, BeforeAndAfterEach}
import org.scalatest.funsuite.AnyFunSuite

/** MV lifecycle + rewrite fidelity, mirroring the reference's
  * MaterializedViewSuite / AggregateRewriteSuite / JoinRewriteSuite
  * assertion styles: plan-shape (backing table appears in the
  * optimized plan) and hand-computed result correctness, plus
  * negative tests asserting the rewrite does NOT fire. */
class MvSuite extends AnyFunSuite with BeforeAndAfterAll with BeforeAndAfterEach {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("mv_wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("mv-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .withExtensions(new MvExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("""CREATE TABLE sales (region string, product string,
                | amount bigint, qty bigint) USING parquet""".stripMargin)
    spark.sql("""INSERT INTO sales VALUES
                | ('east','a',100,1),('east','b',200,2),
                | ('west','a',300,3),('west','b',400,4),
                | ('west','c',500,5)""".stripMargin)
    spark.sql("CREATE TABLE regions (region string, country string) USING parquet")
    spark.sql("INSERT INTO regions VALUES ('east','us'),('west','us')")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()
  override def afterEach(): Unit = {
    MvCatalog.list().foreach(m =>
      spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS ${m.name}"))
  }

  private def sql(s: String) = spark.sql(s)
  private def usesBacking(df: org.apache.spark.sql.DataFrame, mv: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(MvCommands.backingName(mv))

  test("lifecycle: create, show, refresh, drop") {
    sql("CREATE TABLE sales_lc USING parquet AS SELECT * FROM sales")
    sql("CREATE MATERIALIZED VIEW mv1 AS SELECT region, sum(amount) AS s FROM sales_lc GROUP BY region")
    val shown = sql("SHOW MATERIALIZED VIEWS").collect()
    assert(shown.length == 1 && shown(0).getString(0) == "mv1")
    assert(shown(0).getLong(6) == 2) // row_count

    sql("INSERT INTO sales_lc VALUES ('north','z',50,1)")
    sql("REFRESH MATERIALIZED VIEW mv1")
    assert(sql("SHOW MATERIALIZED VIEWS").collect()(0).getLong(6) == 3)
    sql("REFRESH MATERIALIZED VIEW mv1 INCREMENTAL")

    sql("DROP MATERIALIZED VIEW mv1")
    assert(sql("SHOW MATERIALIZED VIEWS").count() == 0)
    sql("DROP TABLE sales_lc")
  }

  test("exact match rewrite") {
    sql("CREATE MATERIALIZED VIEW mv_exact AS SELECT region, sum(amount) AS total FROM sales GROUP BY region")
    val df = sql("SELECT region, sum(amount) AS total FROM sales GROUP BY region")
    assert(usesBacking(df, "mv_exact"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res == Map("east" -> 300L, "west" -> 1200L))
  }

  test("roll-up rewrite: SUM/COUNT/MIN/MAX re-aggregate from finer MV") {
    sql("""CREATE MATERIALIZED VIEW mv_fine AS
          |SELECT region, product, sum(amount) AS sum_amount,
          |       count(*) AS cnt, min(amount) AS min_amount,
          |       max(amount) AS max_amount
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("""SELECT region, sum(amount) AS sum_amount, count(*) AS cnt,
                   |  min(amount) AS min_amount, max(amount) AS max_amount
                   |FROM sales GROUP BY region""".stripMargin)
    assert(usesBacking(df, "mv_fine"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(res("east") == ((300L, 2L, 100L, 200L)))
    assert(res("west") == ((1200L, 3L, 300L, 500L)))
  }

  test("AVG derived from SUM and COUNT") {
    sql("""CREATE MATERIALIZED VIEW mv_avg AS
          |SELECT region, product, sum(amount) AS s, count(amount) AS c
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("SELECT region, avg(amount) AS a FROM sales GROUP BY region")
    assert(usesBacking(df, "mv_avg"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(res("east") == 150.0 && res("west") == 400.0)
  }

  test("predicate compensation: extra query predicate becomes a filter") {
    sql("""CREATE MATERIALIZED VIEW mv_pred AS
          |SELECT region, product, sum(amount) AS s
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("""SELECT region, sum(amount) AS s FROM sales
                   |WHERE region = 'west' GROUP BY region""".stripMargin)
    // conservative: predicate over a group column of the MV
    if (usesBacking(df, "mv_pred")) {
      val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(res == Seq(("west", 1200L)))
    }
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("west", 1200L)))
  }

  test("negative: MV more restrictive than query must not fire") {
    sql("""CREATE MATERIALIZED VIEW mv_narrow AS
          |SELECT region, sum(amount) AS s FROM sales
          |WHERE region = 'east' GROUP BY region""".stripMargin)
    val df = sql("SELECT region, sum(amount) AS s FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_narrow"), df.queryExecution.optimizedPlan.toString)
    assert(df.count() == 2)
  }

  test("negative: different base table must not fire") {
    sql("CREATE MATERIALIZED VIEW mv_other AS SELECT region, count(*) AS c FROM regions GROUP BY region")
    val df = sql("SELECT region, count(*) AS c FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_other"))
  }

  test("negative: query needs column the MV lacks") {
    sql("CREATE MATERIALIZED VIEW mv_cols AS SELECT region, sum(amount) AS s FROM sales GROUP BY region")
    val df = sql("SELECT region, sum(qty) AS q FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_cols"))
    assert(df.collect().map(_.getLong(1)).sum == 15)
  }

  test("negative: query predicate on base column shadowed by same-named MV aggregate") {
    // MV projects sum(amount) under the NAME amount; a query filter on
    // the base column amount must NOT bind to that aggregate output
    // (ADVICE round 1: name-based fallback produced wrong results)
    sql("""CREATE MATERIALIZED VIEW mv_shadow AS
          |SELECT region, sum(amount) AS amount
          |FROM sales GROUP BY region""".stripMargin)
    val df = sql("""SELECT region, sum(amount) AS amount FROM sales
                   |WHERE amount > 150 GROUP BY region""".stripMargin)
    assert(!usesBacking(df, "mv_shadow"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res == Map("east" -> 200L, "west" -> 1200L))
  }

  test("negative: query groups by a column outside the MV grouping") {
    sql("""CREATE MATERIALIZED VIEW mv_reg AS
          |SELECT region, sum(amount) AS s FROM sales GROUP BY region""".stripMargin)
    val df = sql("SELECT product, sum(amount) AS s FROM sales GROUP BY product")
    assert(!usesBacking(df, "mv_reg"))
    assert(df.count() == 3)
  }

  test("negative: AVG cannot derive without a COUNT in the MV") {
    sql("""CREATE MATERIALIZED VIEW mv_sum_only AS
          |SELECT region, product, sum(amount) AS s
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("SELECT region, avg(amount) AS a FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_sum_only"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(res("east") == 150.0 && res("west") == 400.0)
  }

  test("negative: count distinct does not roll up") {
    sql("""CREATE MATERIALIZED VIEW mv_cd AS
          |SELECT region, product, count(*) AS c
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("SELECT region, count(DISTINCT product) AS c FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_cd"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res == Map("east" -> 2L, "west" -> 3L))
  }

  test("negative: disjoint MV and query predicates must not fire") {
    sql("""CREATE MATERIALIZED VIEW mv_east AS
          |SELECT region, product, sum(amount) AS s FROM sales
          |WHERE region = 'east' GROUP BY region, product""".stripMargin)
    val df = sql("""SELECT region, sum(amount) AS s FROM sales
                   |WHERE region = 'west' GROUP BY region""".stripMargin)
    assert(!usesBacking(df, "mv_east"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("west", 1200L)))
  }

  test("negative: aggregate over a different expression must not fire") {
    sql("""CREATE MATERIALIZED VIEW mv_expr AS
          |SELECT region, product, sum(amount) AS s
          |FROM sales GROUP BY region, product""".stripMargin)
    val df = sql("SELECT region, sum(amount * 2) AS s FROM sales GROUP BY region")
    assert(!usesBacking(df, "mv_expr"))
    val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res == Map("east" -> 600L, "west" -> 2400L))
  }

  test("negative: different join condition must not fire") {
    sql("""CREATE MATERIALIZED VIEW mv_jc AS
          |SELECT s.region AS region, s.amount AS amount, r.country AS country
          |FROM sales s JOIN regions r ON s.region = r.region""".stripMargin)
    val df = sql("""SELECT s.region AS region, s.amount AS amount, r.country AS country
                   |FROM sales s JOIN regions r ON s.product = r.region""".stripMargin)
    assert(!usesBacking(df, "mv_jc"))
    assert(df.count() == 0)
  }

  test("negative: outer join does not match an inner-join MV") {
    sql("""CREATE MATERIALIZED VIEW mv_inner AS
          |SELECT s.region AS region, s.amount AS amount, r.country AS country
          |FROM sales s JOIN regions r ON s.region = r.region""".stripMargin)
    val df = sql("""SELECT s.region AS region, s.amount AS amount, r.country AS country
                   |FROM sales s LEFT JOIN regions r ON s.region = r.region""".stripMargin)
    assert(!usesBacking(df, "mv_inner"))
    assert(df.count() == 5)
  }

  test("join rewrite: same join tree projects from backing") {
    sql("""CREATE MATERIALIZED VIEW mv_join AS
          |SELECT s.region AS region, s.amount AS amount, r.country AS country
          |FROM sales s JOIN regions r ON s.region = r.region""".stripMargin)
    val df = sql("""SELECT s.region AS region, s.amount AS amount, r.country AS country
                   |FROM sales s JOIN regions r ON s.region = r.region""".stripMargin)
    assert(usesBacking(df, "mv_join"), df.queryExecution.optimizedPlan.toString)
    assert(df.count() == 5)
  }

  test("join + aggregate roll-up") {
    sql("""CREATE MATERIALIZED VIEW mv_ja AS
          |SELECT r.country AS country, s.region AS region, sum(s.amount) AS s
          |FROM sales s JOIN regions r ON s.region = r.region
          |GROUP BY r.country, s.region""".stripMargin)
    val df = sql("""SELECT r.country AS country, sum(s.amount) AS s
                   |FROM sales s JOIN regions r ON s.region = r.region
                   |GROUP BY r.country""".stripMargin)
    assert(usesBacking(df, "mv_ja"), df.queryExecution.optimizedPlan.toString)
    val res = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res == Map("us" -> 1500L))
  }

  test("rewrite stays off during refresh and on backing-table queries") {
    sql("CREATE MATERIALIZED VIEW mv_self AS SELECT region, sum(amount) AS s FROM sales GROUP BY region")
    // direct query on the backing table must not recurse
    val backing = MvCommands.backingName("mv_self")
    assert(sql(s"SELECT * FROM $backing").count() == 2)
    sql("REFRESH MATERIALIZED VIEW mv_self")
    assert(sql(s"SELECT * FROM $backing").count() == 2)
  }
}
