package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Time-transform zone pinning (round-8 self-audit find): partition
  * tuples for `days(ts)` on a TimestampType source were formatted in
  * the WRITING session's timezone, so two sessions in different zones
  * produced different tuples for the same instant — and a dynamic
  * overwrite staged in one zone failed to MATCH (and so failed to
  * replace) files committed from another, silently keeping rows it
  * should have replaced. Tables now stamp `write.transform.zone` at
  * creation (or when spec evolution adds their first time transform)
  * and every transform evaluation pins to it. Legacy tables without
  * the property keep their historical session-zone behavior.
  */
class TransformZoneSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("tzone_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("transform-zone-suite")
      .withExtensions(new LakeExtensions)
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

  private def inZone[A](z: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", z)
    try body finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("creation stamps write.transform.zone for time-transform specs") {
    sql("CREATE TABLE lake.db.tz1 (id int, ts timestamp) USING lake " +
      "PARTITIONED BY (days(ts))")
    val props = sql("SHOW TBLPROPERTIES lake.db.tz1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get(Transforms.ZoneProp).contains("UTC"))
    // untimed specs stay unstamped
    sql("CREATE TABLE lake.db.tz2 (id int) USING lake " +
      "PARTITIONED BY (bucket(4, id))")
    val props2 = sql("SHOW TBLPROPERTIES lake.db.tz2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props2.contains(Transforms.ZoneProp))
  }

  test("cross-zone writes land in ONE tuple; dynamic overwrite matches it") {
    sql("CREATE TABLE lake.db.tz3 (id int, ts timestamp) USING lake " +
      "PARTITIONED BY (days(ts))")
    // 2024-01-01 05:30 UTC = 2023-12-31 21:30 in Los Angeles — the
    // instant where session-zone tuples disagree across the date line
    sql("INSERT INTO lake.db.tz3 VALUES " +
      "(1, timestamp'2024-01-01 05:30:00')")
    inZone("America/Los_Angeles") {
      // same INSTANT, written from an LA session (the literal is
      // parsed in LA wall time, so spell the matching wall clock)
      sql("INSERT INTO lake.db.tz3 VALUES " +
        "(2, timestamp'2023-12-31 21:30:00')")
    }
    val parts = sql("SELECT partition FROM lake.db.tz3.partitions")
      .collect().map(_.get(0).toString)
    assert(parts.distinct.length == 1,
      s"one instant must be one tuple regardless of writer zone: " +
        s"${parts.mkString(", ")}")
    // dynamic overwrite FROM THE OTHER ZONE must replace that tuple —
    // pre-fix its staged tuple ('2023-12-31') matched nothing and the
    // old rows survived alongside the new one
    inZone("America/Los_Angeles") {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try sql("INSERT OVERWRITE lake.db.tz3 VALUES " +
        "(3, timestamp'2023-12-31 21:30:00')")
      finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val rows = sql("SELECT id FROM lake.db.tz3").collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(3),
      s"overwrite must replace the whole day tuple, got ${rows.mkString(",")}")
  }

  test("ADD PARTITION FIELD stamps the zone on first time transform") {
    sql("CREATE TABLE lake.db.tz4 (id int, ts timestamp) USING lake")
    inZone("Asia/Tokyo") {
      sql("ALTER TABLE lake.db.tz4 ADD PARTITION FIELD days(ts)")
    }
    val props = sql("SHOW TBLPROPERTIES lake.db.tz4")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get(Transforms.ZoneProp).contains("Asia/Tokyo"))
  }

  test("DATE sources stay zone-free (no stamp needed to be correct)") {
    sql("CREATE TABLE lake.db.tz5 (id int, d date) USING lake " +
      "PARTITIONED BY (days(d))")
    sql("INSERT INTO lake.db.tz5 VALUES (1, date'2024-06-01')")
    inZone("America/Los_Angeles") {
      sql("INSERT INTO lake.db.tz5 VALUES (2, date'2024-06-01')")
    }
    val parts = sql("SELECT partition FROM lake.db.tz5.partitions")
      .collect().map(_.get(0).toString)
    assert(parts.distinct.length == 1)
  }
}
