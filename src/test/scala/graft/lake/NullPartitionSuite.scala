package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** NULL partition-source values through every path: fanout routing,
  * tuple recording, stats pruning, row-level DML, dynamic overwrite
  * of the null tuple, metadata tables, and compaction.
  *
  * Design note (documented, deliberate): `bucket(n, NULL)` assigns
  * the SEED's bucket (Spark's xxhash64 skips null inputs), so null
  * keys land in one real bucket instead of Iceberg's null partition
  * tuple, while `days(NULL)`/identity record a null tuple. This is
  * internally consistent — write-time tuples, plan-time pruning, and
  * dynamic-overwrite matching all evaluate the SAME expression — and
  * null join keys never match anyway, so SPJ grouping is unaffected.
  * Changing it now would break tuple matching against files written
  * before the change (the epoch problem, but for partition
  * semantics), so it stays. */
class NullPartitionSuite extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var wh: String = _
  override def beforeAll(): Unit = {
    wh = java.nio.file.Files.createTempDirectory("lake_np").toString
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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

  test("identity partition on nullable string") {
    sql("CREATE TABLE lake.db.np1 (id bigint, c string) USING lake PARTITIONED BY (c)")
    sql("INSERT INTO lake.db.np1 VALUES (1, NULL), (2, 'a'), (3, NULL)")
    assert(sql("SELECT count(*) FROM lake.db.np1").collect()(0).getLong(0) == 3)
    assert(sql("SELECT count(*) FROM lake.db.np1 WHERE c IS NULL").collect()(0).getLong(0) == 2)
    assert(sql("SELECT count(*) FROM lake.db.np1 WHERE c = 'a'").collect()(0).getLong(0) == 1)
    sql("DELETE FROM lake.db.np1 WHERE c IS NULL")
    assert(sql("SELECT id FROM lake.db.np1").collect().map(_.getLong(0)).toSet == Set(2L))
    sql("DROP TABLE lake.db.np1")
  }

  test("bucket partition on nullable long + days on nullable ts") {
    sql("CREATE TABLE lake.db.np2 (id bigint, k bigint, ts timestamp) USING lake " +
      "PARTITIONED BY (bucket(4, k), days(ts))")
    sql("INSERT INTO lake.db.np2 VALUES (1, NULL, NULL), " +
      "(2, 7, timestamp'2024-01-02 03:04:05'), (3, NULL, timestamp'2024-01-02 10:00:00')")
    assert(sql("SELECT count(*) FROM lake.db.np2").collect()(0).getLong(0) == 3)
    assert(sql("SELECT count(*) FROM lake.db.np2 WHERE k IS NULL").collect()(0).getLong(0) == 2)
    assert(sql("SELECT count(*) FROM lake.db.np2 WHERE ts IS NULL").collect()(0).getLong(0) == 1)
    sql("UPDATE lake.db.np2 SET id = id + 10 WHERE k IS NULL")
    assert(sql("SELECT id FROM lake.db.np2").collect().map(_.getLong(0)).toSet == Set(11L, 2L, 13L))
    // dynamic overwrite of the null partition (static mode would
    // truncate the whole table by Spark semantics)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE lake.db.np2 VALUES (20, NULL, NULL)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val ids = sql("SELECT id FROM lake.db.np2").collect().map(_.getLong(0)).toSet
    assert(ids == Set(20L, 2L, 13L), s"dynamic overwrite of null tuple: $ids")
    sql("DROP TABLE lake.db.np2")
  }

  test("metadata + compaction survive null tuples") {
    sql("CREATE TABLE lake.db.np3 (id bigint, c string) USING lake PARTITIONED BY (c)")
    sql("INSERT INTO lake.db.np3 VALUES (1, NULL), (2, 'a')")
    sql("INSERT INTO lake.db.np3 VALUES (3, NULL)")
    val parts = sql("SELECT * FROM lake.db.np3.partitions").collect()
    assert(parts.nonEmpty)
    sql("CALL lake.system.rewrite_data_files(table => 'db.np3', " +
      "options => map('min-input-files', '1', 'rewrite-all', 'true'))")
    assert(sql("SELECT count(*) FROM lake.db.np3 WHERE c IS NULL").collect()(0).getLong(0) == 2)
    assert(sql("SELECT id FROM lake.db.np3").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    sql("DROP TABLE lake.db.np3")
  }
}
