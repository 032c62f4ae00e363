package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Row-level operations immediately after schema evolution — the
  * regression surface the DML fuzz uncovered: a single-epoch
  * copy-on-write row-level scan used to report its files' WRITE-TIME
  * column names in readSchema, which Spark's group-based scan
  * planning resolves against the relation's CURRENT names (crash
  * after RENAME COLUMN). */
class EvolutionRowLevelSuite extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("lake_rr").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("update after rename") {
    val sql = spark.sql(_: String)
    sql("CREATE TABLE lake.db.rr (id bigint, v string) USING lake")
    sql("INSERT INTO lake.db.rr VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE lake.db.rr RENAME COLUMN v TO vv")
    sql("UPDATE lake.db.rr SET vv = concat(vv, '+') WHERE id % 2 = 0")
    val rows = sql("SELECT id, vv FROM lake.db.rr ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b+")))
    sql("DROP TABLE lake.db.rr")
  }

  test("merge after rename") {
    val sql = spark.sql(_: String)
    sql("CREATE TABLE lake.db.rr2 (id bigint, v string) USING lake")
    sql("INSERT INTO lake.db.rr2 VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE lake.db.rr2 RENAME COLUMN v TO vv")
    sql("""MERGE INTO lake.db.rr2 t
          |USING (SELECT * FROM (VALUES (1, 'x')) AS s(id, vv)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET vv = s.vv""".stripMargin)
    val rows = sql("SELECT id, vv FROM lake.db.rr2 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "b")))
    sql("DROP TABLE lake.db.rr2")
  }

  test("merge-on-read delete on a partitioned table (delete-only delta)") {
    // a pure-delete delta row carries only (__row_operation,_file,_pos)
    // — the write's required ordering must not reference the partition
    // source column it doesn't have
    val sql = spark.sql(_: String)
    sql("""CREATE TABLE lake.db.rr4 (id bigint, p bigint, v string)
          |USING lake PARTITIONED BY (p)
          |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO lake.db.rr4 VALUES (1, 0, 'a'), (2, 1, 'b'), (3, 0, 'c')")
    sql("DELETE FROM lake.db.rr4 WHERE id % 2 = 1") // crosses partitions
    val rows = sql("SELECT id, v FROM lake.db.rr4 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b")))
    sql("DROP TABLE lake.db.rr4")
  }

  test("partition source column rename: spec follows, writes keep working") {
    // the partition spec references its source column by current name
    // — a rename must rewrite the spec, or every later write's
    // transform evaluation and ordering stops resolving
    val sql = spark.sql(_: String)
    sql("""CREATE TABLE lake.db.rr5 (id bigint, p bigint, v string)
          |USING lake PARTITIONED BY (p)
          |TBLPROPERTIES ('write.update.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO lake.db.rr5 VALUES (1, 0, 'a'), (2, 1, 'b')")
    sql("ALTER TABLE lake.db.rr5 RENAME COLUMN p TO q")
    sql("INSERT INTO lake.db.rr5 VALUES (3, 1, 'c')")      // append resolves q
    sql("UPDATE lake.db.rr5 SET v = 'x' WHERE id = 2")     // delta resolves q
    val rows = sql("SELECT id, q, v FROM lake.db.rr5 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 0L, "a"), (2L, 1L, "x"), (3L, 1L, "c")))
    // dropping the (renamed) partition source column is refused
    val e = intercept[Exception](
      sql("ALTER TABLE lake.db.rr5 DROP COLUMN q"))
    assert(e.getMessage.contains("partition source"), e.getMessage)
    sql("DROP TABLE lake.db.rr5")
  }

  test("update after add column") {
    val sql = spark.sql(_: String)
    sql("CREATE TABLE lake.db.rr3 (id bigint, v string) USING lake")
    sql("INSERT INTO lake.db.rr3 VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE lake.db.rr3 ADD COLUMN extra bigint")
    sql("UPDATE lake.db.rr3 SET v = concat(v, '+') WHERE id % 2 = 0")
    sql("ALTER TABLE lake.db.rr3 DROP COLUMN extra")
    sql("UPDATE lake.db.rr3 SET v = concat(v, '!') WHERE id % 2 = 1")
    val rows = sql("SELECT id, v FROM lake.db.rr3 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a!"), (2L, "b+")))
    sql("DROP TABLE lake.db.rr3")
  }

  test("runtime group filtering that narrows to one epoch keeps routing") {
    // Two schema epochs (rename between inserts) make the row-level
    // scan's delegate a keyed composite; the UPDATE's runtime group
    // filter (matched rows all in p=0) then narrows the file set to
    // the SECOND epoch only. Spark pairs the reader factory of one
    // toBatch with the partitions of the re-planned one, so the
    // narrowed delegate must keep the same leaf-key layout — the
    // positional routing this replaces threw a FilePartition
    // MatchError here (DML-fuzz seed 7701) and could route a masked
    // file to the wrong reader.
    val sql = spark.sql(_: String)
    sql("""CREATE TABLE lake.db.rr4 (id bigint, p bigint, v string)
         |USING lake PARTITIONED BY (p)""".stripMargin)
    // epoch-0 file: p=1, id range [1,100] (overlaps id=50, so the
    // static min/max prune can NOT remove it — only the runtime
    // group filter does)
    sql("INSERT INTO lake.db.rr4 VALUES (1, 1, 'a'), (100, 1, 'b')")
    sql("ALTER TABLE lake.db.rr4 RENAME COLUMN v TO vv")
    // epoch-1 file: p=0, the only matched group
    sql("INSERT INTO lake.db.rr4 VALUES (50, 0, 'c')")
    sql("UPDATE lake.db.rr4 SET vv = concat(vv, '+') WHERE id = 50")
    val rows = sql("SELECT id, p, vv FROM lake.db.rr4 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "a"), (50L, 0L, "c+"), (100L, 1L, "b")))
    // same shape through MERGE (the fuzz op that actually crashed)
    sql("""MERGE INTO lake.db.rr4 t
          |USING (SELECT * FROM (VALUES (50, 0, 'm')) AS s(id, p, vv)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET vv = s.vv""".stripMargin)
    val rows2 = sql("SELECT id, vv FROM lake.db.rr4 ORDER BY id").collect()
    assert(rows2.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (50L, "m"), (100L, "b")))
    sql("DROP TABLE lake.db.rr4")
  }
}
