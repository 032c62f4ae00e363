package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stats-order soundness (round-8 self-audit, two live wrong-results
  * finds):
  *
  *  1. STRING ORDER — parquet's binary min/max are UNSIGNED-BYTE
  *     (= code point) order; the probe compared with Java
  *     `String.compareTo` (UTF-16 code-unit order). The two disagree
  *     whenever supplementary characters (emoji, rare CJK — routine
  *     in web corpora) meet U+E000..U+FFFF: reproduced live as
  *     `c > '￿'` returning 0 rows on a table whose file holds
  *     U+1F600, and MAX(c) answered from metadata returning the
  *     WRONG string (Spark's own UTF8String order is byte order).
  *     The same mis-order sat in equality-delete relevance and
  *     StringStartsWith bounds.
  *  2. FLOAT EDGE VALUES on IMPORTED files — parquet-mr never writes
  *     NaN min/max (NaN pages drop stats) and normalizes ±0.0, so
  *     native writes were safe; files adopted via add_files/migrate
  *     come from arbitrary writers. A total-order compare against a
  *     foreign NaN stat pruned matching files; Double.compare on
  *     ±0.0 pruned a foreign file whose only value is the other
  *     zero. FileStats.cmp now makes NO claim on NaN and treats
  *     ±0.0 equal; the metadata MIN/MAX answer declines NaN stats.
  */
class FileStatsSoundnessSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("statsound_wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("filestats-soundness-suite")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()
  private def sql(s: String) = spark.sql(s)

  // U+FFFF (max BMP char) and U+1F600 (emoji, supplementary): byte
  // order puts the emoji ABOVE, UTF-16 order puts it BELOW
  private val bmpMax = "￿"
  private val emoji = new String(Character.toChars(0x1F600))

  test("supplementary chars: range filter keeps the emoji file (live r8 repro)") {
    sql("CREATE TABLE lake.db.ss (id int, c string) USING lake")
    sql(s"INSERT INTO lake.db.ss VALUES (1, '$bmpMax'), (2, '$emoji')")
    // pre-fix: cmp judged '￿' > max('😀') under UTF-16 order and
    // pruned every file — 0 rows for a predicate matching row 2
    assert(sql(s"SELECT * FROM lake.db.ss WHERE c > '$bmpMax'").count() == 1)
    assert(sql(s"SELECT * FROM lake.db.ss WHERE c = '$emoji'").count() == 1)
    assert(sql(s"SELECT * FROM lake.db.ss WHERE c < '$emoji'").count() == 1)
  }

  test("supplementary chars: metadata-answered MIN/MAX match Spark's order") {
    sql("CREATE TABLE lake.db.sm (id int, c string) USING lake")
    sql(s"INSERT INTO lake.db.sm VALUES (1, '$bmpMax'), (2, '$emoji')")
    // no filters → the aggregate is answered from manifest stats;
    // Spark's UTF8String comparison is unsigned-byte order, so the
    // emoji IS the max — pre-fix the metadata answer said '￿'
    val row = sql("SELECT min(c) AS mn, max(c) AS mx FROM lake.db.sm")
      .collect().head
    assert(row.getString(0) == bmpMax, "min must be the BMP char")
    assert(row.getString(1) == emoji, "max must be the supplementary char")
    // and it must agree with the scan path (filter defeats pushdown)
    val scan = sql(
      "SELECT min(c), max(c) FROM lake.db.sm WHERE id IS NOT NULL")
      .collect().head
    assert(scan.getString(0) == bmpMax && scan.getString(1) == emoji)
  }

  test("supplementary chars: StartsWith bounds probe in byte order") {
    sql("CREATE TABLE lake.db.sp (id int, c string) USING lake")
    sql(s"INSERT INTO lake.db.sp VALUES (1, '${emoji}abc'), (2, 'zz')")
    assert(sql(s"SELECT * FROM lake.db.sp WHERE c LIKE '$emoji%'").count() == 1)
  }

  test("cmp: byte order, NaN no-claim, signed zeros equal") {
    assert(FileStats.cmp(emoji, bmpMax, StringType).contains(1))
    assert(FileStats.cmp(bmpMax, emoji, StringType).contains(-1))
    assert(FileStats.cmp("NaN", "1.0", DoubleType).isEmpty)
    assert(FileStats.cmp("1.0", "NaN", FloatType).isEmpty)
    assert(FileStats.cmp("0.0", "-0.0", DoubleType).contains(0))
    assert(FileStats.cmp("-0.0", "0.0", FloatType).contains(0))
  }

  // a FOREIGN file's stats as add_files would adopt them: written by
  // a writer that put NaN / an unnormalized -0.0 into min/max
  private def foreign(mn: String, mx: String): DataFileMeta =
    DataFileMeta("f", 2L, 10L, 0, Map("v" -> mn), Map("v" -> mx),
      Map("v" -> 0L), Map.empty)

  test("imported NaN stats never prune, and decline the metadata MIN/MAX") {
    val schema = StructType(Seq(StructField("v", DoubleType)))
    val f = foreign("1.0", "NaN")
    // every comparison involving the NaN bound makes no claim
    assert(FileStats.mayMatch(f, EqualTo("v", 5.0), schema))
    assert(FileStats.mayMatch(f, GreaterThan("v", 100.0), schema))
    assert(FileStats.mayMatch(f, EqualTo("v", Double.NaN), schema))
    // the sane bound still prunes: v < 0.5 is impossible (min 1.0)
    assert(!FileStats.mayMatch(f, LessThan("v", 0.5), schema))
  }

  test("imported unnormalized -0.0 stats keep files for = 0.0") {
    val schema = StructType(Seq(StructField("v", DoubleType)))
    // file holds only -0.0, foreign writer recorded min=max=-0.0
    val f = foreign("-0.0", "-0.0")
    assert(FileStats.mayMatch(f, EqualTo("v", 0.0), schema),
      "SQL 0.0 = -0.0; a signed compare pruned this file")
    assert(FileStats.mayMatch(f, EqualTo("v", -0.0), schema))
    assert(!FileStats.mayMatch(f, EqualTo("v", 1.0), schema))
  }

  test("TimestampNTZ literals now prune (were no-claim)") {
    val schema = StructType(Seq(StructField("t", TimestampNTZType)))
    // stats in parquet NTZ space: micros of the wall-clock at UTC
    val jan1 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val feb1 = java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
    def us(t: java.time.LocalDateTime): String =
      (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L).toString
    val f = DataFileMeta("f", 2L, 10L, 0, Map("t" -> us(jan1)),
      Map("t" -> us(feb1)), Map("t" -> 0L), Map.empty)
    assert(!FileStats.mayMatch(f,
      GreaterThan("t", java.time.LocalDateTime.of(2024, 3, 1, 0, 0)), schema))
    assert(FileStats.mayMatch(f,
      GreaterThan("t", java.time.LocalDateTime.of(2024, 1, 15, 0, 0)), schema))
  }
}
