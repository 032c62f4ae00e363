package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Mixture-sampler quality guard ([[TextOps.tMixtureSample]]). The
  * oracle gate proves both engines select the same docs; this suite
  * pins the SEMANTICS — the selection actually approximates the
  * target mixture, respects availability, and is a subset stable
  * under re-computation (pure hash, no rand()).
  */
class MixtureSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  // target parts per lang, of 20 total (mirrors the operator)
  private val parts = Map("en" -> 10L, "de" -> 3L, "fr" -> 3L,
    "es" -> 2L, "zh" -> 2L)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("mixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  test("selection approximates the target mixture within availability") {
    assume(ready)
    val sel = TextOps.tMixtureSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val avail = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sel.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(sel.nonEmpty)
    // never select more than exists, per stratum
    got.foreach { case (l, n) =>
      assert(n <= avail(l), s"lang $l selected $n of ${avail(l)}")
    }
    // expected keeps from the operator's own bottleneck rule; the
    // hash threshold is binomial around them — allow generous noise
    // at this tiny sf but pin the SHAPE (en must dominate, each
    // stratum within ±50% relative or ±4 absolute of its keep)
    val t = parts.map { case (l, p) => avail.getOrElse(l, 0L) * 20L / p }.min
    parts.foreach { case (l, p) =>
      val keep = t * p / 20L
      val n = got.getOrElse(l, 0L)
      val slack = math.max(4L, keep / 2)
      assert(math.abs(n - keep) <= slack,
        s"lang $l: selected $n, expected ~$keep (±$slack)")
    }
    assert(got.maxBy(_._2)._1 == "en", s"en must dominate the mix: $got")
    // deterministic: a second computation selects the identical set
    val again = TextOps.tMixtureSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again == sel, "selection must be a pure function of the data")
    info(s"budget=$t, selected=${sel.size}, per-lang=$got")
  }
}
