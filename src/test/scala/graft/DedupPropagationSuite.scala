package graft

import java.nio.file.Files

import graft.queries.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Convergence tests for the dedup-group propagation loop on graph
  * shapes the real corpus never exhibits but a 100 TB one could: a
  * long CHAIN component, whose diameter defeats plain neighbor-min
  * propagation (O(diameter) rounds — round 6 capped at 16 and threw).
  * The pointer-halving rung that activates past round 8 must collapse
  * it in O(log diameter) further rounds instead.
  *
  * Chain construction: doc i = 8 consecutive tokens of one globally
  * unique token stream, stride 1. Consecutive docs share 5 of their 6
  * 3-shingles (Jaccard 5/7 ≈ 0.714 ≥ 0.6 → edge); docs two apart
  * share 4 (4/8 = 0.5 < 0.6 → no edge). The pair graph is therefore
  * exactly a path: 41 docs → diameter 40.
  */
class DedupPropagationSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-propagation-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("dedup-chain").toString
    val nDocs = 41
    val tokensPerDoc = 8
    val stream = (0 until nDocs + tokensPerDoc - 1).map(i => f"tok$i%04d")
    val docs = (0 until nDocs).map { i =>
      (i.toLong, stream.slice(i, i + tokensPerDoc).mkString(" "),
        "en", "chain", tokensPerDoc * 7)
    }
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chain of diameter 40 converges to one component (pointer-halving)") {
    // force the DISTRIBUTED loop (the driver union-find fast path
    // would absorb a 41-doc graph and never exercise the halving rung
    // this suite exists to pin)
    spark.conf.set("spark.graft.cc.driverEdgeLimit", "0")
    try {
      val rows = TextOps.tDedupGroups(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(rows.length == 41)
      // every doc labels to the chain minimum — plain neighbor-min
      // needs 40 rounds for the far end; the halving rung must get
      // there well inside the 64-round failsafe
      assert(rows.forall(_._2 == 0L),
        s"non-minimum labels: ${rows.filterNot(_._2 == 0L).take(5).toSeq}")
    } finally spark.conf.unset("spark.graft.cc.driverEdgeLimit")
  }

  test("driver union-find fast path labels exactly like the loop") {
    // same corpus through both algorithms: the size-gated driver path
    // (default conf admits the 40-edge chain) must reproduce the
    // distributed loop's labels bit-for-bit
    TextOps.clearMemos()
    val viaDriver = TextOps.tDedupGroups(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    TextOps.clearMemos()
    spark.conf.set("spark.graft.cc.driverEdgeLimit", "0")
    try {
      val viaLoop = TextOps.tDedupGroups(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      assert(viaDriver.toSeq == viaLoop.toSeq)
    } finally spark.conf.unset("spark.graft.cc.driverEdgeLimit")
  }

  test("keep_best consumes the memoized grouping (no second propagation)") {
    // group 0 spans all 41 docs; exactly one representative survives
    val kept = SparkEntry.queries("t_dedup_keep_best")(spark, dir).collect()
    assert(kept.length == 1, kept.toSeq)
    assert(kept.head.getAs[Long]("group_id") == 0L)
    assert(kept.head.getAs[Long]("n_members") == 41L)
  }
}
