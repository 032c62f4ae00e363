package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling, both halves of the strategy the engine relies on at
  * 100 TB:
  *
  *  - AQE skew-join (this suite): for SORT-MERGE joins inside a batch
  *    query, the runtime re-plans a hot shuffle partition into
  *    multiple reducer splits — no code change, no salt. This spec
  *    proves the mechanism actually fires under this build's configs
  *    (it is easy to believe AQE "handles skew" while a threshold or
  *    a join-strategy choice silently disables it).
  *  - Deterministic salting (`q_skew_salted_join`, PlanSuite): for
  *    the regimes AQE cannot reach — shuffle-hash joins,
  *    storage-partitioned joins, streaming — where the key space
  *    itself must be widened.
  */
class SkewSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("skew-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // force the sort-merge regime (a broadcast would hide the skew)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.join.preferSortMergeJoin", "true")
      // thresholds scaled down so a ~MB hot partition counts as
      // skewed on test data; production uses the defaults (factor 5 /
      // 256 MB) against multi-GB partitions — same mechanism
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits the hot key's partition in a sort-merge join") {
    // key 0 holds 100k of 103k left rows — one reducer would sort and
    // join ~97% of the data without AQE
    val left = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(3000).select((col("id") % 3 + 1).as("k"),
        col("id").as("v")))
    val right = spark.range(4).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    // NOTE a groupBy on the join key downstream would make AQE
    // DECLINE the skew split (splitting breaks the aggregate's
    // required hash distribution and would add a shuffle — the
    // documented forceOptimizeSkewedJoin trade-off); the asserted
    // query aggregates without a key so the join output is free
    val joined = left.join(right, "k")
      .select((col("v") + col("w")).as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val row = joined.collect().head
    // correctness first: the split must not change the result
    assert(row.getLong(0) == 103000L)
    // the executed (adaptive-final) plan must mark the join skew-split:
    // SortMergeJoin prints "(skew=true)" once OptimizeSkewedJoin fired
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE skew-join did not fire — thresholds or strategy drifted:\n$p")
  }

  test("skew split declined when it would break a same-key aggregate " +
      "(the regime that needs salting or forceOptimizeSkewedJoin)") {
    val left = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(3000).select((col("id") % 3 + 1).as("k"),
        col("id").as("v")))
    val right = spark.range(4).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val joined = left.join(right, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    val rows = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 100000L && rows(1L) == 1000L)
    // same hot key, same thresholds — but the aggregate's required
    // distribution pins the partitioning, so AQE leaves the hot
    // partition whole: exactly where q_skew_salted_join's explicit
    // salt (or forceOptimizeSkewedJoin's extra shuffle) is the answer
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("skew=true"), p)
  }
}
