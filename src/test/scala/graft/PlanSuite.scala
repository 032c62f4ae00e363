package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regression tests for the headline queries: the
  * properties that make them hold at 100 TB — filters pushed to the
  * parquet scan, small sides broadcast, no accidental shuffles or
  * windows on corpus-sized paths, top-k pushed below windows. These
  * were hand-verified in rounds 1-4; this suite keeps them verified. */
class PlanSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  private def fmt(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }
  // formatted explain numbers every operator: "(5) Exchange" is a
  // shuffle, "(6) BroadcastExchange" is not
  private def shuffles(p: String): Int =
    "\\(\\d+\\) Exchange\\b".r.findAllIn(p).size
  private def has(p: String, op: String): Boolean =
    s"\\(\\d+\\) $op\\b".r.findAllIn(p).nonEmpty

  test("q_filter_pushdown: predicates reach the parquet scan; one shuffle") {
    assume(ready)
    val p = fmt("q_filter_pushdown")
    assert(p.contains("GreaterThan(l_quantity"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(shuffles(p) <= 1, s"expected a single aggregation shuffle:\n$p")
  }

  test("q_correlated_subquery: decorrelated to one agg + one join") {
    assume(ready)
    val p = fmt("q_correlated_subquery")
    // the whole point: no per-row subquery re-execution — Catalyst
    // rewrites both correlated scalars into ONE grouped aggregate
    // joined back on the correlation key
    assert(!has(p, "CartesianProduct") && !has(p, "BroadcastNestedLoopJoin"), p)
    assert("Join\\b".r.findAllIn(p).size >= 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("x_semantic_dedup: candidate list broadcasts, no cartesian") {
    assume(ready)
    val p = fmt("x_semantic_dedup")
    // candidates ≪ corpus: both vector fetches ride broadcast joins;
    // the embedding table never self-joins all-pairs
    assert(!has(p, "CartesianProduct") && !has(p, "BroadcastNestedLoopJoin"), p)
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"pair list must broadcast onto the embedding scan twice:\n$p")
    // ONLY id pairs may broadcast: an embedding column inside a
    // BroadcastExchange means candidate-count growth hits the
    // broadcast size limit (the round-7 defect). Formatted explain
    // details are blank-line-separated blocks; every broadcast
    // block's Input must be embedding-free.
    val bcastBlocks = p.split("\n\\s*\n")
      .filter(_.contains(") BroadcastExchange"))
    assert(bcastBlocks.nonEmpty, p)
    bcastBlocks.foreach(b =>
      assert(!b.contains("embedding") && !"\\be[ab]#".r.findAllIn(b).hasNext,
        s"embedding payload must never enter a broadcast exchange:\n$b"))
  }

  test("q1_pricing_summary: pushdown + partial aggregation, no join") {
    assume(ready)
    val p = fmt("q1_pricing_summary")
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(shuffles(p) <= 2, s"agg + order shuffles only:\n$p")
    assert(!has(p, "SortMergeJoin") && !has(p, "CartesianProduct"), p)
    // map-side partial aggregation before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q5_region_revenue: dimensions broadcast, filters pushed") {
    assume(ready)
    val p = fmt("q5_region_revenue")
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"region/nation/supplier/customer joins must broadcast:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), "region filter must push down")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order date range must push down")
    assert(!has(p, "CartesianProduct"), p)
  }

  test("v_ann_ivf: corpus path is shuffle-free (centroids only), no window") {
    assume(ready)
    val p = fmt("v_ann_ivf")
    assert(!has(p, "Window"), s"cell assignment must not use a window:\n$p")
    assert(!has(p, "SortMergeJoin"), p)
    assert(shuffles(p) <= 2,
      s"only the K-row centroid aggregations may shuffle:\n$p")
    assert(has(p, "BroadcastHashJoin"), "probe join must broadcast")
    assert(has(p, "TakeOrderedAndProject"), "top-k must not globally sort")
  }

  test("v_ann_ivf_k256: wide index keeps the toy-K plan shape") {
    assume(ready)
    // the whole point of the K=256 gate: index width must not change
    // the plan class — assignment stays a narrow projection (no
    // window, no n×k explode), probe stays a broadcast join, and the
    // only shuffles are the K-row centroid aggregations
    val p = fmt("v_ann_ivf_k256")
    assert(!has(p, "Window"), s"cell assignment must not use a window:\n$p")
    assert(!has(p, "SortMergeJoin"), p)
    assert(shuffles(p) <= 2,
      s"only the K-row centroid aggregations may shuffle:\n$p")
    assert(has(p, "BroadcastHashJoin"), "probe join must broadcast")
  }

  test("v_ann_ivf_pq: quantized scoring stays broadcast-probed, no window") {
    assume(ready)
    val p = fmt("v_ann_ivf_pq")
    assert(!has(p, "Window"), s"assignment/quantization must not window:\n$p")
    assert(!has(p, "SortMergeJoin") && !has(p, "CartesianProduct"), p)
    assert(has(p, "BroadcastHashJoin"), "probe join must broadcast")
    assert(has(p, "TakeOrderedAndProject"), "top-k must not globally sort")
    assert(shuffles(p) <= 2,
      s"only the K-row centroid aggregations may shuffle:\n$p")
  }

  test("v_knn_join: query side broadcasts, top-k pushed below the window") {
    assume(ready)
    val p = fmt("v_knn_join")
    assert(has(p, "BroadcastExchange"), p)
    assert(has(p, "WindowGroupLimit"),
      s"rank<=k must push as a group limit:\n$p")
    assert(!has(p, "CartesianProduct"), p)
  }

  test("v_neardup_pairs: banded LSH joins broadcast, no cartesian product") {
    assume(ready)
    val p = fmt("v_neardup_pairs")
    assert(!has(p, "CartesianProduct"),
      s"near-dup must stay bucketed, never all-pairs:\n$p")
    assert(has(p, "BroadcastHashJoin"), p)
  }

  test("t_bm25: corpus stats travel as a broadcast, not a shuffle join") {
    assume(ready)
    val p = fmt("t_bm25")
    assert(has(p, "BroadcastExchange"), s"1-row stats must broadcast:\n$p")
    assert(!has(p, "SortMergeJoin"), p)
  }

  test("t_dedup_exact: digest-keyed, bounded shuffles") {
    assume(ready)
    val p = fmt("t_dedup_exact")
    assert(shuffles(p) <= 2, s"digest shuffle (+order) only:\n$p")
    assert(!has(p, "CartesianProduct"), p)
  }

  test("t_chunk: pure map stage — explode + slice, no join, order only") {
    assume(ready)
    val p = fmt("t_chunk")
    assert(shuffles(p) <= 1, s"only the result ordering may shuffle:\n$p")
    assert(!has(p, "SortMergeJoin") && !has(p, "BroadcastHashJoin") &&
      !has(p, "Window"), p)
    assert(has(p, "Generate"), "chunk starts must explode, not loop")
  }

  test("v_quantize: narrow per-row transforms, no join or window") {
    assume(ready)
    val p = fmt("v_quantize")
    assert(shuffles(p) <= 1, s"only the result ordering may shuffle:\n$p")
    assert(!has(p, "SortMergeJoin") && !has(p, "BroadcastHashJoin") &&
      !has(p, "Window") && !has(p, "CartesianProduct"), p)
  }

  test("v_centroid_update: broadcast assignment, k×dim-bounded shuffles") {
    assume(ready)
    val p = fmt("v_centroid_update")
    // assignment must stay a broadcast argmax — never a window or an
    // n×k expansion join; the only exchanges are the (cell, dim) /
    // cell aggregations (k×dim keys, map-side partials) + result order
    assert(!has(p, "Window") && !has(p, "CartesianProduct") &&
      !has(p, "SortMergeJoin"), p)
    assert(shuffles(p) <= 4, s"k×dim agg + count + order shuffles only:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected map-side partial aggregation:\n$p")
  }

  test("v_kmeans: two broadcast-assignment passes, k×dim-bounded shuffles") {
    assume(ready)
    val p = fmt("v_kmeans")
    // each Lloyd iteration = one corpus scan with a broadcast argmax
    // assignment; every exchange is (cell, dim)- or cell-keyed
    // (k×dim rows, map-side partials) — a Window or n×k expansion
    // join here means the loop stopped being a scan-shaped pass
    assert(!has(p, "Window") && !has(p, "CartesianProduct") &&
      !has(p, "SortMergeJoin"), p)
    assert(shuffles(p) <= 6,
      s"two k×dim aggs + centroid rebuild + order shuffles only:\n$p")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"both assignment passes must broadcast their centroid row:\n$p")
  }

  test("t_unigram_logprob: tf joins token-partitioned, total broadcasts") {
    assume(ready)
    val p = fmt("t_unigram_logprob")
    // the 1-row grand total must broadcast; the corpus-sized tf join
    // may shuffle on token but never windows or goes quadratic
    assert(has(p, "BroadcastNestedLoopJoin") || has(p, "BroadcastExchange"), p)
    assert(!has(p, "Window"), p)
    assert(shuffles(p) <= 4, s"tf agg + token join + doc agg + order:\n$p")
  }

  test("t_pmi_bigrams: totals broadcast, joins token-keyed, no window") {
    assume(ready)
    val p = fmt("t_pmi_bigrams")
    // the 1-row (n, m) totals ride a broadcast; the unigram↔bigram
    // joins key on token/bigram — never a window, never quadratic
    assert(has(p, "BroadcastNestedLoopJoin") || has(p, "BroadcastExchange"), p)
    assert(!has(p, "Window") && !has(p, "CartesianProduct"), p)
  }

  test("t_mixture_sample: thresholds broadcast, no per-stratum window") {
    assume(ready)
    val p = fmt("t_mixture_sample")
    // the 5-row per-lang thresholds ride a broadcast onto one narrow
    // corpus filter pass; ranking docs within a stratum would plan a
    // Window PARTITIONED BY lang — one task per language at 100 TB
    assert(has(p, "BroadcastExchange"), p)
    assert(!has(p, "Window") && !has(p, "CartesianProduct") &&
      !has(p, "SortMergeJoin"), p)
  }

  test("t_dedup_keep_best: one struct-max aggregate after grouping") {
    assume(ready)
    val p = fmt("t_dedup_keep_best")
    // selection must be an aggregate, not a per-group window ranking;
    // grouping lineage is checkpoint-truncated upstream. struct-max
    // plans as SortAggregate (struct buffers aren't hash-aggregable) —
    // partial + final proves map-side combining still happens
    assert(!has(p, "Window") && !has(p, "CartesianProduct"), p)
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_asof_join: no join at all — one user_id shuffle + window") {
    assume(ready)
    val p = fmt("q_asof_join")
    // the as-of match is a running last() over a tagged union: any
    // Join node here means the plan regressed to an equi+range join
    // (which Spark executes as BNLJ at worst)
    assert(!p.contains("Join"), s"as-of must be join-free:\n$p")
    assert(has(p, "Window"), p)
    assert(shuffles(p) <= 3, s"user_id window + agg + order only:\n$p")
  }

  test("q_range_join: banded buckets keep the range join equi-keyed") {
    assume(ready)
    val p = fmt("q_range_join")
    // the whole point: a pure-inequality join would plan as
    // BroadcastNestedLoopJoin / CartesianProduct — O(n²) at scale
    assert(!has(p, "CartesianProduct") &&
      !has(p, "BroadcastNestedLoopJoin"),
      s"range join must stay bucket-equi-keyed:\n$p")
    assert(!has(p, "Window"), p)
  }

  test("q_grouping_sets: one Expand, one aggregation shuffle — not N scans") {
    assume(ready)
    val p = fmt("q_grouping_sets")
    assert(has(p, "Expand"), s"grouping sets should plan as Expand:\n$p")
    assert(shuffles(p) <= 2, s"agg + order shuffles only:\n$p")
    assert(!p.contains("Union"), s"must not rewrite to unioned scans:\n$p")
  }

  test("q_window_time_range: single user_id shuffle feeds the range frame") {
    assume(ready)
    val p = fmt("q_window_time_range")
    assert(has(p, "Window"), p)
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, s"window partition + order only:\n$p")
  }

  test("t_simhash_pairs: banded blocking, no cartesian, sigs checkpointed") {
    assume(ready)
    val p = fmt("t_simhash_pairs")
    assert(!has(p, "CartesianProduct") &&
      !has(p, "BroadcastNestedLoopJoin"),
      s"simhash pair mining must stay band-bucketed:\n$p")
    assert(!has(p, "Window"), p)
    // signature computation is materialized once (localCheckpoint →
    // the join reads an RDD scan, not two copies of the md5 pipeline)
    assert(p.contains("Scan ExistingRDD"), s"signatures should be checkpointed:\n$p")
    // ids-only candidate mining: the band-bucket self-join and the
    // pair distinct must not carry the sig arrays (round 7 hauled
    // sig_a/sig_b through both — widest-row shuffle under hot-band
    // skew). The sig arrays may appear only in the post-distinct
    // fetch joins. Locate the bucket join: the HashAggregate pair
    // dedup must aggregate exactly (doc_a, doc_b) keys.
    val dedupBlocks = p.split("\n\\s*\n").filter(b =>
      b.contains(") HashAggregate") && b.contains("doc_a") &&
        b.contains("doc_b"))
    assert(dedupBlocks.nonEmpty, s"pair distinct missing:\n$p")
    dedupBlocks.foreach(b =>
      assert(!b.contains("sig"),
        s"pair dedup must be ids-only (no sig payload):\n$b"))
  }

  test("t_source_cap: rank filter plans as map-side WindowGroupLimit") {
    assume(ready)
    val p = fmt("t_source_cap")
    // the property that makes a per-source cap affordable on a hot
    // source: each input partition keeps ≤10 rows per source BEFORE
    // the exchange (Partial WindowGroupLimit), so the shuffle carries
    // O(sources × partitions × 10), never the corpus
    assert(has(p, "WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
    assert(p.contains("Partial"), s"expected a partial (map-side) pass:\n$p")
    assert(!has(p, "Join"), p)
  }

  test("q_events_funnel: 4 chained stage windows share ONE user sort") {
    assume(ready)
    val p = fmt("q_events_funnel")
    // the sequential funnel dependency must ride a single user_id
    // exchange + sort: stage windows reuse the child ordering (no
    // per-stage re-sort), then one partial-aggregated rollup — the
    // final single-row stack may add its own tiny exchange
    // 2 sorts total: the shared user_id window sort + the final 4-row
    // presentation orderBy — one MORE would mean a stage re-sorted
    val winSorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
    assert(winSorts <= 2, s"stage windows must share one sort:\n$p")
    assert("\\(\\d+\\) Window\\b".r.findAllIn(p).size == 4, p)
    assert(!has(p, "Join"), p)
    assert(shuffles(p) <= 3, s"user exchange + rollup only:\n$p")
  }

  test("q_skew_salted_join: salt reaches the join key; no broadcast") {
    assume(ready)
    val p = fmt("q_skew_salted_join")
    // the demonstrated regime: dim too big to broadcast, hot fact key
    // — the join must be a shuffle-hash join whose key INCLUDES the
    // salt, so a hot user's rows spread over R sub-partitions
    assert(has(p, "ShuffledHashJoin"), s"expected shuffle-hash join:\n$p")
    assert(!has(p, "BroadcastHashJoin"), p)
    val joinBlock = p.split("\n\\s*\n")
      .find(b => b.contains(") ShuffledHashJoin")).getOrElse("")
    assert(joinBlock.contains("salt"),
      s"join keys must include the salt:\n$joinBlock")
  }

  test("q_events_anomaly: per-type stats broadcast back, no window") {
    assume(ready)
    val p = fmt("q_events_anomaly")
    // the hourly metrics frame materializes ONCE (checkpoint → both
    // consumers read an RDD scan; without it column pruning defeats
    // ReuseExchange and the events table is scanned twice); the
    // ≤types-row stats frame comes back as a broadcast, and only the
    // type rollup + presentation sort exchange remain
    assert(p.contains("Scan ExistingRDD"),
      s"hourly frame should be checkpointed once:\n$p")
    assert(has(p, "BroadcastHashJoin"), s"stats frame should broadcast:\n$p")
    assert(!has(p, "Window"), p)
    assert(shuffles(p) <= 2, s"type rollup + presentation sort only:\n$p")
  }

  test("q_events_retention: cohort join stays user-keyed, no window") {
    assume(ready)
    val p = fmt("q_events_retention")
    assert(!has(p, "Window"), p)
    assert(!has(p, "CartesianProduct") &&
      !has(p, "BroadcastNestedLoopJoin"), p)
  }
}
