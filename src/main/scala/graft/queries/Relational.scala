package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators over the TPC-H-ish corpus: scan/filter/
  * project (pushdown-friendly), hash aggregate, broadcast + shuffle
  * joins, top-k, window functions, semi/anti joins, set ops, rollup/
  * cube, and event-time aggregation/sessionization.
  *
  * Scale notes (100 TB design intent):
  *  - dimension joins (region/nation/supplier/customer) are
  *    `broadcast(...)` — they stay tiny relative to the fact tables;
  *  - fact-side filters are plain `Column` predicates on the scan so
  *    Catalyst pushes them into the parquet reader (verified via
  *    .explain PushedFilters);
  *  - aggregates are declarative groupBy/agg → partial+final
  *    HashAggregate with map-side combine, no driver-side collect;
  *  - window queries partition on high-cardinality keys (custkey /
  *    suppkey / user_id) so state per partition stays bounded;
  *  - every query has a deterministic total order for oracle parity.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))
  private def r2(c: Column): Column = round(c, 2)

  /** TPC-H Q1 flavor: pricing summary. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        r2(avg(col("l_quantity"))).as("avg_qty"),
        r2(avg(col("l_extendedprice"))).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6 flavor: selective-filter scalar aggregate — the whole
    * query collapses to a single pushdown scan + partial sums. */
  def q6RevenueForecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))

  /** TPC-H Q3 flavor: shipping priority (3-way join, top-10). */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < ts("1998-06-01 00:00:00"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > ts("1998-06-01 00:00:00"))
    // customer grows with scale factor — no broadcast hint; AQE
    // converts to broadcast at runtime when the build side is small
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 flavor: revenue by nation for one region/year.
    * No broadcast hints: region/nation are tiny (AQE broadcasts them),
    * but supplier and customer grow with scale factor, so the planner
    * must stay free to shuffle-join them at 100 TB. */
  def q5RegionRevenue(s: SparkSession, d: String): DataFrame = {
    val dims =
      Tables.region(s, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("s_nationkey") === col("n_nationkey"))
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(dims, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top spenders: join + agg + deterministic top-k. */
  def qTopCustomers(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(r2(sum(col("o_totalprice"))).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"),
        col("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(20)

  /** Pure pushdown scan: selective filter + narrow projection. The
    * physical plan must show PushedFilters + a 4-column ReadSchema. */
  def qFilterPushdown(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 49.5 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Distinct cardinalities (expanding-aggregate path). */
  def qDistinctCounts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Window: top-3 orders per customer by price. */
  def qWindowTopOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        r2(col("o_totalprice")).as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Window: running quantity per supplier.
    *
    * The frame order ends in `l_quantity` to make the ROWS frame
    * TIE-PROOF: the synthetic lineitem contains duplicate
    * (l_orderkey, l_linenumber) rows, including a pair tying on ALL
    * of (suppkey, shipdate, orderkey, linenumber) with different
    * quantities — without the quantity key the running sum at that
    * tie depends on sort stability, and DuckDB's parallel sort
    * actually flips it RUN TO RUN (caught by an sf0.1 oracle sweep:
    * one row oscillating ±3). With quantity last, any remaining ties
    * agree on every projected column AND on quantity, so swapping
    * them permutes identical output rows — the result SET is
    * deterministic in both engines. */
  def qWindowRunningQty(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .withColumn("running_qty", r2(sum(col("l_quantity")).over(w)))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Left-semi join (EXISTS): customers that have orders. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join (NOT EXISTS): customers without orders. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Set op: custkeys never seen in orders (EXCEPT = distinct). */
  def qSetExcept(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("k"))
      .except(Tables.orders(s, d).select(col("o_custkey").as("k")))
      .orderBy(col("k"))

  /** Set op: custkeys present on both sides. */
  def qSetIntersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("k"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))
      .orderBy(col("k"))

  /** ROLLUP over returnflag/linestatus. */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE over order status/priority. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), r2(sum(col("o_totalprice"))).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** GROUPING SETS — the general form rollup/cube specialize. The
    * non-hierarchical set list ((f,s),(f),(s),()) is one Expand over
    * the scan (4 rows per input row, map-side partial-aggregated
    * immediately) + ONE shuffle — not four scans unioned, which is
    * what a hand-rolled equivalent costs at 100 TB. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Sliding time-range window: each event's total value over the SAME
    * user's preceding hour — a RANGE frame on the event-time axis
    * (row frames can't express "1 hour", only "k rows"). One user_id
    * shuffle; frame state per partition is bounded by the hour span,
    * not the partition length. */
  def qWindowTimeRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(s, d)
      .withColumn("hour_value", r2(sum(col("value")).over(w)))
      .select(col("event_id"), col("user_id"), col("hour_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Scalar subquery: orders priced far above the global average. The
    * scalar aggregates first (one partial+final pass), then rides a
    * 1-row broadcast onto every row — no correlated per-row
    * re-evaluation, no shuffle on the fact side. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val avgP = ord.agg(avg(col("o_totalprice")).as("avg_price"))
    ord.crossJoin(broadcast(avgP))
      .filter(col("o_totalprice") > col("avg_price") * 1.8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), r2(max(col("o_totalprice"))).as("max_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Event-time tumbling-hour aggregation on the events stream table. */
  /** Batch twin of [[graft.streaming.EventStreams.dedup]]: distinct
    * event identity (user, type, minute), rolled up per type so the
    * gate result is small and stable. */
  def qEventsDedup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("minute"))
      .distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Batch twin of [[graft.streaming.EventStreams.attribution]]: each
    * purchase joins the same user's clicks in the preceding hour —
    * a single user_id-keyed shuffle join; the time-range predicate
    * evaluates post-join on co-located rows. */
  def qEventsAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_attrib"))
      .orderBy(col("user_id"))
  }

  /** Batch twin of [[graft.streaming.EventStreams.slidingCounts]]:
    * SLIDING 1-hour windows on a 15-min slide — Spark's `window()`
    * expands each event to its 4 covering windows (a narrow 4× fan-out,
    * no join) before one aggregation shuffle. Epoch-aligned starts
    * match DuckDB `time_bucket` exactly (both origins are 15-min
    * aligned). */
  def qEventsSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))

  def qEventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization: 30-min-gap sessions per user, fully windowed —
    * no per-user collect, scales with user cardinality. */
  def qEventsSessions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** As-of join: each purchase picks the latest click by the same user
    * at or before the purchase time (financial-tick / attribution
    * semantics Spark has no native operator for).
    *
    * Spark-first shape: NOT a join at all — union both sides tagged,
    * ONE shuffle on user_id, and a running `last(click, ignoreNulls)`
    * window carries the most recent click forward onto each purchase
    * row. At 100 TB this is a single hash partitioning by a
    * high-cardinality key with a sort inside each partition — no
    * range-probe explosion, no equi+inequality join fallback to
    * BroadcastNestedLoop. Clicks sort BEFORE purchases on ts ties
    * (tag 0 < 1) to make the match inclusive, like DuckDB's
    * `ASOF ... ON p.ts >= c.ts`. Lag sums stay in exact integer
    * microseconds so the oracle compare is float-free. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        unix_micros(col("ts")).as("click_us"),
        lit(null).cast("long").as("purchase_us"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("click_us"),
        unix_micros(col("ts")).as("purchase_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purch)
      .withColumn("last_click_us",
        last(col("click_us"), ignoreNulls = true).over(w))
      .filter(col("purchase_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("last_click_us")).as("n_matched"),
        sum(col("purchase_us") - col("last_click_us")).as("lag_us_sum"))
      .orderBy(col("user_id"))
  }

  /** Range join: count click/purchase pairs (across ALL users) where
    * the click lands in the 10 minutes before the purchase.
    *
    * A naive inequality-only join plans as BroadcastNestedLoopJoin /
    * CartesianProduct — O(n²) and dead at scale. Banded bucketing
    * turns it into an equi-join: each click maps to ONE time bucket
    * of exactly the window width, each purchase probes its own bucket
    * and the previous one (any click within one band-width back lives
    * in one of those two), and the residual range predicate refines
    * post-join on co-located rows. Bucket ids use integer `div` so
    * band edges are exact. PlanSuite locks the no-cartesian shape. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val bandUs = 600L * 1000000L // band width == window width (10 min)
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("cus"))
      .withColumn("bucket", expr(s"cus div ${bandUs}L"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("pts"), unix_micros(col("ts")).as("pus"))
      .withColumn("bucket",
        explode(array(expr(s"pus div ${bandUs}L"),
          expr(s"pus div ${bandUs}L") - 1)))
    purch.join(clicks, Seq("bucket"))
      .filter(col("cus") <= col("pus") && col("cus") > col("pus") - bandUs)
      .groupBy(date_trunc("hour", col("pts")).as("hour"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hour"))
  }

  /** Exact DISCRETE percentiles per group (SQL-standard
    * percentile_disc): both engines return an actual element of the
    * column, read verbatim from the same parquet — bit-identical, no
    * interpolation arithmetic. (The continuous variant is a hash-gate
    * trap: an even-count median is the midpoint of two prices, which
    * can land exactly on a round(,2) .005 boundary where Spark/DuckDB
    * fp noise rounds to different sides — seen at sf0.001.) Exact
    * percentile buffers per-group values — fine for bounded group
    * cardinality (3 flags here); the 100 TB scale path for
    * high-cardinality groups is `approx_percentile` (KLL-style sketch,
    * mergeable map-side), which the oracle can't hash-match. */
  def qPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)").as("p75"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99"))
      .orderBy(col("l_returnflag"))

  /** Pivot: daily event counts, one column per event type. The value
    * list is EXPLICIT — `.pivot(col)` without values runs a distinct
    * job over the fact table first, a full extra scan at 100 TB. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Semi-structured extraction: parse the JSON props column with an
    * EXPLICIT schema (`from_json`) — one typed parse per row, struct
    * fields prune like ordinary columns. The 100 TB anti-patterns are
    * schema inference (`schema_of_json` = extra full scan) and
    * repeated `get_json_object` calls (one parse per field). */
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k",
        from_json(col("props"), lit("k BIGINT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** UNPIVOT (melt): wide per-flag measure columns to long
    * (measure, value) rows via Spark's native `unpivot` — planned as
    * one Expand over the already-aggregated rows (each row fans out
    * to one row per measure), NOT a union of N re-scans of the fact
    * table; the wide aggregate itself is a single lineitem pass. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(r2(sum(col("l_quantity"))).as("qty"),
        r2(sum(col("l_extendedprice"))).as("price"),
        r2(sum(col("l_discount"))).as("disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")), "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** Dimension enrichment of the event stream — batch twin of
    * [[graft.streaming.EventStreams.enrich]]: events pick up the
    * customer's market segment through an explicit `broadcast` dim
    * join (no fact-side shuffle before the aggregate), then roll up
    * per (segment, event type). At 100 TB the fact side streams
    * through map tasks; only the final low-cardinality aggregate
    * exchanges. */
  def qEventsEnrich(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("c_mktsegment"), col("event_type"))

  /** Correlated scalar subquery — each order compares against ITS
    * customer's average. Catalyst decorrelates this into one
    * aggregate over orders + ONE equi-join back (no per-row
    * re-execution — the naive reading would be O(rows × subquery)),
    * which is the only shape that survives 100 TB. Expressed in SQL
    * to exercise the subquery planner itself rather than a
    * hand-written join. The above-average test runs in EXACT integer
    * cents (`price·n > Σprice` instead of `price > Σprice/n`): a
    * float average differs by an ulp between engines' summation
    * orders, and a boundary row flipping is a hash-gate mismatch. */
  def qCorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("q_corr_orders")
    s.sql(
      """SELECT o_custkey, count(*) AS n_above,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM q_corr_orders o
        |WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
        |      (SELECT count(*) FROM q_corr_orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |       FROM q_corr_orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)
  }

  /** Ordered conversion funnel signup → view → click → purchase: a
    * user reaches stage k when an event of type k occurs AT OR AFTER
    * that user's first stage-(k-1) reach. Classic product-analytics
    * operator with genuinely sequential semantics — no plain aggregate
    * expresses "first view after first signup".
    *
    * Spark-first shape: ONE shuffle. Four chained running-min window
    * columns over the same (user_id / ts, event_id) window spec —
    * `s1` = earliest signup so far; `s2` = earliest view at a row
    * where `s1` is already set; `s3`/`s4` likewise — so the sequential
    * dependency rides a single partition-sort that Spark plans as one
    * exchange + one sort with four Window operators on top (no
    * re-sort: each reuses the child ordering). A per-user any-reach
    * aggregate and a 4-row stack finish on the driver-side-tiny frame.
    * At 100 TB this is exactly the sessionization cost — one
    * user-keyed exchange — regardless of funnel depth. */
  def qEventsFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def firstAfter(tpe: String, prev: Option[String]): Column = {
      val hit = col("event_type") === tpe &&
        prev.fold(lit(true))(p => col(p).isNotNull)
      min(when(hit, col("ts"))).over(w)
    }
    val per = Tables.events(s, d)
      .withColumn("s1", firstAfter("signup", None))
      .withColumn("s2", firstAfter("view", Some("s1")))
      .withColumn("s3", firstAfter("click", Some("s2")))
      .withColumn("s4", firstAfter("purchase", Some("s3")))
      .groupBy(col("user_id"))
      .agg(max(col("s1")).as("m1"), max(col("s2")).as("m2"),
        max(col("s3")).as("m3"), max(col("s4")).as("m4"))
    def reach(c: String): Column =
      sum(when(col(c).isNotNull, 1L).otherwise(0L))
    per.agg(reach("m1").as("signup"), reach("m2").as("view"),
        reach("m3").as("click"), reach("m4").as("purchase"))
      .selectExpr("""stack(4,
        1L, 'signup',   signup,
        2L, 'view',     view,
        3L, 'click',    click,
        4L, 'purchase', purchase) AS (step, stage, n_users)""")
      .orderBy(col("step"))
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * (cohort day, day offset) the number of distinct cohort members
    * active that many days later — the engagement-decay matrix.
    *
    * Shape: one user-keyed aggregate for cohort assignment, one
    * user-keyed join back (AQE broadcasts the per-user frame when it
    * fits; co-partitioned hash join otherwise — both sides share the
    * user_id key so the join adds no third shuffle), one
    * (cohort, offset) count-distinct. All keys are high-cardinality
    * (users) or tiny (day pairs); nothing is per-event stateful. */
  def qEventsRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Skew-salted large-large join — the explicit mitigation for a hot
    * join key when the runtime can't fix it for you: AQE's skew-join
    * only splits SORT-MERGE partitions inside a batch query (no help
    * for shuffle-hash joins, storage-partitioned joins, or streaming),
    * and a dim side too big to broadcast leaves the naive plan with
    * one straggler task holding the hot key's entire fan-in.
    *
    * The salt is DETERMINISTIC (`event_id % R`), not `rand()`: same
    * result every run and engine, so correctness is oracle-checkable —
    * the oracle is the UNSALTED join, which must be identical by
    * construction. Fact rows scatter across R sub-keys of
    * (user_id, salt); the dim side replicates R ways via a literal
    * explode (R×|dim| rows — the explicit price of bounding every
    * task at 1/R of a hot key). `shuffle_hash` hint pins the
    * broadcast-ineligible regime being demonstrated; the plan lock
    * asserts the salted key reaches the exchange. */
  def qSkewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val R = 8
    val ev = Tables.events(s, d)
      .withColumn("salt", (col("event_id") % R).cast("int"))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(lit((0 until R).toArray)))
    ev.join(dim.hint("shuffle_hash"),
        col("user_id") === col("c_custkey") && ev("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Ingestion-metrics anomaly detection: flag (hour, event_type)
    * buckets whose count deviates more than 2σ from that type's
    * hourly mean — the data-quality tripwire a pipeline runs over its
    * own volume metrics to catch crawler outages and floods.
    *
    * The z-test runs in EXACT integers: with C hours, S = Σn,
    * Q = Σn², flagging |z| > 2 is `C·(n·C − S)² > 4·(C·Q − S²)·C`
    * divided through — `(n·C − S)² > 4·(C·Q − S²)` — all BIGINT, so
    * no float mean/stddev crosses an engine boundary (the
    * q_correlated_subquery exact-cents trick applied to a variance).
    * Shape: one (hour, type) count aggregate, one per-type rollup
    * (≤ types rows, broadcast back), one narrow filter — metrics
    * cardinality, never event cardinality, crosses any exchange
    * after the first aggregate. */
  def qEventsAnomaly(s: SparkSession, d: String): DataFrame = {
    // materialize the metrics frame once: both consumers (the bucket
    // stream and the per-type rollup) would otherwise re-plan the
    // subtree — column pruning gives the two hourly aggregates
    // different outputs, so ReuseExchange can NOT dedupe them and the
    // events table would be scanned twice (2× the dominant cost at
    // 100 TB). The checkpoint is hours×types rows — metrics-sized.
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("q"))
    val dev = col("n") * col("c") - col("s")
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(dev * dev > lit(4L) * (col("c") * col("q") - col("s") * col("s")))
      .select(col("hour"), col("event_type"), col("n"),
        (dev * dev).as("dev2_scaled"),
        (col("c") * col("q") - col("s") * col("s")).as("var_scaled"))
      .orderBy(col("hour"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q6_revenue_forecast" -> (q6RevenueForecast _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "q_top_customers" -> (qTopCustomers _),
    "q_filter_pushdown" -> (qFilterPushdown _),
    "q_distinct_counts" -> (qDistinctCounts _),
    "q_window_top_orders" -> (qWindowTopOrders _),
    "q_window_running_qty" -> (qWindowRunningQty _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_set_except" -> (qSetExcept _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_window_time_range" -> (qWindowTimeRange _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_sessions" -> (qEventsSessions _),
    "q_events_dedup" -> (qEventsDedup _),
    "q_events_attribution" -> (qEventsAttribution _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_percentiles" -> (qPercentiles _),
    "q_pivot" -> (qPivot _),
    "q_json_extract" -> (qJsonExtract _),
    "q_unpivot" -> (qUnpivot _),
    "q_events_enrich" -> (qEventsEnrich _),
    "q_correlated_subquery" -> (qCorrelatedSubquery _),
    "q_events_sliding" -> (qEventsSliding _),
    "q_events_funnel" -> (qEventsFunnel _),
    "q_events_retention" -> (qEventsRetention _),
    "q_skew_salted_join" -> (qSkewSaltedJoin _),
    "q_events_anomaly" -> (qEventsAnomaly _),
  )

  /** DuckDB-dialect equivalents for the driver's oracle. Column names
    * and ordering must match the Spark results exactly. */
  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),2) AS avg_qty,
        |  round(avg(l_extendedprice),2) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM region, nation, supplier, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND s_nationkey = n_nationkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        |  round(sum(o_totalprice),2) AS total_spend,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 20""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 49.5 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2)
        |    AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS
        |  ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_window_time_range" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
        |    AS hour_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(max(o_totalprice),2) AS max_price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value),2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM (SELECT user_id,
        |        CASE WHEN prev_us IS NULL
        |               OR epoch_us(ts) - prev_us > 1800*1000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM (SELECT user_id, ts,
        |              lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id) AS prev_us
        |            FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_dedup" ->
      """SELECT event_type, count(*) AS n
        |FROM (SELECT DISTINCT user_id, event_type,
        |        date_trunc('minute', ts) AS minute FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_attribution" ->
      """SELECT p.user_id, count(*) AS n_attrib
        |FROM (SELECT user_id, ts AS purchase_ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts AS click_ts FROM events
        |      WHERE event_type = 'click') c USING (user_id)
        |WHERE c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    // sum(BIGINT) is HUGEINT in DuckDB — cast, or the driver's
    // type-sensitive hash mismatches (the lake_mv_incremental trap)
    "q_asof_join" ->
      """SELECT p.user_id, count(*) AS n_purchases,
        |  count(c.click_ts) AS n_matched,
        |  sum(epoch_us(p.purchase_ts) - epoch_us(c.click_ts))::BIGINT
        |    AS lag_us_sum
        |FROM (SELECT user_id, ts AS purchase_ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts AS click_ts FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    "q_range_join" ->
      """SELECT date_trunc('hour', p.pts) AS hour, count(*) AS n_pairs
        |FROM (SELECT ts AS pts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT ts AS cts FROM events WHERE event_type = 'click') c
        |  ON c.cts <= p.pts AND c.cts > p.pts - INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP —
    // cast, or the driver's type-sensitive compare mismatches
    "q_pivot" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
        |  max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS price,
        |  round(sum(l_discount), 2) AS disc
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'price', price FROM a
        |UNION ALL
        |SELECT l_returnflag, 'disc', disc FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q_events_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT o_custkey, count(*) AS n_above,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders o
        |WHERE round(o.o_totalprice * 100)::BIGINT *
        |      (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(round(o2.o_totalprice * 100)::BIGINT)::BIGINT
        |       FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q_events_sliding" ->
      """WITH w AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '15 minutes', ts)
        |      - to_minutes(15 * k) AS w_start
        |  FROM events, unnest(range(4)) AS t(k))
        |SELECT w_start, event_type, count(*) AS n
        |FROM w GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "q_events_funnel" ->
      """WITH w1 AS (SELECT user_id, ts, event_type, event_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) OVER win AS s1
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'view'
        |      AND s1 IS NOT NULL THEN ts END) OVER win AS s2
        |  FROM w1
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'click'
        |      AND s2 IS NOT NULL THEN ts END) OVER win AS s3
        |  FROM w2
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w4 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
        |      AND s3 IS NOT NULL THEN ts END) OVER win AS s4
        |  FROM w3
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT user_id, max(s1) AS m1, max(s2) AS m2,
        |        max(s3) AS m3, max(s4) AS m4
        |      FROM w4 GROUP BY user_id),
        |c AS (SELECT
        |  sum(CASE WHEN m1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN m2 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN m3 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN m4 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS purchase
        |FROM u)
        |SELECT 1::BIGINT AS step, 'signup' AS stage, signup AS n_users FROM c
        |UNION ALL SELECT 2, 'view', view FROM c
        |UNION ALL SELECT 3, 'click', click FROM c
        |UNION ALL SELECT 4, 'purchase', purchase FROM c
        |ORDER BY step""".stripMargin,
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day
        |            FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day::TIMESTAMP AS cohort_day,
        |  date_diff('day', cohort_day, day)::BIGINT AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q_events_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS c, sum(n)::BIGINT AS s,
        |         sum(n*n)::BIGINT AS q
        |       FROM h GROUP BY 1)
        |SELECT hour, event_type, n,
        |  (n*c - s)*(n*c - s) AS dev2_scaled,
        |  (c*q - s*s) AS var_scaled
        |FROM h JOIN st USING (event_type)
        |WHERE (n*c - s)*(n*c - s) > 4*(c*q - s*s)
        |ORDER BY hour, event_type""".stripMargin,
    // the UNSALTED join: salting must be result-invariant
    "q_skew_salted_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
  )
}
