package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish corpus (see TESTDATA.md).
  *
  * Every table is a single columnar parquet file; `spark.read.parquet`
  * gives a vectorized scan with filter pushdown + column pruning for
  * free, which is the scale path: at 100 TB these reads become
  * multi-file partitioned scans with identical plan shape.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf) and convert to
    * µs TimestampType (values are µs-aligned, so this is lossless).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // some scale factors store µs-precision NTZ instead of nanos:
      // normalize to TimestampType (naive value read as a UTC instant,
      // session-TZ independent) so downstream epoch math — e.g.
      // unix_micros in the sessionization query — sees ONE type
      // everywhere
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.to_utc_timestamp(
          org.apache.spark.sql.functions.col("ts"), "UTC"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Floor a narrow scan's parallelism before per-row-HEAVY map work
    * (tokenize + shingle explodes, per-vector dot products): a small
    * corpus arrives as one parquet file with one row group, so the
    * scan is one split and every downstream map side runs on ONE core
    * (measured: the shingle-posting materialization at sf0.1 is 1.1 s
    * serial vs 0.4 s spread). The gate is the ACTUAL partition count,
    * not a constant: at production scale the scan already carries >=
    * default-parallelism splits and this is a no-op — no conf tuned
    * to local mode, no shuffle added where the data is already wide.
    * Only for consumers whose per-row work dwarfs one exchange of the
    * input; narrow aggregates keep the raw scan. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    // hash on the leading column (doc_id / vec_id — unique keys), not
    // round-robin: keyless repartition first pays a LOCAL SORT of the
    // full rows (sortBeforeRepartition, needed for deterministic
    // retries) — on text-carrying rows that sort costs more than the
    // exchange itself. A deterministic hash key needs no such sort.
    else df.repartition(target,
      org.apache.spark.sql.functions.col(df.columns.head))
  }
}
