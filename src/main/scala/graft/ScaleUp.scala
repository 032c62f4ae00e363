package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness: derive a larger documents corpus from an
  * existing scale factor so the dedup ring's scaling curve can be
  * MEASURED one decade up (the 100 TB arguments are design-sound;
  * one measured decade makes them empirical — COVERAGE.md round-9).
  *
  * Replication preserves the workload's shape honestly:
  *  - replica 0 is the original corpus byte-for-byte;
  *  - replica k > 0 prefixes "r<k>_" to EVERY token, so shingle
  *    equality WITHIN a replica is untouched (the dup-pair graph
  *    replicates exactly) while NO shingle collides ACROSS replicas —
  *    a 10× corpus of fresh content, not 10 mirrors whose cross-copy
  *    near-dups would explode the pair graph 100×;
  *  - doc_ids offset by replica × (max_id + 1), parities preserved
  *    (the offset is even), so the even-corpus/odd-batch convention
  *    of the incremental gates still partitions each replica in half.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$src/documents.parquet")
    val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
    // keep the id offset EVEN so doc-parity conventions survive
    val off = (maxId / 2 + 1) * 2
    val reps = spark.range(factor).toDF("rep")
    val tagged = base.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * off).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), "\\s+"),
              t => concat(lit("r"), col("rep"), lit("_"), t)), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    tagged.repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"""{"scaled_rows":$n,"factor":$factor,"src":"$src"}""")
    spark.stop()
  }
}
