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
          // trim before splitting (matching TextOps.toks): leading
          // whitespace would yield an empty first token, giving every
          // k>0 replica a bare "r<k>_" token replica 0 lacks — the
          // replica's shingle multiset must be exactly the original's
          .otherwise(array_join(
            transform(split(trim(col("text")), "\\s+"),
              t => concat(lit("r"), col("rep"), lit("_"), t)), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    tagged.repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()

    // Embeddings scale with the DOCUMENTS id offset, so the
    // cross-modal join (doc_id = vec_id) stays aligned per replica:
    //  - replica 0 is the original vectors byte-for-byte;
    //  - replica k > 0 applies a deterministic per-replica ±1 sign
    //    mask (md5 parity of "k_dim"). A common sign flip preserves
    //    every within-replica cosine EXACTLY (each replica keeps its
    //    neighbor graph, IVF structure, and near-dup pair set), while
    //    cross-replica similarity collapses: the mask is Rademacher
    //    noise against any shared component. (A cyclic dimension
    //    SHIFT — the first attempt — also preserves within-replica
    //    cosines but left replicas correlated through the corpus's
    //    common mean direction: sf1 grew 1.2k cross-replica near-dup
    //    pairs where an honest 10× corpus has ~70.)
    //  - centroid convention (first K vec_ids) still lands in
    //    replica 0, matching the gates' deterministic stand-in.
    val embPath = new org.apache.hadoop.fs.Path(s"$src/embeddings.parquet")
    val fs = embPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nEmb = if (fs.exists(embPath)) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      def maskFor(rep: Int): Seq[Float] = (0 until dim).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val b = md.digest(s"${rep}_$i".getBytes("UTF-8"))
        if ((b(0) & 1) == 1) 1.0f else -1.0f
      }
      val masks = array((0 until factor).map(r =>
        typedLit(if (r == 0) Seq.fill(dim)(1.0f) else maskFor(r))): _*)
      val scaled = emb.crossJoin(reps)
        .select(
          (col("vec_id") + col("rep") * off).as("vec_id"),
          zip_with(col("embedding"),
            element_at(masks, col("rep").cast("int") + 1),
            (x, m) => x * m).as("embedding"),
          col("label"))
      scaled.repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      spark.read.parquet(s"$out/embeddings.parquet").count()
    } else 0L
    println(s"""{"scaled_rows":$n,"scaled_vectors":$nEmb,"factor":$factor,"src":"$src"}""")
    spark.stop()
  }
}
