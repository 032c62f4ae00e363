package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization round 15): print the dedup refresh's
  * batch×corpus probe plan under BOTH strategies — the size-gated
  * broadcast fast path and the scratch-table SPJ — so the plan
  * evidence for the r15 probe gate lives in plans/r15/ next to the
  * gate dumps (the end-to-end gate explain ends at a checkpoint and
  * cannot show this internal join). */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.lake.LakeExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    val idx = TextOps.buildGroupIndex(spark,
      docs.filter(col("doc_id") % 10 =!= 1))
    val bPost = TextOps.shinglePostings(
        docs.filter(col("doc_id") % 10 === 1))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println("\n===== probe_broadcast =====")
    graft.Tables.load(spark, sfDir, "documents") // warm
    spark.table(graft.lake.Names.q(spark, idx.post)).toDF("doc_b", "sh")
      .join(broadcast(bPost.toDF("doc_id", "sh")), Seq("sh"))
      .groupBy(col("doc_id"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .explain("formatted")
    println("\n===== probe_spj =====")
    val scratch = LakeOps.fresh("plandump_probe")
    bPost.writeTo(s"lakeq.db.$scratch").using("lake")
      .partitionedBy(bucket(TextOps.GroupIdxBuckets, col("sh"))).create()
    TextOps.groupProbeCandidates(spark, scratch, idx.post)
      .explain("formatted")
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$scratch PURGE")
    Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
    spark.stop()
  }
}
