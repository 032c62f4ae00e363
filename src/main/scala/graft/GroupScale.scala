package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the stored dedup-group index under a
  * REALISTIC nightly: build on (100-pct)% of a corpus, refresh with a
  * pct% batch, print the stage split as one JSON line. The driver
  * gate's 90/10 split keeps the oracle exercise meaningful at tiny
  * scale factors; THIS harness answers the 100 TB question — which
  * refresh stages are batch-proportional (mine/cap/advance/labels)
  * and which pay the index-read floor (the SPJ posting probe) — at
  * whatever corpus and batch fraction the measurement needs.
  *
  * Usage: runMain graft.GroupScale <sfDir> [batchPct=1]
  */
object GroupScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pct = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val nBatch = docs.filter(col("doc_id") % 100 < pct).count()
    val nCorpus = docs.count() - nBatch
    graft.StageTimes.drain()
    val idx = graft.StageTimes.timed("build") {
      graft.queries.TextOps.buildGroupIndex(spark,
        docs.filter(col("doc_id") % 100 >= pct))
    }
    graft.StageTimes.timed("refresh") {
      graft.queries.TextOps.refreshGroupIndexMined(spark, idx,
        docs.filter(col("doc_id") % 100 < pct))
    }
    val stages = graft.StageTimes.drain()
    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"harness":"group_scale","sf":"$dir","batch_pct":$pct,""" +
      s""""corpus_docs":$nCorpus,"batch_docs":$nBatch,"stages":{""" +
      stages.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + r3(v) }.mkString(",") + "}}")
    Seq(idx.post, idx.df, idx.size, idx.labels).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE"))
    spark.stop()
  }
}
