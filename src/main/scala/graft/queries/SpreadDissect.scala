package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev measurement (optimization round 15): is the single-split
  * documents scan serializing the corpus-explode map sides (shingle
  * posting build, minhash signatures), and does spreading the scan
  * pay for its shuffle at bench scale? Times each variant three
  * times; nothing persists. */
object SpreadDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[spread] $label%-34s run$i ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    }
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    println(s"[spread] docs partitions = ${docs.rdd.getNumPartitions}")
    def posting(d: org.apache.spark.sql.DataFrame) =
      TextOps.shinglePostings(d)
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
    t("posting ckpt (as-is)") { posting(docs).count() }
    t("posting ckpt (repartition 32)") { posting(docs.repartition(32)).count() }
    t("posting ckpt (hash doc_id 32)") {
      posting(docs.repartition(32, col("doc_id"))).count() }
    def uniAgg(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(lower(col("text")), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    t("token agg (as-is)") { uniAgg(docs) }
    t("token agg (repartition 32)") { uniAgg(docs.repartition(32)) }
    t("token agg (hash doc_id 32)") {
      uniAgg(docs.repartition(32, col("doc_id"))) }
    spark.stop()
  }
}
