package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (optimization round): decompose the SPJ probe's
  * wall time into analysis / optimization / physical planning /
  * execution, to find where its job-free driver seconds go. */
object ProbeDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.lake.LakeExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dissect] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val idx = t("build") {
      TextOps.buildGroupIndex(spark,
        docs.filter(col("doc_id") % 10 =!= 1))
    }
    // mimic the refresh's probe: scratch table + SPJ against postings
    (1 to 3).foreach { i =>
      val bPost = TextOps.shinglePostings(
        docs.filter(col("doc_id") % 10 === 1))
      val scratch = LakeOps.fresh("dissect_probe")
      t(s"scratch create $i") {
        bPost.writeTo(s"lakeq.db.$scratch").using("lake")
          .partitionedBy(bucket(TextOps.GroupIdxBuckets,
            col("sh"))).create()
      }
      val probe = t(s"probe build df $i") {
        TextOps.groupProbeCandidates(spark, scratch, idx.post)
      }
      t(s"probe analyze $i") { probe.queryExecution.analyzed }
      t(s"probe optimize $i") { probe.queryExecution.optimizedPlan }
      // sample this thread's stack during physical planning to find
      // the hot driver-side frames
      val me = Thread.currentThread()
      val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = me.getStackTrace
          // first graft/spark frame below the sampler noise
          st.filterNot(_.getClassName.startsWith("java."))
            .take(6).foreach { fr =>
              val k = fr.getClassName + "." + fr.getMethodName
              hits.merge(k, 1, (a, b) => a + b)
            }
          Thread.sleep(10)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      t(s"probe physical $i") { probe.queryExecution.executedPlan }
      sampling = false
      sampler.join()
      import scala.jdk.CollectionConverters._
      hits.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, n) =>
        println(f"[dissect-hot] $n%4d  $k") }
      t(s"probe execute $i") {
        probe.write.format("noop").mode("overwrite").save()
      }
      t(s"probe ckpt $i") {
        probe.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
      }
      spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$scratch PURGE")
    }
    spark.stop()
  }
}
