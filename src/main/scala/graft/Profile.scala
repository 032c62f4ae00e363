package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev measurement harness (optimization rounds): run selected gates
  * under a SparkListener and print per-job wall times, stage/task
  * counts, and totals — the "where do the seconds go" attribution the
  * bench's per-gate numbers lack. Mirrors Bench's session shape
  * (same confs/extensions, master from SPARK_GRAFT_CPUS) so job
  * structure matches what the driver measures; results print to
  * stdout only, nothing persists.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Profile <name-substrings...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.lake.LakeExtensions)
      .withExtensions(new graft.mv.MvExtensions)
      .withExtensions(new graft.readonly.ReadOnlyExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // A/B experiments: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" overlays
    // session confs so config hypotheses measure here before touching
    // the Bench session
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, desc: String, t0: Long,
        var t1: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var stageNames: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, d, e.time,
          stages = e.stageInfos.size,
          stageNames = e.stageInfos.map(_.name.takeWhile(_ != ' '))
            .mkString(",").take(120)))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.t1 = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTasks.put(e.stageInfo.stageId, e.stageInfo.numTasks)
        val j = stageToJob.get(e.stageInfo.stageId)
        val r = jobs.get(j)
        if (r != null) r.tasks += e.stageInfo.numTasks
      }
    })

    // warm like Bench does, so the profiled run is the steady state
    try {
      Seq("lineitem", "orders", "customer", "documents", "embeddings")
        .foreach(t => Tables.load(spark, sfDir, t).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }

    val wanted = SparkEntry.queries.filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    wanted.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // two runs: cold (JIT/codegen) then measured
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      jobs.clear(); stageTasks.clear(); stageToJob.clear()
      System.gc(); Thread.sleep(300)
      graft.StageTimes.drain()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case t: Throwable =>
        println(s"FAILED $name: ${t.getClass.getName}: ${t.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.toSeq.sortBy(_.t0)
      }
      val jobSum = recs.map(r => math.max(0L, r.t1 - r.t0)).sum / 1e3
      println(f"\n===== $name%s wall=$wall%.3fs jobs=${recs.size}%d " +
        f"jobtime=$jobSum%.3fs (gaps=${wall - jobSum}%.3fs) =====")
      // grouped by job description (the StageTimes label): job count,
      // summed job time, summed tasks — the per-stage attribution
      recs.groupBy(_.desc).toSeq
        .map { case (d, rs) =>
          (d, rs.size, rs.map(r => math.max(0L, r.t1 - r.t0)).sum / 1e3,
            rs.map(_.tasks).sum)
        }.sortBy(-_._3)
        .foreach { case (d, n, sec, tasks) =>
          println(f"  $sec%7.3fs jobs=$n%3d tasks=$tasks%5d  " +
            (if (d.isEmpty) "<unlabeled>" else d.take(80)))
        }
      val jobFloorMs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_JOB_MS", "300").toInt
      recs.filter(r => r.t1 - r.t0 >= jobFloorMs).foreach { r =>
        val ms = math.max(0L, r.t1 - r.t0)
        println(f"  job ${r.id}%4d ${ms / 1e3}%7.3fs stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  ${r.desc.replace('\n', ' ').take(60)}%s " +
          f"[${r.stageNames}%s]")
      }
      val st = graft.StageTimes.drain()
      if (st.nonEmpty) {
        println("  -- StageTimes --")
        st.toSeq.sortBy(-_._2).foreach { case (k, v) =>
          println(f"  $v%7.3fs  $k%s") }
      }
    }
    spark.stop()
  }
}
