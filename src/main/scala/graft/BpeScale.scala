package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the BPE trainer's per-iteration scaling —
  * the empirical backing for the delta-pair-statistics path
  * (graft.queries.TextOps.trainBpeMerges): iteration cost must track
  * the REWRITTEN WORDS, not the vocabulary, or production merge
  * counts (k ≈ 32 000) multiply a vocabulary-scale recount 32 000×.
  *
  * Protocol: for each mode (delta / full), train to kLo and to kHi
  * merges end to end; the marginal per-iteration cost is
  * (t(kHi) − t(kLo)) / (kHi − kLo), which subtracts the shared
  * corpus-scale init pass and JVM warmup without instrumenting the
  * loop — measured BOTH as wall seconds and as SHUFFLE WRITE BYTES
  * (a task-metrics listener). The bytes are the claim that survives
  * the move off local[32]: in one JVM a vocabulary-scale shuffle is
  * a memcpy and wall-clock hides it, on a cluster it crosses the
  * network per iteration — the full recount shuffles every adjacency
  * of every vocabulary word each merge, the delta path only the
  * affected words' plus the distinct-pairs fold. Run across
  * VOCABULARY decades — the testdata corpus draws from a fixed word
  * list (vocabulary is flat in sf), so the harness accepts
  * `synth:<nWords>` corpora of distinct letter-only pseudo-words
  * (md5-derived, freq 2 each).
  *
  * Usage: runMain graft.BpeScale <sfDir | synth:N> [kLo=16] [kHi=64]
  * Prints one JSON line with the vocabulary size and per-mode
  * totals + marginal per-iteration seconds and shuffle KB.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val kLo = if (args.length > 1) args(1).toInt else 16
    val kHi = if (args.length > 2) args(2).toInt else 64
    require(kHi > kLo, "kHi must exceed kLo")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs =
        if (src.startsWith("synth:")) {
          val n = src.stripPrefix("synth:").toInt
          val md = java.security.MessageDigest.getInstance("MD5")
          // letter-only pseudo-words (a..p from md5 nibbles) so the
          // trainer's [a-z]+ extraction keeps each word whole
          val words = (0 until n).map { i =>
            md.reset()
            md.digest(s"w$i".getBytes("UTF-8"))
              .flatMap(b => Seq((b >> 4) & 0xF, b & 0xF))
              .map(nib => ('a' + nib).toChar)
              .mkString.take(5 + i % 8)
          }
          val sp2 = spark
          import sp2.implicits._
          (words ++ words).grouped(400).map(_.mkString(" ")).toSeq
            .zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text")
        } else Tables.documents(spark, src)
          .select(col("doc_id"), col("text"))
      val vocabSize = docs
        .selectExpr("explode(regexp_extract_all(lower(text), '[a-z]+', 0)) w")
        .select(col("w")).distinct().count()
      val shuffled = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = e.taskMetrics
            if (m != null)
              shuffled.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        })
      def time(mode: String, k: Int): (Double, Long, Long) = {
        // listener events are async; give the bus a beat to drain
        // around each measured window
        Thread.sleep(1000)
        val b0 = shuffled.get()
        val t0 = System.nanoTime()
        val n = (mode match {
          case "driver" =>
            graft.queries.TextOps.trainBpeMergesDriver(spark, docs, k)
          case m => graft.queries.TextOps
            .trainBpeMerges(spark, docs, k, deltaPairStats = m == "delta")
        }).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        (secs, n, shuffled.get() - b0)
      }
      def r3(v: Double) = math.round(v * 1000) / 1000.0
      val parts = Seq("driver", "delta", "full").map { mode =>
        val (tLo, nLo, bLo) = time(mode, kLo)
        val (tHi, nHi, bHi) = time(mode, kHi)
        require(nLo == kLo && nHi == kHi,
          s"$mode stopped early ($nLo/$kLo, $nHi/$kHi) — raise the " +
            "corpus or lower k so the marginal window is full")
        s""""$mode":{"t_k$kLo":${r3(tLo)},"t_k$kHi":${r3(tHi)},""" +
          s""""marginal_per_iter":${r3((tHi - tLo) / (kHi - kLo))},""" +
          s""""marginal_shuffle_kb":${(bHi - bLo) / (kHi - kLo) / 1024}}"""
      }
      println(s"""{"harness":"bpe_scale","src":"$src","k_lo":$kLo,""" +
        s""""k_hi":$kHi,"vocab":$vocabSize,${parts.mkString(",")}}""")
    } finally spark.stop()
  }
}
