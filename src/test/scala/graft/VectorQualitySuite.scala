package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ANN retrieval QUALITY guard. The oracle gates prove the
  * implementation computes what its own algorithm specifies; nothing
  * there fails if an IVF parameter change silently tanks what the
  * index retrieves. This suite pins the two properties that matter:
  *
  *  - probing every cell (nprobe == k) must reproduce the exact k-NN
  *    result bit-for-bit — the inverted file partitions the corpus,
  *    so full probing IS brute force (a deterministic invariant, not
  *    a threshold);
  *  - probing nprobe=2 of 8 cells — the production trade the gates
  *    ship — must keep mean recall@3 above a measured floor.
  */
class VectorQualitySuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("vector-quality")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  private def neighborSets(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] =
    df.select("qid", "nid").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("IVF with nprobe == k reproduces exact k-NN bit-for-bit") {
    assume(ready)
    val exact = neighborSets(graft.queries.VectorOps
      .vKnnJoin(spark, sfDir).withColumnRenamed("qid", "qid"))
    val full = neighborSets(graft.queries.VectorOps
      .ivfKnnJoin(spark, sfDir, nQueries = 20, k = 8, nprobe = 8))
    assert(full == exact,
      s"full-probe IVF must equal brute force:\nivf   $full\nexact $exact")
  }

  test("IVF at K=256 with full probing still reproduces exact k-NN") {
    assume(ready)
    // production index width: the 256-slot broadcast centroid row and
    // the transform-array argmax must stay bit-correct past toy K —
    // full probing partitions the corpus, so it IS brute force at
    // any K
    val exact = neighborSets(graft.queries.VectorOps.vKnnJoin(spark, sfDir))
    val full = neighborSets(graft.queries.VectorOps
      .ivfKnnJoin(spark, sfDir, nQueries = 20, k = 256, nprobe = 256))
    assert(full == exact,
      s"full-probe K=256 IVF must equal brute force:\nivf   $full\nexact $exact")
  }

  test("IVF K=256 nprobe=64 keeps mean recall@3 above the measured floor") {
    assume(ready)
    val exact = neighborSets(graft.queries.VectorOps.vKnnJoin(spark, sfDir))
    val ivf = neighborSets(graft.queries.VectorOps
      .ivfKnnJoin(spark, sfDir, nQueries = 20, k = 256, nprobe = 64))
    val recalls = exact.toSeq.map { case (q, e) =>
      e.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@3 at K=256 nprobe=64: $mean%.4f over ${recalls.size} queries")
    assert(mean >= 0.50,
      f"mean recall@3 dropped to $mean%.3f (floor 0.50) at K=256 — " +
        "the wide index stopped retrieving what brute force finds")
  }

  test("IVF nprobe=2/8 keeps mean recall@3 above the measured floor") {
    assume(ready)
    val exact = neighborSets(graft.queries.VectorOps.vKnnJoin(spark, sfDir))
    val ivf = neighborSets(graft.queries.VectorOps
      .ivfKnnJoin(spark, sfDir, nQueries = 20, k = 8, nprobe = 2))
    val recalls = exact.toSeq.map { case (q, e) =>
      e.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@3 at nprobe=2/8: $mean%.4f over ${recalls.size} queries")
    // measured 2026-08: 0.7333 at sf0.001 — floor set well below so
    // only a real retrieval regression trips; if a legitimate
    // parameter change moves this, re-measure and re-pin
    assert(mean >= 0.50,
      f"mean recall@3 dropped to $mean%.3f (floor 0.50) — the IVF " +
        "index stopped retrieving what brute force finds")
  }

  test("stored IVF index: probe plans fewer files than the full index") {
    assume(ready)
    // the gate itself drops its index after its eager probe, so build
    // through the keep variant and count planned files ourselves
    val (t, withSims) = graft.queries.VectorOps.buildStoredIvf(spark, sfDir)
    val probe = graft.queries.VectorOps
      .probeStoredIvf(spark, t, withSims, qVecId = 0)
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    val totalRows = spark.table(s"lakeq.db.$t").collect().length
    val total = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    assert(total >= 8, s"expected >=1 file per cell (8 cells), saw $total")
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    assert(probe.collect().length == 5)
    val probed = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    // 2 of 8 cells probed: identity-partition footer stats (min=max
    // per cell file) must prune the other 6 cells' files at plan time
    assert(probed >= 1 && probed <= total / 2,
      s"probe planned $probed of $total files — the cell IN filter " +
        "did not prune non-probed cells (stored-index probe would " +
        "read the whole corpus at scale)")
    info(s"index rows=$totalRows files=$total, probe planned $probed")
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("stored IVF: concurrent probes return sequential results") {
    assume(ready)
    // serving-path claim under concurrency: many probes share ONE
    // stored index through one SparkContext (the multi-probe bench
    // rows prove sequential reuse; this pins scheduler-level
    // interference). Every concurrent result must equal its
    // sequential twin bit-for-bit.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val (t, withSims) = graft.queries.VectorOps.buildStoredIvf(spark, sfDir)
    try {
      val qids = Seq(0L, 1L, 2L, 3L)
      val sequential = qids.map { q =>
        q -> graft.queries.VectorOps.probeStoredIvf(spark, t, withSims, q)
          .collect().map(_.toString).toSeq
      }.toMap
      val t0 = System.nanoTime()
      val concurrent = Await.result(
        Future.sequence(qids.map { q =>
          Future(q -> graft.queries.VectorOps
            .probeStoredIvf(spark, t, withSims, q)
            .collect().map(_.toString).toSeq)
        }), 120.seconds).toMap
      info(f"4 concurrent probes in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      qids.foreach { q =>
        assert(concurrent(q) == sequential(q),
          s"probe $q diverged under concurrency")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("incremental IVF: append-only ingest converges to the one-shot index") {
    assume(ready)
    val (t, evens) = graft.queries.VectorOps.buildIncrementalIvf(spark, sfDir)
    // lifecycle: exactly build + ingest; the batch APPENDS (no resident
    // cell file is rewritten — every build-time file survives the ingest)
    val snaps = spark.sql(
      s"SELECT snapshot_id, operation FROM lakeq.db.$t.snapshots ORDER BY committed_at")
      .collect()
    assert(snaps.length == 2, s"expected build+ingest, got ${snaps.length}")
    assert(snaps(1).getString(1) == "append",
      s"ingest must be an append, was ${snaps(1).getString(1)}")
    val v1 = snaps(0).getLong(0)
    val before = spark.sql(
      s"SELECT file_path FROM lakeq.db.$t.files VERSION AS OF $v1")
      .collect().map(_.getString(0)).toSet
    val after = spark.sql(s"SELECT file_path FROM lakeq.db.$t.files")
      .collect().map(_.getString(0)).toSet
    assert(before.subsetOf(after),
      "ingest must not rewrite build-time files: " +
        s"${(before diff after).take(3)} disappeared")
    assert(after.size > before.size, "ingest must add files")
    // the stored rows cover the whole corpus exactly once
    val nAll = Tables.embeddings(spark, sfDir).count()
    assert(spark.table(s"lakeq.db.$t").count() == nAll)
    // probe result == a full driver-side recompute of the one-shot
    // truth (assign EVERYONE to the fixed even-id centroids, rank the
    // query's 2 best cells)
    val probe = graft.queries.VectorOps.probeStoredIvf(spark, t, evens, 0L)
    graft.lake.LakeScanBuilder.lastPlannedFileCount.set(-1)
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planned = graft.lake.LakeScanBuilder.lastPlannedFileCount.get()
    assert(planned >= 1 && planned <= after.size / 2,
      s"probe planned $planned of ${after.size} files — cell pruning " +
        "must hold over appended files too")
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cents = emb.filter(e => e._1 % 2 == 0 && e._1 < 16).sortBy(_._1)
    def cellOf(v: Array[Double]): Long =
      cents.map { case (cid, cv) =>
        val c = dot(v, cv) / (nrm(v) * nrm(cv))
        (if (c.isNaN) -2.0 else c, cid)
      }.maxBy { case (c, cid) => (c, -cid) }._2
    val q = emb.find(_._1 == 0L).get._2
    val probeCells = cents.map { case (cid, cv) =>
      (dot(q, cv) / (nrm(q) * nrm(cv)), cid)
    }.sortBy { case (c, cid) => (-c, cid) }.take(2).map(_._2).toSet
    val expected = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, cellOf(v),
        BigDecimal(dot(v, q) / (nrm(v) * nrm(q)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .filter(e => probeCells.contains(e._2))
      .sortBy { case (id, _, c) => (-c, id) }
      .take(5)
    assert(got.toSeq == expected.toSeq,
      s"probe must equal the one-shot truth:\ngot      ${got.toSeq}\n" +
        s"expected ${expected.toSeq}")
    spark.sql(s"DROP TABLE IF EXISTS lakeq.db.$t PURGE")
  }

  test("near-dup miner: (4,4) = gate parity; scale config sound + deterministic") {
    assume(ready)
    val d = "/root/testdata/sf0.001"
    val gate = graft.queries.VectorOps.vNearDupPairs(spark, d)
      .collect().map(_.toString).toSet
    val cfg44 = graft.queries.VectorOps.nearDupPairsCfg(spark, d, 4, 4)
      .collect().map(_.toString).toSet
    assert(cfg44 == gate, "(4,4) configuration must equal the gate bit-for-bit")
    // scale configuration (wider buckets, more bands): every returned
    // pair must be a TRUE near-dup (mining is candidates-only; the
    // exact-cosine verification step makes precision 1 by
    // construction — recompute it driver-side), and the md5 planes
    // make the result deterministic across runs
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dt(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dt(a, b) / (math.sqrt(dt(a, a)) * math.sqrt(dt(b, b)))
    }
    val scale1 = graft.queries.VectorOps.nearDupPairsCfg(spark, d, 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    scale1.foreach { case (a, b, c) =>
      val direct = BigDecimal(cos(emb(a), emb(b)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(direct == c && c >= 0.5, s"pair ($a,$b): reported $c direct $direct")
    }
    val scale2 = graft.queries.VectorOps.nearDupPairsCfg(spark, d, 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scale1.toSeq == scale2.toSeq, "scale config must be deterministic")
  }

  test("IVF lifecycle: kmeans repair recovers recall on a drifted batch") {
    assume(ready)
    import org.apache.spark.sql.functions._
    val VO = graft.queries.VectorOps
    val emb = Tables.embeddings(spark, sfDir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // deterministic Rademacher sign mask (the ScaleUp replication
    // trick): pairwise cosines WITHIN the masked batch are exactly
    // preserved while correlation with the build-time centroids
    // collapses — a clean, reproducible stand-in for distribution
    // drift under sustained ingestion
    val mask: Seq[Float] = (0 until dim).map { i =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(s"drift_$i".getBytes("UTF-8"))
      if ((b(0) & 1) == 1) 1.0f else -1.0f
    }
    val corpus = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val drifted = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        zip_with(col("embedding"), typedLit(mask), (x, m) => x * m)
          .as("embedding"))
    val (t, withSims) = VO.buildDriftedIvf(spark, corpus, drifted)
    // exact ground truth over the CURRENT residents, driver-side,
    // with the probe's own rounding and tie order
    val all = corpus.unionByName(drifted).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dt(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dt(a, b) / (math.sqrt(dt(a, a)) * math.sqrt(dt(b, b)))
    }
    def truth(q: Long): Set[Long] = all.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, BigDecimal(cos(all(q), v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    val queries = all.keys.filter(_ % 2 == 1).toSeq.sorted.take(10)
    def recall(ws: org.apache.spark.sql.DataFrame): Double =
      queries.map { q =>
        val got = VO.probeStoredIvf(spark, t, ws, q).collect()
          .map(_.getLong(0)).toSet
        (got intersect truth(q)).size / 5.0
      }.sum / queries.length
    val before = recall(withSims)
    val repaired = VO.repairStoredIvf(spark, t)
    val after = recall(repaired)
    info(f"drift repair recall@5 (nprobe 2/8): $before%.2f -> $after%.2f")
    assert(after >= before,
      f"kmeans repair must not lose recall: $before%.2f -> $after%.2f")
    spark.sql(s"DROP TABLE lakeq.db.$t PURGE")
  }

  test("band sizing: occupancy-driven width, recall-driven band count") {
    // the sizing rule packaged from the r9 measurements: bucket count
    // must grow with the corpus, band count must buy back the recall
    def cfg(n: Long, occ: Long, c: Double, rec: Double): (Int, Int) =
      graft.queries.VectorOps.nearDupBandConfig(n, occ, c, rec)
    // planesPerBand grows one bit per corpus decade (log2), clamped
    val rs = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L)
      .map(n => cfg(n, 64, 0.7, 0.9)._2)
    assert(rs == rs.sorted, s"width must be monotone in n: $rs")
    assert(rs.head >= 4 && rs.last <= 20, rs.toString)
    // the theoretical recall target is met at the design point for
    // every returned configuration
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val (b, r) = cfg(n, 64, 0.7, 0.9)
      val p = 1.0 - math.acos(0.7) / math.Pi
      val rec = 1.0 - math.pow(1.0 - math.pow(p, r), b)
      assert(rec >= 0.9 - 1e-9, f"n=$n (b=$b,r=$r) recall $rec%.3f < 0.9")
      assert(b <= 64, s"band count must stay bounded, got $b")
    }
    // a higher design cosine needs fewer bands at the same width
    val loose = cfg(100000L, 64, 0.9, 0.9)._1
    val tight = cfg(100000L, 64, 0.6, 0.9)._1
    assert(loose < tight,
      s"cos 0.9 should need fewer bands than cos 0.6: $loose vs $tight")
  }

  test("banded miner refuses a super-linear config before mining " +
      "(the sf10 (4,4) OOM guard)") {
    val VO = graft.queries.VectorOps
    // the measured datum: (4,4) at 500k vectors puts ~4.9e8 candidate
    // pairs behind each single join key and OOM'd an executor at
    // sf10 — the guard must trip well before that regime
    val e = intercept[IllegalArgumentException] {
      VO.requireSubquadraticBands(500000L, 4, 4)
    }
    assert(e.getMessage.contains("nearDupBandConfig"),
      s"guard must point at the sizing rule: ${e.getMessage}")
    // the guard is WIRED into the miner: against a synthetic
    // 500k-vector corpus the (4,4) fixture config must throw AT CALL
    // TIME — before any plane hashing, posting explode, or join (the
    // only work the call is allowed is the metadata count; actually
    // mining this corpus under (4,4) is the measured JVM killer)
    import org.apache.spark.sql.functions.{array, col, lit}
    val tmp = java.nio.file.Files.createTempDirectory("guard-sf10").toString
    try {
      spark.range(500000L).select(col("id").as("vec_id"),
          array(lit(0.1f), lit(0.2f)).as("embedding"))
        .write.parquet(s"$tmp/embeddings.parquet")
      intercept[IllegalArgumentException] {
        VO.nearDupPairsCfg(spark, tmp, 4, 4)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp))
    }
    // sound regimes stay open: the gate fixture at gate scale (sf0.1
    // is 2000 vectors), the measured-sound sf1 run (20k), and
    // nearDupBandConfig's own output at the OOM scale
    VO.requireSubquadraticBands(2000L, 4, 4)
    VO.requireSubquadraticBands(20000L, 4, 4)
    val (b, r) = VO.nearDupBandConfig(500000L)
    VO.requireSubquadraticBands(500000L, b, r)
  }

  test("cluster prune: exact per-cluster P25 cutoff, ties kept, <=25% dropped") {
    assume(ready)
    val rows = graft.queries.VectorOps.vClusterPrune(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // independent slow-path recompute: nearest-of-first-8 assignment,
    // 4-dp prototypicality, per-cluster cutoff = min score whose
    // cumulative count exceeds n/4 (exact integer compare)
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cents = emb.filter(_._1 < 8).sortBy(_._1)
    val assigned = emb.map { case (id, v) =>
      val sims = cents.map { case (cid, cv) =>
        val c = dot(v, cv) / (nrm(v) * nrm(cv))
        (if (c.isNaN) -2.0 else c, cid)
      }
      val best = sims.maxBy { case (c, cid) => (c, -cid) }
      (id, best._2, BigDecimal(best._1).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cell, ms) =>
      val n = ms.length.toLong
      val sorted = ms.map(_._3).sorted
      val thr = sorted.distinct.find { p =>
        4L * sorted.count(_ <= p) > n
      }.get
      ms.map { case (id, _, p) =>
        (id, cell, p, if (p >= thr) 1L else 0L)
      }
    }.toSet
    assert(rows.toSet == expected,
      s"diff: ${(rows.toSet diff expected).take(5)} vs " +
        s"${(expected diff rows.toSet).take(5)}")
    // per cluster: strictly-below-threshold drop is at most a quarter,
    // and every score equal to the cluster minimum KEPT score survives
    rows.groupBy(_._2).foreach { case (cell, ms) =>
      val dropped = ms.count(_._4 == 0L)
      assert(4L * dropped <= ms.length.toLong,
        s"cluster $cell dropped $dropped of ${ms.length}")
      val minKept = ms.filter(_._4 == 1L).map(_._3).min
      assert(ms.filter(_._3 == minKept).forall(_._4 == 1L),
        s"cluster $cell: tie at the cutoff was dropped")
    }
  }

  test("centroid LRU cache: access-ordered eviction, not wholesale clear") {
    // r13 watch item: past 64 live indexes the old cache cleared
    // WHOLESALE, re-scanning every hot index; the LRU keeps the hot
    // set and evicts only the coldest entry
    val c = new graft.queries.VectorOps.LruCache[Integer](3)
    Seq("a", "b", "c").zipWithIndex.foreach { case (k, i) =>
      c.putIfAbsent(k, i) }
    assert(c.get("a") == 0)        // touch "a" -> "b" becomes eldest
    c.putIfAbsent("d", 3)          // evicts "b", not "a"
    assert(c.get("a") == 0 && c.get("d") == 3)
    assert(c.get("b") == null, "eldest-by-access must be evicted")
    c.putIfAbsent("a", 99)         // putIfAbsent never overwrites
    assert(c.get("a") == 0)
  }
}
