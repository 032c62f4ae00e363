package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics guards for the round-8 curation operators — the oracle
  * gates prove cross-engine equality; this suite pins what the numbers
  * MEAN: novelty counts corpus-unique shingles, length-trim keeps an
  * exact-percentile body per language, epoch-shuffle is a permutation
  * into dense per-shard slots.
  */
class CurationOpsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("curation-ops")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  test("ngram novelty: bounds, exact rounding, and a hand-checked doc") {
    assume(ready)
    val rows = TextOps.tNgramNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && novel >= 0 && novel <= n, r.toString)
      assert(bp == (20000L * novel + n) / (2L * n), s"rounding: $r")
      assert(bp >= 0 && bp <= 10000, r.toString)
    }
    // cross-check one doc against a direct two-sided computation
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sh3(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (id, t) => id -> sh3(t) }
    val target = all.find(_._2.nonEmpty).get
    val others = all.filter(_._1 != target._1).flatMap(_._2).toSet
    val novelExp = target._2.count(!others.contains(_))
    val row = rows.find(_.getLong(0) == target._1).get
    assert(row.getLong(1) == target._2.size, "n_shingles")
    assert(row.getLong(2) == novelExp, "n_novel")
  }

  test("length trim: exact per-lang P5/P95 body, tails dropped") {
    assume(ready)
    val kept = TextOps.tLengthTrim(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // recompute the exact thresholds per lang the slow way
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val sorted = ds.map(_._3).sorted
      val n = sorted.length.toLong
      def cut(k: Long): Long = {
        // min length whose cumulative count reaches k% of n
        val need = ds.map(_._3).distinct.sorted.find { len =>
          100L * sorted.count(_ <= len) >= k * n
        }
        need.get
      }
      val (lo, hi) = (cut(5), cut(95))
      val keptHere = kept.filter(_._2 == lang).map(_._1).toSet
      val expected = ds.filter(d => d._3 >= lo && d._3 <= hi)
        .map(_._1).toSet
      assert(keptHere == expected,
        s"$lang: lo=$lo hi=$hi kept=${keptHere.size} expected=${expected.size}")
      // the body must be a strict subset when tails exist
      assert(keptHere.size <= ds.length)
    }
  }

  test("epoch shuffle: permutation into dense 1..n slots per shard") {
    assume(ready)
    val rows = TextOps.tEpochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs, "every doc gets a slot")
    assert(rows.map(_._1).distinct.length == rows.length, "one slot per doc")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 32, s"shard $shard")
      val ps = rs.map(_._3).sorted
      assert(ps.toSeq == (1L to rs.length.toLong).toSeq,
        s"shard $shard positions not dense: ${ps.take(5).toSeq}…")
    }
    // deterministic: same epoch salt → identical layout
    val again = TextOps.tEpochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
    // and the order differs from plain doc order in at least one shard
    // (it is a shuffle, not the identity)
    val anyShard = rows.groupBy(_._2).values.find(_.length > 2).get
    val byPos = anyShard.sortBy(_._3).map(_._1).toSeq
    assert(byPos != byPos.sorted, "epoch order must not be doc order")
  }

  test("stored shingle-DF index: merged batch scores identically to one-shot") {
    assume(ready)
    // document frequencies are additive over disjoint doc sets: the
    // lake round-trip (build on evens, MERGE the odd batch, score
    // from storage) must reproduce the in-memory novelty row for row
    val direct = TextOps.tNgramNovelty(spark, sfDir).collect().map(_.toString)
    val stored = TextOps.tNgramNoveltyIndexed(spark, sfDir)
      .collect().map(_.toString)
    assert(stored.toSeq == direct.toSeq,
      s"stored-DF novelty diverges: ${stored.diff(direct).take(3).toSeq}")
  }

  test("stored LM model: build + merged batch scores identically to one-shot") {
    assume(ready)
    // counts are additive: the lake round-trip (build on evens, MERGE
    // the odd batch, score from storage) must reproduce the in-memory
    // gate row for row
    val direct = TextOps.tBigramLm(spark, sfDir).collect().map(_.toString)
    val stored = TextOps.tBigramLmIndexed(spark, sfDir).collect().map(_.toString)
    assert(stored.toSeq == direct.toSeq,
      s"stored-model scores diverge: ${stored.diff(direct).take(3).toSeq}")
  }

  test("boilerplate: per-source frequency rule matches a direct recompute") {
    assume(ready)
    val rows = TextOps.tBoilerplate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def pars(t: String): Seq[Seq[String]] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      (0 until w.size by 16).map(i => w.slice(i, i + 16))
    }
    val allPars = docs.map { case (id, src, t) => (id, src, pars(t)) }
    val srcDocs = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // a paragraph is boilerplate in its source iff it appears in
    // >= max(2, ceil(5% of the source's docs)) DISTINCT documents
    val freq = allPars
      .flatMap { case (id, src, ps) => ps.map(p => (src, p.mkString(" "), id)) }
      .groupBy(x => (x._1, x._2)).view
      .mapValues(_.map(_._3).distinct.length.toLong).toMap
    val byId = rows.map(r => r._1 -> r).toMap
    allPars.foreach { case (id, src, ps) =>
      val thr = math.max(2L, (srcDocs(src) + 19) / 20)
      val boiler = ps.count(p => freq((src, p.mkString(" "))) >= thr)
      val kept = ps.filter(p => freq((src, p.mkString(" "))) < thr)
        .map(_.size.toLong).sum
      val row = byId(id)
      assert(row._2 == src && row._3 == ps.size.toLong, s"doc $id shape")
      assert(row._4 == boiler.toLong, s"doc $id n_boiler ${row._4} vs $boiler")
      assert(row._5 == kept, s"doc $id kept_tokens ${row._5} vs $kept")
    }
    // the strip must actually fire somewhere on this corpus (the gate
    // would silently hash-match an all-zero column too)
    assert(rows.exists(_._4 > 0), "no boilerplate found — dead rule?")
  }

  test("MoR fold-in: bit-identical rows, masks retired, read tax " +
      "recovered") {
    assume(ready)
    import org.apache.spark.sql.functions._
    LakeOps.cat(spark)
    // a stored shingle-DF model mid-lifecycle: built on evens, one
    // additive merge-on-read MERGE of the odd batch — the exact state
    // the gates compact
    val t = LakeOps.fresh("shdfcmp")
    val docs = graft.Tables.documents(spark, sfDir)
    def dfOf(d: org.apache.spark.sql.DataFrame) =
      TextOps.shinglePostings(d).groupBy(col("sh"))
        .agg(count(lit(1)).as("df"))
    dfOf(docs.filter(col("doc_id") % 2 === 0))
      .writeTo(s"lakeq.db.$t").using("lake")
      .tableProperty("write.merge.mode", "merge-on-read")
      .partitionedBy(bucket(8, col("sh"))).create()
    dfOf(docs.filter(col("doc_id") % 2 === 1))
      .createOrReplaceTempView("shdfcmp_batch")
    spark.sql(s"""MERGE INTO lakeq.db.$t t USING shdfcmp_batch b
                 |ON t.sh = b.sh
                 |WHEN MATCHED THEN UPDATE SET t.df = t.df + b.df
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("shdfcmp_batch")
    def masks(): Long = spark.sql(
      s"SELECT count(*) FROM lakeq.db.$t.delete_files")
      .collect()(0).getLong(0)
    def files(): Long = spark.sql(
      s"SELECT count(*) FROM lakeq.db.$t.data_files")
      .collect()(0).getLong(0)
    def readAll(): (Seq[(String, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = spark.table(s"lakeq.db.$t").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    assert(masks() > 0,
      "the additive MoR MERGE should leave position masks to fold in")
    val filesBefore = files()
    readAll() // warm the read path so both timings are steady-state
    val (before, tMasked) = readAll()
    TextOps.foldInModelTable(spark, t)
    assert(masks() == 0, "fold-in must retire every position mask")
    assert(files() < filesBefore,
      s"binpack should shrink the file count ($filesBefore -> ${files()})")
    readAll()
    val (after, tClean) = readAll()
    assert(after == before,
      "fold-in is row-preserving: scores must be bit-identical")
    info(f"fold-in: $filesBefore -> ${files()} files, masked read " +
      f"$tMasked%.3f s -> mask-free $tClean%.3f s")
    spark.sql(s"DROP TABLE lakeq.db.$t PURGE")
  }

  test("concurrent refresh-vs-refresh: racing additive MERGEs both " +
      "land; probes read consistent snapshots") {
    assume(ready)
    import org.apache.spark.sql.functions._
    LakeOps.cat(spark)
    // the composition the lake-layer ConcurrencySuite doesn't cover:
    // two nightly batches MERGE-refresh the SAME stored model table
    // concurrently, under merge-on-read, while a reader probes it.
    // Overlapping vocabulary makes a genuine write-skew possible (both
    // batches mask the same resident rows), so the race is run the way
    // a nightly scheduler runs it: commit CAS retries inside the
    // engine, a bounded OPERATION-level retry when validation rejects
    // a batch whose read snapshot a sibling invalidated — additive
    // algebra makes the re-run safe (the batch view recomputes against
    // the new head).
    val t = LakeOps.fresh("shdfrace")
    val docs = graft.Tables.documents(spark, sfDir)
    def dfOf(d: org.apache.spark.sql.DataFrame) =
      TextOps.shinglePostings(d).groupBy(col("sh"))
        .agg(count(lit(1)).as("df"))
    dfOf(docs.filter(col("doc_id") % 2 === 0))
      .writeTo(s"lakeq.db.$t").using("lake")
      .tableProperty("write.merge.mode", "merge-on-read")
      .partitionedBy(bucket(8, col("sh"))).create()
    // the four consistent states a probe may observe: before, after
    // either single batch, after both — (sum(df), count(*)) witnesses
    def stateOf(sets: Seq[org.apache.spark.sql.DataFrame]): (Long, Long) = {
      val all = sets.reduce(_ union _).groupBy(col("sh"))
        .agg(sum(col("df")).as("df"))
      val r = all.agg(sum(col("df")), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val b1 = dfOf(docs.filter(col("doc_id") % 4 === 1))
      .localCheckpoint(true)
    val b2 = dfOf(docs.filter(col("doc_id") % 4 === 3))
      .localCheckpoint(true)
    val s0 = dfOf(docs.filter(col("doc_id") % 2 === 0))
      .localCheckpoint(true)
    val allowed = Set(stateOf(Seq(s0)), stateOf(Seq(s0, b1)),
      stateOf(Seq(s0, b2)), stateOf(Seq(s0, b1, b2)))
    def isCme(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException])
    val opRetries = new java.util.concurrent.atomic.AtomicLong(0)
    def mergeBatch(name: String, batch: org.apache.spark.sql.DataFrame): Unit = {
      batch.createOrReplaceTempView(name)
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        try {
          spark.sql(s"""MERGE INTO lakeq.db.$t t USING $name b
                       |ON t.sh = b.sh
                       |WHEN MATCHED THEN UPDATE SET t.df = t.df + b.df
                       |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          done = true
        } catch {
          case e: Throwable if isCme(e) && attempts < 8 =>
            opRetries.incrementAndGet()
        }
      }
      spark.catalog.dropTempView(name)
    }
    val violations =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var racing = true
    val prober = new Thread(() => try {
      while (racing) {
        val r = spark.table(s"lakeq.db.$t")
          .agg(sum(col("df")), count(lit(1))).collect()(0)
        val st = (r.getLong(0), r.getLong(1))
        if (!allowed.contains(st)) violations.add(st)
      }
    } catch { case e: Throwable => errors.add(e) })
    val writers = Seq("shdfrace_b1" -> b1, "shdfrace_b2" -> b2).map {
      case (n, b) => new Thread(() =>
        try mergeBatch(n, b) catch { case e: Throwable => errors.add(e) })
    }
    prober.start(); writers.foreach(_.start()); writers.foreach(_.join())
    racing = false; prober.join()
    if (!errors.isEmpty) throw errors.peek()
    assert(violations.isEmpty,
      s"probe observed torn states: ${violations.toArray.toSeq} " +
        s"allowed=$allowed")
    // final state = the sequential sum, bit-for-bit
    val finalRows = spark.table(s"lakeq.db.$t").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val wantRows = stateRows(Seq(s0, b1, b2))
    assert(finalRows == wantRows,
      "racing batches must land the same model a serial schedule does")
    info(s"both batches landed; ${opRetries.get()} operation-level " +
      s"retries (validation rejected a stale read set)")
    spark.sql(s"DROP TABLE lakeq.db.$t PURGE")
  }

  private def stateRows(sets: Seq[org.apache.spark.sql.DataFrame])
      : Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    sets.reduce(_ union _).groupBy(col("sh"))
      .agg(sum(col("df")).as("df")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
  }

  test("unigram logprob: score matches a direct model; witnesses exact") {
    assume(ready)
    // the cross-engine gate hashes only the integer witnesses; the
    // float score's semantics live HERE, against an independent
    // driver-side model (same division of labor as the bigram LM)
    val rows = TextOps.tUnigramLogprob(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val allToks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val tf = allToks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = tf.values.sum.toDouble
    val byId = rows.map(r => r._1 -> r).toMap
    allToks.foreach { case (id, ts) =>
      val (_, n, score, sumTf, maxTf) = byId(id)
      assert(n == ts.size, s"doc $id n_tokens")
      assert(sumTf == ts.map(tf).sum, s"doc $id sum_tf")
      assert(maxTf == ts.map(tf).max, s"doc $id max_tf")
      val exp = ts.map(t => math.log10(tf(t) / total)).sum / ts.size
      assert(math.abs(score - exp) <= 2e-4,
        s"doc $id score $score vs direct $exp")
    }
  }

  test("bigram LM: exact transition counts, score matches a direct model") {
    assume(ready)
    val rows = TextOps.tBigramLm(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // direct driver-side model: same tokens, same Jelinek-Mercer mix
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tk(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val allToks = docs.map { case (id, t) => id -> tk(t) }
    val bigrams = allToks.flatMap { case (_, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
    }
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cu = allToks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = cu.values.sum.toDouble
    val byId = rows.map(r => r._1 -> r).toMap
    // every doc with >=2 tokens is scored, none else
    assert(rows.map(_._1).toSet ==
      allToks.filter(_._2.size >= 2).map(_._1).toSet)
    allToks.filter(_._2.size >= 2).foreach { case (id, ts) =>
      val row = byId(id)
      assert(row._2 == ts.size - 1, s"doc $id n_bigrams")
      val logs = ts.sliding(2).filter(_.size == 2).map { p =>
        val pr = 0.9 * (cb((p(0), p(1))).toDouble / c1(p(0)).toDouble) +
          0.1 * (cu(p(1)).toDouble / total)
        math.log10(pr)
      }.toSeq
      val exp = logs.sum / logs.size
      assert(math.abs(row._3 - exp) <= 2e-4,
        s"doc $id score ${row._3} vs direct $exp")
    }
    // repeated common transitions must not score below the corpus
    // minimum of rare-transition docs: sanity that the signal orders
    // by transition likelihood (weak but direction-pinning)
    assert(rows.map(_._3).distinct.length > 1, "scores must discriminate")
  }
}
