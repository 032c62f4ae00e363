package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  * All dot products are pure column expressions (`zip_with` +
  * `aggregate`, left-to-right double accumulation) — codegen-friendly,
  * no UDFs, identical evaluation order to the DuckDB oracle.
  *
  * Scale design: brute-force top-k is the correctness baseline (one
  * broadcast of the query vector, map-side partial top-k via
  * TakeOrderedAndProject). The scale path is the random-hyperplane
  * LSH variant: bucket assignment is a narrow projection against a
  * broadcast plane matrix, then candidate ranking happens only within
  * the query's bucket — at 100 TB the bucket join replaces the full
  * scan with a hash-partition-local lookup.
  */
object VectorOps {

  /** Deterministic ±1 hyperplanes derived from md5 parity — the same
    * values are inlined into the DuckDB oracle SQL, so both engines
    * use bit-identical planes without sharing code. */
  private val Dim = 64
  private val NPlanes = 8
  // 16 planes total: planes 0-7 back the 8-bit ANN bucket, and the
  // banded near-dup LSH uses 4 independent bands of 4 planes each
  // (bands 0-3 = planes 0-3, 4-7, 8-11, 12-15).
  private val NBands = 4
  private val PlanesPerBand = 4
  private def planeAt(j: Int): Seq[Double] =
    graft.functions.PlaneSigns.planeAt(j).toSeq // single source of truth
  private lazy val planes: Seq[Seq[Double]] =
    (0 until NBands * PlanesPerBand).map(planeAt)

  /** Codegen'd dot product (graft.functions.DotProduct) — one fused
    * loop per pair instead of interpreted zip_with+aggregate chains. */
  private def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Per-label vector statistics (count, mean L2 norm). */
  def vVectorStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("nrm", norm(col("embedding")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
      .orderBy(col("label"))

  /** Int8 symmetric quantization of the embedding column — the
    * storage/bandwidth lever for a 100 TB vector corpus (4x smaller
    * than float32, SIMD-friendly dot products downstream). Per vector:
    * scale = max|x| / 127, q_i = floor(x_i/scale + 0.5). Pure narrow
    * ops (one transform + aggregates per row, no shuffle); the gate
    * verifies scale and the quantized values' sum / L1 mass, all in
    * double precision so both engines round identically. */
  def vQuantize(s: SparkSession, d: String): DataFrame = {
    val dbl = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .withColumn("e", dbl)
      .withColumn("amax", array_max(transform(col("e"), x => abs(x))))
      .withColumn("scale",
        when(col("amax") > 0, col("amax") / 127.0).otherwise(lit(1.0)))
      .withColumn("q", transform(col("e"),
        x => floor(x / col("scale") + 0.5).cast("long")))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale6"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"))
      .orderBy(col("vec_id"))
  }

  /** Brute-force cosine top-10 for the query vector (vec_id = 0). */
  def vAnnBruteforce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("qv")) /
          (norm(col("embedding")) * norm(col("qv"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Bucket id from the sign pattern of the hyperplane projections. */
  private def bucketCol(v: Column, nPlanes: Int = NPlanes): Column =
    planes.take(nPlanes).foldLeft(lit(0)) { (acc, p) =>
      acc * 2 + when(dot(v, typedLit(p)) > 0, 1).otherwise(0)
    }

  /** LSH-bucketed ANN: rank only candidates in the query's bucket. */
  def vAnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", bucketCol(col("embedding")))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
    emb.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("bucket"),
        round(dot(col("embedding"), col("qv")) /
          (norm(col("embedding")) * norm(col("qv"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Small k-NN similarity join: top-3 cosine neighbors for each of
    * the first 20 vectors (the per-query ranking pattern; at scale the
    * candidate side comes from LSH buckets instead of a full scan).
    *
    * Norms are computed ONCE per vector before the join (same values,
    * same float order as computing them per pair — just hoisted), so
    * each candidate pair costs exactly one fused dot product. */
  def vKnnJoin(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("nrm", norm(col("embedding")))
    val qs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      col("nrm").as("nn"))
      .crossJoin(broadcast(qs))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("nv"), col("qv")) /
          (col("nn") * col("qn")), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("qid"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs — the fifth dedup mode
    * (exact / MinHash / SimHash / n-gram / embedding).
    *
    * Banded multi-table LSH (4 independent bands × 4 hyperplanes, the
    * same band/row structure as MinHash-LSH): a pair is a candidate
    * iff it agrees on ALL 4 sign bits of at least one band. Compared
    * to a single k-bit bucket this keeps per-bucket population small
    * (2^4 buckets per band, independent keys) while multi-probe-style
    * recall comes from the 4 independent chances — the standard
    * sub-quadratic shape for 100 TB embedding stores. Candidate pairs
    * are deduplicated on (id_a, id_b) BEFORE the vectors are joined
    * back, so each pair costs one fused dot product.
    *
    * SIZING THE BANDS (r9 sf1 measurement): bucket count per band is
    * 2^planesPerBand and does NOT grow with the corpus, so per-bucket
    * candidates grow QUADRATICALLY in corpus size — at 10× the
    * vectors the 4-plane gate shape mined 100× the candidates (12.2 s
    * vs 2.2 s). planesPerBand must scale ~log2(n/occupancy); recall
    * is then recovered with more bands (per-band collision for a
    * cosine-θ pair is (1-θ/π)^b, union over bands). The gate pins
    * (4, 4) for oracle parity; [[nearDupPairsCfg]] is the tunable
    * miner — (16, 8) re-mines the sf1 corpus in ~1/6 the time with
    * the same confirmed pairs (VectorQualitySuite). */
  def vNearDupPairs(s: SparkSession, d: String): DataFrame =
    nearDupPairsCfg(s, d, NBands, PlanesPerBand)

  /** The banded miner, parameterized by (bands, planesPerBand) —
    * plane j of band i is the deterministic md5-parity hyperplane
    * index i·planesPerBand + j, so the (4, 4) configuration is
    * bit-identical to the original gate.
    *
    * All bands' sign bits come from ONE [[graft.functions.PlaneSigns]]
    * signature per vector (a single generated loop over planes × dims,
    * bit-packed longs); band buckets are then pure bit slices. The
    * per-plane `when(graft_dot > 0)` composition this replaces fell
    * out of whole-stage codegen past ~64 planes and the interpreted
    * hashing dominated the whole mining pass (measured at sf1:
    * hashing grew linearly in plane count to 25-37 s while the
    * candidate join SHRANK; with the fused signature the same
    * configurations hash in milliseconds). */
  /** Ceiling on the banded miner's expected candidate pairs PER
    * BUCKET — the quantity that kills an executor. Bucket count per
    * band is 2^r and does not grow with the corpus, so per-bucket
    * occupancy n/2^r grows linearly in n and the pairs a SINGLE join
    * key emits grow quadratically: at sf10 (500 k vectors) the gate's
    * (4, 4) fixture put ~31 k vectors behind each of 16 buckets —
    * ~4.9·10⁸ pairs from one key, ~4.6 B total — and OOM'd an
    * executor, taking the JVM (COVERAGE round 10). The largest
    * measured-SOUND run ((4, 4) at 20 k vectors, sf1) emitted
    * ~7.8·10⁵ pairs per bucket. 2^24 sits between them with ~20×
    * margin on each side. [[nearDupBandConfig]]-sized configurations
    * hold per-bucket occupancy roughly at targetOccupancy, orders of
    * magnitude below this ceiling at any n. */
  private[graft] val MaxExpectedBucketPairs: Double = (1L << 24).toDouble

  /** Expected candidate pairs per band-bucket at corpus size n, under
    * the uniform-bucket approximation: each band hashes n vectors
    * into 2^r buckets → occupancy n/2^r → ~occ²/2 pairs per bucket.
    * Real corpora skew worse (correlated vectors pile into shared
    * buckets), so this is a LOWER estimate — conservative in the safe
    * direction. */
  private[graft] def expectedBucketPairs(n: Long,
      planesPerBand: Int): Double = {
    val occ = n.toDouble / math.pow(2.0, planesPerBand)
    occ * occ / 2.0
  }

  private[graft] def requireSubquadraticBands(n: Long, bands: Int,
      planesPerBand: Int): Unit = {
    val perBucket = expectedBucketPairs(n, planesPerBand)
    require(perBucket <= MaxExpectedBucketPairs,
      f"banded near-dup config (bands=$bands, planesPerBand=" +
        f"$planesPerBand) expects ~$perBucket%.2e candidate pairs " +
        f"PER BUCKET at corpus size $n — a single join key emitting " +
        "quadratic pairs OOMs the executor sorting it (measured: " +
        "(4,4) at 500k vectors = ~4.9e8 pairs/bucket took the JVM); " +
        "size the config with nearDupBandConfig(n), which grows " +
        "planesPerBand ~log2(n/occupancy) so per-bucket work stays " +
        "bounded")
  }

  private[graft] def nearDupPairsCfg(s: SparkSession, d: String,
      bands: Int, planesPerBand: Int): DataFrame = {
    val raw = Tables.embeddings(s, d)
    // the corpus-size guard pays one metadata-only count before any
    // mining: a config that is sound at gate scale is an executor
    // OOM at 250× the vectors, and nothing else in this path would
    // stop it before the candidate join materializes
    requireSubquadraticBands(raw.count(), bands, planesPerBand)
    val sigCol = VectorFunctions.planeSigns(col("embedding"),
      bands * planesPerBand)
    def bkt(sig: Column, band: Int): Column =
      (0 until planesPerBand).foldLeft(lit(0)) { (acc, j) =>
        val g = band * planesPerBand + j
        acc * 2 + shiftrightunsigned(element_at(sig, lit(g / 64 + 1)), g % 64)
          .bitwiseAND(lit(1L)).cast("int")
      }
    // (vec_id, band, bkt) postings — B rows per vector, narrow ints
    val bandStructs = (0 until bands).map(j =>
      struct(lit(j).as("band"), bkt(col("sig"), j).as("bkt")))
    val postings = raw
      .withColumn("sig", sigCol)
      .select(col("vec_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
    val cand = postings.as("a")
      .join(postings.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val emb = raw.withColumn("nrm", norm(col("embedding")))
    val ea = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("nrm").as("na"))
    val eb = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("nrm").as("nb"))
    cand.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4)
          .as("cos_sim"))
      .filter(col("cos_sim") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** IVF-flat ANN: every vector is assigned ONCE to the nearest of K
    * fixed centroid cells (the inverted file); a query then ranks
    * candidates only inside its nprobe nearest cells.
    *
    * All K centroids travel as ONE broadcast row (an array of
    * (cid, cv, cn) structs), so cell assignment is a narrow,
    * shuffle-free projection: `transform` builds each row's K-slot
    * similarity array in place and `array_max` over (csim, -cid)
    * structs takes the argmax — no n×k row expansion, no window, no
    * exchange before assignment. The query's probe cells come from
    * sorting its own similarity array (again no window), and the probe
    * itself is a broadcast join on cell id touching ~nprobe/K of the
    * corpus — the IVF trade that keeps ANN sublinear at corpus scale.
    * Centroids here are the first K vectors (a deterministic k-means
    * stand-in; a real pipeline would refresh them and re-assign). */
  /** Nearest-of-K-centroid cell assignment, shared by the IVF index
    * and the centroid-refresh step. K centroids (the first K vectors,
    * a deterministic k-means stand-in) travel as ONE broadcast row, so
    * assignment is a narrow shuffle-free projection: `transform`
    * builds each row's K-slot similarity array in place and
    * `array_max` over (csim, -cid) structs takes the argmax — no n×k
    * row expansion, no window, no exchange. nanvl pins a zero-norm
    * vector's NaN cosine below any real similarity so the argmax (and
    * IVF's probe-cell slice) can't flip on degenerate vectors.
    * Returns (vec_id, embedding, nrm, sims, cell). */
  private def ivfAssign(emb: DataFrame, k: Int): DataFrame =
    // one row: [(cid, cv, cn)] sorted by cid — K is small by design
    assignToCents(emb, emb.filter(col("vec_id") < k)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cv"), col("nrm").as("cn")))).as("cents")))

  /** Nearest-centroid assignment against an EXPLICIT 1-row centroid
    * frame (`[(cid, cv, cn)]` sorted by cid) — the shared kernel of
    * [[ivfAssign]] (first-K centroids) and [[vKmeans]] (refreshed
    * means): broadcast row, narrow transform + argmax, no shuffle. */
  private[graft] def assignToCents(emb: DataFrame, centsRow: DataFrame): DataFrame = {
    val withSims = emb.crossJoin(broadcast(centsRow))
      .withColumn("sims", transform(col("cents"), c =>
        struct(nanvl(dot(col("embedding"), c.getField("cv")) /
          (col("nrm") * c.getField("cn")), lit(-2.0)).as("csim"),
          c.getField("cid").as("cid"))))
      .drop("cents")
    // argmax via struct ordering: max (csim, -cid) = best csim,
    // ties to the smallest cid — same order as the oracle's
    // row_number() OVER (ORDER BY csim DESC, cid)
    val best = array_max(transform(col("sims"), s0 =>
      struct(s0.getField("csim").as("csim"), (-s0.getField("cid")).as("ncid"))))
    withSims.withColumn("cell", -best.getField("ncid"))
  }

  /** Multi-query IVF retrieval for the retrieval-quality spec: top
    * `kNN` neighbors per query among each query's `nprobe` probe
    * cells — the [[vKnnJoin]] shape with the candidate side bounded
    * by the inverted file instead of the full corpus. With
    * nprobe == k (probe everything) this must reproduce the exact
    * k-NN result bit-for-bit, which the spec pins; with nprobe < k
    * it measures the recall the IVF trade actually buys. */
  private[graft] def ivfKnnJoin(s: SparkSession, d: String,
      nQueries: Int, k: Int = 8, nprobe: Int = 2, kNN: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val withSims = ivfAssign(emb, k)
    val assigned = withSims
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val qcells = withSims.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("nrm").as("qn"),
        explode(slice(sort_array(transform(col("sims"), s0 =>
          struct((-s0.getField("csim")).as("negsim"),
            s0.getField("cid").as("cid")))), 1, nprobe)).as("t"))
      .select(col("qid"), col("qv"), col("qn"), col("t.cid").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 4)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNN)
      .select(col("qid"), col("nid"), col("rank"))
  }

  def vAnnIvf(s: SparkSession, d: String): DataFrame =
    annIvf(s, d, k = 8, nprobe = 2)

  /** [[vAnnIvf]] at production index width: K = 256 cells, nprobe
    * scaled to the same 1/4 probe fraction. The broadcast centroid
    * row grows linearly in K (256 cells × 64 dims ≈ 64 KB of floats —
    * a real 100 TB index at K = 65k cells × 1024 dims is ~256 MB,
    * still one broadcast row next to executor memory) and the
    * assignment stays a narrow shuffle-free projection whose per-row
    * cost is K dots; per CANDIDATE scored, cost is flat: nprobe/K is
    * held constant, so the probe join touches the same corpus
    * fraction. This gate exists to prove the transform-array argmax
    * + broadcast-centroid design past toy K — if K×dim ever outgrows
    * a broadcast row, the assignment switches to the
    * [[vCentroidUpdate]] join shape instead. */
  def vAnnIvfK256(s: SparkSession, d: String): DataFrame =
    annIvf(s, d, k = 256, nprobe = 64)

  private def annIvf(s: SparkSession, d: String, k: Int, nprobe: Int)
      : DataFrame = {
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val withSims = ivfAssign(emb, k)
    val assigned = withSims
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    // the query row's nprobe best cells: sort its OWN sim array
    // ascending on (-csim, cid) and slice — 1 row, no global window
    val qcells = withSims.filter(col("vec_id") === 0)
      .select(explode(slice(sort_array(transform(col("sims"), s0 =>
        struct((-s0.getField("csim")).as("negsim"),
          s0.getField("cid").as("cid")))), 1, nprobe)).as("t"),
        col("embedding").as("qv"), col("nrm").as("qn"))
      .select(col("t.cid").as("cell"), col("qv"), col("qn"))
    assigned.filter(col("vec_id") =!= 0)
      .join(broadcast(qcells), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 4)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** IVF index STORED as a partitioned lake table — the 100 TB ANN
    * serving shape. [[vAnnIvf]] computes assignment and probe in one
    * job; a production vector store builds the inverted file ONCE,
    * persists it, and serves probes from storage. Here the inverted
    * file is a lake table partitioned by identity(cell): each cell's
    * vectors land in their own files, so a probe's `cell IN (...)`
    * pushes into the scan and footer min=max stats prune every
    * non-probed cell's files before a task launches — the probe reads
    * ~nprobe/K of the corpus from DISK, not just from a filtered
    * in-memory frame. The probe's cell ids are a planning-time
    * collect of nprobe scalars (bounded by design). Same (K=8,
    * nprobe=2) parameters and result as [[vAnnIvf]], so the oracle is
    * shared — the gate proves the storage path returns the identical
    * top-5. */
  def vAnnIvfIndexed(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val (t, withSims) = graft.StageTimes.timed("v_ann_ivf_indexed.build")(
      buildStoredIvf(s, d))
    // the gate's probe runs EAGERLY so build and probe each report
    // their own StageTimes figure — the serving-path claim is the
    // probe number, the build is the amortized one-time cost
    val result = graft.StageTimes.timed("v_ann_ivf_indexed.probe")(
      probeStoredIvf(s, t, withSims, qVecId = 0)
        .localCheckpoint(true, StorageLevel.DISK_ONLY))
    // repeat probes with OTHER query vectors against the SAME stored
    // index: per-probe time ≈ the first probe proves index REUSE is
    // what the serving path pays, not a rebuild per query
    Seq(1L -> "probe2", 2L -> "probe3").foreach { case (qid, stage) =>
      graft.StageTimes.timed(s"v_ann_ivf_indexed.$stage")(
        probeStoredIvf(s, t, withSims, qid).count())
    }
    s.sql(s"DROP TABLE IF EXISTS ${graft.lake.Names.q(s, t)} PURGE")
    result.orderBy(col("cos_sim").desc, col("vec_id"))
  }

  /** Build the stored inverted file (see [[vAnnIvfIndexed]]) and
    * return (table name, assignment frame). The table is the caller's
    * to drop — VectorQualitySuite keeps it to count planned files. */
  private[graft] def buildStoredIvf(s: SparkSession, d: String)
      : (String, DataFrame) = {
    LakeOps.cat(s)
    val t = LakeOps.fresh("ivfidx")
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val withSims = ivfAssign(emb, 8)
    withSims.select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
      .writeTo(graft.lake.Names.q(s, t)).using("lake")
      .partitionedBy(col("cell")).create()
    (t, withSims)
  }

  /** One probe of the stored inverted file for query vector `qVecId`:
    * nprobe best cells (bounded scalar collect), then a cell-pruned
    * scan of the index table scored against the broadcast query row. */
  private[graft] def probeStoredIvf(s: SparkSession, table: String,
      withSims: DataFrame, qVecId: Long): DataFrame = {
    val probeCells: Array[Long] = withSims.filter(col("vec_id") === qVecId)
      .select(explode(slice(sort_array(transform(col("sims"), s0 =>
        struct((-s0.getField("csim")).as("negsim"),
          s0.getField("cid").as("cid")))), 1, 2)).as("t"))
      .select(col("t.cid")).collect().map(_.getLong(0))
    val q = withSims.filter(col("vec_id") === qVecId)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    s.table(graft.lake.Names.q(s, table))
      .where(col("cell").isin(probeCells.map(c => c: Any): _*))
      .filter(col("vec_id") =!= qVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 4)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Drift-lifecycle harness for VectorQualitySuite: build the stored
    * inverted file from `corpus` (fixed centroids = its 8 smallest
    * vec_ids, the [[vAnnIvfIncremental]] convention), then ingest
    * `batch` under those FIXED centroids — the state a sustained
    * drifted ingestion leaves behind. Returns (table, the combined
    * assignment frame probes take). */
  private[graft] def buildDriftedIvf(s: SparkSession, corpus: DataFrame,
      batch: DataFrame): (String, DataFrame) = {
    LakeOps.cat(s)
    val t = LakeOps.fresh("ivfdrift")
    val c = corpus.withColumn("nrm", norm(col("embedding")))
    val b = batch.withColumn("nrm", norm(col("embedding")))
    val centsRow = c.orderBy(col("vec_id")).limit(8)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cv"), col("nrm").as("cn")))).as("cents"))
    val corpusAssigned = assignToCents(c, centsRow)
    corpusAssigned
      .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
      .writeTo(graft.lake.Names.q(s, t)).using("lake")
      .partitionedBy(col("cell")).create()
    val batchAssigned = assignToCents(b, centsRow)
    batchAssigned
      .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
      .writeTo(graft.lake.Names.q(s, t)).append()
    (t, corpusAssigned.unionByName(batchAssigned))
  }

  /** Per-cell 4 dp mean centroids of an assignment frame, as the
    * one-row cents frame [[assignToCents]] broadcasts — the Lloyd
    * update kernel shared by [[repairStoredIvf]] (iteration step) and
    * [[storedCentsRow]] (re-deriving a REPAIRED index's centroids
    * from its stored rows: the repair's publish convention is exactly
    * "centroids = per-cell means of the published assignment", so the
    * source snapshot's rows alone reproduce them — no sidecar
    * state). */
  private def centsOfAssigned(assigned: DataFrame): DataFrame = {
    val m0 = round(avg(col("col").cast("double")), 4)
    assigned
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(when(m0 === 0.0, lit(0.0)).otherwise(m0).as("m"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell").as("cid"),
        transform(col("pm"), x => x.getField("m")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .agg(sort_array(collect_list(struct(col("cid"), col("cv"),
        col("cn")))).as("cents"))
  }

  /** Centroid-drift REPAIR for a stored inverted file — the rebuild
    * leg of the index lifecycle that [[vAnnIvfIncremental]] defers
    * out of the nightly path (ingestion assigns against FIXED
    * centroids; sustained drifted ingestion degrades cell locality
    * until a rebuild): re-derive the K centroids from the CURRENT
    * resident vectors with Lloyd iterations seeded by the existing
    * assignment's own per-cell means (the [[vKmeans]] kernel —
    * per-iteration exchange is (cell, dim)-bounded partial sums,
    * centroids quantized to 4 dp for reproducibility), re-assign
    * every vector, and publish IN PLACE:
    *
    *  - ONE atomic full-overwrite commit on the SAME table
    *    incarnation (identity, uuid, snapshot counter, refs, and any
    *    live streaming query's view of the table all survive — the
    *    previous createOrReplace re-founded the table, which under a
    *    live ingest stream would have invalidated every identity the
    *    exactly-once machinery keys on), stamped with the
    *    [[graft.lake.ReplayGuard.IvfRepairTag]] commit marker so
    *    centroid-source resolution ([[storedCentsRow]]) sees the
    *    repair ATOMICALLY with its data — the repaired snapshot's
    *    per-cell means ARE the index's centroids from this commit on;
    *  - then the [[IvfBuildTag]] ref moves onto the repair snapshot
    *    (expiry protection, same as the build's). The one-commit
    *    window where the marker exists but the ref hasn't moved is
    *    covered by expire_snapshots' replay guard, which refuses to
    *    expire the newest repair-marked snapshot without an override.
    *
    * The marker cannot satisfy or poison a streaming epoch's replay
    * guard — it is not an `<ring>-ingest-<scope>-<epoch>` tag. Cost =
    * iterations × one corpus scan plus one partitioned rewrite.
    * Returns the new assignment frame (the `withSims` shape
    * [[probeStoredIvf]] takes), so probes continue against the
    * repaired index unchanged. VectorQualitySuite drives build →
    * drifted ingest → repair and measures the recall recovery;
    * IngestStreamsSuite drives it through the in-loop drift
    * trigger. */
  private[graft] def repairStoredIvf(s: SparkSession, table: String,
      iters: Int = 2,
      afterWrite: () => Unit = () => ()): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Publish via branch + fast-forward, NOT a direct overwrite of
    // main: the overwrite commit path re-derives on a lost CAS
    // without conflict validation, so a concurrent scope's epoch
    // append landing between this repair's resident read and its
    // commit would be silently truncated away — with the append's
    // epoch tag SURVIVING on history, so the replay guard would
    // swear the lost epoch committed (the exact hole the
    // multi-stream sharing contract must not have). fast_forward
    // refuses any non-fast-forward move, turning that interleaving
    // into a detected race: the repair re-reads the grown resident
    // set and retries. `afterWrite` is the spec's injection point
    // for a deterministic interleaved append.
    var attempt = 0
    var published: DataFrame = null
    while (published == null) {
      attempt += 1
      if (attempt > 5) throw new IllegalStateException(
        s"repair of $table lost the publish race $attempt times — " +
          "pause ingestion or raise the retry bound")
      val resident = s.table(graft.lake.Names.q(s, table))
        .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
      var cents = centsOfAssigned(resident)
      var assigned = resident
      for (_ <- 1 to iters) {
        assigned = assignToCents(
          resident.select(col("vec_id"), col("embedding"), col("nrm")), cents)
        cents = centsOfAssigned(assigned)
      }
      // publish convention (storedCentsRow's read side): the LAST
      // Lloyd re-assignment is what lands, so "per-cell means of the
      // stored rows" re-derives the centroids that will assign FUTURE
      // batches — one more centsOfAssigned over the published state,
      // which is exactly `cents` computed above
      val br = s"ivfrepair_${java.util.UUID.randomUUID().toString.take(8)}"
      s.sql(s"CALL ${graft.lake.Names.catalog(s)}.system.create_branch(" +
        s"table => '${graft.lake.Names.rel(s, table)}', branch => '$br')")
      try {
        TextOps.withCommitTag(Some(graft.lake.ReplayGuard.IvfRepairTag)) {
          assigned.select(col("vec_id"), col("cell"), col("embedding"),
              col("nrm"))
            .writeTo(s"${graft.lake.Names.q(s, table)}.branch_$br")
            .overwrite(lit(true))
        }
        afterWrite()
        try {
          s.sql(s"CALL ${graft.lake.Names.catalog(s)}.system.fast_forward(" +
            s"table => '${graft.lake.Names.rel(s, table)}', " +
            s"branch => 'main', to => '$br')")
          published = assigned
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("Cannot fast-forward") =>
            () // a foreign commit interleaved — re-read and retry
        }
      } finally
        s.sql(s"CALL ${graft.lake.Names.catalog(s)}.system.drop_branch(" +
          s"table => '${graft.lake.Names.rel(s, table)}', branch => '$br')")
    }
    val m = graft.lake.LakeMeta.of(s, graft.lake.Names.parts(s, table))
    graft.lake.LakeRefCommand(graft.lake.Names.parts(s, table),
      if (m.refs.contains(IvfBuildTag)) "REPLACE" else "CREATE",
      isTag = true, IvfBuildTag, version = None, ifNotExists = false,
      ifExists = false).run(s)
    published
  }

  /** Pick a banded-LSH configuration for a corpus size — the sizing
    * rule the r9 sf1/sf10 measurements derived, packaged so a caller
    * doesn't re-derive it:
    *
    *  - planesPerBand r = ceil(log2(n / targetOccupancy)), clamped to
    *    [4, 20]: bucket count 2^r grows WITH the corpus so per-bucket
    *    candidate pairs stay ~occupancy²/2 per bucket instead of
    *    growing quadratically in n (the measured failure of a fixed
    *    r: 46 M candidates at 20 k vectors under r=4);
    *  - bands b = smallest b with theoretical recall
    *    1-(1-p^r)^b ≥ minRecall at the design cosine, where
    *    p = 1 - acos(designCos)/π is the per-plane agreement
    *    probability (random-hyperplane LSH), clamped to ≤ 64.
    *
    * Measured against brute-force truth at sf0.1 (14 true pairs at
    * cos ≥ 0.5 — most barely over the threshold, the hardest regime):
    * (4,4) recall 0.50 / 4.5 s, (16,6) 0.79 / 2.8 s, (32,8) 0.79 /
    * 4.5 s — observed recall tracks the formula. Note the OUTPUT
    * itself grows quadratically when the verify threshold sits inside
    * the corpus's random-similarity tail (64-dim at cos 0.5); the
    * design point for production is higher cosine and dimension,
    * where p^r decays slower and fewer bands reach the same recall. */
  private[graft] def nearDupBandConfig(n: Long,
      targetOccupancy: Long = 64, designCos: Double = 0.7,
      minRecall: Double = 0.9, bandBudget: Int = 64): (Int, Int) = {
    val p = 1.0 - math.acos(designCos) / math.Pi
    def bandsFor(r: Int): Int = {
      val perBand = math.pow(p, r)
      math.max(1, math.ceil(
        math.log(1.0 - minRecall) / math.log(1.0 - perBand)).toInt)
    }
    // occupancy-driven width — but the RECALL contract wins: past the
    // band BUDGET (a soft target, not a hard cap — hence the name),
    // widen buckets back down (more candidates per bucket) rather
    // than silently miss the recall target. At design cos 0.7 the
    // budget caps r at 11 (2048 buckets/band, 57 bands); a higher
    // design cosine pushes the cap out. If the budget still binds at
    // the r=4 floor (extreme low-cos/high-recall inputs), the
    // UNCAPPED band count is returned — possibly ABOVE bandBudget —
    // so the caller sees the true cost of its recall target instead
    // of a silently degraded one (capping here would miss minRecall
    // with no signal).
    var r = math.max(4, math.min(20,
      math.ceil(math.log(math.max(2.0, n.toDouble / targetOccupancy)) /
        math.log(2.0)).toInt))
    while (r > 4 && bandsFor(r) > bandBudget) r -= 1
    (bandsFor(r), r)
  }

  /** Incremental maintenance of the stored IVF index — the missing
    * lifecycle piece next to [[vAnnIvfIndexed]]'s one-shot build (the
    * dedup ring already has it: band postings and group labels both
    * refresh from nightly batches; the inverted file should too, or
    * every vector batch pays a full re-index).
    *
    * Protocol: centroids are FIXED at index-build time (here: the
    * first 8 even vec_ids — the "existing corpus" of the gate story,
    * where even ids build the index and odd ids arrive as the
    * incremental batch). A batch ingests by assigning its vectors
    * against those stored centroids and APPENDING to the
    * cell-partitioned lake table — partition-local file appends, no
    * rewrite of any resident cell file (spec-pinned via the snapshots
    * log), no corpus-scale work: O(batch × K) assignment dots plus
    * the append commit. Probes are unchanged ([[probeStoredIvf]]
    * shape) and keep their footer-stats cell pruning over old AND new
    * files. Centroid drift under sustained ingestion is repaired by a
    * [[vCentroidUpdate]]/[[vKmeans]] refresh + re-assign — a rebuild,
    * deliberately OUT of the nightly path.
    *
    * The oracle is the one-shot truth: assign EVERY vector to the
    * same fixed centroids and probe — storage round-trip, build/batch
    * split, and append path must not change one row. */
  def vAnnIvfIncremental(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val (t, evens) = buildIncrementalIvf(s, d)
    val result = graft.StageTimes.timed("v_ann_ivf_incremental.probe")(
      probeStoredIvf(s, t, evens, qVecId = 0)
        .localCheckpoint(true, StorageLevel.DISK_ONLY))
    s.sql(s"DROP TABLE IF EXISTS ${graft.lake.Names.q(s, t)} PURGE")
    result.orderBy(col("cos_sim").desc, col("vec_id"))
  }

  /** Build the incremental inverted file (see [[vAnnIvfIncremental]]):
    * even ids create the cell-partitioned index, odd ids append as
    * the incremental batch under the FIXED build-time centroids.
    * Returns (table name, even-side assignment frame — carries the
    * probe query's sims); the table is the caller's to drop. */
  private[graft] def buildIncrementalIvf(s: SparkSession, d: String)
      : (String, DataFrame) = {
    val (t, evens) = buildEvenIvf(s, d)
    graft.StageTimes.timed("v_ann_ivf_incremental.ingest") {
      ingestVectorBatch(s, t,
        Tables.embeddings(s, d).filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding")))
    }
    (t, evens)
  }

  /** Gate: the STREAMING IVF-ingest twin end to end — build the
    * cell-partitioned inverted file on the even ids, stream the odd
    * ids through a REAL Structured-Streaming query
    * ([[graft.streaming.IngestStreams.ivfIngest]]: MemoryStream
    * source, single-append epochs, exactly-once commit tags) as two
    * micro-batches, then probe. The oracle is the one-shot truth
    * [[vAnnIvfIncremental]] answers to: assignment against the FIXED
    * build-time centroids is independent of how the batch side is
    * chopped into epochs, so the probe must reproduce the same top-5
    * bit-for-bit. */
  def vAnnIngestStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val (t, evens) = buildEvenIvf(s, d)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ivf-gate-ckpt").toString
    try {
      import s.implicits._
      val oddRows = Tables.embeddings(s, d)
        .filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      val (half1, half2) = oddRows.splitAt(oddRows.length / 2)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](s)
      // the in-loop compaction trigger rides in the gate: the first
      // epoch's appends push the index past build+4 files, so that
      // same epoch's trailing trigger check compacts mid-stream (the
      // second epoch then appends onto the compacted layout) — and
      // the probe must still answer to the SAME oracle (the cadence
      // is row-preserving)
      // driver-side metadata count (no Spark job — the `.files` table
      // scan paid a scheduled job just to size the trigger)
      val threshold = (graft.lake.LakeMeta.liveFileCount(s,
        graft.lake.Names.parts(s, t)) + 4).toInt
      val q = graft.streaming.IngestStreams.ivfIngest(
        mem.toDF().toDF("vec_id", "embedding"), t, ckpt,
        maintainFileThreshold = threshold)
      try graft.StageTimes.timed("v_ann_ingest_stream.epochs") {
        mem.addData(half1); q.processAllAvailable()
        mem.addData(half2); q.processAllAvailable()
      } finally q.stop()
      val result = graft.StageTimes.timed("v_ann_ingest_stream.probe")(
        probeStoredIvf(s, t, evens, qVecId = 0)
          .localCheckpoint(true, StorageLevel.DISK_ONLY))
      result.orderBy(col("cos_sim").desc, col("vec_id"))
    } finally {
      s.sql(s"DROP TABLE IF EXISTS ${graft.lake.Names.q(s, t)} PURGE")
      TextOps.rmTree(s, ckpt)
    }
  }

  /** The build half of [[buildIncrementalIvf]]: even ids create the
    * cell-partitioned index under the fixed first-8-even-id
    * centroids; batches (the gate's odd half, or a stream's
    * micro-batches) ingest separately via [[ingestVectorBatch]]. */
  private[graft] def buildEvenIvf(s: SparkSession, d: String)
      : (String, DataFrame) = {
    LakeOps.cat(s)
    val t = LakeOps.fresh("ivfincr")
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    // fixed centroid row: first 8 EVEN ids (0,2,..,14)
    val centsRow = emb
      .filter(col("vec_id") % 2 === 0 && col("vec_id") < 16)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cv"), col("nrm").as("cn")))).as("cents"))
    val evens = assignToCents(emb.filter(col("vec_id") % 2 === 0), centsRow)
    graft.StageTimes.timed("v_ann_ivf_incremental.build") {
      evens.select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
        .writeTo(graft.lake.Names.q(s, t)).using("lake")
        .partitionedBy(col("cell")).create()
    }
    // tag the build snapshot: refs protect their snapshots from
    // expire_snapshots, so a long-lived index under a nightly expire
    // cadence keeps the fixed-centroid source readable forever — the
    // VERSION AS OF read in [[ingestVectorBatch]] would otherwise
    // break the first time retention passes the build commit. (The
    // command runs directly — `ALTER TABLE … CREATE TAG` needs the
    // extensions parser, which plain gate sessions don't install.)
    // version = None resolves to the current main head — at this
    // point exactly the build snapshot, without assuming its id
    graft.lake.LakeRefCommand(graft.lake.Names.parts(s, t), "CREATE", isTag = true,
      IvfBuildTag, version = None, ifNotExists = false,
      ifExists = false).run(s)
    (t, evens)
  }

  /** Name of the tag [[buildEvenIvf]] pins on the build snapshot. */
  private[graft] val IvfBuildTag = "graft_ivf_build"

  /** Assign a batch of raw vectors (`vec_id`, `embedding`) against a
    * stored incremental index's FIXED build-time centroids — read
    * back from the table's own first-8-even-id rows, so no input
    * beyond the batch and the index is touched — and APPEND: the
    * incremental-ingest kernel shared by the batch gate and the
    * streaming twin (graft.streaming.IngestStreams.ivfIngest).
    * Partition-local file appends, O(batch × K) assignment dots,
    * no resident cell file rewritten. */
  /** Driver-side cache of each incremental index's collected fixed-
    * centroid row, keyed by (table, build snapshot id): centroids are
    * IMMUTABLE by construction (pinned to the build snapshot — see
    * [[ingestVectorBatch]]), so a sustained ingest reads them from
    * storage ONCE instead of scanning the table's full build snapshot
    * every micro-batch epoch — keeping the documented O(batch × K)
    * epoch cost independent of the build-time corpus size. The value
    * is one collected Row (K centroid structs, K×dim floats — bytes,
    * not a frame), so the cache is driver-memory-trivial; a 64-entry
    * access-ordered LRU bounds long-lived sessions cycling many
    * transient indexes WITHOUT the old wholesale clear (which made a
    * session with >64 live indexes re-scan all of them). The key is
    * the table's UUID (minted at create time, exposed as the reserved
    * `uuid` property — the per-INCARNATION identity) plus the build
    * snapshot id: snapshot ids are per-table counters and commit
    * timestamps have millisecond grain, so a dropped-and-recreated
    * index under the same name could collide on any (name, id, ts)
    * key and serve the previous incarnation's centroids — the UUID
    * cannot collide by construction. */
  /** Driver-side bounded LRU for per-source immutable values. Values
    * are recomputable and immutable per key, so locking is only the
    * map's own integrity: reads/writes synchronize briefly, the
    * multi-second Spark computes stay OUTSIDE (two concurrent misses
    * both compute the same value; the first put wins). */
  private[graft] final class LruCache[V](capacity: Int) {
    private val m = new java.util.LinkedHashMap[String, V](16, 0.75f,
        /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean = size > capacity
    }
    def get(k: String): V = m.synchronized(m.get(k))
    def putIfAbsent(k: String, v: V): Unit =
      m.synchronized { m.putIfAbsent(k, v); () }
    def clear(): Unit = m.synchronized(m.clear())
    /** The one miss-handling dance both caches share: compute runs
      * OUTSIDE the lock (it is a Spark job), duplicate concurrent
      * misses both compute the same immutable value, first put wins. */
    def getOrCompute(k: String)(f: => V): V = {
      val c = get(k)
      if (c != null) c else { val v = f; putIfAbsent(k, v); v }
    }
  }

  private val centroidCache = new LruCache[
    (org.apache.spark.sql.Row, org.apache.spark.sql.types.StructType)](64)

  /** Test hook: drop every cached centroid row so the next ingest
    * proves the STORAGE path (expire-survival specs). */
  private[graft] def clearCentroidCache(): Unit = centroidCache.clear()

  /** Resolve a stored incremental index's CENTROID SOURCE snapshot:
    * the newest main-history snapshot carrying the
    * [[graft.lake.ReplayGuard.IvfRepairTag]] commit marker (a repair
    * re-founds the centroids — see [[repairStoredIvf]]), else the
    * [[IvfBuildTag]] ref, else the pre-tag oldest==1 fallback.
    * Fails loudly when a replay watermark shows the newest repair was
    * expired under ignore_replay_guard (falling back to the build's
    * centroids against repaired rows would silently mis-assign every
    * later batch), and when the untagged build snapshot is gone. */
  private def centroidSourceSnap(meta: graft.lake.TableMeta,
      table: String): Long = {
    val mainAnc = meta.currentSnapshotId("main")
      .map(meta.ancestorsOf).getOrElse(Nil)
    // nearest-first walk → the first repair marker is the newest
    mainAnc.find(_.summary.get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag))
      .map(_.snapshotId)
      .getOrElse {
        graft.lake.ReplayGuard
          .watermarkOf(meta, graft.lake.ReplayGuard.IvfRepairTag)
          .foreach(wid => throw new IllegalStateException(
            s"index $table: repair snapshot $wid was expired under " +
              "ignore_replay_guard and no newer repair exists — the " +
              "centroid source is gone; re-run repairStoredIvf or " +
              "rebuild the index"))
        meta.refs.get(IvfBuildTag).map(_.snapshotId).getOrElse {
          // pre-tag fallback: legitimate ONLY while the table's
          // history still reaches back to the build commit (snapshot
          // ids are per-table counters starting at 1, so the build IS
          // id 1). After an expire has passed the untagged build
          // commit, the oldest SURVIVING snapshot contains ingested
          // rows — reading centroids from it would silently
          // mis-assign every later batch, so fail loudly instead.
          val oldest = meta.snapshots.map(_.snapshotId).min
          if (oldest != 1L) throw new IllegalStateException(
            s"index $table has no '$IvfBuildTag' tag and its build " +
              s"snapshot is expired (oldest surviving id $oldest): the " +
              "fixed-centroid source is gone — re-tag before expiring, " +
              "or rebuild the index")
          oldest
        }
      }
  }

  /** The one-row cents frame of `table`'s current centroid source —
    * what every ingest epoch assigns against and what
    * [[storedWithSims]] scores queries against.
    *
    * Centroids must be IMMUTABLE under ingestion: reading them from
    * the CURRENT table state would let any ingested batch containing
    * an even vec_id < 16 (a re-embedded doc, an overlapping id space)
    * silently grow/replace the centroid set for every later epoch and
    * strand probe-cell selection. They come from the resolved SOURCE
    * snapshot ([[centroidSourceSnap]]), whose rows no append can
    * alter (spec-pinned by the centroid-pollution test):
    *
    *  - a BUILD source stores the centroids as its first-8-even-id
    *    rows (the [[buildEvenIvf]] convention);
    *  - a REPAIR source's centroids are the per-cell 4 dp means of
    *    its published assignment ([[centsOfAssigned]] — the repair's
    *    publish convention, so the snapshot's rows alone reproduce
    *    them, no sidecar state to lose).
    *
    * The per-epoch storage cost is ONE driver-side metadata-log read
    * (graft.lake.LakeMeta — ref, uuid, repair marker, and snapshot
    * floor in one JSON load, no Spark jobs); the source-snapshot SCAN
    * happens once per source via [[centroidCache]] (immutability is
    * what makes the cache sound). Cache identity: the table UUID —
    * minted at create time, so a dropped-and-recreated index under
    * the same name is a DIFFERENT key by construction — plus the
    * source snapshot id. */
  private def storedCentsRow(s: SparkSession, table: String): DataFrame = {
    val meta = graft.lake.LakeMeta.of(s, graft.lake.Names.parts(s, table))
    val srcSnap = centroidSourceSnap(meta, table)
    val isRepair = meta.snapshotById(srcSnap)
      .exists(_.summary.get("graft.commit.tag")
        .contains(graft.lake.ReplayGuard.IvfRepairTag))
    val srcKey = s"${meta.uuid}@$srcSnap"
    val (row, schema) = centroidCache.getOrCompute(srcKey) {
      val stored = s.sql(
        s"SELECT * FROM ${graft.lake.Names.q(s, table)} VERSION AS OF $srcSnap")
      val cents =
        if (isRepair) centsOfAssigned(stored)
        else stored
          .filter(col("vec_id") % 2 === 0 && col("vec_id") < 16)
          .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
            col("embedding").as("cv"), col("nrm").as("cn"))))
            .as("cents"))
      (cents.head(), cents.schema)
    }
    s.createDataFrame(java.util.Collections.singletonList(row), schema)
  }

  /** Assign raw vectors (`vec_id`, `embedding`) against `table`'s
    * current centroid source — the `withSims` frame
    * [[probeStoredIvf]] takes, repair-aware: after a drift repair,
    * probe-cell selection follows the repaired centroids exactly as
    * ingestion does. */
  private[graft] def storedWithSims(s: SparkSession, table: String,
      vecs: DataFrame): DataFrame =
    assignToCents(vecs.withColumn("nrm", norm(col("embedding"))),
      storedCentsRow(s, table))

  private[graft] def ingestVectorBatch(s: SparkSession, table: String,
      batch: DataFrame): Unit = {
    ingestVectorBatchStat(s, table, batch, wantStat = false)
    ()
  }

  /** [[ingestVectorBatch]] returning the batch's mean best-centroid
    * cosine when `wantStat` — the O(batch × K) drift statistic the
    * streaming twin's repair trigger compares against
    * [[centroidRefStat]]. The stat is one extra batch-scale
    * aggregation job (recomputing the assignment from the batch
    * source), paid only when a caller opted into drift tracking —
    * plain gates and batch ingests stay one write job. */
  private[graft] def ingestVectorBatchStat(s: SparkSession, table: String,
      batch: DataFrame, wantStat: Boolean,
      smallBatch: Boolean = false): Option[Double] = {
    val assigned = assignToCents(
      batch.withColumn("nrm", norm(col("embedding"))),
      storedCentsRow(s, table))
    val stat = if (!wantStat) None else Some(
      assigned.agg(avg(array_max(transform(col("sims"),
        s0 => s0.getField("csim"))))).head().getDouble(0))
    // streaming micro-batches (smallBatch) skip the cluster-by-cell
    // exchange the partitioned append would otherwise pay per epoch:
    // one coalesced task writes the same one-file-per-touched-cell
    // layout (requiredOrdering still sorts tuple-major in-task). Bulk
    // ingests keep the clustered write.
    val out = assigned
      .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"))
    val w = (if (smallBatch) out.coalesce(1) else out)
      .writeTo(graft.lake.Names.q(s, table))
    (if (smallBatch) w.option("distribution-mode", "none") else w).append()
    stat
  }

  /** Driver-side cache of [[centroidRefStat]] per (uuid, source
    * snapshot) — same immutability argument as [[centroidCache]]. */
  private val refStatCache = new LruCache[java.lang.Double](64)

  /** Reference assignment quality of `table`'s centroid source: the
    * mean best-centroid cosine of the SOURCE snapshot's own residents
    * against its centroids. A drifted incoming batch scores well
    * below this (its vectors don't resemble any centroid); the
    * streaming repair trigger fires when the per-epoch statistic
    * falls under `threshold × this`. One source-snapshot scan per
    * source, cached — amortized across the stream's lifetime like the
    * centroid read itself. */
  private[graft] def centroidRefStat(s: SparkSession,
      table: String): Double = {
    val meta = graft.lake.LakeMeta.of(s, graft.lake.Names.parts(s, table))
    val srcSnap = centroidSourceSnap(meta, table)
    val key = s"${meta.uuid}@$srcSnap"
    refStatCache.getOrCompute(key) {
      val stored = s.sql(
        s"SELECT * FROM ${graft.lake.Names.q(s, table)} VERSION AS OF $srcSnap")
        .select(col("vec_id"), col("embedding"), col("nrm"))
      assignToCents(stored, storedCentsRow(s, table))
        .agg(avg(array_max(transform(col("sims"),
          s0 => s0.getField("csim"))))).head().getDouble(0)
    }.doubleValue()
  }

  /** IVF + int8 ANN — the two scale levers composed: the inverted
    * file bounds WHICH candidates are scored (nprobe/K of the corpus,
    * [[vAnnIvf]]) and symmetric int8 quantization ([[vQuantize]])
    * bounds WHAT each scoring touches — a 4× smaller candidate payload
    * whose dot product runs over packed integers, which is what a
    * memory-bandwidth-bound 100 TB vector store actually ships to the
    * ranking stage. Score = (scale_a·scale_q)·Σ(qa·qq) / (‖a‖·‖q‖),
    * association written identically in the DuckDB oracle so both
    * engines round the same doubles. Exact integer products (|q|≤127,
    * 64 dims ⇒ |Σ|≤1.04e6) — no float drift in the sum itself. */
  def vAnnIvfPq(s: SparkSession, d: String): DataFrame =
    ivfPqScored(s, d).orderBy(col("pq_cos").desc, col("vec_id")).limit(5)

  /** The IVF+int8 coarse candidate scoring shared by [[vAnnIvfPq]]
    * (serves top-5 directly) and [[vAnnRerank]] (top-C feeds an exact
    * re-rank): (vec_id, cell, pq_cos) for every candidate in the
    * query's probe cells. */
  private def ivfPqScored(s: SparkSession, d: String): DataFrame = {
    val k = 8
    val nprobe = 2
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val withSims = ivfAssign(emb, k)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val quantized = withSims
      .withColumn("e", dbl)
      .withColumn("amax", array_max(transform(col("e"), x => abs(x))))
      .withColumn("scale",
        when(col("amax") > 0, col("amax") / 127.0).otherwise(lit(1.0)))
      .withColumn("q", transform(col("e"),
        x => floor(x / col("scale") + 0.5).cast("long")))
    val assigned = quantized
      .select(col("vec_id"), col("cell"), col("q"), col("scale"), col("nrm"))
    // the query row carries its probe cells AND its quantized form in
    // one 2-row broadcast (cell, qq, qs, qn)
    val qrow = quantized.filter(col("vec_id") === 0)
      .select(explode(slice(sort_array(transform(col("sims"), s0 =>
        struct((-s0.getField("csim")).as("negsim"),
          s0.getField("cid").as("cid")))), 1, nprobe)).as("t"),
        col("q").as("qq"), col("scale").as("qs"), col("nrm").as("qn"))
      .select(col("t.cid").as("cell"), col("qq"), col("qs"), col("qn"))
    val ip = aggregate(zip_with(col("q"), col("qq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x).cast("double")
    assigned.filter(col("vec_id") =!= 0)
      .join(broadcast(qrow), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        round(((col("scale") * col("qs")) * ip) /
          (col("nrm") * col("qn")), 4).as("pq_cos"))
  }

  /** Two-stage retrieval — the production ANN serving shape: the
    * quantized coarse stage ([[ivfPqScored]]) ranks the IVF-bounded
    * candidates over 4×-smaller int8 payloads and keeps only the top
    * C = 20; the exact stage re-scores just those 20 at full double
    * precision (the 20-row candidate list broadcasts onto the
    * embedding scan — point fetches, no corpus-wide exact pass).
    * Coarse ranking bounds memory bandwidth, exact re-ranking
    * restores the precision the quantization gave up; both cut
    * orders are total (score DESC, vec_id) so the result is
    * deterministic on both engines. */
  def vAnnRerank(s: SparkSession, d: String): DataFrame = {
    val c = 20
    val cand = ivfPqScored(s, d)
      .orderBy(col("pq_cos").desc, col("vec_id")).limit(c)
      .select(col("vec_id"))
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    emb.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 4)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** One distributed Lloyd (k-means) refresh step — the centroid
    * update the IVF index defers ("a real pipeline would refresh them
    * and re-assign"): assign every vector to its nearest centroid
    * (shuffle-free broadcast argmax, [[ivfAssign]]), then recompute
    * each cell's centroid as the element-wise mean of its members.
    *
    * The mean deliberately rides stock aggregation instead of a custom
    * vector-sum Aggregator: posexplode is a NARROW map (no shuffle),
    * and the (cell, dim-index) group-by partial-aggregates map-side —
    * each task ships at most k×dim partial sums regardless of corpus
    * size, so the exchange is metadata-sized at 100 TB and the whole
    * plan stays inside whole-stage codegen.
    *
    * Output shape is one SCALAR row per (cluster_id, pos) — the
    * natural product of the aggregation, and the only shape the
    * driver's pandas-based comparator can hash (an array-typed result
    * column crashes its row sort). A consumer wanting packed arrays
    * reassembles with one k-group collect_list; the gate stays on the
    * exploded form. Member count rides the same aggregate: every
    * member contributes exactly one element at each pos, so the
    * per-(cell,pos) count IS the member count — no second scan. */
  /** Random-projection dimensionality reduction 64-d → 16-d
    * (Johnson–Lindenstrauss style, ±1 hyperplanes — the SAME
    * deterministic planes the LSH buckets use, so the oracle inlines
    * identical literals). A pure narrow projection: 16 fused dot
    * products per row, no shuffle — the standard "shrink before you
    * index/cluster" stage of an embedding pipeline; at 100 TB it cuts
    * downstream candidate-scoring bandwidth 4× like int8 quantization
    * cuts storage. Gate digests the reduced vector to scalars
    * (sum/L1, rounded) — array outputs crash the driver comparator. */
  def vDimReduce(s: SparkSession, d: String): DataFrame = {
    val proj = (0 until 16).map(j =>
      dot(col("embedding"), typedLit(planes(j))))
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(proj.reduce(_ + _), 4).as("r_sum"),
        round(proj.map(abs).reduce(_ + _), 4).as("r_l1"))
      .orderBy(col("vec_id"))
  }

  /** Cross-modal semantic dedup — the pipeline composite the separate
    * rings exist for: text-side MinHash-LSH proposes candidate pairs
    * (sub-quadratic, [[TextOps.tMinhashPairs]]) and the embedding
    * side VERIFIES each with an exact cosine, flagging which survive
    * a semantic threshold. At 100 TB the shape is the decisive part:
    * candidates ≪ corpus, so ONLY the candidate id pairs broadcast —
    * once onto each embedding scan (point fetches of the two
    * vectors); the fetched candidate-scale sides then meet in a
    * pair-keyed shuffle join. No embedding payload ever enters a
    * broadcast exchange (round 7 broadcast the A-side WITH its
    * vectors — correct, but it crosses the broadcast size limit as
    * soon as the candidate count grows), and the expensive modality
    * never self-joins. */
  def xSemanticDedup(s: SparkSession, d: String): DataFrame = {
    val cand = TextOps.tMinhashPairs(s, d) // (doc_a, doc_b, est_jaccard)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
    val aSide = emb
      .join(broadcast(cand), col("vec_id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val bSide = emb
      .join(broadcast(cand.select(col("doc_a"), col("doc_b"))),
        col("vec_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    aSide.join(bSide, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
          .as("cos_sim"))
      .withColumn("confirmed",
        when(col("cos_sim") >= 0.5, 1L).otherwise(0L))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Lloyd k-means — two full refresh iterations of the index-build
    * loop [[vCentroidUpdate]] is one step of: assign every vector to
    * its nearest centroid (cosine argmax over a broadcast centroid
    * row — the [[ivfAssign]] kernel, no shuffle), recompute per-cell
    * per-dimension means, re-broadcast, re-assign, and emit the final
    * centroids. Each iteration's exchange is (cell, dim)-bounded
    * (K×dim partial sums), so at 100 TB the loop cost is
    * iterations × one corpus scan — the shape a real IVF index build
    * pays.
    *
    * Cross-engine determinism contract: published centroids are
    * QUANTIZED to 4 decimals (±0.0 canonicalized) each iteration —
    * Spark's partial aggregation and DuckDB sum in different orders,
    * so raw float means differ in ULPs; rounding pins both engines to
    * identical centroid bits before the next assignment (the same
    * contract `v_centroid_update` already ships, extended through the
    * loop). A reproducible-refresh pipeline wants published centroids
    * quantized anyway. */
  def vKmeans(s: SparkSession, d: String): DataFrame = {
    val k = 8
    val iters = 2
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    var cents = emb.filter(col("vec_id") < k)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cv"), col("nrm").as("cn")))).as("cents"))
    var means: DataFrame = null
    val m0 = round(avg(col("col").cast("double")), 4)
    for (i <- 1 to iters) {
      val assigned = assignToCents(emb, cents)
        .select(col("cell"), posexplode(col("embedding")))
      means = assigned
        .groupBy(col("cell"), col("pos"))
        .agg(when(m0 === 0.0, lit(0.0)).otherwise(m0).as("m"),
          count(lit(1)).as("n_members"))
      if (i < iters)
        cents = means
          .groupBy(col("cell"))
          .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("cell").as("cid"),
            transform(col("pm"), x => x.getField("m")).as("cv"))
          .withColumn("cn", norm(col("cv")))
          .agg(sort_array(collect_list(struct(col("cid"), col("cv"),
            col("cn")))).as("cents"))
    }
    means
      .select(col("cell").as("cluster_id"), col("pos").cast("long").as("pos"),
        col("m"), col("n_members"))
      .orderBy(col("cluster_id"), col("pos"))
  }

  def vCentroidUpdate(s: SparkSession, d: String): DataFrame = {
    val k = 8
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val assigned = ivfAssign(emb, k)
      .select(col("vec_id"), col("embedding"), col("cell"))
    // ±0.0 canonicalization: a dimension whose true mean magnitude is
    // below round-4 resolution rounds to zero, but the SIGN of the
    // underlying tiny sum depends on summation order — Spark's partial
    // aggregation and DuckDB disagree per cell, and -0.0 vs 0.0 breaks
    // a hash/sort compare even though the values are equal
    val m0 = round(avg(col("col").cast("double")), 4)
    assigned
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(when(m0 === 0.0, lit(0.0)).otherwise(m0).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cell").as("cluster_id"), col("pos").cast("long").as("pos"),
        col("m"), col("n_members"))
      .orderBy(col("cluster_id"), col("pos"))
  }

  /** Cluster-prototypicality pruning — the SemDeDup/D4-style curation
    * stage that drops each cluster's least-typical tail before
    * training: assign every vector to its nearest of K centroids (the
    * deterministic first-K stand-in [[ivfAssign]] uses), score each
    * member by its cosine to the assigned centroid
    * ("prototypicality"), and keep a member iff its 4-dp score clears
    * the cluster's exact 25th-percentile cutoff (ties at the cutoff
    * are kept, so the drop is at most a quarter).
    *
    * Scale shape mirrors `t_length_trim`'s histogram percentile:
    * assignment is the narrow broadcast-centroid argmax (no shuffle,
    * no n×k expansion), the heavy pass is ONE (cell, score) histogram
    * aggregate (map-side combining; ≤ K × 20001 bins at any corpus
    * size since scores are 4-dp quantized), the cumulative walk runs
    * on that bounded frame, and per-cluster cutoffs broadcast back
    * onto a narrow filter — no row_number ever ranks the corpus.
    * Cross-engine safety: the cutoff is selected by an exact INTEGER
    * comparison (4·cum > n) over 4-dp-rounded cosines (bit-identical
    * across engines — the same contract every cos_sim gate ships), so
    * no float ordering drives row selection. */
  def vClusterPrune(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).withColumn("nrm", norm(col("embedding")))
    val assigned = ivfAssign(emb, 8)
      .select(col("vec_id"), col("cell"),
        round(array_max(transform(col("sims"), s0 => s0.getField("csim"))), 4)
          .as("proto"))
    val wCum = Window.partitionBy(col("cell")).orderBy(col("proto"))
    val wAll = Window.partitionBy(col("cell"))
    val th = assigned.groupBy(col("cell"), col("proto"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("cell"))
      .agg(min(when(lit(4L) * col("cum") > col("n"), col("proto")))
        .as("thr"))
    assigned.join(broadcast(th), Seq("cell"))
      .select(col("vec_id"), col("cell").cast("long").as("cluster_id"),
        col("proto"),
        when(col("proto") >= col("thr"), lit(1L)).otherwise(lit(0L))
          .as("kept"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_neardup_pairs" -> (vNearDupPairs _),
    "v_vector_stats" -> (vVectorStats _),
    "v_quantize" -> (vQuantize _),
    "v_ann_bruteforce" -> (vAnnBruteforce _),
    "v_ann_lsh" -> (vAnnLsh _),
    "v_ann_ivf" -> (vAnnIvf _),
    "v_ann_ivf_indexed" -> (vAnnIvfIndexed _),
    "v_ann_ivf_incremental" -> (vAnnIvfIncremental _),
    "v_ann_ingest_stream" -> (vAnnIngestStream _),
    "v_ann_ivf_k256" -> (vAnnIvfK256 _),
    "v_ann_ivf_pq" -> (vAnnIvfPq _),
    "v_ann_rerank" -> (vAnnRerank _),
    "x_semantic_dedup" -> (xSemanticDedup _),
    "v_dim_reduce" -> (vDimReduce _),
    "v_knn_join" -> (vKnnJoin _),
    "v_centroid_update" -> (vCentroidUpdate _),
    "v_kmeans" -> (vKmeans _),
    "v_cluster_prune" -> (vClusterPrune _),
  )

  // --- DuckDB oracle -------------------------------------------------

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> " +
      s"$a[i+1]::DOUBLE * $b[i+1]::DOUBLE))"
  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  private def planeLit(p: Seq[Double]): String =
    p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** bucket expression with the plane literals inlined. */
  private def bucketSql(v: String, nPlanes: Int = NPlanes): String =
    planes.take(nPlanes).map { p =>
      s"(CASE WHEN ${dotSql(v, planeLit(p))} > 0 THEN 1 ELSE 0 END)"
    }.zipWithIndex.map { case (bit, j) =>
      val w = 1 << (nPlanes - 1 - j)
      s"$bit * $w"
    }.mkString("(", " + ", ")")

  /** band-j bucket expression over that band's 4 private planes. */
  private def bandSql(v: String, band: Int): String =
    planes.slice(band * PlanesPerBand, (band + 1) * PlanesPerBand).map { p =>
      s"(CASE WHEN ${dotSql(v, planeLit(p))} > 0 THEN 1 ELSE 0 END)"
    }.zipWithIndex.map { case (bit, j) =>
      val w = 1 << (PlanesPerBand - 1 - j)
      s"$bit * $w"
    }.mkString("(", " + ", ")")

  /** IVF-flat ANN oracle, parameterized over index width and the
    * centroid-selection predicate: shared by the toy-K gate
    * (`v_ann_ivf`, K=8/nprobe=2), the production-width gate
    * (`v_ann_ivf_k256`, K=256/nprobe=64 — same 1/4 probe fraction),
    * the stored-index gate, and the incremental gate (centroids =
    * first 8 EVEN ids, the build-time corpus). */
  private def ivfFlatSql(k: Int, nprobe: Int,
      centsWhere: String = ""): String =
    s"""WITH emb AS (
       |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
       |  FROM emb WHERE ${if (centsWhere.nonEmpty) centsWhere
                           else s"vec_id < $k"}),
       |sims AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
       |                    (e.nrm * c.cn))
       |         THEN -2.0
       |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
       |    END AS csim -- NaN pinned below any real cosine, matching
       |                -- the Spark side's nanvl(-2.0)
       |  FROM emb e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, cid) AS rk FROM sims)
       |  WHERE rk = 1),
       |qcells AS (
       |  SELECT cell, qv, qn FROM (
       |    SELECT cid AS cell, embedding AS qv, nrm AS qn,
       |      row_number() OVER (ORDER BY csim DESC, cid) AS rk
       |    FROM sims WHERE vec_id = 0)
       |  WHERE rk <= $nprobe)
       |SELECT a.vec_id, a.cell,
       |  round(${dotSql("a.embedding", "q.qv")} / (a.nrm * q.qn), 4)
       |    AS cos_sim
       |FROM assigned a JOIN qcells q USING (cell)
       |WHERE a.vec_id <> 0
       |ORDER BY cos_sim DESC, a.vec_id LIMIT 5""".stripMargin

  /** Shared WITH-prefix of the IVF+int8 oracles: everything through
    * the coarse quantized candidate scoring CTE. */
  private val ivfPqCoarseSql =
    s"""WITH emb AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
         |  FROM emb WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, e.nrm, c.cid,
         |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
         |                    (e.nrm * c.cn))
         |         THEN -2.0
         |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
         |    END AS csim
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, nrm, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cid) AS rk FROM sims)
         |  WHERE rk = 1),
         |q8 AS (
         |  SELECT vec_id, scale,
         |    list_transform(e, x -> floor(x/scale + 0.5)::BIGINT) AS q
         |  FROM (SELECT vec_id,
         |          CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale, e
         |        FROM (SELECT vec_id,
         |                list_transform(embedding, x -> x::DOUBLE) AS e,
         |                list_max(list_transform(embedding,
         |                  x -> abs(x::DOUBLE))) AS m
         |              FROM embeddings))),
         |a2 AS (
         |  SELECT a.vec_id, a.cell, a.nrm, z.scale, z.q
         |  FROM assigned a JOIN q8 z USING (vec_id)),
         |qcells AS (
         |  SELECT cell FROM (
         |    SELECT cid AS cell,
         |      row_number() OVER (ORDER BY csim DESC, cid) AS rk
         |    FROM sims WHERE vec_id = 0)
         |  WHERE rk <= 2),
         |qv AS (SELECT q AS qq, scale AS qs FROM q8 WHERE vec_id = 0),
         |qn AS (SELECT nrm AS qn FROM emb WHERE vec_id = 0),
       |coarse AS (
       |  SELECT a2.vec_id, a2.cell,
       |    round(((a2.scale * qv.qs) *
       |        list_sum(list_transform(range(len(a2.q)),
       |          i -> a2.q[i+1] * qv.qq[i+1]))::DOUBLE) /
       |      (a2.nrm * qn.qn), 4) AS pq_cos
       |  FROM a2 JOIN qcells USING (cell) CROSS JOIN qv CROSS JOIN qn
       |  WHERE a2.vec_id <> 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "v_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale,
        |    e
        |  FROM (SELECT vec_id,
        |          list_transform(embedding, x -> x::DOUBLE) AS e,
        |          list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
        |            AS m
        |        FROM embeddings))
        |SELECT vec_id, round(scale, 6) AS scale6,
        |  list_sum(list_transform(e, x -> floor(x/scale + 0.5)::BIGINT))
        |    ::BIGINT AS q_sum,
        |  list_sum(list_transform(e, x -> abs(floor(x/scale + 0.5)::BIGINT)))
        |    ::BIGINT AS q_l1
        |FROM q ORDER BY vec_id""".stripMargin,
    "v_neardup_pairs" -> {
      val bandSelects = (0 until NBands).map(j =>
        s"SELECT vec_id, $j AS band, ${bandSql("embedding", j)} AS bkt " +
          "FROM embeddings").mkString("\n  UNION ALL ")
      s"""WITH x AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM x a JOIN x b ON a.band = b.band AND a.bkt = b.bkt
         |    AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  round(${dotSql("a.embedding", "b.embedding")} /
         |    (${normSql("a.embedding")} * ${normSql("b.embedding")}), 4)
         |    AS cos_sim
         |FROM cand
         |JOIN embeddings a ON a.vec_id = id_a
         |JOIN embeddings b ON b.vec_id = id_b
         |WHERE round(${dotSql("a.embedding", "b.embedding")} /
         |    (${normSql("a.embedding")} * ${normSql("b.embedding")}), 4) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    },
    "v_vector_stats" ->
      s"""SELECT label, count(*) AS n,
         |  round(avg(${normSql("embedding")}), 4) AS avg_norm
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "v_ann_bruteforce" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |  round(${dotSql("embedding", "qv")} /
         |    (${normSql("embedding")} * ${normSql("qv")}), 4) AS cos_sim
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "v_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${bucketSql("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qv, bucket AS qbucket
         |      FROM e WHERE vec_id = 0)
         |SELECT vec_id, bucket,
         |  round(${dotSql("embedding", "qv")} /
         |    (${normSql("embedding")} * ${normSql("qv")}), 4) AS cos_sim
         |FROM e, q WHERE vec_id <> 0 AND bucket = qbucket
         |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin,
    "v_ann_ivf" -> ivfFlatSql(k = 8, nprobe = 2),
    // the stored-index gate must return the identical top-5: the lake
    // round-trip changes the read path, not the result
    "v_ann_ivf_indexed" -> ivfFlatSql(k = 8, nprobe = 2),
    // incremental ingestion must converge to the one-shot truth:
    // centroids fixed at build time (first 8 even ids), every vector
    // assigned, same probe
    "v_ann_ivf_incremental" -> ivfFlatSql(k = 8, nprobe = 2,
      centsWhere = "vec_id % 2 = 0 AND vec_id < 16"),
    // the streaming twin answers to the same one-shot truth — epoch
    // chopping cannot change an assignment against fixed centroids
    "v_ann_ingest_stream" -> ivfFlatSql(k = 8, nprobe = 2,
      centsWhere = "vec_id % 2 = 0 AND vec_id < 16"),
    "v_ann_ivf_k256" -> ivfFlatSql(k = 256, nprobe = 64),
    "v_ann_ivf_pq" ->
      s"""$ivfPqCoarseSql
         |SELECT vec_id, cell, pq_cos FROM coarse
         |ORDER BY pq_cos DESC, vec_id LIMIT 5""".stripMargin,
    "v_ann_rerank" ->
      s"""$ivfPqCoarseSql,
         |topc AS (SELECT vec_id FROM coarse
         |         ORDER BY pq_cos DESC, vec_id LIMIT 20)
         |SELECT e.vec_id,
         |  round(${dotSql("e.embedding", "q.qv")} / (e.nrm * q.qn), 4)
         |    AS cos_sim
         |FROM emb e JOIN topc USING (vec_id)
         |CROSS JOIN (SELECT embedding AS qv, nrm AS qn FROM emb
         |            WHERE vec_id = 0) q
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""".stripMargin,
    "v_dim_reduce" -> {
      val ds = (0 until 16).map(j => dotSql("embedding", planeLit(planes(j))))
      s"""SELECT vec_id,
         |  round(${ds.mkString(" + ")}, 4) AS r_sum,
         |  round(${ds.map(x => s"abs($x)").mkString(" + ")}, 4) AS r_l1
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },
    "x_semantic_dedup" ->
      s"""${TextOps.minhashCandCte},
         |emb AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
         |        FROM embeddings)
         |SELECT doc_a, doc_b, est_jaccard, cos_sim,
         |  CASE WHEN cos_sim >= 0.5 THEN 1 ELSE 0 END::BIGINT AS confirmed
         |FROM (
         |  SELECT c.doc_a, c.doc_b, c.est_jaccard,
         |    round(${dotSql("ea.embedding", "eb.embedding")} /
         |      (ea.nrm * eb.nrm), 4) AS cos_sim
         |  FROM mh_cand c
         |  JOIN emb ea ON ea.vec_id = c.doc_a
         |  JOIN emb eb ON eb.vec_id = c.doc_b)
         |ORDER BY doc_a, doc_b""".stripMargin,
    "v_centroid_update" ->
      s"""WITH emb AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
         |  FROM emb WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
         |                    (e.nrm * c.cn))
         |         THEN -2.0
         |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
         |    END AS csim
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cid) AS rk FROM sims)
         |  WHERE rk = 1),
         |ex AS (
         |  SELECT cell, generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding)::DOUBLE AS x
         |  FROM assigned)
         |SELECT cell AS cluster_id, (i - 1)::BIGINT AS pos,
         |  CASE WHEN round(avg(x), 4) = 0 THEN 0.0
         |       ELSE round(avg(x), 4) END AS m, -- ±0.0 canonicalized,
         |                                       -- matching the Spark side
         |  count(*) AS n_members
         |FROM ex GROUP BY cell, i
         |ORDER BY cluster_id, pos""".stripMargin,
    "v_cluster_prune" ->
      s"""WITH emb AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
         |  FROM emb WHERE vec_id < 8),
         |sims AS (
         |  SELECT e.vec_id, c.cid,
         |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
         |                    (e.nrm * c.cn))
         |         THEN -2.0
         |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
         |    END AS csim
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid AS cell, round(csim, 4) AS proto FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cid) AS rk FROM sims)
         |  WHERE rk = 1),
         |hist AS (
         |  SELECT cell, proto, count(*)::BIGINT AS c FROM assigned
         |  GROUP BY cell, proto),
         |th AS ( -- cutoff by exact integer compare on 4-dp bins:
         |        -- min proto whose cumulative count exceeds n/4
         |  SELECT cell, min(CASE WHEN 4 * cum > n THEN proto END) AS thr
         |  FROM (SELECT cell, proto,
         |          sum(c) OVER (PARTITION BY cell ORDER BY proto)
         |            ::BIGINT AS cum,
         |          sum(c) OVER (PARTITION BY cell)::BIGINT AS n
         |        FROM hist)
         |  GROUP BY cell)
         |SELECT a.vec_id, a.cell::BIGINT AS cluster_id, a.proto,
         |  (CASE WHEN a.proto >= t.thr THEN 1 ELSE 0 END)::BIGINT AS kept
         |FROM assigned a JOIN th t USING (cell)
         |ORDER BY a.vec_id""".stripMargin,
    "v_kmeans" ->
      s"""WITH emb AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
         |  FROM embeddings),
         |c1 AS (
         |  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
         |  FROM emb WHERE vec_id < 8),
         |s1 AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
         |                    (e.nrm * c.cn))
         |         THEN -2.0
         |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
         |    END AS csim
         |  FROM emb e CROSS JOIN c1 c),
         |a1 AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cid) AS rk FROM s1)
         |  WHERE rk = 1),
         |e1 AS (
         |  SELECT cell, generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding)::DOUBLE AS x
         |  FROM a1),
         |m1 AS ( -- published iteration-1 centroids: 4-dp quantized,
         |        -- ±0.0 canonicalized (the cross-engine contract)
         |  SELECT cell, i,
         |    CASE WHEN round(avg(x), 4) = 0 THEN 0.0
         |         ELSE round(avg(x), 4) END AS m
         |  FROM e1 GROUP BY cell, i),
         |c2 AS (
         |  SELECT cell AS cid, list(m ORDER BY i) AS cv FROM m1
         |  GROUP BY cell),
         |c2n AS (SELECT cid, cv, ${normSql("cv")} AS cn FROM c2),
         |s2 AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    CASE WHEN isnan(${dotSql("e.embedding", "c.cv")} /
         |                    (e.nrm * c.cn))
         |         THEN -2.0
         |         ELSE ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn)
         |    END AS csim
         |  FROM emb e CROSS JOIN c2n c),
         |a2 AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cid) AS rk FROM s2)
         |  WHERE rk = 1),
         |e2 AS (
         |  SELECT cell, generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding)::DOUBLE AS x
         |  FROM a2)
         |SELECT cell AS cluster_id, (i - 1)::BIGINT AS pos,
         |  CASE WHEN round(avg(x), 4) = 0 THEN 0.0
         |       ELSE round(avg(x), 4) END AS m,
         |  count(*) AS n_members
         |FROM e2 GROUP BY cell, i
         |ORDER BY cluster_id, pos""".stripMargin,
    "v_knn_join" ->
      s"""SELECT qid, nid, cos_sim, rank FROM (
         |  SELECT q.vec_id AS qid, n.vec_id AS nid,
         |    round(${dotSql("n.embedding", "q.embedding")} /
         |      (${normSql("n.embedding")} * ${normSql("q.embedding")}), 4)
         |      AS cos_sim,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      round(${dotSql("n.embedding", "q.embedding")} /
         |        (${normSql("n.embedding")} * ${normSql("q.embedding")}), 4)
         |      DESC, n.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20)
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
  )
}
