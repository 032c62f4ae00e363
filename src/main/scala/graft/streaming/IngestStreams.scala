package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextOps

/** Continuous-ingest curation: Structured-Streaming twins of the
  * stored-index nightly maintenance paths. The nightly refresh was
  * built batch-first, but its contract — everything derives from the
  * batch docs' own text plus the stored index tables — is exactly a
  * `foreachBatch` body, so a documents stream keeps the SAME index
  * tables continuously fresh with the same exactness guarantees
  * (df-capped universe, straddle guard/repair, atomic label publish).
  *
  * Delivery semantics: `foreachBatch` is at-least-once — an epoch
  * that crashed mid-refresh is replayed from the checkpoint. Each
  * epoch therefore runs with a commit tag derived from the epoch id:
  * every lake commit the refresh makes carries the tag atomically in
  * its snapshot summary, and the refresh skips any table whose main
  * history already holds this epoch's commit
  * (TextOps.refreshGroupIndexMined's `epochTag` contract). The net
  * effect is exactly-once per table across every crash point, pinned
  * by IngestStreamsSuite's partial-replay specs.
  *
  * Interplay with `expire_snapshots`: the epoch guard checks the tag
  * against MAIN-HISTORY snapshots, so expiring a snapshot forgets its
  * tag — a replay of an epoch whose commits retention no longer
  * covers would re-append. foreachBatch replays at most the LAST
  * uncommitted epoch (the checkpoint advances past an epoch only
  * after the batch body returns), so the guard only ever needs the
  * most recent epoch's commits, while expire retention is
  * hours-to-days — and the rule is ENFORCED, not just operational:
  * `expire_snapshots` refuses to expire a scope's newest epoch-tagged
  * snapshot unless overridden, and an override stamps a replay
  * watermark that turns the bad replay into a loud failure instead of
  * silent duplicates (graft.lake.ReplayGuard). (The IVF build
  * snapshot itself is tag-PROTECTED from expiry — see
  * VectorOps.IvfBuildTag.)
  *
  * 100 TB shape: one long-lived query per corpus; micro-batch cost is
  * the measured nightly-refresh cost at the batch's size (GroupScale
  * decade tables — probe floor + batch-proportional stages), so
  * trigger intervals tune freshness against the per-epoch commit
  * floor. State lives in the INDEX TABLES, not the stream — the
  * checkpoint holds only source offsets, so executors stay
  * stateless and the query restarts anywhere.
  *
  * Namespace: every table these loops touch (the index tables, the
  * trigger state reads, the maintenance procedure calls) resolves
  * through `spark.graft.lake.namespace` (graft.lake.Names, default
  * `lakeq.db`) — a deployment points the whole ring at its own
  * catalog/namespace with one conf, after registering that catalog
  * and creating the namespace exactly as for the default
  * (IngestStreamsSuite's alternate-namespace spec is the template).
  */
object IngestStreams {

  /** Epoch tags must be unique across STREAM GENERATIONS, not just
    * within one: they are checked against the index table's PERMANENT
    * history, so a new query started over the same long-lived index
    * (new checkpoint, epoch ids restarting at 0) must not collide
    * with a previous generation's tags — a collision would silently
    * skip the new generation's first micro-batches as "replays". The
    * tag therefore carries a digest of the checkpoint's PERSISTENT
    * STREAMING QUERY ID (the `id` the engine writes to
    * `<checkpoint>/metadata` at first start and reads back on every
    * restart): same checkpoint → same id → same tags (genuine
    * restarts deduplicate), new checkpoint → fresh id → fresh tag
    * space (a new generation re-processes whatever its source
    * delivers). The id is read through the Hadoop FileSystem the
    * checkpoint string resolves to — the SAME resolution the engine
    * applies to `checkpointLocation` — so a driver restart with a
    * different working directory (per-attempt container dirs under
    * YARN/k8s) or a URI-style location (s3://, hdfs://) cannot shift
    * the scope the way a java.io.File canonicalization would.
    * Clearing a checkpoint IN PLACE while keeping the index is
    * unsupported, as with any offset store.
    *
    * Migration caveat (pre-release): before r12 the scope digested
    * the CHECKPOINT PATH, so index tables + checkpoints created under
    * that scheme carry old-scope tags — a post-upgrade restart of such
    * a stream would treat already-committed epochs as new and append
    * them again. No long-lived pre-r12 checkpoints exist (the scheme
    * never shipped), so no legacy-tag matching is implemented; if one
    * ever surfaces, start it on a FRESH checkpoint with a source
    * offset past the committed data, or add path-digest tags to the
    * replay check. */
  private[graft] def scopeOf(s: SparkSession, checkpoint: String): String = {
    val meta = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val fs = meta.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(fs.makeQualified(meta))
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // a real JSON parse (json4s ships with Spark), not a regex: the
    // engine writes a single flat object today, but an escaped quote
    // inside a future sibling field must not shift the id match. Both
    // failure shapes — unparseable file AND well-formed JSON missing
    // the id — must name the checkpoint, or a truncated metadata file
    // (partial write during a crash) surfaces as a bare parser error
    // with no path to act on.
    val parsed =
      try org.json4s.jackson.JsonMethods.parse(json)
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalStateException(
          s"unparseable checkpoint metadata at $meta", e)
      }
    val id = parsed \ "id" match {
      case org.json4s.JString(v) if v.nonEmpty => v
      case _ => throw new IllegalStateException(
        s"no streaming query id in checkpoint metadata at $meta")
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
  }

  /** Start the continuous near-dup ingest over a streaming documents
    * frame (`doc_id`, `text`): each micro-batch probes the stored
    * group index, mines its edges, advances the substrate tables, and
    * publishes labels atomically — the streaming twin of
    * [[graft.queries.TextOps.tDedupGroupsIndexed]]'s refresh stage.
    * `rollbackCrashedRepair` opts a replayed epoch that crashed
    * INSIDE a straddle repair into automatic reconciliation (roll
    * each epoch-touched table back to its pre-epoch ancestor, re-run
    * the repair); off, such a replay keeps the diagnosable refusal.
    *
    * SINGLE-FLIGHT per index: the refresh is a multi-table
    * read-modify-write, so exactly one dedup stream may feed a given
    * group index (the crashed-repair rollback refuses on any foreign
    * interleaved commit for the same reason). Contrast [[ivfIngest]],
    * whose epoch is one append against fixed centroids — multiple
    * scope-distinct IVF streams may legally share one index
    * (spec-pinned).
    *
    * `maintainFileThreshold = N` (0 = off) runs the group-index
    * maintenance cadence (TextOps.maintainGroupIndex: df fold,
    * posting binpack, size sort-rewrite, labels mask-fold) INSIDE the
    * loop whenever the MAX live file count across the four index
    * tables reaches N, so a long-lived stream bounds its own side
    * tables' file counts instead of depending on an external
    * scheduler. The canary is the max, not the df table alone: an
    * ordinary epoch appends to all four tables in step, but a
    * repair-heavy or skew-appending workload can grow one table ahead
    * of the others — a single-table canary would let the outliers run
    * unbounded. The trigger reads DURABLE state (four driver-side
    * live-file counts off the metadata log — graft.lake.LakeMeta —
    * every non-empty epoch), so it is restart-stable by construction — an in-memory "every K refreshes" counter resets
    * on every stream restart and a crash-looped or availableNow-style
    * deployment restarting faster than its period would NEVER
    * maintain, while epoch-id parity misfires when data lands only on
    * non-aligned epochs; the file count is also exactly the quantity
    * the feature exists to bound. The cadence is row-preserving pure
    * scheduling — labels and probe results are bit-identical across a
    * pass (GroupIndexSuite) — and runs AFTER the epoch's refresh
    * returns, outside its tag scope: maintenance commits are
    * untagged, so they can never satisfy (or poison) a replay's
    * epoch guard. */
  private[graft] def dedupIngest(docs: DataFrame, idx: TextOps.GroupIndex,
      checkpoint: String,
      rollbackCrashedRepair: Boolean = false,
      maintainFileThreshold: Int = 0): StreamingQuery = {
    // the scope digests the checkpoint's persistent query id, which
    // the engine writes at query START — so it resolves lazily at the
    // first non-empty batch (foreachBatch runs strictly after start),
    // then stays cached for the query's lifetime
    lazy val scope = scopeOf(docs.sparkSession, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty) {
          TextOps.refreshGroupIndexMined(batch.sparkSession, idx, batch,
            epochTag = Some(s"dedup-ingest-$scope-$epoch"),
            rollbackCrashedRepair = rollbackCrashedRepair)
          if (maintainFileThreshold > 0 &&
              Seq(idx.post, idx.df, idx.size, idx.labels)
                .map(t => graft.lake.LakeMeta.liveFileCount(
                  batch.sparkSession,
                  graft.lake.Names.parts(batch.sparkSession, t))).max
                >= maintainFileThreshold)
            TextOps.maintainGroupIndex(batch.sparkSession, idx)
        }
        ()
      }
      .start()
  }

  /** One epoch of the streaming IVF ingest — the guarded body
    * `ivfIngest` runs per micro-batch, callable directly so replay
    * semantics are testable without restarting a stream. The ingest
    * is a SINGLE append commit against fixed stored centroids
    * (VectorOps.ingestVectorBatch), so the epoch tag alone makes it
    * exactly-once: a replayed epoch whose commit is on the table's
    * main history is a no-op. */
  private[graft] def ivfIngestEpoch(table: String, batch: DataFrame,
      epoch: Long, scope: String,
      wantDriftStat: Boolean = false): Option[Double] = {
    val sp = batch.sparkSession
    val tag = s"ivf-ingest-$scope-$epoch"
    if (!batch.isEmpty && !TextOps.epochCommittedOnMain(sp, table, tag))
      TextOps.withCommitTag(Some(tag)) {
        graft.queries.VectorOps.ingestVectorBatchStat(sp, table, batch,
          wantStat = wantDriftStat, smallBatch = true)
      }
    else None
  }

  /** Start the continuous ANN-index ingest over a streaming vectors
    * frame (`vec_id`, `embedding`): each micro-batch assigns against
    * the stored incremental IVF's fixed centroids and appends its
    * cell-partitioned rows — the streaming twin of
    * [[graft.queries.VectorOps.vAnnIvfIncremental]]'s ingest stage,
    * exactly-once under replay via the epoch tag. Probes
    * (probeStoredIvf) serve unchanged throughout; centroid drift
    * under sustained ingestion is repaired out-of-band by
    * repairStoredIvf, exactly as in the batch lifecycle.
    *
    * `maintainFileThreshold = N` (0 = off) compacts the index table
    * INSIDE the loop whenever its live file count reaches N — the
    * [[dedupIngest]] cadence applied to the IVF twin's own growth
    * disease: every epoch appends one small file set per touched
    * cell, so a month of 5-minute triggers is thousands of commits of
    * tiny cell files degrading probe planning. The compaction is
    * `rewrite_data_files` with the table defaults, which bin-packs
    * WITHIN partitions — every rewritten file stays inside its `cell`
    * partition tuple, so footer min=max stats keep pruning non-probed
    * cells and probe results are bit-identical across a pass
    * (spec-pinned, plan pin included). Trigger discipline is the
    * dedup twin's exactly: DURABLE state (a metadata-scale `.files`
    * count every non-empty epoch — restart-stable where an in-memory
    * cadence counter is not), run AFTER the epoch body returns,
    * OUTSIDE its tag scope — maintenance commits are untagged, so
    * they can never satisfy (or poison) a replay's epoch guard, and
    * the build snapshot's files are only superseded, never deleted
    * (and its tag protects them from expiry), so the fixed-centroid
    * read ([[graft.queries.VectorOps.ingestVectorBatch]]'s
    * `VERSION AS OF` build-snapshot scan) survives any number of
    * compactions. Trigger state reads are driver-side metadata-log
    * reads (graft.lake.LakeMeta), not Spark jobs.
    *
    * `driftRepairThreshold = r` (0 = off) closes the twin's LAST
    * self-maintenance gap — recall: each ingested epoch's mean
    * best-centroid cosine (computed from the epoch's OWN assignment,
    * O(batch × K), one extra batch-scale job only when the feature is
    * on) is compared against the centroid source's reference quality
    * (VectorOps.centroidRefStat — the source snapshot's residents
    * against their own centroids, one amortized scan per source);
    * an epoch scoring below r × reference means incoming data no
    * longer resembles ANY centroid, and the loop runs
    * VectorOps.repairStoredIvf in place. Trigger discipline matches
    * the compaction trigger: the statistic is restart-stable by
    * construction (each epoch's stat derives from that epoch's own
    * data — no in-memory counter to lose), the repair runs AFTER the
    * epoch body returns, OUTSIDE its tag scope (the repair's own
    * commit marker is not an epoch tag, so it can never satisfy or
    * poison a replay's epoch guard), and probes stay compatible —
    * the repair re-founds the centroid source atomically, so later
    * epochs assign (and storedWithSims scores queries) against the
    * repaired centroids. A crash between the epoch commit and the
    * repair merely defers the repair to the next drifted epoch (the
    * replayed epoch skips as committed and returns no stat). A
    * replayed-then-skipped epoch never re-evaluates the trigger.
    *
    * MULTI-STREAM sharing: unlike [[dedupIngest]] (single-flight),
    * several scope-distinct IVF streams may feed one index — each
    * epoch is one append, scope-distinct tags never collide, and
    * appends serialize through the commit CAS (spec-pinned). The
    * maintenance paths are sharing-safe too: a repair publishes via
    * branch + fast-forward, so an epoch appended mid-repair makes
    * the publish non-fast-forward and the repair re-reads and
    * retries instead of truncating the append away; racing
    * compactions let the loser yield (the winner already achieved
    * the bounded-files goal state). */
  private[graft] def ivfIngest(vecs: DataFrame, table: String,
      checkpoint: String, maintainFileThreshold: Int = 0,
      driftRepairThreshold: Double = 0.0): StreamingQuery = {
    lazy val scope = scopeOf(vecs.sparkSession, checkpoint)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val sp = batch.sparkSession
        val stat = ivfIngestEpoch(table, batch, epoch, scope,
          wantDriftStat = driftRepairThreshold > 0)
        stat.foreach { mean =>
          val ref = graft.queries.VectorOps.centroidRefStat(sp, table)
          if (ref > 0 && mean < driftRepairThreshold * ref) {
            graft.queries.VectorOps.repairStoredIvf(sp, table)
            ()
          }
        }
        if (maintainFileThreshold > 0 && !batch.isEmpty &&
            graft.lake.LakeMeta.liveFileCount(sp,
              graft.lake.Names.parts(sp, table)) >= maintainFileThreshold)
          try sp.sql(s"CALL ${graft.lake.Names.catalog(sp)}.system." +
            s"rewrite_data_files(table => '${graft.lake.Names.rel(sp, table)}')")
          catch {
            // two sharing streams crossing the threshold on the same
            // cadence race their compactions; the loser's scanned
            // files were already rewritten by the winner. The GOAL
            // state (bounded files) is achieved by whoever won — a
            // lost maintenance race must not kill a production
            // stream, and the count is re-checked next epoch anyway
            case _: java.util.ConcurrentModificationException => ()
          }
        ()
      }
      .start()
  }
}
