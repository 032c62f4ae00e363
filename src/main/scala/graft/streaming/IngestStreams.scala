package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * 100 TB shape: one long-lived query per corpus; micro-batch cost is
  * the measured nightly-refresh cost at the batch's size (GroupScale
  * decade tables — probe floor + batch-proportional stages), so
  * trigger intervals tune freshness against the per-epoch commit
  * floor. State lives in the INDEX TABLES, not the stream — the
  * checkpoint holds only source offsets, so executors stay
  * stateless and the query restarts anywhere.
  */
object IngestStreams {

  /** Start the continuous near-dup ingest over a streaming documents
    * frame (`doc_id`, `text`): each micro-batch probes the stored
    * group index, mines its edges, advances the substrate tables, and
    * publishes labels atomically — the streaming twin of
    * [[graft.queries.TextOps.tDedupGroupsIndexed]]'s refresh stage. */
  private[graft] def dedupIngest(docs: DataFrame, idx: TextOps.GroupIndex,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty)
          TextOps.refreshGroupIndexMined(batch.sparkSession, idx, batch,
            epochTag = Some(s"dedup-ingest-$epoch"))
        ()
      }
      .start()
}
