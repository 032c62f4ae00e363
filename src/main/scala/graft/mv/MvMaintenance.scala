package graft.mv

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous materialized-view maintenance — the link between the
  * streaming ring and the MV ring: subscribe to the base lake table's
  * CDC stream (`tbl.changes`, offsets = snapshot ids, so micro-batch
  * boundaries are commit-atomic) and run `REFRESH ... INCREMENTAL`
  * once per micro-batch.
  *
  * The micro-batch content is the SIGNAL, not the data: the refresh
  * itself re-reads the table's own history from the MV's pinned
  * last-refresh snapshot ([[MvIncremental]]) — appends merge as
  * partials, row-level deletes/updates/upserts replay as ±1-signed
  * changelog partials, and anything non-incrementalizable falls back
  * to a full recompute, so the MV is exact after every batch. That
  * also makes recovery free: a replayed batch after a crash finds no
  * new snapshots and the refresh no-ops — effectively-once
  * maintenance without any sink-side transaction.
  *
  * Scale: the per-batch work is O(backing + changed rows), the change
  * stream's admission caps (`streaming-max-files/rows-per-batch`)
  * bound each catch-up step, and the refresh runs on the driver
  * between micro-batches — the same place a foreachBatch MERGE would
  * run. A production deployment points `checkpoint` at durable
  * storage; the CDC offsets then survive driver restarts.
  */
object MvMaintenance {

  // refreshes of one MV must not interleave (the swap-staging table
  // is per-MV); concurrent signal streams serialize here
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def continuous(spark: SparkSession, mvName: String, baseTable: String,
      checkpoint: String): StreamingQuery =
    spark.readStream.table(s"$baseTable.changes")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // touch nothing in the batch — offsets alone carry the signal
        val _ = (batch, batchId)
        locks.computeIfAbsent(mvName.toLowerCase, _ => new Object)
          .synchronized {
            spark.sql(s"REFRESH MATERIALIZED VIEW $mvName INCREMENTAL")
          }
        ()
      }
      .start()

  /** Join-MV variant: one signal stream per base (the refresh itself
    * reads EVERY base's history from its pinned floor, so whichever
    * stream fires first folds in all bases' progress and the others'
    * refreshes no-op). The per-MV lock above serializes the
    * micro-batch threads' refreshes; idempotence makes the fan-in
    * safe.  */
  def continuousAll(spark: SparkSession, mvName: String,
      baseTables: Seq[String], checkpoint: String): Seq[StreamingQuery] =
    baseTables.zipWithIndex.map { case (t, i) =>
      continuous(spark, mvName, t, s"$checkpoint/base$i")
    }
}
