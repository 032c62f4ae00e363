package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Incremental micro-batch source over the snapshot log (reference:
  * docs/spark-structured-streaming.md:29-37): offsets are snapshot
  * ids; each batch reads the files ADDED by snapshots in
  * (start, end]. Options: `stream-from-timestamp` (start position),
  * `streaming-skip-overwrite-snapshots` /
  * `streaming-skip-delete-snapshots` (else non-append snapshots in
  * range raise an error, matching the reference's semantics).
  */
class LakeMicroBatchStream(table: LakeTable, readSchema: StructType,
    options: CaseInsensitiveStringMap, checkpointLocation: String)
  extends MicroBatchStream {

  private def spark: SparkSession = SparkSession.active
  private def freshMeta: TableMeta = table.catalog.loadMeta(table.ident)

  private val skipOverwrite =
    options.getBoolean("streaming-skip-overwrite-snapshots", false)
  private val skipDelete =
    options.getBoolean("streaming-skip-delete-snapshots", false)

  override def initialOffset(): Offset = {
    val meta = freshMeta
    Option(options.get("stream-from-timestamp")) match {
      case Some(ts) =>
        // start AFTER the last snapshot committed before the timestamp
        val t = ts.toLong
        val before = meta.snapshots.filter(_.timestampMs < t)
          .map(_.snapshotId).maxOption.getOrElse(0L)
        LakeOffset(before)
      case None => LakeOffset(0L)
    }
  }

  override def latestOffset(): Offset =
    LakeOffset(freshMeta.currentSnapshotId("main").getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    LakeOffset("\\d+".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  @volatile private var lastFactory: PartitionReaderFactory = _

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val meta = freshMeta
    val s = start.asInstanceOf[LakeOffset].snapshotId
    val e = end.asInstanceOf[LakeOffset].snapshotId
    val snaps = meta.snapshots
      .filter(x => x.snapshotId > s && x.snapshotId <= e)
      .sortBy(_.snapshotId)
    val files = snaps.flatMap { snap =>
      snap.operation match {
        case "append" =>
          val parentPaths = snap.parentId.flatMap(meta.snapshotById)
            .map(_.files.map(_.path).toSet).getOrElse(Set.empty)
          snap.files.filterNot(f => parentPaths(f.path))
        // CoW row-level ops (UPDATE/MERGE) commit overwrite-shaped
        // snapshots — the skip option must cover them too, or it can
        // never skip the very snapshots it exists for
        case "overwrite" | "replace" | "update" | "merge" if skipOverwrite => Nil
        case "delete" if skipDelete => Nil
        case "replace" => Nil // compaction adds no new rows
        case other =>
          throw new UnsupportedOperationException(
            s"cannot stream snapshot ${snap.snapshotId} of type '$other'; set " +
              "streaming-skip-overwrite-snapshots/streaming-skip-delete-snapshots to skip")
      }
    }
    val index = new InMemoryFileIndex(spark,
      files.map(f => new org.apache.hadoop.fs.Path(f.path)),
      Map.empty[String, String], Some(table.schema()),
      FileStatusCache.getOrCreate(spark), None, None)
    val scan = ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
      table.schema(), readSchema, StructType(Nil), Array.empty, options,
      None, Nil, Nil, Array.empty)
    val batch = scan.toBatch
    lastFactory = batch.createReaderFactory()
    batch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = lastFactory

  override def toString: String = s"LakeMicroBatchStream(${table.name()})"
}

case class LakeOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}
