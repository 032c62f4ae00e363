package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** `SELECT * FROM db.tbl.changes` — the RAW changelog relation
  * (reference: docs/spark-procedures.md:918-921 "To see carry-over
  * rows, query SparkChangelogTable"). Unlike `create_changelog_view`
  * (which removes carry-overs and can pair updates), this surfaces the
  * per-commit file diffs verbatim: rows in files a snapshot added are
  * inserts, rows in files it removed are deletes, and rows newly
  * masked by merge-on-read position deletes are deletes.
  *
  * Fully distributed: ONE scan whose input partitions each cover one
  * (data file × change kind), with the change metadata attached by the
  * reader — no per-snapshot plan-node union, so a long history is just
  * more partitions, not a wider plan. Supports the same
  * `start-snapshot-id` / `end-snapshot-id` read options as the
  * procedure.
  */
class ChangesTable(catalog: LakeCatalog, parent: Identifier, meta: TableMeta)
  extends Table with SupportsRead {

  private val dataSchema = meta.schema
  private val tableSchema = StructType(dataSchema.fields ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_change_ordinal", IntegerType, nullable = false),
    StructField("_commit_snapshot_id", LongType, nullable = false)))

  override def name(): String =
    (catalog.name() +: parent.namespace() :+ parent.name() :+ "changes").mkString(".")
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  // No column pruning: every partition attaches the change metadata
  // and the full row image (a CDC consumer wants whole rows); Spark
  // projects above the scan.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ChangesScan(catalog, meta, ChangesTable.this.name(),
      dataSchema, tableSchema,
      Option(options.get("start-snapshot-id")).map(_.toLong),
      Option(options.get("end-snapshot-id")).map(_.toLong))
}

class ChangesScan(catalog: LakeCatalog, meta: TableMeta, tableName: String,
    dataSchema: StructType, tableSchema: StructType,
    startId: Option[Long], endId: Option[Long])
  extends Scan with Batch {

  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"ChangesScan($tableName)"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = catalog.hadoopConf
    val fs = MetadataLog.fs(meta.location, conf)
    def len(p: String): Long =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen
    val head = meta.currentSnapshotId("main")
    val chain = head.map(meta.ancestorsOf).getOrElse(Nil).reverse // oldest first
    val inRange = chain
      .dropWhile(s => startId.exists(s.snapshotId <= _))
      .takeWhile(s => endId.forall(s.snapshotId <= _))
    inRange.zipWithIndex.flatMap { case (s, ordinal) =>
      val parentSnap = s.parentId.flatMap(meta.snapshotById)
      val parentFiles = parentSnap.map(_.files).getOrElse(Nil)
      val parentPaths = parentFiles.map(_.path).toSet
      val curPaths = s.files.map(_.path).toSet
      val inserts = s.files.filterNot(f => parentPaths(f.path)).map(f =>
        ChangesPartition(f.path, f.schemaEpoch, len(f.path), "insert",
          ordinal, s.snapshotId, Array.empty, keepOnlyPositions = false))
      val deletes = parentFiles.filterNot(f => curPaths(f.path)).map(f =>
        ChangesPartition(f.path, f.schemaEpoch, len(f.path), "delete",
          ordinal, s.snapshotId, Array.empty, keepOnlyPositions = false))
      // merge-on-read commit: rows its NEW masks cover are deletes —
      // emit exactly the masked positions of each (immutable) data file
      val parentDels = parentSnap.map(_.deleteFiles.map(_.path).toSet)
        .getOrElse(Set.empty)
      val newMasks = s.deleteFiles.filterNot(f => parentDels(f.path))
      val masked =
        if (newMasks.isEmpty) Nil
        else {
          val byPath = PosDeletes.deletedMap(newMasks, conf)
          s.files.flatMap { f =>
            byPath.get(PosDeletes.norm(f.path)).map(ps =>
              ChangesPartition(f.path, f.schemaEpoch, len(f.path), "delete",
                ordinal, s.snapshotId, ps, keepOnlyPositions = true))
          }
        }
      inserts ++ deletes ++ masked
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal}
    val spark = SparkSession.active
    val noVec = org.apache.spark.sql.graft.Shims.cloneSessionRowBasedParquet(spark)
    val hconf = noVec.sessionState.newHadoopConf()
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val epochs = meta.schemas.indices
    val perEpoch = epochs.map { e =>
      val epochSchema = meta.schemaAt(e)
      val rename = LakeScans.renameMap(dataSchema, epochSchema)
      val epochRead = StructType(dataSchema.fields.flatMap { f =>
        val en = rename.getOrElse(f.name, f.name)
        epochSchema.fields.find(_.name == en)
      }.distinct)
      val n = epochRead.length
      // project epoch row -> current schema, then the three change
      // metadata columns bound past the data row's width (the reader
      // joins a per-partition metadata row, like PosDeleteScan)
      val exprs: Seq[Expression] = dataSchema.fields.toSeq.map { f =>
        val en = rename.getOrElse(f.name, f.name)
        epochRead.fieldNames.indexOf(en) match {
          case -1 => Literal(null, f.dataType)
          case i =>
            val ef = epochRead(i)
            val ref = BoundReference(i, ef.dataType, nullable = true)
            if (ef.dataType == f.dataType) ref else Cast(ref, f.dataType, Some(tz))
        }
      } ++ Seq(
        BoundReference(n, StringType, nullable = false),
        BoundReference(n + 1, IntegerType, nullable = false),
        BoundReference(n + 2, LongType, nullable = false))
      val fmt = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      val vectorized = fmt.supportBatch(spark, epochRead)
      val readSession =
        if (vectorized) spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        else noVec
      val econf = new org.apache.hadoop.conf.Configuration(hconf)
      val readFunc = fmt.buildReaderWithPartitionValues(readSession, epochSchema,
        StructType(Nil), epochRead, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> vectorized.toString), econf)
      e -> (readFunc, exprs)
    }.toMap
    new ChangesReaderFactory(
      perEpoch.map { case (e, (f, _)) => e -> f },
      perEpoch.map { case (e, (_, x)) => e -> x })
  }
}

case class ChangesPartition(path: String, epoch: Int, fileLen: Long,
    changeType: String, ordinal: Int, snapshotId: Long,
    positionsSorted: Array[Long], keepOnlyPositions: Boolean)
  extends InputPartition

/** Streams a data file in row order, filters by the partition's mask
  * mode (all rows, or only the newly masked positions), and attaches
  * the change metadata columns. */
class ChangesReaderFactory(
    readFuncs: Map[Int, org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[org.apache.spark.sql.catalyst.InternalRow]],
    projections: Map[Int, Seq[org.apache.spark.sql.catalyst.expressions.Expression]])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val part = p.asInstanceOf[ChangesPartition]
    val raw = readFuncs(part.epoch)(
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        org.apache.spark.sql.catalyst.InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(part.path),
        0, part.fileLen))
    val rows: Iterator[org.apache.spark.sql.catalyst.InternalRow] =
      raw.asInstanceOf[Iterator[Any]].flatMap {
        case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(b.rowIterator()).asScala
        case r => Iterator.single(
          r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      }
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(projections(part.epoch).toArray)
    val metaRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    metaRow.update(0, org.apache.spark.unsafe.types.UTF8String
      .fromString(part.changeType))
    metaRow.setInt(1, part.ordinal)
    metaRow.setLong(2, part.snapshotId)
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    val mask = part.positionsSorted
    val keepOnly = part.keepOnlyPositions
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private var di = 0
      private var pos = -1L
      private var cur: org.apache.spark.sql.catalyst.InternalRow = _
      override def next(): Boolean = {
        while (rows.hasNext) {
          val r = rows.next(); pos += 1
          val emit =
            if (!keepOnly) true
            else {
              while (di < mask.length && mask(di) < pos) di += 1
              di < mask.length && mask(di) == pos
            }
          if (emit) {
            cur = proj(joined(r, metaRow))
            return true
          }
        }
        false
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
