package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Write path (SURVEY.md §7.1 "write-path" + §4.3): every batch write
  * stages parquet via Spark's own vectorized writer into a fresh
  * `data/<uuid>/` directory, then commits a snapshot whose file list
  * is derived from the mode:
  *
  *  - append                  -> parent files ++ staged
  *  - truncate / replace      -> staged only
  *  - overwrite(filters)      -> copy-on-write against the predicate
  *  - dynamic overwrite       -> replace only partitions present in
  *                               the staged data
  *
  * Partitioned tables request a clustered distribution on the
  * partition transforms ([[RequiresDistributionAndOrdering]]), so
  * Spark shuffles rows once and files align with partitions — no
  * engine-side row routing. Stats come from parquet footers at commit
  * (no extra scan). WAP (`spark.wap.id` / `spark.wap.branch`,
  * iceberg_it.py:1362-1365) redirects or stages the ref advance.
  */
class LakeWriteBuilder(table: LakeTable, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite
  with SupportsTruncate {

  private var mode: String = "append"
  private var overwriteFilters: Array[Filter] = Array.empty

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[sources.AlwaysTrue])) mode = "truncate"
    else { mode = "overwrite"; overwriteFilters = filters }
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = "dynamic"; this
  }

  override def truncate(): WriteBuilder = { mode = "truncate"; this }

  override def build(): Write = new LakeWrite(table, info, mode, overwriteFilters)
}

class LakeWrite(table: LakeTable, info: LogicalWriteInfo, mode: String,
    overwriteFilters: Array[Filter], operationOverride: Option[String] = None,
    onCommit: Option[TableMeta => Unit] = None,
    replacedFiles: () => Option[Seq[String]] = () => None)
  extends Write with RequiresDistributionAndOrdering {

  override def description(): String = s"LakeWrite(${table.name()}, $mode)"

  override def requiredDistribution(): Distribution =
    if (table.meta.partitionSpec.isEmpty) Distributions.unspecified()
    // per-write override first (the `distribution-mode` WRITE option —
    // Iceberg's spelling): a caller appending a SMALL batch (one
    // streaming epoch) opts out of the cluster-by-transform exchange
    // it would pay on every micro-batch; the fanout writer still
    // splits per tuple and requiredOrdering still sorts tuple-major
    // within each task, so the file count per present tuple is
    // unchanged when the caller coalesces to one task. Table property
    // keeps governing every write that doesn't say otherwise.
    else Option(info.options.get("distribution-mode"))
      .getOrElse(table.meta.properties
        .getOrElse("write.distribution-mode", "hash")) match {
      // reference semantics (docs/spark-writes.md:410-425): `none`
      // requests no shuffle — callers pre-sort/cluster themselves and
      // the fanout writer still splits per tuple (more open files,
      // zero exchange); `range` orders globally on the partition
      // transforms + sort order (range exchange, minimal file count);
      // `hash` (default) clusters on the TRANSFORM values — one
      // shuffle key per partition tuple, resolved through the
      // catalog's FunctionCatalog bindings — so each fanout-writer
      // task receives whole tuples
      case "none" => Distributions.unspecified()
      case "range" => Distributions.ordered(requiredOrdering())
      case _ => Distributions.clustered(table.meta.partitionSpec
        .map(f => Transforms.toTransform(f): org.apache.spark.sql.connector.expressions.Expression)
        .toArray)
    }

  override def requiredOrdering(): Array[SortOrder] = {
    // tuple-major ordering: sort by the partition TRANSFORM values
    // first (bucket values interleave under a source-column sort), so
    // each task's rows are contiguous per tuple and the roll-over
    // fanout writer holds exactly one open file at a time. Only
    // IDENTITY partition sources drop out of the trailing sort-order
    // columns (the transform sort already pins them); a bucket/
    // truncate/date transform does NOT order its source column, so a
    // WRITE ORDERED BY on it must still sort within each tuple — that
    // within-file order is what the sortedBy stamp (and the bucket
    // SPJ sort-free claim) stands on.
    val partSorts = table.meta.partitionSpec.map(f =>
      Expressions.sort(Transforms.toTransform(f), SortDirection.ASCENDING))
    val identityCols = table.meta.partitionSpec
      .filter(_.transform == "identity").map(_.sourceColumn).toSet
    (partSorts ++ table.meta.sortOrder.map(SortSpec.parse)
      .filterNot(e => identityCols.contains(e.column))
      .map(e => Expressions.sort(Expressions.column(e.column),
        if (e.descending) SortDirection.DESCENDING
        else SortDirection.ASCENDING,
        if (e.nullsFirst)
          org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST
        else
          org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_LAST)))
      .toArray
  }

  override def requiredNumPartitions(): Int = 0

  override def toBatch: BatchWrite =
    // batch plans enforce requiredOrdering (Spark injects the sort),
    // so committed files may carry the write-order provenance stamp;
    // streaming epochs construct LakeBatchWrite directly and don't
    new LakeBatchWrite(table, info, mode, overwriteFilters,
      operationOverride, onCommit, replacedFiles,
      sortedWith = table.meta.sortOrder)

  override def toStreaming: StreamingWrite =
    new LakeStreamingWrite(table, info, mode)
}

class LakeBatchWrite(table: LakeTable, info: LogicalWriteInfo, mode: String,
    overwriteFilters: Array[Filter], operationOverride: Option[String],
    onCommit: Option[TableMeta => Unit],
    replacedFiles: () => Option[Seq[String]] = () => None,
    sortedWith: Seq[String] = Nil)
  extends BatchWrite {

  private val stagingDir =
    s"${table.meta.location}/data/${java.util.UUID.randomUUID().toString.take(12)}"

  // Partitioned tables stage through the fanout/roll-over writer so
  // every staged file covers exactly one partition tuple; others use
  // the stock v2 ParquetWrite.
  private val partitioned = table.meta.partitionSpec.nonEmpty

  private lazy val delegate: BatchWrite =
    new ParquetWrite(Seq(stagingDir), "parquet", _ => true,
      TunedWriteInfo.of(info, WriteTuning.options(table.meta))).toBatch

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory = {
    val f =
      if (partitioned) LakeFanoutWrite.factory(SparkSession.active,
        table.meta, info.schema(), stagingDir)
      else delegate.createBatchWriterFactory(pinfo)
    // Row-level ReplaceData queries carry a leading __row_operation
    // column that is not part of the table schema — strip it.
    if (mode == "rewrite") ProjectingWriterFactory(f, info.schema()) else f
  }

  override def useCommitCoordinator(): Boolean =
    if (partitioned) true else delegate.useCommitCoordinator()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (!partitioned) delegate.commit(messages)
    // fanout writes already know every staged file's partition tuple
    // (recorded per roll) — hand them to the commit so it skips the
    // partitionTuples re-derivation job
    val msgTuples: Option[Map[String, Map[String, String]]] =
      if (!partitioned) None
      else {
        val ms = messages.toSeq.filter(_ != null)
        val fan = ms.collect { case m: LakeFanoutCommit => m }
        if (fan.size == ms.size && fan.forall(m => m.files.size == m.tuples.size))
          Some(fan.flatMap(m => m.files.map(LakeWriteUtil.normPath)
            .zip(m.tuples)).toMap)
        else None
      }
    val committed = LakeWriteUtil.commitStaged(table, stagingDir, mode,
      overwriteFilters, info.schema(), operationOverride, replacedFiles(),
      sortedWith, stagedTuples = msgTuples)
    onCommit.foreach(_(committed))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    try if (!partitioned) delegate.abort(messages)
    finally MetadataLog.dropTableDir(stagingDir, table.catalog.hadoopConf)
  }
}

/** [[LogicalWriteInfo]] with table-property-derived parquet tuning
  * options merged in ([[WriteTuning]]): FileWrite copies every write
  * option into the job's hadoop conf, which is how the codec,
  * row-group size and bloom-filter keys reach the stock v2 parquet
  * writer without touching session state. */
private[lake] case class TunedWriteInfo(inner: LogicalWriteInfo,
    extra: Map[String, String]) extends LogicalWriteInfo {
  override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](
      inner.options().asCaseSensitiveMap())
    extra.foreach { case (k, v) => m.put(k, v) }
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(m)
  }
  override def queryId(): String = inner.queryId()
  override def schema(): StructType = inner.schema()
  override def rowIdSchema(): java.util.Optional[StructType] = inner.rowIdSchema()
  override def metadataSchema(): java.util.Optional[StructType] = inner.metadataSchema()
}

private[lake] object TunedWriteInfo {
  def of(inner: LogicalWriteInfo, extra: Map[String, String]): LogicalWriteInfo =
    if (extra.isEmpty) inner else TunedWriteInfo(inner, extra)
}

/** Streaming sink: each epoch commits one snapshot (append; or
  * truncate-and-append for Complete mode). Reference:
  * docs/spark-structured-streaming.md:43-93. */
class LakeStreamingWrite(table: LakeTable, info: LogicalWriteInfo, mode: String)
  extends StreamingWrite {

  private def epochWrite(): LakeBatchWrite =
    new LakeBatchWrite(table, info,
      if (mode == "truncate") "truncate" else "append",
      Array.empty, None, None)

  @volatile private var current: LakeBatchWrite = _

  // the batch OutputCommitCoordinator denies task commits inside
  // micro-batch jobs; staged files are attempt-unique so tasks can
  // commit directly
  override def useCommitCoordinator(): Boolean = false

  override def createStreamingWriterFactory(
      pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    current = epochWrite()
    val f = current.createBatchWriterFactory(pinfo)
    (partitionId: Int, taskId: Long, epochId: Long) =>
      f.createWriter(partitionId, taskId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    current.commit(messages)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    current.abort(messages)
}

/** Drops leading extra columns (e.g. __row_operation from group-based
  * row-level plans) so the parquet writer sees exactly the table
  * schema. The projection is resolved from the first row's arity. */
case class ProjectingWriterFactory(inner: DataWriterFactory,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val d = inner.createWriter(partitionId, taskId)
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      private var checked = false
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        if (!checked) {
          checked = true
          val extra = row.numFields - schema.size
          if (extra > 0)
            proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
              schema, extra until row.numFields)
        }
        if (proj != null) { proj.project(row); d.write(proj) }
        else d.write(row)
      }
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
    }
  }
}

/** Per-commit planning/commit cost accounting — the write-path twin
  * of [[LakeScanMetrics]]. At 100 TB the metadata latency budget is
  * thousands of commits/day × (staged-file listing + partition-tuple
  * job + footer-stats harvest + snapshot derivation/CAS): when an
  * unchanged workload's commits get slower, these counters name the
  * phase instead of leaving a bench delta unattributable (the round-7
  * "commit-path regression" burned a round proving itself to be
  * bench-measurement bleed — with this record one look settles it).
  * Cumulative totals plus a last-commit snapshot; specs read both,
  * and each commit logs one INFO line. */
private[graft] object LakeCommitMetrics {
  final case class CommitTiming(stagedFiles: Int, listMs: Long,
      tuplesMs: Long, statsMs: Long, deriveMs: Long, totalMs: Long)
  private val lastRef =
    new java.util.concurrent.atomic.AtomicReference[CommitTiming]()
  private val commitsCtr = new java.util.concurrent.atomic.AtomicLong
  private val msCtr = new java.util.concurrent.atomic.AtomicLong
  private[lake] def record(t: CommitTiming): Unit = {
    lastRef.set(t)
    commitsCtr.incrementAndGet()
    msCtr.addAndGet(t.totalMs)
  }
  def last: Option[CommitTiming] = Option(lastRef.get())
  def commits: Long = commitsCtr.get()
  def totalMs: Long = msCtr.get()
  private[lake] lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}

object LakeWriteUtil {

  /** Harvest staged files, build the new snapshot per mode, commit.
    * The whole derivation runs inside [[LakeCatalog.commitRetrying]]:
    * a lost CAS reloads the metadata and re-derives the snapshot
    * (including the mode's conflict validation) against the new head,
    * so clean concurrent writers all succeed. */
  def commitStaged(table: LakeTable, stagingDir: String, mode: String,
      overwriteFilters: Array[Filter], writeSchema: StructType,
      operationOverride: Option[String],
      replaced: Option[Seq[String]] = None,
      sortedWith: Seq[String] = Nil,
      stagedTuples: Option[Map[String, Map[String, String]]] = None)
      : TableMeta = {
    val spark = SparkSession.active
    val conf = table.catalog.hadoopConf
    // per-commit phase timings (LakeCommitMetrics): a CAS retry
    // re-derives, so the phase accumulators count what THIS logical
    // commit actually paid across attempts
    val tStart = System.nanoTime()
    var listNs = 0L; var tuplesNs = 0L; var statsNs = 0L
    var stagedCount = 0
    def timed[A](acc: Long => Unit)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body; acc(System.nanoTime() - t0); r
    }
    try table.catalog.commitRetrying(table.ident) { fresh =>

    // write-side schema evolution (mergeSchema / accept-any-schema,
    // iceberg_it.py:1640-1681): extra top-level fields are appended
    val cur = fresh.schema
    // appended columns are forced nullable: rows written before the
    // evolution necessarily read NULL for them
    val extra = writeSchema.fields.filterNot(f =>
      cur.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      .map(_.copy(nullable = true))
    val evolved =
      if (extra.nonEmpty) {
        val ns = TableMeta.withFieldIds(StructType(cur.fields ++ extra),
          fresh.highestFieldId)
        fresh.copy(schemas = fresh.schemas :+ ns.json,
          currentSchemaEpoch = fresh.schemas.size)
      } else fresh

    val epoch = evolved.currentSchemaEpoch
    val schema = evolved.schema

    val stagedPaths = timed(listNs += _)(listParquet(stagingDir, conf))
    stagedCount = stagedPaths.size
    // message-carried tuples (fanout writes) cover the whole staged set
    // in the common case — the partitionTuples job is the fallback for
    // writes that didn't carry them (non-fanout stages, older paths) or
    // any listed file the messages somehow missed
    val specTuples = timed(tuplesNs += _)(stagedTuples match {
      // trust write-time tuples only while the commit-time spec still
      // matches the field names they were evaluated under (a concurrent
      // REPLACE PARTITION FIELD between write and CAS retry re-derives)
      case Some(mt) if stagedPaths.forall(p => mt.contains(normPath(p))) &&
          mt.values.forall(_.keySet ==
            evolved.partitionSpec.map(_.name).toSet) =>
        stagedPaths.map { p =>
          val np = normPath(p); np -> Set(mt(np))
        }.toMap
      case _ => partitionTuples(spark, stagedPaths, evolved)
    })
    val harvested = timed(statsNs += _)(
      FileStats.fromFooters(stagedPaths, conf, schema, epoch,
        p => {
          val tuples = specTuples.getOrElse(normPath(p), Set.empty)
          if (tuples.size == 1) tuples.head else Map.empty
        }))
    // write-order provenance: rows arrived sorted tuple-major then by
    // the sort-order columns (requiredOrdering, batch plans only), so
    // a single-tuple file — or any file of an unpartitioned table —
    // is internally sorted by those columns. Multi-tuple files (empty
    // partitionValues on a partitioned table) make no claim.
    val staged =
      if (sortedWith.isEmpty) harvested
      else harvested.map { f =>
        if (evolved.partitionSpec.isEmpty || f.partitionValues.nonEmpty)
          f.copy(sortedBy = sortedWith)
        else f
      }

    // WAP / branch routing
    val sconf = spark.conf
    val wapEnabled = evolved.properties.get("write.wap.enabled").contains("true")
    val wapId = sconf.getOption("spark.wap.id").filter(_ => wapEnabled)
    val wapBranch = sconf.getOption("spark.wap.branch")
    val targetRef = wapBranch.getOrElse(table.ref)
    val metaWithRef =
      if (!evolved.refs.contains(targetRef) && evolved.refs.contains("main"))
        evolved.copy(refs = evolved.refs +
          (targetRef -> RefMeta("branch", evolved.refs("main").snapshotId)))
      else evolved

    val parent = metaWithRef.currentSnapshot(targetRef)
    val parentFiles = parent.map(_.files).getOrElse(Nil)
    val parentEqs = parent.map(_.eqDeleteFiles).getOrElse(Nil)

    // Data sequence number: every file written by THIS commit carries
    // the new snapshot's id, so the commit's own equality-delete file
    // (seq = same id) never applies to it — and does apply to all
    // older files.
    // ids are 1-based sequential per table BY CONTRACT (spec-pinned in
    // LakeSuite): centroidSourceSnap's pre-tag fallback keys on the
    // build being id 1 — change the scheme and that spec names you
    val nextId = metaWithRef.lastSnapshotId + 1
    val stamped = staged.map(_.copy(seq = nextId))

    // Upsert (write.upsert.enabled + identifier fields): an append
    // additionally writes one equality-delete file of the batch's
    // distinct keys — delete-then-insert by key with zero reads of
    // existing data (the Flink-sink CDC pattern on Iceberg v2).
    val upsert = mode == "append" && EqDeletes.upsertEnabled(evolved)
    val newEqs =
      // an empty parent has nothing the keys could delete — skip the
      // delete file (a bootstrap load stays a plain append)
      if (!upsert || stagedPaths.isEmpty || parentFiles.isEmpty) Nil
      else {
        val keys = EqDeletes.identifierFields(evolved)
        if (keys.isEmpty) throw new IllegalArgumentException(
          s"${table.name()}: ${EqDeletes.UpsertKey} requires identifier " +
            "fields (ALTER TABLE ... SET IDENTIFIER FIELDS ...)")
        EqDeletes.writeForStaged(spark, evolved, stagedPaths, nextId, conf)
      }

    val (files, op) = mode match {
      case "append" =>
        (parentFiles ++ stamped, if (newEqs.nonEmpty) "upsert" else "append")
      case "truncate" => (stamped, "overwrite")
      case "rewrite" =>
        // group-based row-level op: replace exactly the scanned files
        // (Spark pushed the command condition into the scan, so the
        // unscanned files are untouched groups); a staged CTAS/RTAS
        // has no scan and replaces everything.
        val kept = replaced match {
          case Some(paths) =>
            // serializable-isolation check: the scanned groups must
            // still be live, or a concurrent rewrite already replaced
            // them and dropping "their" rows would duplicate data
            val parentPaths = parentFiles.map(_.path).toSet
            val gone = paths.filterNot(parentPaths)
            if (gone.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"${table.name()}: files scanned by this row-level " +
                  s"operation were concurrently rewritten " +
                  s"(${gone.take(3).mkString(", ")}" +
                  s"${if (gone.size > 3) ", …" else ""}); retry")
            val dropped = paths.toSet
            parentFiles.filterNot(f => dropped(f.path))
          case None => Nil
        }
        (kept ++ stamped, operationOverride.getOrElse("replace"))
      case "overwrite" =>
        // merge-on-read masks must be subtracted while rewriting
        // partially-matching files: the rewritten copies get fresh
        // paths no mask matches, so a raw copy would resurrect rows
        val masks = parentDeleteMap(parent, conf)
        val kept = copyOnWrite(spark, table, metaWithRef, parentFiles,
          overwriteFilters, conf, applyDeletes = masks,
          applyEqs = parentEqs, newSeq = nextId)
        (kept ++ stamped, "overwrite")
      case "dynamic" =>
        val stagedTuples = specTuples.values.flatten.toSet
        val masks = parentDeleteMap(parent, conf)
        val kept =
          if (metaWithRef.partitionSpec.isEmpty) Nil
          else dynamicKeep(spark, metaWithRef, parentFiles, stagedTuples, conf,
            applyDeletes = masks, applyEqs = parentEqs, newSeq = nextId)
        (kept ++ stamped, "overwrite")
    }

    val snap = SnapshotMeta(
      snapshotId = nextId,
      parentId = parent.map(_.snapshotId),
      timestampMs = System.currentTimeMillis(),
      operation = operationOverride.getOrElse(op),
      summary = Map(
        "spark.app.id" -> spark.sparkContext.applicationId,
        "added-data-files" -> staged.size.toString,
        "added-records" -> staged.map(_.rowCount).sum.toString,
        "total-data-files" -> files.size.toString,
        "total-records" -> files.map(_.rowCount).sum.toString
      ) ++ (if (newEqs.isEmpty) Map.empty
            else Map("added-equality-delete-files" -> newEqs.size.toString,
              "added-equality-deletes" -> newEqs.map(_.rowCount).sum.toString))
        ++ wapId.map("wap.id" -> _),
      files = files,
      schemaEpoch = epoch,
      // position deletes survive every mode except full truncation:
      // kept data files keep their masks; masks for files that were
      // dropped or rewritten simply never match again
      deleteFiles =
        if (mode == "truncate") Nil
        else parent.map(_.deleteFiles).getOrElse(Nil),
      // equality deletes: same carry-forward, plus this commit's own;
      // retire() drops any delete no remaining file is old enough for
      eqDeleteFiles =
        if (mode == "truncate") Nil
        else EqDeletes.retire(parentEqs ++ newEqs, files))

    // WAP id staging: snapshot recorded, no ref advance until
    // publish_changes (docs/spark-procedures.md:186)
    val advance = if (wapId.isDefined) None else Some(targetRef)
    metaWithRef.withSnapshot(snap, advance)
    } finally {
      def ms(ns: Long) = ns / 1000000L
      val total = ms(System.nanoTime() - tStart)
      val t = LakeCommitMetrics.CommitTiming(stagedCount, ms(listNs),
        ms(tuplesNs), ms(statsNs),
        total - ms(listNs) - ms(tuplesNs) - ms(statsNs), total)
      LakeCommitMetrics.record(t)
      LakeCommitMetrics.log.info(s"commit ${table.name()}: staged=${t.stagedFiles} " +
        s"list=${t.listMs}ms tuples=${t.tuplesMs}ms stats=${t.statsMs}ms " +
        s"derive+cas=${t.deriveMs}ms total=${t.totalMs}ms")
    }
  }

  def listParquet(dir: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val fs = MetadataLog.fs(dir, conf)
    val p = new Path(dir)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet") &&
          !f.getPath.toString.contains("/_temporary/")) buf += f.getPath.toString
    }
    buf.result()
  }

  private def listParquetLocal(root: Path,
      f: org.apache.hadoop.fs.FileSystem): Seq[(String, Long)] = {
    val it = f.listFiles(root, true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.toString.contains("/_temporary/"))
        buf += ((s.getPath.toString, s.getModificationTime))
    }
    buf.result()
  }

  /** Recursive parquet listing with modification times, fanning the
    * walk out to executors when the tree is wide. remove_orphan_files
    * on a 100 TB table lists millions of files across thousands of
    * per-write `data/<uuid>/` subdirectories — a serial driver walk
    * (plus one getFileStatus RPC per candidate for the age guard) is
    * an hours-long stall; here each executor walks a slice of subdirs
    * and the age comes back with the listing. */
  def listParquetWithAge(spark: SparkSession, dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val fs = MetadataLog.fs(dir, conf)
    val p = new Path(dir)
    if (!fs.exists(p)) return Nil
    val top = fs.listStatus(p).toSeq
    val (dirs, files) = top.partition(_.isDirectory)
    val topHits = files
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getModificationTime))
    val subHits =
      if (dirs.size <= 16) dirs.flatMap(d => listParquetLocal(d.getPath, fs))
      else {
        val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
        spark.sparkContext
          .parallelize(dirs.map(_.getPath.toString), math.min(64, dirs.size))
          .flatMap { d =>
            val path = new Path(d)
            listParquetLocal(path, path.getFileSystem(sconf.value))
          }.collect().toSeq
      }
    topHits ++ subHits
  }

  /** Partition-transform tuples per staged file (one small job over
    * just the staged files, reading only the source columns). */
  def partitionTuples(spark: SparkSession, paths: Seq[String],
      meta: TableMeta): Map[String, Set[Map[String, String]]] = {
    if (meta.partitionSpec.isEmpty || paths.isEmpty) return Map.empty
    val schema = meta.schema
    val cols = meta.partitionSpec.map(f =>
      Transforms.eval(f, schema, Transforms.zoneOf(meta)).as(f.name))
    spark.read.parquet(paths: _*)
      .select(input_file_name().as("__file") +: cols: _*)
      .distinct().collect()
      .groupBy(r => normPath(r.getString(0)))
      .map { case (file, rows) =>
        file -> rows.map(r => meta.partitionSpec.zipWithIndex.map {
          case (f, i) => f.name -> String.valueOf(r.get(i + 1))
        }.toMap).toSet
      }
  }

  /** input_file_name() returns file:///x while Hadoop listings give
    * file:/x — compare on the bare URI path. */
  def normPath(p: String): String = new Path(p).toUri.getPath

  /** Column-level twin of [[normPath]] for executor-side path set
    * comparisons (same idiom the MoR mask join uses). */
  def normPathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[a-zA-Z0-9.+-]+:/+", "/")

  /** DataFrame variant of [[listParquetWithAge]]: the listing stays on
    * the executors as (`path` raw, `norm`, `mtime`) instead of
    * collecting every on-disk file to the driver — remove_orphan_files
    * anti-joins it against the referenced set, so the driver only ever
    * materializes actual orphans. */
  def listParquetWithAgeDf(spark: SparkSession, dir: String,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val fs = MetadataLog.fs(dir, conf)
    val p = new Path(dir)
    val empty = spark.emptyDataset[(String, Long)].toDF("path", "mtime")
    val raw =
      if (!fs.exists(p)) empty
      else {
        val top = fs.listStatus(p).toSeq
        val (dirs, files) = top.partition(_.isDirectory)
        val topHits = files
          .filter(s => s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath.toString, s.getModificationTime))
        val topDf = spark.createDataset(topHits).toDF("path", "mtime")
        if (dirs.isEmpty) topDf
        else {
          val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
          val sub = spark.sparkContext
            .parallelize(dirs.map(_.getPath.toString),
              math.min(64, dirs.size))
            .flatMap { d =>
              val path = new Path(d)
              listParquetLocal(path, path.getFileSystem(sconf.value))
            }
          spark.createDataset(sub).toDF("path", "mtime").unionAll(topDf)
        }
      }
    raw.withColumn("norm", normPathCol(col("path")))
  }

  /** Distributed delete of a one-column (`path`) DataFrame without
    * driver materialization; returns the number of files removed. */
  def bulkDeleteDf(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    val n = spark.sparkContext.longAccumulator("bulkDeleteDf")
    df.select("path").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val path = new Path(r.getString(0))
          if (scala.util.Try(
              path.getFileSystem(sconf.value).delete(path, false))
            .getOrElse(false)) n.add(1L)
        }
    }
    n.value
  }

  /** Best-effort delete of many paths. Small batches stay on the
    * driver (no job overhead); large batches ship to executors — at
    * 100 TB file counts a maintenance pass deletes millions of files,
    * and a serial driver loop against an object store is an hours-long
    * stall. Failures are swallowed per path (maintenance is re-runnable
    * and remove_orphan_files sweeps stragglers). */
  def bulkDelete(spark: SparkSession, paths: Seq[String],
      conf: org.apache.hadoop.conf.Configuration,
      recursive: Boolean = false): Unit =
    if (paths.size <= 128)
      paths.foreach(p => scala.util.Try(
        MetadataLog.fs(p, conf).delete(new Path(p), recursive)))
    else {
      val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
      spark.sparkContext
        .parallelize(paths, math.min(64, 1 + paths.size / 1024))
        .foreachPartition { it =>
          it.foreach { p =>
            val path = new Path(p)
            scala.util.Try(path.getFileSystem(sconf.value).delete(path, recursive))
          }
        }
    }

  /** Copy-on-write for `overwrite(filters)` / DELETE WHERE: fully
    * matching files are dropped, partially matching files rewritten
    * with the negated predicate, untouched files kept. */
  def copyOnWrite(spark: SparkSession, table: LakeTable, meta: TableMeta,
      parentFiles: Seq[DataFileMeta], filters: Array[Filter],
      conf: org.apache.hadoop.conf.Configuration,
      applyDeletes: Map[String, Array[Long]] = Map.empty,
      applyEqs: Seq[EqDeleteMeta] = Nil,
      newSeq: Long = 0L): Seq[DataFileMeta] = {
    val schema = meta.schema
    val (touched, untouched) = parentFiles.partition(f =>
      filters.forall(FileStats.mayMatch(f, _, schema)))
    val (full, partial) = touched.partition(fullyMatches(_, filters, schema))
    val _ = full // dropped entirely
    val rewritten =
      if (partial.isEmpty) Nil
      else {
        val cond = filters.flatMap(filterToColumn).reduceOption(_ && _)
          .getOrElse(lit(true))
        rewriteFiles(spark, meta, partial,
          df => df.filter(!coalesce(cond, lit(false))), conf,
          applyDeletes = applyDeletes, applyEqs = applyEqs, newSeq = newSeq)
      }
    untouched ++ rewritten
  }

  /** Merge-on-read masks of a parent snapshot, hydrated for rewrite
    * jobs (empty for copy-on-write tables — the common case). */
  def parentDeleteMap(parent: Option[SnapshotMeta],
      conf: org.apache.hadoop.conf.Configuration): Map[String, Array[Long]] =
    parent.map(_.deleteFiles).getOrElse(Nil) match {
      case Nil => Map.empty
      case dels => PosDeletes.deletedMap(dels, conf)
    }

  /** Rewrite a set of files (grouped by schema epoch, projected to
    * current names) through `xform`, returning new file metas. */
  def rewriteFiles(spark: SparkSession, meta: TableMeta,
      files: Seq[DataFileMeta], xform: DataFrame => DataFrame,
      conf: org.apache.hadoop.conf.Configuration,
      applyDeletes: Map[String, Array[Long]] = Map.empty,
      applyEqs: Seq[EqDeleteMeta] = Nil,
      newSeq: Long = 0L,
      sortedWith: Seq[String] = Nil,
      knownTuple: Option[Map[String, String]] = None): Seq[DataFileMeta] = {
    val outDir = s"${meta.location}/data/${java.util.UUID.randomUUID().toString.take(12)}"
    val schema = meta.schema
    // files with different data sequence numbers are subject to
    // DIFFERENT equality-delete subsets — group so each rewrite job
    // applies exactly the deletes its inputs are old enough for
    for {
      (group, eqs) <- EqDeletes.groupByApplicable(meta, files, applyEqs)
      (epoch, fs) <- group.groupBy(_.schemaEpoch)
    } {
      val epochSchema = meta.schemaAt(epoch)
      val raw = spark.read.schema(epochSchema).parquet(fs.map(_.path): _*)
      // subtract merge-on-read position masks (anti-join on the file
      // ordinal) BEFORE projecting away the metadata columns
      val masked =
        if (applyDeletes.isEmpty) raw
        else {
          val pairs = fs.flatMap(f =>
            applyDeletes.getOrElse(PosDeletes.norm(f.path), Array.empty[Long])
              .map(p => (PosDeletes.norm(f.path), p)))
          if (pairs.isEmpty) raw
          else {
            val delDf = spark.createDataFrame(pairs).toDF("__fp", "__pos")
            raw
              .withColumn("__fp", regexp_replace(
                col("_metadata.file_path"), "^[a-zA-Z0-9.+-]+:/+", "/"))
              .withColumn("__pos", col("_metadata.row_index"))
              .join(broadcast(delDf), Seq("__fp", "__pos"), "left_anti")
          }
        }
      val df = masked.select(epochProjection(meta, epoch, epochSchema): _*)
      // equality masks too — the rewritten copies take the NEW commit's
      // sequence number, which moves them past every existing delete,
      // so the deletes must be applied (not carried) here
      val eqMasked =
        if (eqs.isEmpty) df else EqDeletes.antiJoin(spark, meta, df, eqs)
      xform(eqMasked).write.mode("append").parquet(outDir)
    }
    val epoch = meta.currentSchemaEpoch
    val outPaths = listParquet(outDir, conf)
    // knownTuple: a per-partition-group rewrite (compaction, MoR mask
    // fold) transforms rows WITHIN one partition tuple, so the caller
    // already knows every output file's tuple — re-deriving it with a
    // partitionTuples job (scan + distinct + collect PER GROUP) was
    // one of the two Spark jobs each compaction group paid at any
    // scale (guide §2.4: remove shuffles/jobs outright)
    val tupleOf: String => Map[String, String] = knownTuple match {
      case Some(t) => _ => t
      case None =>
        val tuples = partitionTuples(spark, outPaths, meta)
        p => {
          val t = tuples.getOrElse(normPath(p), Set.empty)
          if (t.size == 1) t.head else Map.empty
        }
    }
    // sortedWith: only sort-strategy compaction passes it (its xform
    // ends in sortWithinPartitions over exactly these entries, one
    // output file per df partition) — binpack/zorder/delete-applying
    // rewrites stamp nothing
    FileStats.fromFooters(outPaths, conf, schema, epoch, tupleOf)
      .map(_.copy(seq = newSeq, sortedBy = sortedWith))
  }

  /** Rewrite MANY partition groups in ONE Spark job — the fused twin
    * of per-group [[rewriteFiles]] loops. A compaction over a
    * bucket(32) table previously scheduled 32 tiny jobs (one read +
    * write per partition group, each a fixed ~100-300 ms of
    * scheduling + commit-path latency) — and a first fused cut as a
    * 32-branch union plan just moved the cost into single-threaded
    * Catalyst planning (~2-3 s of job-free driver time, measured).
    * This shape plans ONE scan over every group's files, recovers
    * each row's group from its source file path (a literal map over
    * `_metadata.file_path` — driver metadata, no join), hash-clusters
    * rows by group, and fans the single write out on the group tag,
    * so each group lands as one file under its own directory. The
    * group-clustering shuffle moves the rewrite bytes once, which is
    * why callers gate fusion by TOTAL BYTES
    * (`spark.graft.lake.fusedRewriteMaxBytes`): small-file
    * maintenance — the regime where fixed job overhead dominates —
    * fuses; bulk compactions keep the shuffle-free per-group path.
    *
    * Callers must pre-restrict groups to the uniform case: a known
    * partition tuple per group, one schema epoch across all fused
    * files, no equality deletes (those sub-group the rewrite by
    * applicable delete subsets), and a one-output-file target per
    * group (binpack nOut == 1, or the mask-fold identity whose file
    * split is not contractual). Row content per group is identical
    * to the per-group path: same scan, same mask anti-join. */
  def rewriteFilesFused(spark: SparkSession, meta: TableMeta,
      groups: Seq[(Map[String, String], Seq[DataFileMeta])],
      conf: org.apache.hadoop.conf.Configuration,
      applyDeletes: Map[String, Array[Long]] = Map.empty,
      newSeq: Long = 0L): Seq[DataFileMeta] = {
    if (groups.isEmpty) return Nil
    val outDir = s"${meta.location}/data/${java.util.UUID.randomUUID().toString.take(12)}"
    val tk = "__graft_rewrite_group"
    val files = groups.flatMap(_._2)
    val epoch = files.head.schemaEpoch
    val epochSchema = meta.schemaAt(epoch)
    val pathTk: Map[String, String] = groups.zipWithIndex.flatMap {
      case ((_, fs), i) => fs.map(f => PosDeletes.norm(f.path) -> i.toString)
    }.toMap
    // one shared mask frame: the anti-join key is (file, pos), so
    // pairs from other files in the same scan are inert
    val allPairs =
      if (applyDeletes.isEmpty) Nil
      else files.flatMap(f =>
        applyDeletes.getOrElse(PosDeletes.norm(f.path), Array.empty[Long])
          .map(p => (PosDeletes.norm(f.path), p)))
    val raw = spark.read.schema(epochSchema).parquet(files.map(_.path): _*)
      .withColumn("__fp", regexp_replace(
        col("_metadata.file_path"), "^[a-zA-Z0-9.+-]+:/+", "/"))
    val masked =
      if (allPairs.isEmpty) raw
      else raw.withColumn("__pos", col("_metadata.row_index"))
        .join(broadcast(spark.createDataFrame(allPairs).toDF("__fp", "__pos")),
          Seq("__fp", "__pos"), "left_anti")
    val tagged = masked.select(
      epochProjection(meta, epoch, epochSchema) :+
        element_at(typedLit(pathTk), col("__fp")).as(tk): _*)
    // explicit partition count (REPARTITION_BY_NUM): a bare
    // repartition(col) is AQE-coalescible, and at maintenance scale
    // AQE folded the whole shuffle into ONE partition — a single task
    // then wrote every group's file serially (measured ~1.7 s for 32
    // groups vs ~0.3 s parallel). One partition per group keeps the
    // write as wide as the group count.
    tagged.repartition(math.max(1, groups.size), col(tk))
      .write.mode("append").partitionBy(tk).parquet(outDir)
    val epochNow = meta.currentSchemaEpoch
    locally {
      // ONE recursive listing of the output root (not one per group
      // directory), and the per-file footer reads fan out on a driver
      // pool — with 32 groups the serial loop was ~0.5 s of dead
      // driver time after a ~0.3 s write job
      val seg = s"/$tk="
      val byGroup: Map[String, Seq[String]] = listParquet(outDir, conf)
        .groupBy { p =>
          val i = p.indexOf(seg) + seg.length
          p.substring(i, p.indexOf('/', i))
        }
      val tupleOf = groups.zipWithIndex
        .map { case ((tuple, _), i) => i.toString -> tuple }.toMap
      // input-group order (numeric on the tag) keeps the committed
      // file list deterministic, like the per-group path's
      // concatenation order
      graft.Par.all(8, byGroup.toSeq.sortBy(_._1.toInt)
        .map { case (g, paths) => () =>
          FileStats.fromFooters(paths.sorted, conf, meta.schema, epochNow,
            _ => tupleOf(g)).map(_.copy(seq = newSeq))
        }).flatten
    }
  }

  /** Dynamic partition overwrite: drop/rewrite parent files that
    * overlap the staged partition tuples. */
  private def dynamicKeep(spark: SparkSession, meta: TableMeta,
      parentFiles: Seq[DataFileMeta], stagedTuples: Set[Map[String, String]],
      conf: org.apache.hadoop.conf.Configuration,
      applyDeletes: Map[String, Array[Long]] = Map.empty,
      applyEqs: Seq[EqDeleteMeta] = Nil,
      newSeq: Long = 0L): Seq[DataFileMeta] = {
    if (stagedTuples.isEmpty) return parentFiles
    val known = parentFiles.filter(_.partitionValues.nonEmpty)
    val unknown = parentFiles.filter(_.partitionValues.isEmpty)
    val keptKnown = known.filterNot(f => stagedTuples.contains(f.partitionValues))
    // files without a recorded single partition tuple: resolve by job
    val resolved =
      if (unknown.isEmpty) Map.empty[String, Set[Map[String, String]]]
      else partitionTuples(spark, unknown.map(_.path), meta)
    val keptUnknown = unknown.filter { f =>
      resolved.getOrElse(normPath(f.path), Set.empty)
        .forall(t => !stagedTuples.contains(t))
    }
    val partials = unknown.filter { f =>
      val tuples = resolved.getOrElse(normPath(f.path), Set.empty)
      tuples.exists(stagedTuples.contains) && !tuples.forall(stagedTuples.contains)
    }
    val rewritten =
      if (partials.isEmpty) Nil
      else {
        val schema = meta.schema
        val sep = "\u0001"
        val key = concat_ws(sep,
          meta.partitionSpec.map(f =>
            Transforms.eval(f, schema, Transforms.zoneOf(meta))): _*)
        val stagedKeys = stagedTuples.map(t =>
          meta.partitionSpec.map(f => t(f.name)).mkString(sep)).toSeq
        rewriteFiles(spark, meta, partials,
          df => df.filter(!key.isin(stagedKeys: _*)), conf,
          applyDeletes = applyDeletes, applyEqs = applyEqs, newSeq = newSeq)
      }
    keptKnown ++ keptUnknown ++ rewritten
  }

  /** Commit a delta (merge-on-read) row-level operation: staged data
    * files append, staged position-delete files extend the mask set;
    * nothing else in the snapshot changes. */
  def commitDelta(table: LakeTable, stagingDir: String, deleteDir: String,
      operation: String, scannedFiles: Option[Seq[String]] = None,
      scanFilters: Array[Filter] = Array.empty,
      stagedTuples: Option[Map[String, Map[String, String]]] = None): Unit = {
    val spark = SparkSession.active
    val conf = table.catalog.hadoopConf

    val dataPaths = listParquet(stagingDir, conf)
    // delete-file stats are schema-independent (fixed DeleteSchema) —
    // harvest once, outside the retry loop
    val dels = listParquet(deleteDir, conf)
      .map(p => FileStats.fromFooter(p, conf, PosDeletes.DeleteSchema, 0, Map.empty))
      .filter(_.rowCount > 0)
    if (dataPaths.isEmpty && dels.isEmpty) return // no rows affected

    // The routing + serializable validation + snapshot build all run
    // inside the retry loop: a lost CAS re-validates the scan set
    // against the NEW head and only a detected conflict aborts.
    table.catalog.commitRetrying(table.ident) { fresh =>
    val epoch = fresh.currentSchemaEpoch
    val schema = fresh.schema
    // message-carried tuples skip the partitionTuples job (see
    // commitStaged); fall back when they don't cover the listing
    val tuples = stagedTuples match {
      // same spec-drift guard as commitStaged
      case Some(mt) if dataPaths.forall(p => mt.contains(normPath(p))) &&
          mt.values.forall(_.keySet ==
            fresh.partitionSpec.map(_.name).toSet) =>
        dataPaths.map { p =>
          val np = normPath(p); np -> Set(mt(np))
        }.toMap
      case _ => partitionTuples(spark, dataPaths, fresh)
    }
    val staged = FileStats.fromFooters(dataPaths, conf, schema, epoch,
      p => {
        val t = tuples.getOrElse(normPath(p), Set.empty)
        if (t.size == 1) t.head else Map.empty
      })

    // WAP / branch routing, mirroring commitStaged
    val sconf = spark.conf
    val wapEnabled = fresh.properties.get("write.wap.enabled").contains("true")
    val wapId = sconf.getOption("spark.wap.id").filter(_ => wapEnabled)
    val wapBranch = sconf.getOption("spark.wap.branch")
    val targetRef = wapBranch.getOrElse(table.ref)
    val metaWithRef =
      if (!fresh.refs.contains(targetRef) && fresh.refs.contains("main"))
        fresh.copy(refs = fresh.refs +
          (targetRef -> RefMeta("branch", fresh.refs("main").snapshotId)))
      else fresh
    val parent = metaWithRef.currentSnapshot(targetRef)

    // Serializable-isolation, part 1 — write-skew on the READ set: the
    // operation scanned the table at the snapshot pinned in
    // `table.meta` (stale by design); if a concurrent commit has since
    // added NEW delete files masking rows in — or removed — files this
    // operation read, our join matched rows that no longer exist and
    // would re-insert them. The mask-liveness check below cannot see
    // this (those files are still live; only their mask set grew), so
    // compare the scan snapshot's file/mask sets against the commit
    // parent's and fail on any overlap with the files actually scanned
    // (Iceberg's validateNoNewDeleteFiles / validateDataFilesExist).
    // Only same-ref commits validate: a spark.wap.branch redirect scans
    // one ref and commits to another, so "what changed since the scan"
    // has no single lineage to compare against (and a divergent branch
    // would fail every retry — the scan re-reads the ORIGINAL ref).
    val scanId = table.readSnapshotId
    val head = parent.map(_.snapshotId)
    if (head != scanId && parent.nonEmpty && targetRef == table.ref) {
      val scanSnap = scanId.flatMap(metaWithRef.snapshotById)
      if (scanId.nonEmpty && scanSnap.isEmpty)
        throw new java.util.ConcurrentModificationException(
          s"${table.name()}: snapshot ${scanId.get} read by this " +
            s"$operation is no longer in the table metadata " +
            "(expired or rolled back); retry the operation")
      val scanned = scannedFiles.map(_.map(PosDeletes.norm).toSet)
        .getOrElse(scanSnap.map(_.files.map(f => PosDeletes.norm(f.path)).toSet)
          .getOrElse(Set.empty))
      val p = parent.get
      val scanDelPaths =
        scanSnap.map(_.deleteFiles.map(_.path).toSet).getOrElse(Set.empty)
      val newDels = p.deleteFiles.filterNot(d => scanDelPaths.contains(d.path))
      val newlyMasked =
        if (newDels.isEmpty) Set.empty[String]
        else PosDeletes.deletedMap(newDels, conf).keySet.intersect(scanned)
      // Equality deletes committed since the scan (a concurrent upsert)
      // are write skew exactly like new position masks: rows this
      // operation matched may no longer exist. Metadata-only check —
      // a new delete conflicts iff it may apply to a scanned file.
      val scanEqPaths =
        scanSnap.map(_.eqDeleteFiles.map(_.path).toSet).getOrElse(Set.empty)
      val scannedMetas = scanSnap.map(_.files.filter(f =>
        scanned(PosDeletes.norm(f.path)))).getOrElse(Nil)
      val newlyEqMasked = p.eqDeleteFiles
        .filterNot(e => scanEqPaths.contains(e.path))
        .flatMap(e => scannedMetas.find(EqDeletes.mayApply(metaWithRef, _, e))
          .map(f => PosDeletes.norm(f.path)))
        .toSet
      val scanFilePaths =
        scanSnap.map(_.files.map(f => PosDeletes.norm(f.path)).toSet)
          .getOrElse(Set.empty)
      val headFilePaths = p.files.map(f => PosDeletes.norm(f.path)).toSet
      val removedRead = scanFilePaths.diff(headFilePaths).intersect(scanned)
      // Phantoms: a concurrent append between scan and commit adds rows
      // this operation never saw — a MERGE would duplicate its NOT
      // MATCHED inserts, an UPDATE/DELETE would silently miss matching
      // rows. Candidates come from walking the snapshot lineage head →
      // scan snapshot and collecting only files INTRODUCED by
      // row-adding commits (Iceberg's validateAddedDataFiles):
      // "replace" (compaction/manifest rewrite) and "delete" snapshots
      // are row-non-increasing — their outputs carry only rows that
      // already existed at their parent, so counting them would abort
      // unrelated operations under steady background compaction (a
      // retry livelock). Candidates are then pruned with the scan's
      // pushed condition using the same stats pruning the scan used: a
      // file the scan would have skipped cannot conflict. An unpushable
      // condition (typical MERGE ON) prunes nothing, so any concurrent
      // append conflicts — that IS serializable semantics. A broken
      // lineage (rollback / set_current_snapshot crossed the chain)
      // falls back to every head file absent from the scan snapshot —
      // conservative, never under-reports.
      // isRowPreservingReplace, not the bare op name (matching the
      // Changelog/ChangesScan/streaming call sites): a legacy RTAS
      // snapshot from an older-build writer is labeled "replace" but
      // stamped added-records — it DID add rows, and skipping it here
      // would let a MERGE duplicate its NOT MATCHED inserts.
      def rowPreserving(s: SnapshotMeta): Boolean =
        s.isRowPreservingReplace || s.operation == "delete"
      lazy val phantomCandidates: Seq[DataFileMeta] = {
        val added = Seq.newBuilder[DataFileMeta]
        var cur: Option[SnapshotMeta] = Some(p)
        var broken = false
        while (cur.nonEmpty && !scanId.contains(cur.get.snapshotId) && !broken) {
          val s = cur.get
          val parentSnap = s.parentId.flatMap(metaWithRef.snapshotById)
          if (!rowPreserving(s)) {
            val pp = parentSnap.map(_.files.map(f => PosDeletes.norm(f.path)).toSet)
              .getOrElse(Set.empty)
            added ++= s.files.filterNot(f => pp(PosDeletes.norm(f.path)))
          }
          // a parent pointer that resolves nowhere, or a chain that
          // bottoms out before reaching the scan snapshot
          if (parentSnap.isEmpty && (s.parentId.nonEmpty || scanId.nonEmpty))
            broken = true
          cur = parentSnap
        }
        if (broken) p.files
        else added.result()
      }
      // Isolation level (Iceberg's write.<op>.isolation-level):
      // `serializable` (default) also fails on concurrently ADDED rows
      // matching the condition (phantoms); `snapshot` validates only
      // the rows actually read (masks/removals above) — the relief
      // valve for workloads where steady concurrent appends would
      // otherwise livelock row-level operations.
      val isolation = metaWithRef.properties
        .getOrElse(s"write.$operation.isolation-level", "serializable")
      require(isolation == "serializable" || isolation == "snapshot",
        s"invalid write.$operation.isolation-level '$isolation': " +
          "expected 'serializable' or 'snapshot'")
      val phantom =
        if (isolation == "snapshot") Nil
        else FileStats.prune(
          phantomCandidates.filterNot(f => scanFilePaths(PosDeletes.norm(f.path))),
          scanFilters.toSeq, schema,
          // phantom files may carry a NEWER epoch than this op's scan
          // schema; probing un-mapped names could miss a real phantom
          LakeScans.statRenames(schema, metaWithRef))
          .map(f => PosDeletes.norm(f.path))
      val conflicts = newlyMasked ++ newlyEqMasked ++ removedRead ++ phantom
      if (conflicts.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"${table.name()}: files read by this $operation were " +
            "concurrently deleted or rewritten, or rows matching its " +
            s"condition were concurrently added " +
            s"(${conflicts.take(3).mkString(", ")}" +
            s"${if (conflicts.size > 3) ", …" else ""}); retry the operation")
    }

    // Serializable-isolation, part 2 — every file our masks reference
    // must still be live. A concurrent compaction/overwrite between the
    // operation's scan and this commit would make the masks inert
    // (their target paths replaced) and silently resurrect the rows —
    // fail instead, like the stale-base CAS does for metadata races.
    if (dels.nonEmpty) {
      val live = parent.map(_.files.map(f => PosDeletes.norm(f.path)).toSet)
        .getOrElse(Set.empty)
      val masked = PosDeletes.deletedMap(dels, conf).keySet
      val gone = masked.filterNot(live)
      if (gone.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"${table.name()}: files scanned by this $operation were " +
            s"concurrently rewritten (${gone.take(3).mkString(", ")}" +
            s"${if (gone.size > 3) ", …" else ""}); retry the operation")
    }

    val nextId = metaWithRef.lastSnapshotId + 1
    val allFiles = parent.map(_.files).getOrElse(Nil) ++
      staged.map(_.copy(seq = nextId))
    val snap = SnapshotMeta(nextId,
      parent.map(_.snapshotId), System.currentTimeMillis(), operation,
      Map(
        "spark.app.id" -> spark.sparkContext.applicationId,
        "added-data-files" -> staged.size.toString,
        "added-records" -> staged.map(_.rowCount).sum.toString,
        "added-delete-files" -> dels.size.toString,
        "added-position-deletes" -> dels.map(_.rowCount).sum.toString
      ) ++ wapId.map("wap.id" -> _),
      allFiles, epoch,
      deleteFiles = parent.map(_.deleteFiles).getOrElse(Nil) ++ dels,
      eqDeleteFiles = EqDeletes.retire(
        parent.map(_.eqDeleteFiles).getOrElse(Nil), allFiles))
    val advance = if (wapId.isDefined) None else Some(targetRef)
    metaWithRef.withSnapshot(snap, advance)
    }
    ()
  }

  /** SupportsDeleteV2 fast path — file-granular copy-on-write. The
    * whole derivation retries on a lost CAS: the rewrite re-runs
    * against the reloaded head's file set, so a concurrent clean
    * commit doesn't fail this delete (and nothing it added is lost —
    * the kept set is re-derived from the new parent). */
  def deleteWhere(table: LakeTable, filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val conf = table.catalog.hadoopConf
    table.catalog.commitRetrying(table.ident) { fresh =>
      val parent = fresh.currentSnapshot(table.ref)
      val parentFiles = parent.map(_.files).getOrElse(Nil)
      if (fresh.properties.get("write.delete.mode").contains("merge-on-read"))
        morDelete(spark, table, fresh, parent, parentFiles, filters, conf)
      else {
        val nextId = fresh.lastSnapshotId + 1
        val kept = copyOnWrite(spark, table, fresh, parentFiles, filters, conf,
          applyDeletes = parentDeleteMap(parent, conf),
          applyEqs = parent.map(_.eqDeleteFiles).getOrElse(Nil),
          newSeq = nextId)
        val snap = SnapshotMeta(nextId, parent.map(_.snapshotId),
          System.currentTimeMillis(), "delete",
          Map("deleted-files" -> (parentFiles.size - kept.size).toString),
          kept, fresh.currentSchemaEpoch,
          deleteFiles = parent.map(_.deleteFiles).getOrElse(Nil),
          eqDeleteFiles = EqDeletes.retire(
            parent.map(_.eqDeleteFiles).getOrElse(Nil), kept))
        fresh.withSnapshot(snap, Some(table.ref))
      }
    }
    ()
  }

  /** Merge-on-read DELETE: instead of rewriting the partially-matching
    * files, record the matching row POSITIONS in a position-delete
    * parquet (computed distributed via `_metadata.row_index`, pushed
    * filters pruning untouched files). Whole-file matches are still
    * dropped outright — no mask needed. Data files are left
    * byte-identical; reads subtract the positions (see PosDeleteScan),
    * and rewrite_position_delete_files folds masks back into data. */
  private def morDelete(spark: SparkSession, table: LakeTable,
      fresh: TableMeta, parent: Option[SnapshotMeta],
      parentFiles: Seq[DataFileMeta], filters: Array[Filter],
      conf: org.apache.hadoop.conf.Configuration): TableMeta = {
    val schema = fresh.schema
    val (touched, untouched) = parentFiles.partition(f =>
      filters.forall(FileStats.mayMatch(f, _, schema)))
    val (full, partial) = touched.partition(fullyMatches(_, filters, schema))
    val newDeletes: Seq[DataFileMeta] =
      if (partial.isEmpty) Nil
      else {
        val cond = filters.flatMap(filterToColumn).reduceOption(_ && _)
          .getOrElse(lit(true))
        val outDir = s"${fresh.location}/metadata/deletes/" +
          java.util.UUID.randomUUID().toString.take(12)
        // positions already masked by the parent's delete files must
        // not be re-recorded: reads dedup either way, but a duplicate
        // pair would emit a phantom changelog 'delete' event and
        // over-count added-position-deletes
        val priorDels = parent.map(_.deleteFiles).getOrElse(Nil)
        val subtractPrior: DataFrame => DataFrame =
          if (priorDels.isEmpty) identity
          else df => df.join(
            spark.read.schema(PosDeletes.DeleteSchema)
              .parquet(priorDels.map(_.path): _*),
            Seq("file_path", "pos"), "left_anti")
        // rows already equality-deleted must not be re-masked (the
        // read dedups either way, but the pair would emit a phantom
        // changelog delete for an already-dead row)
        val parentEqs = parent.map(_.eqDeleteFiles).getOrElse(Nil)
        for {
          (group, eqs) <- EqDeletes.groupByApplicable(fresh, partial, parentEqs)
          (epoch, fs) <- group.groupBy(_.schemaEpoch)
        } {
          val epochSchema = fresh.schemaAt(epoch)
          val meta = Seq(
            regexp_replace(col("_metadata.file_path"), "^[a-zA-Z0-9.+-]+:/+", "/")
              .as("file_path"),
            col("_metadata.row_index").as("pos"))
          val projected =
            spark.read.schema(epochSchema).parquet(fs.map(_.path): _*)
              .select(epochProjection(fresh, epoch, epochSchema) ++ meta: _*)
              .where(cond)
          val eqMasked =
            if (eqs.isEmpty) projected
            else EqDeletes.antiJoin(spark, fresh, projected, eqs)
          subtractPrior(eqMasked.select(col("file_path"), col("pos")))
            .repartitionByRange(math.max(1, fs.size / 64),
              col("file_path"), col("pos"))
            .sortWithinPartitions(col("file_path"), col("pos"))
            .write.mode("append").parquet(outDir)
        }
        listParquet(outDir, conf)
          .map(p => FileStats.fromFooter(p, conf, PosDeletes.DeleteSchema, 0, Map.empty))
          .filter(_.rowCount > 0)
      }
    val snap = SnapshotMeta(fresh.lastSnapshotId + 1, parent.map(_.snapshotId),
      System.currentTimeMillis(), "delete",
      Map("deleted-files" -> full.size.toString,
        "added-delete-files" -> newDeletes.size.toString,
        "added-position-deletes" -> newDeletes.map(_.rowCount).sum.toString),
      untouched ++ partial, fresh.currentSchemaEpoch,
      deleteFiles = parent.map(_.deleteFiles).getOrElse(Nil) ++ newDeletes,
      eqDeleteFiles = parent.map(_.eqDeleteFiles).getOrElse(Nil))
    fresh.withSnapshot(snap, Some(table.ref))
  }

  /** Columns projecting an epoch-schema frame to the CURRENT schema
    * (field-id renames honored, types cast, dropped columns nulled). */
  /** Project an epoch-schema frame into the CURRENT schema — by
    * stable field id, exactly like the read path's renameMap. A
    * current field whose id does not exist in the epoch is NULL even
    * when a same-named column does: that name belongs to a DROPPED
    * column's lineage, and matching it resurrects dead data (the
    * round-7 soak caught compaction doing precisely this after a
    * drop/re-add — the rewrite materialized the dead values into
    * current-epoch files, corrupting the re-added column for every
    * later read). Name matching applies only to id-less legacy
    * fields. */
  def epochProjection(meta: TableMeta, epoch: Int,
      epochSchema: StructType): Seq[Column] = {
    val byId = epochSchema.fields.flatMap(f =>
      TableMeta.fieldId(f).map(_ -> f)).toMap
    meta.schema.fields.toSeq.map { f =>
      TableMeta.fieldId(f) match {
        case Some(id) => byId.get(id) match {
          case Some(ef) =>
            projectValue(col(ef.name), f.dataType, ef.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
        case None => epochSchema.fields.find(_.name == f.name) match {
          case Some(ef) =>
            projectValue(col(f.name), f.dataType, ef.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
    }
  }

  /** Project an epoch-typed VALUE to its current type, mapping struct
    * internals by NESTED field id (name fallback per id-less legacy
    * level, fresh-id nulling for re-adds — the same resolution
    * [[LakeScans.epochNamed]] gives the clean scan path). A bare
    * positional `cast` is wrong across nested add/drop (fields shift
    * or counts differ) and was wrong for nested renames until nested
    * ids existed. Arrays of structs recurse through `transform`;
    * other types keep the widening cast. */
  private[lake] def projectValue(c: Column,
      cur: org.apache.spark.sql.types.DataType,
      ep: org.apache.spark.sql.types.DataType): Column = (cur, ep) match {
    case (cs: StructType, es: StructType) =>
      if (cs == es) c
      else {
        val byId = es.fields.flatMap(f =>
          TableMeta.fieldId(f).map(_ -> f)).toMap
        val epHasIds = byId.nonEmpty
        val inner = cs.fields.map { cf =>
          val counterpart = TableMeta.fieldId(cf) match {
            case Some(id) => byId.get(id).orElse(
              if (!epHasIds) es.fields.find(_.name.equalsIgnoreCase(cf.name))
              else None)
            case None => es.fields.find(_.name.equalsIgnoreCase(cf.name))
          }
          counterpart match {
            case Some(ef) =>
              projectValue(c.getField(ef.name), cf.dataType, ef.dataType)
                .as(cf.name)
            case None => lit(null).cast(cf.dataType).as(cf.name)
          }
        }
        // a NULL struct must stay NULL — struct(...) of nulls is a
        // present struct with null members
        when(c.isNull, lit(null).cast(stripIds(cs)))
          .otherwise(struct(inner.toSeq: _*))
      }
    case (ArrayType(ce, _), ArrayType(ee, _))
        if structDiffers(ce, ee) =>
      transform(c, x => projectValue(x, ce, ee))
    case (MapType(ck, cv, _), MapType(ek, ev, _))
        if structDiffers(ck, ek) || structDiffers(cv, ev) =>
      // a positional cast through a map whose key/value structs differ
      // maps dead columns into live ones (the same lineage class the
      // struct case fixes) — dive per entry instead; scalar key/value
      // mismatches keep their widening cast inside the lambda
      val keyed =
        if (ck == ek) c
        else transform_keys(c, (k, _) => projectValue(k, ck, ek))
      if (cv == ev) keyed
      else transform_values(keyed, (_, v) => projectValue(v, cv, ev))
    case _ => c.cast(cur)
  }

  /** True when a struct ANYWHERE inside the type pair differs — the
    * signal that a positional Cast would silently misalign struct
    * internals and the projection must recurse through the container
    * instead. */
  private[lake] def structDiffers(cur: org.apache.spark.sql.types.DataType,
      ep: org.apache.spark.sql.types.DataType): Boolean = (cur, ep) match {
    case (cs: StructType, es: StructType) => cs != es
    case (ArrayType(ce, _), ArrayType(ee, _)) => structDiffers(ce, ee)
    case (MapType(ck, cv, _), MapType(ek, ev, _)) =>
      structDiffers(ck, ek) || structDiffers(cv, ev)
    case _ => false
  }

  private[lake] def stripIdsPublic(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = stripIds(dt)

  /** Field-id metadata stripped at every level — lit(null).cast to a
    * metadata-carrying struct and struct(...) outputs must agree on
    * type for the when/otherwise union. */
  private def stripIds(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name, stripIds(f.dataType),
        f.nullable)))
    case ArrayType(e, n) => ArrayType(stripIds(e), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(stripIds(k), stripIds(v), n)
    case other => other
  }

  /** Does every row of `file` definitely match all `filters`?
    * (Requires provable negation + no nulls in referenced columns.) */
  def fullyMatches(file: DataFileMeta, filters: Array[Filter],
      schema: StructType): Boolean =
    file.rowCount > 0 && filters.forall { f =>
      f.references.forall(a => file.nullCounts.get(a).contains(0L)) &&
        negate(f).exists(nf => !FileStats.mayMatch(file, nf, schema))
    }

  def negate(f: Filter): Option[Filter] = f match {
    case sources.EqualTo(a, v) =>
      Some(sources.Or(sources.LessThan(a, v), sources.GreaterThan(a, v)))
    case sources.GreaterThan(a, v) => Some(sources.LessThanOrEqual(a, v))
    case sources.GreaterThanOrEqual(a, v) => Some(sources.LessThan(a, v))
    case sources.LessThan(a, v) => Some(sources.GreaterThanOrEqual(a, v))
    case sources.LessThanOrEqual(a, v) => Some(sources.GreaterThan(a, v))
    case sources.IsNull(a) => Some(sources.IsNotNull(a))
    case sources.IsNotNull(a) => Some(sources.IsNull(a))
    case sources.Not(c) => Some(c)
    case sources.And(l, r) =>
      for (nl <- negate(l); nr <- negate(r)) yield sources.Or(nl, nr)
    case sources.Or(l, r) =>
      for (nl <- negate(l); nr <- negate(r)) yield sources.And(nl, nr)
    case _ => None
  }

  /** v1 Filter -> Column (for copy-on-write rewrite jobs). */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
    case sources.Not(c) => filterToColumn(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
