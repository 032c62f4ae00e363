package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Partition-aware staging writer for partitioned tables.
  *
  * The generic v2 ParquetWrite writes one file per task regardless of
  * content, so a task holding rows of several partition tuples staged
  * a single multi-tuple file — breaking the one-file-one-partition
  * invariant that dynamic overwrite, runtime group filtering and the
  * partitions metadata table rely on. This writer instead evaluates
  * the partition transforms per row and ROLLS to a new file whenever
  * the tuple changes. Combined with the write's required clustering +
  * ordering on the partition source columns, each task keeps exactly
  * ONE open parquet writer (bounded memory at any partition count) and
  * produces one file per tuple; if the input somehow arrives unsorted
  * the writer still splits correctly, just into more files.
  *
  * Atomicity: rows are written under
  * `stagingDir/_temporary/attempt-<partition>-<task>/` and moved into
  * the staging root only at task commit, so a failed or speculative
  * attempt never leaks rows into the snapshot commit (which lists the
  * staging root).
  */
object LakeFanoutWrite {

  /** Driver side: resolve the partition transform expressions against
    * the write schema once, bind them to ordinals, and capture a
    * serializable parquet OutputWriterFactory. */
  def factory(spark: SparkSession, meta: TableMeta, schema: StructType,
      stagingDir: String): DataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // property-driven parquet tuning (row-group/page size, bloom
    // filters) keys directly into the job conf; the compression codec
    // goes through prepareWrite's options, same as a write option
    WriteTuning.hadoopOptions(meta).foreach { case (k, v) =>
      job.getConfiguration.set(k, v)
    }
    val owf = new ParquetFileFormat().prepareWrite(
      org.apache.spark.sql.classic.SparkSession.active, job,
      WriteTuning.options(meta), schema)
    // Resolve the transform Columns through a real (empty) Dataset so
    // the analyzed plan carries plain catalyst expressions, then bind
    // them to the write schema's ordinals for executor-side eval.
    // A DELETE-only delta write's schema carries no data columns at
    // all — its partition transforms cannot (and need not) resolve,
    // because no insert row can ever reach this factory; building the
    // factory must not fail analysis for them. If a row DOES arrive
    // with a truncated spec, the writer fails loudly below rather
    // than silently mis-partitioning.
    val resolvable = meta.partitionSpec.filter(f =>
      Transforms.leafType(schema, f.sourceColumn).isDefined)
    val cols = resolvable.zipWithIndex.map { case (f, i) =>
      Transforms.eval(f, schema, Transforms.zoneOf(meta)).as(s"__p$i")
    }
    val analyzed = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .select(cols: _*).queryExecution.analyzed
    val bound = analyzed.collectFirst {
      case p: Project =>
        val input = p.child.output
        p.projectList.map {
          case a: Alias => BindReferences.bindReference(a.child, input)
          case e => BindReferences.bindReference(e: Expression, input)
        }
    }.getOrElse(throw new IllegalStateException(
      s"could not resolve partition transforms for ${meta.location}"))
    new LakeFanoutWriterFactory(owf, bound, schema, stagingDir,
      new SerializableConfiguration(job.getConfiguration),
      WriteTuning.targetFileSize(meta),
      specTruncated = resolvable.size != meta.partitionSpec.size,
      tupleNames = resolvable.map(_.name))
  }
}

class LakeFanoutWriterFactory(owf: OutputWriterFactory,
    tupleExprs: Seq[Expression], schema: StructType, stagingDir: String,
    conf: SerializableConfiguration, targetBytes: Long,
    specTruncated: Boolean = false,
    tupleNames: Seq[String] = Nil) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    if (specTruncated)
      return new DataWriter[InternalRow] {
        override def write(row: InternalRow): Unit =
          throw new IllegalStateException(
            "insert row reached a fanout writer whose partition spec " +
              "could not resolve against the write schema — the plan " +
              "routed a data row into a delete-only delta write")
        override def commit(): WriterCommitMessage = LakeFanoutCommit(Nil)
        override def abort(): Unit = ()
        override def close(): Unit = ()
      }
    new LakeFanoutDataWriter(owf, tupleExprs, schema, stagingDir,
      conf.value, partitionId, taskId, targetBytes, tupleNames)
  }
}

/** `files` zips with `tuples`: each staged file's partition tuple,
  * recorded AT WRITE TIME (the writer rolls per tuple, so every file
  * is single-tuple by construction). Carrying the tuple in the commit
  * message lets the snapshot commit skip the partitionTuples Spark job
  * (a scan + distinct + collect of everything just staged) every
  * partitioned write used to pay. Values use the same formatting that
  * job produced (`String.valueOf` of the stringified transform), so
  * stored partitionValues stay byte-identical either way. */
case class LakeFanoutCommit(files: Seq[String],
    tuples: Seq[Map[String, String]] = Nil) extends WriterCommitMessage

class LakeFanoutDataWriter(owf: OutputWriterFactory,
    tupleExprs: Seq[Expression], schema: StructType, stagingDir: String,
    conf: Configuration, partitionId: Int, taskId: Long,
    targetBytes: Long = WriteTuning.DefaultTargetFileSize,
    tupleNames: Seq[String] = Nil)
  extends DataWriter[InternalRow] {

  private val fs = new Path(stagingDir).getFileSystem(conf)
  private val attemptDir = new Path(stagingDir,
    s"_temporary/attempt-$partitionId-$taskId")
  private val proj = UnsafeProjection.create(tupleExprs)
  private var current: OutputWriter = _
  private var currentKey: String = null
  private var currentPath: Path = _
  private var bytesSinceSizeCheck = 0L
  private var fileCount = 0
  private val written = Seq.newBuilder[Path]
  // per-file partition tuple, in `written` order (null values keep the
  // "null" string partitionTuples' String.valueOf produced)
  private val tuples = Seq.newBuilder[Map[String, String]]
  private var currentTuple: Map[String, String] = Map.empty

  private def tupleKey(row: InternalRow): String = {
    val t = proj(row) // all transforms are cast to string in Transforms.eval
    (0 until tupleExprs.size).map(i =>
      if (t.isNullAt(i)) "__NULL__" else t.getUTF8String(i).toString)
      .mkString("//|//")
  }

  private def tupleOf(row: InternalRow): Map[String, String] = {
    val t = proj(row)
    tupleNames.zipWithIndex.map { case (n, i) =>
      n -> (if (t.isNullAt(i)) "null" else t.getUTF8String(i).toString)
    }.toMap
  }

  private def roll(): Unit = {
    if (current != null) { current.close(); current = null }
    val file = new Path(attemptDir,
      f"part-$partitionId%05d-$taskId-$fileCount%04d.parquet")
    fileCount += 1
    written += file
    val attemptId = new TaskAttemptID("lake", 0, TaskType.MAP, partitionId, fileCount)
    current = owf.newInstance(file.toString, schema,
      new TaskAttemptContextImpl(conf, attemptId))
    currentPath = file
    bytesSinceSizeCheck = 0L
  }

  override def write(row: InternalRow): Unit = {
    val key = tupleKey(row)
    if (current == null || key != currentKey) {
      roll(); currentKey = key; currentTuple = tupleOf(row)
      tuples += currentTuple
    }
    current.write(row)
    // Target-file-size roll-over (write.target-file-size-bytes): a
    // partition tuple receiving many gigabytes in one task must not
    // become one huge file — MoR-masked reads never split a data file,
    // so file size bounds read parallelism. In-memory row-size
    // accounting (UnsafeRow byte size) gates an on-disk length probe:
    // no filesystem RPC until roughly a compressed target's worth of
    // raw bytes has been written (vs one getFileStatus per 128 rows —
    // ~78k NameNode RPCs for a 10M-row task). The probe itself is
    // Try-wrapped: object stores (S3A) materialize a file only at
    // close, so mid-write getFileStatus throws FileNotFoundException
    // there — size rolls degrade to close-time granularity instead of
    // failing every write task.
    bytesSinceSizeCheck += (row match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
        u.getSizeInBytes.toLong
      case _ => 64L
    })
    if (bytesSinceSizeCheck >= targetBytes) {
      bytesSinceSizeCheck = 0L
      if (scala.util.Try(fs.getFileStatus(currentPath).getLen)
          .getOrElse(0L) >= targetBytes) {
        // size roll-over within one tuple: the new file keeps the
        // current tuple (tuples stays aligned with written)
        roll()
        tuples += currentTuple
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    if (current != null) { current.close(); current = null }
    val files = written.result()
    // HDFS-style filesystems report rename failure via a false return,
    // not an exception; an unchecked failure here would delete the part
    // file with attemptDir below while the commit message still lists
    // it — silent loss of the task's inserts. Fail the attempt instead.
    files.foreach { f =>
      val dest = new Path(stagingDir, f.getName)
      if (!fs.rename(f, dest) || !fs.exists(dest))
        throw new java.io.IOException(s"failed to promote $f to $dest")
    }
    fs.delete(attemptDir, true)
    LakeFanoutCommit(files.map(f => new Path(stagingDir, f.getName).toString),
      tuples.result())
  }

  override def abort(): Unit = {
    if (current != null) { try current.close() catch { case _: Exception => () }; current = null }
    fs.delete(attemptDir, true)
  }

  override def close(): Unit =
    if (current != null) { current.close(); current = null }
}
