package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Per-file column statistics: harvested from parquet footers at
  * commit time (no extra scan job), consumed at planning time for
  * file-level pruning — the lake equivalent of Iceberg's
  * lower_bounds/upper_bounds skipping (reference:
  * docs/spark-queries.md:41-45, 320-326).
  *
  * Values are encoded as strings in the manifest; comparisons decode
  * by column type. Conservative throughout: any column/filter shape we
  * can't reason about keeps the file.
  */
object FileStats {

  /** Footer-harvest MANY files concurrently: footer reads are
    * IO-bound driver work, and a commit staging hundreds of files
    * (one per partition tuple) must not pay them serially. */
  def fromFooters(paths: Seq[String], conf: Configuration,
      schema: StructType, epoch: Int,
      partitionValuesOf: String => Map[String, String] = _ => Map.empty)
      : Seq[DataFileMeta] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.traverse(paths)(p =>
      Future(fromFooter(p, conf, schema, epoch, partitionValuesOf(p)))),
      Duration.Inf)
  }

  /** Read row count + min/max/null-counts for one parquet file. */
  def fromFooter(path: String, conf: Configuration, schema: StructType,
      epoch: Int, partitionValues: Map[String, String]): DataFileMeta = {
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala
      val rowCount = blocks.map(_.getRowCount).sum
      val sizeBytes = blocks.map(_.getCompressedSize).sum
      val mins = scala.collection.mutable.Map[String, String]()
      val maxs = scala.collection.mutable.Map[String, String]()
      val nulls = scala.collection.mutable.Map[String, Long]()
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (!name.contains('.') || schema.fieldNames.contains(name)) {
          val st = c.getStatistics
          if (st != null && !st.isEmpty) {
            nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
            if (st.hasNonNullValue) {
              val (mn, mx) = (encode(st.genericGetMin), encode(st.genericGetMax))
              mins(name) = mins.get(name) match {
                case Some(cur) => if (lt(mn, cur, typeOf(schema, name))) mn else cur
                case None => mn
              }
              maxs(name) = maxs.get(name) match {
                case Some(cur) => if (lt(cur, mx, typeOf(schema, name))) mx else cur
                case None => mx
              }
            }
          }
        }
      }
      DataFileMeta(path, rowCount, sizeBytes, epoch,
        mins.toMap, maxs.toMap, nulls.toMap, partitionValues)
    } finally reader.close()
  }

  private def encode(v: Any): String = v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case x => String.valueOf(x)
  }

  private def typeOf(schema: StructType, name: String): DataType =
    schema.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
      .getOrElse(StringType)

  /** Compare encoded stats values under a column type; false if unsure. */
  private def lt(a: String, b: String, dt: DataType): Boolean =
    cmp(a, b, dt).exists(_ < 0)

  private[lake] def cmp(a: String, b: String, dt: DataType): Option[Int] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(java.lang.Long.compare(a.toLong, b.toLong))
      case FloatType | DoubleType =>
        Some(java.lang.Double.compare(a.toDouble, b.toDouble))
      case _: DecimalType =>
        Some(new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)))
      case BooleanType => Some(a.toBoolean.compareTo(b.toBoolean))
      case StringType | _: CharType | _: VarcharType => Some(a.compareTo(b))
      // Parquet stores date as epoch-day int, timestamp as long micros —
      // both footer-encoded as numeric strings, filter literals likewise
      // (see encodeLiteral), so numeric compare is exact.
      case DateType => Some(java.lang.Long.compare(a.toLong, b.toLong))
      case TimestampType | TimestampNTZType =>
        Some(java.lang.Long.compare(a.toLong, b.toLong))
      case _ => None
    } catch { case _: Exception => None }

  /** Encode a filter literal into the same string space as footer stats. */
  private[lake] def encodeLiteral(v: Any, dt: DataType): Option[String] = v match {
    case null => None
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case t: java.sql.Timestamp =>
      Some((t.getTime * 1000L + (t.getNanos / 1000) % 1000).toString)
    case t: java.time.Instant =>
      Some((t.getEpochSecond * 1000000L + t.getNano / 1000).toString)
    case other => Some(other.toString)
  }

  /** Can `file` possibly contain rows matching `filter`? */
  def mayMatch(file: DataFileMeta, filter: Filter, schema: StructType): Boolean = {
    def stats(attr: String): (Option[String], Option[String], Option[Long], DataType) = {
      val dt = typeOf(schema, attr)
      (file.minValues.get(attr), file.maxValues.get(attr),
        file.nullCounts.get(attr), dt)
    }
    filter match {
      case EqualTo(a, v) =>
        val (mn, mx, _, dt) = stats(a)
        encodeLiteral(v, dt) match {
          case Some(lit) =>
            mn.forall(m => cmp(lit, m, dt).forall(_ >= 0)) &&
            mx.forall(m => cmp(lit, m, dt).forall(_ <= 0))
          case None => true
        }
      case GreaterThan(a, v) =>
        val (_, mx, _, dt) = stats(a)
        encodeLiteral(v, dt).forall(lit =>
          mx.forall(m => cmp(lit, m, dt).forall(_ < 0)))
      case GreaterThanOrEqual(a, v) =>
        val (_, mx, _, dt) = stats(a)
        encodeLiteral(v, dt).forall(lit =>
          mx.forall(m => cmp(lit, m, dt).forall(_ <= 0)))
      case LessThan(a, v) =>
        val (mn, _, _, dt) = stats(a)
        encodeLiteral(v, dt).forall(lit =>
          mn.forall(m => cmp(lit, m, dt).forall(_ > 0)))
      case LessThanOrEqual(a, v) =>
        val (mn, _, _, dt) = stats(a)
        encodeLiteral(v, dt).forall(lit =>
          mn.forall(m => cmp(lit, m, dt).forall(_ >= 0)))
      case In(a, vs) => vs.isEmpty || vs.exists(v => mayMatch(file, EqualTo(a, v), schema))
      case IsNull(a) =>
        val (_, _, nulls, _) = stats(a)
        nulls.forall(_ > 0) || file.rowCount == 0
      case IsNotNull(a) =>
        val (_, _, nulls, _) = stats(a)
        nulls.forall(_ < file.rowCount)
      case StringStartsWith(a, prefix) =>
        val (mn, mx, _, _) = stats(a)
        mn.forall(m => m.take(prefix.length) <= prefix) &&
          mx.forall(m => m.take(prefix.length) >= prefix)
      case And(l, r) => mayMatch(file, l, schema) && mayMatch(file, r, schema)
      case Or(l, r) => mayMatch(file, l, schema) || mayMatch(file, r, schema)
      case _ => true
    }
  }

  def prune(files: Seq[DataFileMeta], filters: Seq[Filter],
      schema: StructType): Seq[DataFileMeta] =
    files.filter(f => filters.forall(mayMatch(f, _, schema)))
}
