package graft.lake

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

import scala.util.Try

/** Helpers for `rewrite_data_files` (reference:
  * docs/spark-procedures.md:396-436): the `where` scope filter and the
  * `zorder(...)` sort strategy.
  */
object RewriteUtil {

  /** Matches `zorder(c1, c2, ...)` in a sort_order spec. */
  val ZorderSpec = "(?i)^zorder\\s*\\((.*)\\)$".r

  /** Parse+analyze a `where` string against the table schema and
    * translate it to v1 source filters for metadata-level pruning.
    * Untranslatable conjuncts are dropped — dropping a conjunct can
    * only widen the kept-file set, so the scope stays a conservative
    * superset of the rows that match.
    */
  def whereToFilters(spark: SparkSession, schema: StructType,
      where: String): Seq[Filter] = {
    // analyzed (not optimized) plan: the optimizer would collapse the
    // empty relation and drop the Filter. Constant-fold explicitly so
    // implicit casts around literals (id <= CAST(20 AS BIGINT)) become
    // plain literals that translateFilter understands.
    val analyzed = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .where(where).queryExecution.analyzed
    val cond = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(analyzed)
      .collect { case f: logical.Filter => f.condition }
    cond.flatMap(splitConjuncts).flatMap(e =>
      org.apache.spark.sql.graft.Shims.translateFilter(e))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Z-order sort key over `names`: each column is linearized to an
    * 8-bit bucket, and the bucket bits are interleaved into one long
    * so lexicographic order on the result is Morton order on the
    * columns. Numeric/date/timestamp columns scale linearly between
    * the min/max already recorded in the candidate files' manifest
    * stats (no extra pass over the data); other types hash to a
    * bucket, which clusters equal values without imposing an order.
    * The whole key is a plain codegen'd expression tree — no UDF.
    */
  def zvalue(files: Seq[DataFileMeta], schema: StructType,
      names: Seq[String]): Column = {
    require(names.nonEmpty && names.size <= 7,
      s"zorder supports 1-7 columns, got ${names.size}")
    val n = names.size
    val buckets = names.map { nm =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(nm)).getOrElse(
        throw new IllegalArgumentException(
          s"zorder column not found in table schema: $nm"))
      zbucket(f, files)
    }
    var acc: Column = lit(0L)
    for (bit <- 0 until 8; (b, j) <- buckets.zipWithIndex)
      acc = acc.bitwiseOR(shiftleft(
        shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + j))
    acc
  }

  /** One column's 0-255 bucket (nulls bucket to 0 = sort first). */
  private def zbucket(f: StructField, files: Seq[DataFileMeta]): Column = {
    def bounds: Option[(Double, Double)] = {
      val los = files.flatMap(_.minValues.get(f.name)).flatMap(s => Try(s.toDouble).toOption)
      val his = files.flatMap(_.maxValues.get(f.name)).flatMap(s => Try(s.toDouble).toOption)
      if (los.isEmpty || his.isEmpty) None
      else Some((los.min, his.max)).filter { case (lo, hi) => hi > lo }
    }
    val numeric: Option[Column] = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType =>
        Some(col(f.name).cast(DoubleType))
      case DateType => Some(unix_date(col(f.name)).cast(DoubleType))
      case TimestampType => Some(unix_micros(col(f.name)).cast(DoubleType))
      case _ => None
    }
    (numeric, bounds) match {
      case (Some(v), Some((lo, hi))) =>
        coalesce(least(greatest(
          floor((v - lit(lo)) * 255.0 / (hi - lo)).cast(LongType),
          lit(0L)), lit(255L)), lit(0L))
      case _ =>
        coalesce(pmod(xxhash64(col(f.name)), lit(256L)), lit(0L))
    }
  }
}
