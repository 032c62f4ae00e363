package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 FunctionCatalog bindings for the partition transforms, so
  * Spark can evaluate `bucket(16, id)` / `days(ts)` / `truncate(4, s)`
  * as SHUFFLE KEYS when a write declares
  * `Distributions.clustered(partition transforms)`: rows cluster on
  * the transform VALUE (one shuffle key per partition tuple) instead
  * of the raw source column (one per distinct value) — fewer, fatter
  * shuffle groups feeding the roll-over fanout writer.
  *
  * Equivalence classes match [[Transforms.eval]] exactly (same hash,
  * same arithmetic), so clustering agrees with the partition tuples
  * recorded in the manifest. Results are evaluated via
  * `produceResult` — these run only in the write-side exchange, not
  * in query hot paths.
  */
object TransformFunctions {

  val names: Seq[String] = Seq("years", "months", "days", "hours", "bucket", "truncate")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "years" | "months" | "days" | "hours" => Some(new TimeUnbound(name.toLowerCase))
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case _ => None
  }

  private def fmt(unit: String, zone: java.time.ZoneId): java.time.format.DateTimeFormatter = {
    val p = unit match {
      case "years" => "yyyy" case "months" => "yyyy-MM"
      case "days" => "yyyy-MM-dd" case _ => "yyyy-MM-dd-HH"
    }
    java.time.format.DateTimeFormatter.ofPattern(p).withZone(zone)
  }

  private class TimeUnbound(unit: String) extends UnboundFunction {
    override def name(): String = unit
    override def description(): String = s"lake partition transform $unit"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$unit takes one argument")
      // Transforms.eval pins TimestampType formatting to the TABLE's
      // write.transform.zone; this FunctionCatalog binding has no
      // table context, so it captures the SESSION zone at bind (plan)
      // time. A mismatch (cross-zone writer session) only scatters a
      // tuple's rows across shuffle tasks — the fanout writer still
      // routes every row to its correct PINNED-zone tuple, so this is
      // file fan-in cost, never correctness (TransformZoneSuite).
      // DATE and NTZ values are zone-free and keep UTC.
      val sessionZone = java.time.ZoneId.of(
        org.apache.spark.sql.SparkSession.active.sessionState.conf.sessionLocalTimeZone)
      new ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
        private val in = inputType.fields(0).dataType
        private val zone = in match {
          case TimestampType => sessionZone
          case _ => java.time.ZoneOffset.UTC
        }
        override def inputTypes(): Array[DataType] = Array(in)
        override def resultType(): DataType = StringType
        override def name(): String = unit
        override def canonicalName(): String = s"lake.$unit"
        override def produceResult(row: InternalRow): org.apache.spark.unsafe.types.UTF8String = {
          if (row.isNullAt(0)) return null
          val instant = in match {
            case DateType =>
              java.time.Instant.ofEpochSecond(row.getInt(0).toLong * 86400L)
            case TimestampType | TimestampNTZType =>
              java.time.Instant.ofEpochSecond(
                Math.floorDiv(row.getLong(0), 1000000L))
            case _ => return null
          }
          // years -> "2026" is year(ts).cast(string) in Transforms.eval;
          // keep the same literal text per unit
          val s =
            if (unit == "years") fmt(unit, zone).format(instant).toInt.toString
            else fmt(unit, zone).format(instant)
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        }
      }
    }
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String = "lake partition transform bucket"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "bucket takes (n, col)")
      new ScalarFunction[java.lang.Long] {
        private val in = inputType.fields(1).dataType
        override def inputTypes(): Array[DataType] = Array(IntegerType, in)
        override def resultType(): DataType = LongType
        override def name(): String = "bucket"
        override def canonicalName(): String = "lake.bucket"
        override def produceResult(row: InternalRow): java.lang.Long = {
          if (row.isNullAt(0) || row.isNullAt(1)) return null
          val n = row.getInt(0)
          // same as Transforms.eval: pmod(abs(xxhash64(c)), n) — the
          // catalyst XxHash64Function IS the xxhash64 SQL function
          val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(row.get(1, in), in, 42L)
          java.lang.Long.valueOf(Math.floorMod(Math.abs(h), n.toLong))
        }
      }
    }
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String = "lake partition transform truncate"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "truncate takes (width, col)")
      new ScalarFunction[AnyRef] {
        private val in = inputType.fields(1).dataType
        override def inputTypes(): Array[DataType] = Array(IntegerType, in)
        override def resultType(): DataType = in match {
          case StringType => StringType
          case _ => LongType
        }
        override def name(): String = "truncate"
        override def canonicalName(): String = "lake.truncate"
        override def produceResult(row: InternalRow): AnyRef = {
          if (row.isNullAt(0) || row.isNullAt(1)) return null
          val w = row.getInt(0)
          in match {
            case StringType =>
              row.getUTF8String(1).substringSQL(1, w)
            case LongType =>
              val v = row.getLong(1)
              java.lang.Long.valueOf(v - Math.floorMod(v, w.toLong))
            case IntegerType =>
              val v = row.getInt(1).toLong
              java.lang.Long.valueOf(v - Math.floorMod(v, w.toLong))
            case _ => null
          }
        }
      }
    }
  }
}
