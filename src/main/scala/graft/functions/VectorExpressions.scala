package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Codegen'd dot product over two float/double array columns.
  *
  * Semantically identical to the interpreted higher-order-function
  * chain `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
  * y.cast(double)), 0.0, _ + _)` — each element is widened to double,
  * products are accumulated left-to-right from 0.0 — but it runs as a
  * single generated loop inside whole-stage codegen instead of ~4
  * interpreted array passes with per-element lambda dispatch. On the
  * 100 TB path every embedding comparison (ANN ranking, k-NN join,
  * near-dup cosine) sits in the innermost hot loop, so this is the
  * "custom Catalyst Expression beats UDF beats interpreted HOF" rung
  * of the extension ladder.
  *
  * Null semantics match the HOF chain: null array -> null; any null
  * element pair position -> null. Arrays of unequal length contribute
  * only the common prefix (callers use fixed-dimension embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  /** A null ELEMENT also nulls the result, so the default
    * BinaryExpression nullability (children only) is too narrow —
    * declaring nullable=false while doGenCode assigns `ev.isNull =
    * true` made janino reject the generated Java ("not an rvalue",
    * because Spark emits isNull as the constant `false`) and every
    * consumer silently fell back to interpreted eval. Nullable must
    * cover the element path whenever either array may contain nulls. */
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, dt: DataType): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      // Assigning ev.isNull is only legal Java when `nullable` is true
      // (otherwise Spark emits it as the constant `false`); when
      // neither array can hold null elements the check is dead code,
      // so the non-nullable hot loop drops the two isNullAt branches
      // entirely instead of paying them per element.
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"""if ($xa.isNullAt($i) || $ya.isNullAt($i)) {
             |    ${ev.isNull} = true;
             |    break;
             |  }""".stripMargin
        else ""
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ${get(xa, elemType(left))} * ${get(ya, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane sign bits of a vector in ONE fused loop,
  * bit-packed into long words (bit g of word g/64 = 1 iff
  * dot(v, plane_g) > 0).
  *
  * The LSH band miners need bands × planesPerBand sign bits per
  * vector; as a Column composition that is one [[DotProduct]] call
  * per plane — at the 128-plane scale configuration the projection
  * outgrows whole-stage codegen and falls back to interpreted
  * per-plane array walks (measured: the HASHING stage dominated the
  * whole mining pass). One expression, one generated loop over
  * (planes × dims) restores codegen whatever the plane count.
  *
  * Bit-parity contract with the composition it replaces: the inner
  * accumulation is the same left-to-right `acc += (double) x_i * p_i`
  * as [[DotProduct]] against the same md5-parity planes (the
  * companion is the single source of plane truth — the Column-side
  * generators delegate here), and a null ELEMENT yields the all-zero
  * signature exactly as `when(dot > 0, 1).otherwise(0)` buckets a
  * null dot. */
case class PlaneSigns(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_plane_signs"
  override def nullable: Boolean = child.nullable

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (nPlanes > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs nPlanes > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  private lazy val table: Array[Array[Double]] = PlaneSigns.table(nPlanes)
  private def nWords: Int = (nPlanes + 63) >> 6

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val planes = table
    val sig = new Array[Long](nWords)
    val n = math.min(x.numElements(), PlaneSigns.Dim)
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) { anyNull = x.isNullAt(i); i += 1 }
    if (!anyNull) {
      val isF = elemFloat
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          val xv = if (isF) x.getFloat(j).toDouble else x.getDouble(j)
          acc += xv * planes(p)(j)
          j += 1
        }
        if (acc > 0.0) sig(p >> 6) |= 1L << (p & 63)
        p += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xa => {
      val planesRef = ctx.addReferenceObj("planes", table, "double[][]")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val anyNull = ctx.freshName("anyNull")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val get = if (elemFloat) s"(double) $xa.getFloat($j)"
                else s"$xa.getDouble($j)"
      s"""
         |long[] $sig = new long[$nWords];
         |int $n = java.lang.Math.min($xa.numElements(), ${PlaneSigns.Dim});
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n && !$anyNull; $j++) {
         |  $anyNull = $xa.isNullAt($j);
         |}
         |if (!$anyNull) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += $get * $planesRef[$p][$j];
         |    }
         |    if ($acc > 0.0) $sig[$p >> 6] |= 1L << ($p & 63);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneSigns =
    copy(child = newChild)
}

object PlaneSigns {
  val Dim = 64

  /** Deterministic ±1 hyperplane j — md5 first-hex-digit parity of
    * "j_i" per dimension; the SAME values the DuckDB oracles inline
    * (VectorOps.planeLit) and the Column-side bucket folds use. */
  def planeAt(j: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Dim) { i =>
      val b = md.digest(s"${j}_$i".getBytes("UTF-8"))
      if (((b(0) >> 4) & 0x1) == 1) 1.0 else -1.0
    }
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  def table(n: Int): Array[Array[Double]] =
    memo.computeIfAbsent(n, k => Array.tabulate(k)(planeAt))
}

object VectorFunctions {
  /** Column-level dot product backed by the codegen'd [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Bit-packed hyperplane sign signature ([[PlaneSigns]]). */
  def planeSigns(v: Column, nPlanes: Int): Column =
    Shims.column(PlaneSigns(Shims.expression(v), nPlanes))
}
