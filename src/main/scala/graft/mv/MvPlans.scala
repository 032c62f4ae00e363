package graft.mv

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._

/** Structural decomposition of Filter?/Project?/Join/Aggregate plans
  * over base relations, shared by the transparent rewrite
  * ([[MvRewriteRule]]) and the incremental refresher
  * ([[MvIncremental]]). Matching is fingerprint-based (lowercased SQL
  * with attribute names normalized), mirroring the reference's
  * lowercase-name matching (AggregateRewriter.scala:102-103).
  */
private[mv] object MvPlans {

  /** Lowercased, attribute-normalized SQL of an expression — the
    * cross-plan matching key. */
  def fp(e: Expression): String = {
    val norm = e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name.toLowerCase))
    }
    norm.sql.toLowerCase
  }

  /** Read options that change WHICH rows a scan of the same table
    * name returns; a relation carrying any of them must never
    * fingerprint-match a current-state MV base. */
  private val ScanAffectingOptions = Seq("snapshot-id", "as-of-timestamp",
    "branch", "tag", "start-snapshot-id", "end-snapshot-id")

  def relationName(plan: LogicalPlan): Option[String] = plan match {
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      // a pinned (time-travel/tag) or branch-routed lake table and a
      // current-state read share a NAME but not a row set — suffix the
      // fingerprint so the MV rewrite can never serve current backing
      // data to a historical query (and vice versa)
      val pin = r.table match {
        case lt: graft.lake.LakeTable =>
          lt.pinnedSnapshot.map(v => s"@v$v").getOrElse("") +
            (if (lt.ref != "main") s"@ref=${lt.ref}" else "")
        case _ => ""
      }
      val opts = ScanAffectingOptions
        .flatMap(k => Option(r.options.get(k)).map(v => s"$k=$v"))
      val optFp = if (opts.isEmpty) "" else opts.mkString("@opts[", ",", "]")
      Some(r.table.name().toLowerCase + pin + optFp)
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      r.catalogTable.map(_.identifier.unquotedString.toLowerCase)
    case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
      Some(h.tableMeta.identifier.unquotedString.toLowerCase)
    case _ => None
  }

  /** (base fingerprint, predicates) of a Filter?/Project?/join tree
    * over relations; None if the shape is unsupported. The base
    * fingerprint folds relation names and inner-join condition
    * fingerprints, so single-table and join queries share one path
    * (JoinRewriter's tree compare, JoinRewriter.scala:227-254). */
  def decomposeBase(plan: LogicalPlan): Option[(String, Seq[Expression])] =
    plan match {
      case SubqueryAlias(_, child) => decomposeBase(child)
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        decomposeBase(child)
      case Filter(cond, child) =>
        decomposeBase(child).map { case (b, preds) =>
          (b, preds ++ splitConjunctivePredicates(cond))
        }
      case Join(l, r, Inner, cond, _) =>
        for ((lb, lp) <- decomposeBase(l); (rb, rp) <- decomposeBase(r)) yield {
          val condFp = cond.toSeq.flatMap(splitConjunctivePredicates)
            .map(fp).sorted.mkString("&")
          (Seq(lb, rb).sorted.mkString("JOIN[", "|", s"]($condFp)"), lp ++ rp)
        }
      case leaf =>
        relationName(leaf).map(n => (n, Nil))
    }

  def splitConjunctivePredicates(cond: Expression): Seq[Expression] =
    cond match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  case class AggShape(base: String, preds: Seq[Expression],
      groupBy: Seq[Expression], output: Seq[NamedExpression])

  def decomposeAgg(plan: LogicalPlan): Option[AggShape] = plan match {
    case Aggregate(ge, ae, child, _) =>
      decomposeBase(child).map { case (b, preds) => AggShape(b, preds, ge, ae) }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      // column-pruning projection over an aggregate
      decomposeAgg(child).map { shape =>
        val names = exprs.map(_.name.toLowerCase).toSet
        shape.copy(output = shape.output.filter(o => names(o.name.toLowerCase)))
      }
    case _ => None
  }

  /** Plain Project+Filter over the base (simple join rewrite /
    * column-subset projection) modeled as an aggregate-free shape. */
  def projOnly(plan: LogicalPlan): Option[AggShape] = plan match {
    case Project(exprs, child) =>
      decomposeBase(child).map { case (b, preds) =>
        AggShape(b, preds, Nil, exprs)
      }
    case _ => decomposeBase(plan).collect {
      case (b, preds) if plan.output.nonEmpty =>
        AggShape(b, preds, Nil, plan.output)
    }
  }

  def stripAlias(e: Expression): Expression = e match {
    case Alias(child, _) => stripAlias(child)
    case other => other
  }
}
