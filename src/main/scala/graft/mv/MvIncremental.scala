package graft.mv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.graft.Shims

/** True incremental MV refresh — beyond the reference, whose
  * REFRESH ... INCREMENTAL always recomputes in full
  * (MaterializedViewCommands.scala:144-147).
  *
  * A refresh is applied as a delta when ALL of:
  *   - the MV reads exactly one base table, and it is a lake table
  *     (its snapshot history makes "what changed" answerable);
  *   - the base's history since the last refresh is pure `append`
  *     snapshots — upserts/deletes/updates/overwrites retire rows that
  *     are already folded into the backing aggregate, which no
  *     row-level delta can unwind without keyed state;
  *   - the MV is either (a) an aggregate whose outputs all merge
  *     (SUM/COUNT roll up as SUM of partials, MIN/MAX as MIN/MAX;
  *     group-by columns pass through; a bare AVG output does not
  *     merge) or (b) an aggregate-free filter/projection, where the
  *     delta rows simply append.
  *
  * Cost: O(|backing| + |delta|) — at a 100 TB base with a compact
  * rollup MV this is the difference between re-scanning the corpus and
  * touching only the new partition's worth of data. Anything not
  * provably incrementalizable returns None and the caller falls back
  * to the reference's full recompute, so results are always exact.
  */
object MvIncremental {

  private sealed trait Merge
  private case object BySum extends Merge
  private case object ByMin extends Merge
  private case object ByMax extends Merge

  def tryRefresh(spark: SparkSession, meta: MvMeta): Option[MvMeta] =
    try MvCatalog.withRewriteDisabled(attempt(spark, meta))
    catch {
      case _: Exception =>
        // a failed attempt may have left the swap staging table
        // behind — and if the failure hit between DROP and RENAME,
        // the backing table itself is missing: finish the rename
        // (the swap holds the complete merged state) instead of
        // dropping the only surviving copy
        try {
          val swap = s"${meta.backingTable}_swap"
          if (!spark.catalog.tableExists(meta.backingTable) &&
              spark.catalog.tableExists(swap))
            spark.sql(s"ALTER TABLE $swap RENAME TO ${meta.backingTable}")
          else
            spark.sql(s"DROP TABLE IF EXISTS $swap")
        } catch { case _: Exception => () }
        None
    }

  private def attempt(spark: SparkSession, meta: MvMeta): Option[MvMeta] = {
    if (meta.baseSnapshots.size != 1) return None
    val (baseName, startSnap) = meta.baseSnapshots.head

    val mvPlan = spark.sessionState.analyzer.execute(
      spark.sessionState.sqlParser.parsePlan(meta.query))
    val shape = MvPlans.decomposeAgg(mvPlan)
      .orElse(MvPlans.projOnly(mvPlan)).getOrElse(return None)
    if (shape.base != baseName) return None // joins fold into "JOIN[..]"

    val leaf = mvPlan.collectLeaves().collectFirst {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[graft.lake.LakeTable] &&
          r.table.name().toLowerCase == baseName => r
    }.getOrElse(return None)
    val lake = leaf.table.asInstanceOf[graft.lake.LakeTable]
    val head = lake.readSnapshotId.getOrElse(0L)
    val now = System.currentTimeMillis()
    if (head == startSnap) // nothing changed: freshness bump only
      return Some(meta.copy(lastRefreshTs = now,
        lastRefreshMode = "incremental"))

    // pure-append ancestry check, same walk as the incremental batch
    // read (LakeTable.newScanBuilder) but STRICTER: upserts qualify
    // there (their delete files only retire pre-range rows from the
    // reader's view) yet here the retired rows are already inside the
    // backing aggregate, so any non-append operation forces a full
    // recompute.
    val ancestry = lake.meta.ancestorsOf(head)
    if (startSnap != 0L && !ancestry.exists(_.snapshotId == startSnap))
      return None // rollback/rewritten history: floor is gone
    val range = ancestry.filter(_.snapshotId > startSnap)
    if (range.exists(_.operation != "append")) return None

    // classify MV outputs: group columns pass through, SUM/COUNT merge
    // as SUM of partials, MIN/MAX as themselves; anything else bails
    val groupFps = shape.groupBy.map(MvPlans.fp).toSet
    val outNames = shape.output.map(_.name.toLowerCase)
    if (outNames.distinct.size != outNames.size) return None
    val isAgg = shape.groupBy.nonEmpty ||
      shape.output.exists(o => MvPlans.stripAlias(o)
        .isInstanceOf[AggregateExpression])
    val merges: Seq[(String, Option[Merge])] = shape.output.map { o =>
      MvPlans.stripAlias(o) match {
        case g if groupFps.contains(MvPlans.fp(g)) => o.name -> None
        case AggregateExpression(_: Sum, _, false, _, _) => o.name -> Some(BySum)
        case AggregateExpression(_: Count, _, false, _, _) => o.name -> Some(BySum)
        case AggregateExpression(_: Min, _, false, _, _) => o.name -> Some(ByMin)
        case AggregateExpression(_: Max, _, false, _, _) => o.name -> Some(ByMax)
        case _ if !isAgg => o.name -> None // plain projection output
        case _ => return None // AVG, DISTINCT aggs, UDAFs, ...
      }
    }

    // run the MV's defining plan against the append delta only: swap
    // the base leaf for an incremental read bridged back to the
    // original attribute ids (types must still line up — a widening
    // ALTER in range falls back via the dataType check)
    val deltaRel = spark.read
      .option("start-snapshot-id", startSnap.toString)
      .option("end-snapshot-id", head.toString)
      .table(baseName).queryExecution.analyzed
    val byName = deltaRel.output.map(a => a.name.toLowerCase -> a).toMap
    val bridge = Project(leaf.output.map { o =>
      val src = byName.getOrElse(o.name.toLowerCase, return None)
      if (src.dataType != o.dataType) return None
      Alias(src, o.name)(exprId = o.exprId)
    }, deltaRel)
    val deltaPlan = mvPlan.transform {
      case l: LogicalPlan if l eq leaf => bridge
    }
    val delta = Shims.ofRows(spark, deltaPlan)

    val backing = spark.table(meta.backingTable)
    val bSchema = backing.schema
    if (!outNames.forall(n => bSchema.fieldNames.exists(_.equalsIgnoreCase(n))))
      return None
    def typed(n: String) = bSchema.fields
      .find(_.name.equalsIgnoreCase(n)).get.dataType
    val ordered = bSchema.fieldNames.toSeq

    if (isAgg) {
      val groupCols = merges.collect { case (n, None) => n }
      val aggCols = merges.collect { case (n, Some(m)) =>
        val merged = m match {
          case BySum => fsum(col(n))
          case ByMin => fmin(col(n))
          case ByMax => fmax(col(n))
        }
        // re-summing widens decimals; pin every merged column back to
        // the backing schema so repeated refreshes cannot drift types
        merged.cast(typed(n)).as(n)
      }
      val union = backing.unionByName(delta.select(ordered.map(col): _*))
      val merged =
        if (aggCols.isEmpty) union.distinct() // SELECT DISTINCT-style MV
        else union.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      // the merged result reads the backing table, so it cannot
      // overwrite it in place: stage to a swap table, then swap
      val swap = s"${meta.backingTable}_swap"
      merged.select(ordered.map(col): _*)
        .write.mode("overwrite").format(meta.storageFormat).saveAsTable(swap)
      spark.sql(s"DROP TABLE IF EXISTS ${meta.backingTable}")
      spark.sql(s"ALTER TABLE $swap RENAME TO ${meta.backingTable}")
    } else {
      // aggregate-free MV: the delta's MV rows are exactly the new
      // backing rows — append, no rewrite of existing data
      delta.select(ordered.map(n =>
          col(n).cast(typed(n)).as(n)): _*)
        .write.mode("append").format(meta.storageFormat)
        .saveAsTable(meta.backingTable)
    }

    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser
      .parseTableIdentifier(meta.backingTable)
    val tbl = cat.getTableMetadata(ident)
    val rowCount = spark.table(meta.backingTable).count()
    Some(meta.copy(
      lastRefreshTs = now,
      storageLocation = tbl.location.toString,
      rowCount = rowCount,
      sizeInBytes = tbl.stats.map(_.sizeInBytes.toLong).getOrElse(0L),
      baseSnapshots = Map(baseName -> head),
      lastRefreshMode = "incremental"))
  }
}
