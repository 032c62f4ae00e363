package graft.mv

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** MV lifecycle commands (reference: MaterializedViewCommands.scala).
  * Each runs the defining query with rewriting disabled, materializes
  * into a parquet backing table `mv_backing_<name>`, and registers
  * catalog metadata (rowCount / sizeInBytes harvested post-write).
  */
object MvCommands {
  def backingName(mv: String): String = s"mv_backing_${mv.toLowerCase}"

  private[mv] def materialize(spark: SparkSession, name: String,
      query: String): MvMeta = {
    val backing = backingName(name)
    val (baseTables, baseSnapshots) = MvCatalog.withRewriteDisabled {
      val df = spark.sql(query)
      df.write.mode("overwrite").format("parquet").saveAsTable(backing)
      val leaves = df.queryExecution.analyzed.collectLeaves()
      val tables = leaves.flatMap {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          Some(r.table.name().toLowerCase)
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.unquotedString.toLowerCase)
        case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
          Some(h.tableMeta.identifier.unquotedString.toLowerCase)
        case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
          Some(l.nodeName.toLowerCase)
      }.toSet
      // snapshot floor per lake base table: what the backing table
      // reflects as of this materialization (0 = empty table — the
      // incremental read accepts 0 as "from the beginning")
      val snaps = leaves.flatMap {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.table match {
            case lt: graft.lake.LakeTable =>
              Some(lt.name().toLowerCase -> lt.readSnapshotId.getOrElse(0L))
            case _ => None
          }
        case _ => None
      }.toMap
      (tables, snaps)
    }
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(backing)
    val tbl = cat.getTableMetadata(ident)
    val rowCount = MvCatalog.withRewriteDisabled(spark.table(backing).count())
    val now = System.currentTimeMillis()
    MvMeta(name, query, backing, now, now,
      tbl.provider.getOrElse("parquet"),
      tbl.location.toString, rowCount,
      tbl.stats.map(_.sizeInBytes.toLong).getOrElse(0L),
      baseTables, baseSnapshots)
  }
}

case class CreateMaterializedViewCommand(name: String, query: String,
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (MvCatalog.get(name).isDefined) {
      if (ifNotExists) return Nil
      throw new IllegalStateException(s"materialized view $name already exists")
    }
    MvCatalog.register(MvCommands.materialize(spark, name, query))
    Nil
  }
}

case class DropMaterializedViewCommand(name: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MvCatalog.drop(name) match {
      case Some(meta) =>
        spark.sql(s"DROP TABLE IF EXISTS ${meta.backingTable}")
      case None if !ifExists =>
        throw new IllegalStateException(s"materialized view $name does not exist")
      case None => ()
    }
    Nil
  }
}

/** REFRESH [INCREMENTAL]. The reference accepts INCREMENTAL but always
  * recomputes in full (MaterializedViewCommands.scala:144-177); this
  * engine goes further: when the MV is a mergeable aggregate or a
  * filter/projection over a SINGLE lake table whose history since the
  * last refresh is pure appends, the refresh applies only the delta —
  * O(|backing| + |delta|) instead of O(|base|) — see [[MvIncremental]].
  * Anything not provably incrementalizable (joins, AVG-only outputs,
  * deletes/updates/upserts in range, non-lake bases) falls back to the
  * reference's full recompute, so results are always exact. */
case class RefreshMaterializedViewCommand(name: String, incremental: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val meta = MvCatalog.get(name).getOrElse(
      throw new IllegalStateException(s"materialized view $name does not exist"))
    val viaDelta =
      if (incremental) MvIncremental.tryRefresh(spark, meta) else None
    MvCatalog.register(viaDelta.getOrElse(
      MvCommands.materialize(spark, name, meta.query)
        .copy(createdTs = meta.createdTs, lastRefreshMode = "full")))
    Nil
  }
}

case class ShowMaterializedViewsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType)(),
    AttributeReference("query", StringType)(),
    AttributeReference("backing_table", StringType)(),
    AttributeReference("created_at", TimestampType)(),
    AttributeReference("last_refreshed_at", TimestampType)(),
    AttributeReference("storage_format", StringType)(),
    AttributeReference("row_count", LongType)(),
    AttributeReference("size_in_bytes", LongType)())

  override def run(spark: SparkSession): Seq[Row] =
    MvCatalog.list().map(m => Row(m.name, m.query, m.backingTable,
      new java.sql.Timestamp(m.createdTs), new java.sql.Timestamp(m.lastRefreshTs),
      m.storageFormat, m.rowCount, m.sizeInBytes))
}
