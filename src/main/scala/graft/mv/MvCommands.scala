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
    val baseTables = MvCatalog.withRewriteDisabled {
      val df = spark.sql(query)
      df.write.mode("overwrite").format("parquet").saveAsTable(backing)
      df.queryExecution.analyzed.collectLeaves().flatMap {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          Some(r.table.name().toLowerCase)
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.unquotedString.toLowerCase)
        case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
          Some(h.tableMeta.identifier.unquotedString.toLowerCase)
        case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
          Some(l.nodeName.toLowerCase)
      }.toSet
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
      baseTables)
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

/** Full refresh; INCREMENTAL is accepted but falls back to a full
  * recompute, matching the reference
  * (MaterializedViewCommands.scala:144-177). */
case class RefreshMaterializedViewCommand(name: String, incremental: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val meta = MvCatalog.get(name).getOrElse(
      throw new IllegalStateException(s"materialized view $name does not exist"))
    MvCatalog.register(MvCommands.materialize(spark, name, meta.query)
      .copy(createdTs = meta.createdTs))
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
