package graft.readonly

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, ResolvedTable}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.command._
import org.apache.spark.sql.execution.datasources.{InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Table-level write protection (reference: spark-readonly-plugin
  * ReadOnlyTableCheckRule.scala:51-232): an analyzer check rule that
  * vetoes every write/DDL path against tables carrying the property
  * `hive-ext.readOnly=true` — V2 writes (AppendData /
  * OverwriteByExpression / OverwritePartitionsDynamic /
  * DeleteFromTable / UpdateTable / MergeIntoTable), V2 DDL
  * (AlterTableCommand, DropTable, RenameTable, CommentOnTable), and
  * the surviving V1 command set.
  */
object ReadOnly {
  val Prop = "hive-ext.readOnly"

  def isReadOnly(t: Table): Boolean =
    Option(t.properties().get(Prop)).exists(_.equalsIgnoreCase("true"))

  def isReadOnly(t: CatalogTable): Boolean =
    t.properties.get(Prop).exists(_.equalsIgnoreCase("true"))

  def fail(name: String): Nothing =
    throw new AnalysisException(
      errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
      messageParameters = Map(
        "tableName" -> name,
        "operation" -> s"writes: table is read-only ($Prop=true)"))
}

class ReadOnlyCheckRule(spark: SparkSession) extends (LogicalPlan => Unit) {

  private def tableOf(plan: LogicalPlan): Option[(String, Boolean)] = plan match {
    case SubqueryAlias(_, child) => tableOf(child)
    case r: DataSourceV2Relation =>
      // row-level plans wrap the target in RowLevelOperationTable,
      // which does not delegate properties() — unwrap it
      val t = org.apache.spark.sql.graft.Shims.unwrapRowLevelTable(r.table)
      Some((t.name(), ReadOnly.isReadOnly(t)))
    case r: ResolvedIdentifier =>
      r.catalog match {
        case tc: org.apache.spark.sql.connector.catalog.TableCatalog =>
          try {
            val t = tc.loadTable(r.identifier)
            Some((t.name(), ReadOnly.isReadOnly(t)))
          } catch { case _: Exception => None }
        case _ => None
      }
    case r: ResolvedTable =>
      Some((r.name, ReadOnly.isReadOnly(r.table)))
    case l: LogicalRelation =>
      l.catalogTable.map(t => (t.identifier.unquotedString, ReadOnly.isReadOnly(t)))
    case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
      Some((h.tableMeta.identifier.unquotedString, ReadOnly.isReadOnly(h.tableMeta)))
    case _ => None
  }

  private def check(target: LogicalPlan): Unit =
    tableOf(target).foreach { case (name, ro) => if (ro) ReadOnly.fail(name) }

  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    // V2 write paths (reference :59-71)
    case a: AppendData => check(a.table)
    case o: OverwriteByExpression => check(o.table)
    case o: OverwritePartitionsDynamic => check(o.table)
    case d: DeleteFromTable => check(d.table)
    case u: UpdateTable => check(u.table)
    case m: MergeIntoTable => check(m.targetTable)
    case r: ReplaceData => check(r.table)
    // V2 DDL (reference :73-81)
    case a: AlterTableCommand => check(a.table)
    case d: DropTable => check(d.child)
    case r: RenameTable if !r.isView => check(r.child)
    case c: CommentOnTable => check(c.child)
    case t: TruncateTable => check(t.table)
    // V1 commands (reference :83-124)
    case i: InsertIntoHadoopFsRelationCommand =>
      i.catalogTable.foreach(t =>
        if (ReadOnly.isReadOnly(t)) ReadOnly.fail(t.identifier.unquotedString))
    case i: InsertIntoStatement => check(i.table)
    case a: AlterTableAddColumnsCommand => checkV1(a.table.unquotedString)
    case a: AlterTableRenameCommand => checkV1(a.oldName.unquotedString)
    case a: AlterTableSetPropertiesCommand => checkV1(a.tableName.unquotedString)
    case a: AlterTableUnsetPropertiesCommand => checkV1(a.tableName.unquotedString)
    case d: DropTableCommand => checkV1(d.tableName.unquotedString)
    case t: TruncateTableCommand => checkV1(t.tableName.unquotedString)
    case _ => ()
  }

  private def checkV1(name: String): Unit = {
    val cat = spark.sessionState.catalog
    try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
      if (cat.tableExists(ident) && ReadOnly.isReadOnly(cat.getTableMetadata(ident)))
        ReadOnly.fail(name)
    } catch { case _: AnalysisException => () case _: Exception => () }
  }
}

/** `.withExtensions(new ReadOnlyExtensions)` or
  * `spark.sql.extensions=graft.readonly.ReadOnlyExtensions`. */
class ReadOnlyExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectCheckRule(session => new ReadOnlyCheckRule(session))
}
