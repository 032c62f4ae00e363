package graft.readonly

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, ResolvedNamespace, ResolvedTable}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, HiveTableRelation}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.command._
import org.apache.spark.sql.execution.datasources.{InsertIntoDataSourceCommand, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Table-level write protection (reference: spark-readonly-plugin
  * ReadOnlyTableCheckRule.scala:51-232): an analyzer check rule that
  * vetoes every write/DDL path against tables carrying the property
  * `hive-ext.readOnly=true` —
  *  - V2 data writes: AppendData / OverwriteByExpression /
  *    OverwritePartitionsDynamic / DeleteFromTable / UpdateTable /
  *    MergeIntoTable / ReplaceData,
  *  - V2 DDL: AlterTableCommand, DropTable, RenameTable,
  *    CommentOnTable, TruncateTable,
  *  - V1 data writes: Hadoop-FS / DataSource / Hive inserts,
  *  - V1 DDL: column, partition, property, location, serde ALTERs,
  *    DROP / TRUNCATE / REPAIR TABLE, LOAD DATA,
  *  - V1 statistics: ANALYZE TABLE [COLUMNS | PARTITION],
  *  - DROP DATABASE CASCADE when any contained table is read-only.
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
    case h: HiveTableRelation =>
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
    // (CommentOnTable is an AlterTableCommand in Spark 4 — already covered)
    case t: TruncateTable => check(t.table)
    // V1 data writes (reference :83-95)
    case i: InsertIntoHadoopFsRelationCommand =>
      i.catalogTable.foreach(checkCatalogTable)
    case i: InsertIntoDataSourceCommand =>
      i.logicalRelation.catalogTable.foreach(checkCatalogTable)
    case i: InsertIntoStatement => check(i.table)
    // InsertIntoHiveTable lives in spark-hive; matching by class name
    // avoids the compile-time dependency (reference :91-95). The write
    // TARGET is the command's `table: CatalogTable` field — its
    // children are the SOURCE query. (The reference plugin checks
    // children, which vetoes reads FROM a read-only table instead of
    // writes INTO one; correctness is preferred over parity here.)
    case n if n.getClass.getName
        == "org.apache.spark.sql.hive.execution.InsertIntoHiveTable" =>
      try n.getClass.getMethod("table").invoke(n) match {
        case t: CatalogTable => checkCatalogTable(t)
        case _ => ()
      } catch { case _: ReflectiveOperationException => () }
    // V1 DDL (reference :97-124)
    case a: AlterTableAddColumnsCommand => checkV1(a.table)
    case a: AlterTableChangeColumnCommand => checkV1(a.tableName)
    case a: AlterTableAddPartitionCommand => checkV1(a.tableName)
    case a: AlterTableDropPartitionCommand => checkV1(a.tableName)
    case a: AlterTableRenamePartitionCommand => checkV1(a.tableName)
    case a: AlterTableRenameCommand => checkV1(a.oldName)
    case a: AlterTableSetPropertiesCommand => checkV1(a.tableName)
    case a: AlterTableUnsetPropertiesCommand => checkV1(a.tableName)
    case a: AlterTableSetLocationCommand => checkV1(a.tableName)
    case a: AlterTableSerDePropertiesCommand => checkV1(a.tableName)
    case d: DropTableCommand => checkV1(d.tableName)
    case t: TruncateTableCommand => checkV1(t.tableName)
    case r: RepairTableCommand => checkV1(r.tableName)
    case l: LoadDataCommand => checkV1(l.table)
    // V1 statistics (reference :126-133)
    case a: AnalyzeTableCommand => checkV1(a.tableIdent)
    case a: AnalyzeColumnCommand => checkV1(a.tableIdent)
    case a: AnalyzePartitionCommand => checkV1(a.tableIdent)
    // DROP DATABASE CASCADE would take read-only tables with it
    // (reference :135-145)
    case d: DropDatabaseCommand if d.cascade => checkDatabase(d.databaseName)
    case d: DropNamespace if d.cascade =>
      d.namespace match {
        case ResolvedNamespace(_, ns, _) if ns.nonEmpty => checkDatabase(ns.head)
        case _ => ()
      }
    case _ => ()
  }

  private def checkCatalogTable(t: CatalogTable): Unit =
    if (ReadOnly.isReadOnly(t)) ReadOnly.fail(t.identifier.unquotedString)

  // decide INSIDE the try, fail OUTSIDE it: metadata lookups on a
  // half-resolved identifier may legitimately throw (skip the check),
  // but our own veto must not be swallowed with them
  private def checkV1(ident: TableIdentifier): Unit = {
    val cat = spark.sessionState.catalog
    val ro =
      try cat.tableExists(ident) && ReadOnly.isReadOnly(cat.getTableMetadata(ident))
      catch { case _: Exception => false }
    if (ro) ReadOnly.fail(ident.unquotedString)
  }

  private def checkDatabase(db: String): Unit = {
    val cat = spark.sessionState.catalog
    val ro =
      try {
        if (!cat.databaseExists(db)) None
        else cat.listTables(db).find { t =>
          try cat.tableExists(t) && ReadOnly.isReadOnly(cat.getTableMetadata(t))
          catch { case _: Exception => false }
        }
      } catch { case _: Exception => None }
    ro.foreach(t => ReadOnly.fail(t.unquotedString))
  }
}

/** `.withExtensions(new ReadOnlyExtensions)` or
  * `spark.sql.extensions=graft.readonly.ReadOnlyExtensions`. */
class ReadOnlyExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectCheckRule(session => new ReadOnlyCheckRule(session))
}
