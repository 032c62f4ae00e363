package graft.mv

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.Origin
import org.apache.spark.sql.errors.QueryParsingErrors
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating parser for MV DDL (reference:
  * MaterializedViewParser.scala:24-98 — same prefix-dispatch design:
  * the five MV statements are recognized up front, everything else
  * goes to the stock parser untouched).
  */
class MvParser(delegate: ParserInterface) extends ParserInterface {

  private val create =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w`.]+)\s+AS\s+(.+)""".r
  private val drop =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w`.]+)\s*""".r
  private val refresh =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w`.]+)(\s+INCREMENTAL)?\s*""".r
  private val show =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*""".r

  private def clean(name: String): String = name.replace("`", "")

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case create(ifNot, name, query) =>
      CreateMaterializedViewCommand(clean(name), query.trim, ifNot != null)
    case drop(ifEx, name) =>
      DropMaterializedViewCommand(clean(name), ifEx != null)
    case refresh(name, inc) =>
      RefreshMaterializedViewCommand(clean(name), inc != null)
    case show() => ShowMaterializedViewsCommand()
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}
