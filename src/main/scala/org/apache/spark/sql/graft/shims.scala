package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Thin accessor for `private[sql]` Spark helpers the engine builds
  * on (v2 Predicate -> v1 Filter translation). Lives under the spark
  * package solely for visibility — no Spark code is modified.
  */
object Shims {
  def predicateToV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)

  /** Wrap a raw Catalyst expression as a user-facing Column (the
    * Spark-4 replacement for the removed `new Column(expr)`). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a classic Column. */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Clone the session with the vectorized parquet reader disabled
    * (cloneSession is private[sql]) — used by the position-delete
    * scan, whose row-order bookkeeping needs the row-based reader. */
  def cloneSessionRowBasedParquet(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.classic.SparkSession = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    s.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    s
  }

  /** Column-name NamedReference (FieldReference is private[sql]). */
  def columnRef(name: String): org.apache.spark.sql.connector.expressions.NamedReference =
    org.apache.spark.sql.connector.expressions.FieldReference.column(name)

  /** Catalyst expression -> v1 source Filter (the method is
    * protected[sql] on DataSourceStrategy). */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** DataFrame over a hand-built logical plan (Dataset.ofRows is
    * private[sql]) — used by the incremental MV refresher to run the
    * MV's defining plan against a substituted delta relation. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unwrap the private[sql] RowLevelOperationTable wrapper that
    * group-based DELETE/UPDATE/MERGE plans put around the target. */
  def unwrapRowLevelTable(t: org.apache.spark.sql.connector.catalog.Table): org.apache.spark.sql.connector.catalog.Table =
    t match {
      case rl: org.apache.spark.sql.connector.write.RowLevelOperationTable => rl.table
      case other => other
    }
}
