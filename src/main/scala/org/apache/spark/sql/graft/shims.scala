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
}
