package graft.mv

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Materialized-view metadata + thread-safe in-memory catalog
  * (reference: spark-mv-plugin MaterializedViewCatalog.scala:19-75 —
  * same design: defining SQL + physical backing table + freshness/
  * storage stats; in-memory per reference, metastore persistence is
  * future work).
  */
final case class MvMeta(
    name: String,
    query: String,
    backingTable: String,
    createdTs: Long,
    lastRefreshTs: Long,
    storageFormat: String,
    storageLocation: String,
    rowCount: Long,
    sizeInBytes: Long,
    baseTables: Set[String] = Set.empty, // lowercased relation names
    // lowercased lake-table name -> snapshot id the backing table
    // reflects; the delta floor for REFRESH ... INCREMENTAL
    baseSnapshots: Map[String, Long] = Map.empty,
    // how the last refresh ran: "full" | "incremental" — observability
    // for specs and SHOW-level diagnostics
    lastRefreshMode: String = "full")

object MvCatalog {
  private val views = new ConcurrentHashMap[String, MvMeta]()

  def register(meta: MvMeta): Unit = {
    views.put(meta.name.toLowerCase, meta)
    analyzedCache.clear()
  }

  /** Analyzed-plan cache for MV definition texts — re-analyzing the
    * defining query on every candidate plan would dominate analysis
    * time once an MV is registered. Invalidated on register/drop. */
  private val analyzedCache =
    new ConcurrentHashMap[String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()
  def cachedPlan(key: String,
      f: => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    analyzedCache.computeIfAbsent(key, _ => f)
  def get(name: String): Option[MvMeta] = Option(views.get(name.toLowerCase))
  def drop(name: String): Option[MvMeta] = {
    analyzedCache.clear()
    Option(views.remove(name.toLowerCase))
  }
  def list(): Seq[MvMeta] = views.values().asScala.toSeq.sortBy(_.name)
  def clear(): Unit = views.clear()

  /** Re-entrancy guard: MV definition queries must not themselves be
    * rewritten (reference: MaterializedViewOptimizationRule.scala:86-90). */
  private val disabled = ThreadLocal.withInitial[Boolean](() => false)
  def isRewriteDisabled: Boolean = disabled.get()
  def withRewriteDisabled[T](f: => T): T = {
    val prev = disabled.get()
    disabled.set(true)
    try f finally disabled.set(prev)
  }
}
