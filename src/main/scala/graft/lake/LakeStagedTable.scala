package graft.lake

import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** Atomic CTAS/RTAS (SURVEY.md §2.A CTAS/RTAS; iceberg_it.py:298-333,
  * 1374-1398). The table metadata is kept in memory while the query
  * writes; `commitStagedChanges` publishes the single metadata file,
  * so a failed query leaves no half-created table behind.
  */
class LakeStagedTable(catalog: LakeCatalog, ident: Identifier,
    base: TableMeta, isReplace: Boolean)
  extends StagedTable with SupportsWrite {

  // metadata committed up-front so the write path can load it; on
  // abort we roll the directory back (create) or restore (replace).
  private val preVersion: Option[Int] =
    if (MetadataLog.exists(base.location, catalog.hadoopConf))
      Some(MetadataLog.currentVersion(base.location, catalog.hadoopConf))
    else None

  private val inner = new LakeTable(catalog,
    ident, catalog.commitMeta(base), None, "main")

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): util.Map[String, String] = inner.properties()
  override def capabilities(): util.Set[TableCapability] = inner.capabilities()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsOverwrite
      with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS plans a truncate/overwrite against the staged table; the
      // staged write is a whole-table replace either way.
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = this
      override def overwriteDynamicPartitions(): WriteBuilder = this
      override def truncate(): WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new LakeWrite(inner, info,
          if (isReplace) "rewrite" else "append", Array.empty,
          // RTAS records "overwrite", NOT "replace": "replace" is the
          // row-preserving rewrite marker (compaction, delete-format
          // conversion) that changelog mask-handling and the streaming
          // CDC source SKIP — an RTAS replaces every row, and naming
          // it "replace" made a continuous CDC consumer silently drop
          // the whole-table replacement (ChangesTable.scala
          // skipRowPreserving)
          operationOverride = Some(if (isReplace) "overwrite" else "append"))
    }

  override def commitStagedChanges(): Unit = () // write commit did it

  override def abortStagedChanges(): Unit = preVersion match {
    case None => MetadataLog.dropTableDir(base.location, catalog.hadoopConf)
    case Some(v) =>
      // restore the pre-stage content as a NEW version on top of the
      // current head (commit() only ever writes base.version + 1);
      // retried so a concurrent commit can't strand the restore
      val old = MetadataLog.loadVersion(base.location, v, catalog.hadoopConf)
      catalog.commitRetrying(ident)(fresh => old.copy(version = fresh.version))
  }
}
