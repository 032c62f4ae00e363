package graft.lake

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, WriteBuilder}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) DELETE / UPDATE / MERGE
  * (SURVEY.md §2.B rows 1342-1500; §7.4.1).
  *
  * Spark 4 plans these natively over [[RowLevelOperation]]: it reads
  * the target through `newScanBuilder`, computes the surviving /
  * updated / merged rows (incl. multi-WHEN MERGE and NOT MATCHED BY
  * SOURCE), and writes the full replacement through
  * `newWriteBuilder` — the engine only commits staged files as a
  * whole-snapshot replacement.
  *
  * Correctness with file pruning: the only filter Spark pushes into a
  * row-level scan is the DELETE survival predicate, so a pruned-out
  * file is exactly one whose rows are all deleted — dropping it via
  * the replace commit is the intended result. Targeted DELETEs take
  * the cheaper [[org.apache.spark.sql.connector.catalog.SupportsDeleteV2]]
  * file-granular path instead (see LakeTable.deleteWhere).
  */
class LakeRowLevelOperation(table: LakeTable, info: RowLevelOperationInfo)
  extends RowLevelOperation {

  // files planned by the scan = the groups being replaced; recorded at
  // scan build time (planning), consumed by the write commit.
  @volatile private var scanned: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = info.command()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(table, table.readSnapshotId, options,
      rowLevel = true, onBuild = fs => scanned = Some(fs.map(_.path)))

  override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder = {
    new WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new LakeWrite(table, winfo, "rewrite", Array.empty,
          operationOverride = Some(info.command().toString.toLowerCase),
          replacedFiles = () => scanned)
    }
  }
}
