package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable

/** Merge-on-read position deletes (SURVEY §4.3 follow-up; reference:
  * docs/spark-procedures.md:514-575, iceberg_it.py:2274-2294).
  *
  * A position-delete file is a parquet file of
  * `(file_path string, pos long)` sorted by both columns — the same
  * shape as Iceberg's position deletes. `file_path` is stored in
  * NORMALIZED form (schemeless absolute path) so matching is immune to
  * the `file:///x` vs `file:/x` spelling differences between Spark's
  * `_metadata.file_path` and Hadoop listings.
  *
  * Delete files are written by a distributed Spark job at DELETE time
  * (LakeWriteUtil.deleteWhere) and read on the driver here — a delete
  * file is manifest-scale metadata, far smaller than the data it
  * masks, and immutable, so reads are cached process-wide.
  */
object PosDeletes {

  val DeleteSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))

  private val cache = new ConcurrentHashMap[String, Map[String, Array[Long]]]()

  /** Normalize any path spelling to a schemeless absolute path. */
  def norm(p: String): String = new Path(p).toUri.getPath

  /** Positions deleted per (normalized) data-file path, merged over
    * `deleteFiles`. Arrays are sorted ascending. */
  def deletedMap(deleteFiles: Seq[DataFileMeta],
      conf: Configuration): Map[String, Array[Long]] = {
    if (deleteFiles.isEmpty) return Map.empty
    val merged = mutable.Map[String, mutable.ArrayBuffer[Long]]()
    for (df <- deleteFiles; (file, ps) <- readPairs(df.path, conf))
      merged.getOrElseUpdate(file, mutable.ArrayBuffer.empty) ++= ps
    merged.map { case (f, ps) => f -> ps.toArray.sorted.distinct }.toMap
  }

  private def readPairs(path: String, conf: Configuration): Map[String, Array[Long]] = {
    val cached = cache.get(path)
    if (cached != null) return cached
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new Path(path)).withConf(conf).build()
    val acc = mutable.Map[String, mutable.ArrayBuffer[Long]]()
    try {
      var g = reader.read()
      while (g != null) {
        acc.getOrElseUpdate(g.getString("file_path", 0),
          mutable.ArrayBuffer.empty) += g.getLong("pos", 0)
        g = reader.read()
      }
    } finally reader.close()
    val out = acc.map { case (f, ps) => f -> ps.toArray }.toMap
    if (cache.size > 64) cache.clear()
    cache.put(path, out)
    out
  }
}
