package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Commit log: one immutable `metadata/v{N}.json` per commit plus a
  * `version-hint.text` pointer, committed by create-if-absent — the
  * single-writer rename-swap protocol (SURVEY.md §7.4.7). Uses the
  * Hadoop FileSystem API so the same code path works on HDFS/S3A in
  * a cluster deployment, not just local files.
  */
object MetadataLog {
  implicit private val fmts: Formats = DefaultFormats

  private def metaDir(location: String) = new Path(location, "metadata")
  private def hintFile(location: String) = new Path(metaDir(location), "version-hint.text")
  private def versionFile(location: String, v: Int) = new Path(metaDir(location), f"v$v%05d.json")

  def fs(location: String, conf: Configuration): FileSystem =
    new Path(location).getFileSystem(conf)

  def exists(location: String, conf: Configuration): Boolean =
    fs(location, conf).exists(hintFile(location))

  def currentVersion(location: String, conf: Configuration): Int = {
    val f = fs(location, conf)
    val in = new BufferedReader(new InputStreamReader(f.open(hintFile(location)), StandardCharsets.UTF_8))
    try in.readLine().trim.toInt finally in.close()
  }

  def load(location: String, conf: Configuration): TableMeta =
    loadVersion(location, currentVersion(location, conf), conf)

  def loadVersion(location: String, v: Int, conf: Configuration): TableMeta = {
    val f = fs(location, conf)
    val in = f.open(versionFile(location, v))
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      Serialization.read[TableMeta](new String(bytes, StandardCharsets.UTF_8))
    } finally in.close()
  }

  def metadataFiles(location: String, conf: Configuration): Seq[(Int, String, Long)] = {
    val f = fs(location, conf)
    if (!f.exists(metaDir(location))) return Nil
    f.listStatus(metaDir(location)).toSeq
      .filter(s => s.getPath.getName.matches("v\\d+\\.json"))
      .map(s => (s.getPath.getName.stripPrefix("v").stripSuffix(".json").toInt,
        s.getPath.toString, s.getModificationTime))
      .sortBy(_._1)
  }

  /** Commit: write v{N+1}.json with create-if-absent (optimistic lock),
    * then repoint the hint. Retries are the caller's concern. */
  def commit(meta: TableMeta, conf: Configuration): TableMeta = {
    val onDisk =
      if (exists(meta.location, conf)) currentVersion(meta.location, conf) else 0
    val next = meta.copy(version = math.max(meta.version, onDisk) + 1)
    val f = fs(meta.location, conf)
    f.mkdirs(metaDir(meta.location))
    val vf = versionFile(meta.location, next.version)
    val out = f.create(vf, false) // fails if a concurrent writer won
    try out.write(Serialization.write(next).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val hint = f.create(hintFile(meta.location), true)
    try hint.write(next.version.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    next
  }

  def dropTableDir(location: String, conf: Configuration): Unit = {
    val f = fs(location, conf)
    if (f.exists(new Path(location))) f.delete(new Path(location), true)
  }
}
