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

  /** Resolve the current version. The hint file is only a pointer —
    * if it is missing or caught mid-replace (empty), fall back to the
    * max version present in the directory listing, so readers never
    * fail on a concurrent commit's hint swap. */
  def currentVersion(location: String, conf: Configuration): Int = {
    val f = fs(location, conf)
    val hinted =
      try {
        val in = new BufferedReader(new InputStreamReader(
          f.open(hintFile(location)), StandardCharsets.UTF_8))
        try Option(in.readLine()).map(_.trim).filter(_.nonEmpty).map(_.toInt)
        finally in.close()
      } catch { case _: java.io.IOException => None }
    hinted.getOrElse {
      val listed = metadataFiles(location, conf)
      if (listed.isEmpty) throw new java.io.FileNotFoundException(
        s"no metadata versions under $location")
      listed.last._1
    }
  }

  def load(location: String, conf: Configuration): TableMeta =
    loadVersion(location, currentVersion(location, conf), conf)

  def loadVersion(location: String, v: Int, conf: Configuration): TableMeta = {
    val f = fs(location, conf)
    val in = f.open(versionFile(location, v))
    val parsed =
      try {
        val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        Serialization.read[TableMeta](new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    // hydrate spilled manifests so in-memory SnapshotMeta.files is
    // always authoritative
    parsed.copy(snapshots = parsed.snapshots.map(Manifests.hydrate(_, conf)))
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

  /** Commit: write v{base+1}.json with create-if-absent (optimistic
    * lock), then repoint the hint. The version is derived from the
    * CALLER's base metadata only — if another commit landed after the
    * caller loaded, the create collides and the conflict surfaces as
    * ConcurrentModificationException (the caller reloads and
    * reapplies) instead of silently erasing the concurrent commit's
    * snapshots by skipping past it. */
  def commit(meta: TableMeta, conf: Configuration): TableMeta = {
    // Spill oversized manifests to parquet; the JSON gets the slim
    // form (pointers), the CALLER gets back the hydrated form (full
    // file lists + pointers) so in-memory reads never dehydrate.
    // Spill dirs a re-spill stops referencing are NOT deleted here —
    // not even after the CAS wins: an already-loaded reader holds an
    // unforced LazyManifestFiles pointer into the old dir, and an
    // inline delete would break that reader's first file-list access
    // at an unbounded later time. remove_orphan_files' age-guarded
    // stranded-spill sweep reclaims them.
    val spilled = meta.snapshots.map { s =>
      val slim = Manifests.slim(meta, s, conf)
      (slim, s.copy(manifestPath = slim.manifestPath),
        // fresh spill written by THIS attempt — garbage if the CAS
        // loses (the retry re-spills from the reloaded metadata);
        // nobody can have loaded it, so inline deletion is safe
        slim.manifestPath.filterNot(s.manifestPath.contains))
    }
    val freshDirs = spilled.flatMap(_._3)
    val next = meta.copy(snapshots = spilled.map(_._1),
      version = meta.version + 1)
    val f = fs(meta.location, conf)
    f.mkdirs(metaDir(meta.location))
    val vf = versionFile(meta.location, next.version)
    val out =
      try f.create(vf, false) // fails if a concurrent writer won
      catch {
        case e: java.io.IOException if f.exists(vf) =>
          Manifests.drop(freshDirs, conf)
          throw new java.util.ConcurrentModificationException(
            s"concurrent commit to ${meta.location}: v${next.version} " +
              s"already exists (base version ${meta.version} is stale); " +
              "reload the table metadata and reapply", e)
      }
    try out.write(Serialization.write(next).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Repoint the hint via write-temp + atomic rename so concurrent
    // readers never observe a truncated/empty hint file.
    val tmp = new Path(metaDir(meta.location),
      s".version-hint.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val hint = f.create(tmp, true)
    try hint.write(next.version.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
      fc.rename(tmp, hintFile(meta.location),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: Exception => // fallback: non-atomic replace; readers
        f.delete(hintFile(meta.location), false) // fall back to listing
        f.rename(tmp, hintFile(meta.location))
    }
    retireOldVersions(next, conf)
    next.copy(snapshots = spilled.map(_._2))
  }

  /** Metadata-log retention (`write.metadata.delete-after-commit.
    * enabled` + `write.metadata.previous-versions-max`, default 100 —
    * Iceberg's own knobs): at one commit per minute a year-old table
    * carries half a million version files, so the committer — and only
    * the committer, only after its CAS has won and the hint points at
    * the new version — prunes versions older than the retained window.
    * Snapshots and time travel are unaffected (the current JSON carries
    * the whole snapshot DAG); only the `metadata_log_entries` history
    * and the crash-fallback listing narrow to the window. Deletes are
    * best-effort: a failure strands a version file for the next commit
    * to retry, never fails the commit. */
  private def retireOldVersions(next: TableMeta, conf: Configuration): Unit = {
    if (!next.properties.get("write.metadata.delete-after-commit.enabled")
        .contains("true")) return
    val maxPrev = next.properties.get("write.metadata.previous-versions-max")
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ >= 0)
      .getOrElse(100)
    val cutoff = next.version - maxPrev
    if (cutoff <= 0) return
    val f = fs(next.location, conf)
    metadataFiles(next.location, conf)
      .filter(_._1 < cutoff)
      .foreach { case (_, p, _) =>
        scala.util.Try(f.delete(new Path(p), false))
      }
  }

  def dropTableDir(location: String, conf: Configuration): Unit = {
    val f = fs(location, conf)
    if (f.exists(new Path(location))) f.delete(new Path(location), true)
  }
}
