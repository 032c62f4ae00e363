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
    // The hint is only a pointer: fall back to the version listing so
    // a reader can never observe "table missing" inside a concurrent
    // commit's hint swap (non-atomic delete+rename on some FS).
    fs(location, conf).exists(hintFile(location)) ||
      metadataFiles(location, conf).nonEmpty

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

  // Version files are immutable once written, so parsed TableMeta is
  // cacheable process-wide: without this every statement of a high-QPS
  // workload re-reads and re-parses the (potentially MBs at hundreds
  // of snapshots) current metadata JSON. The key carries the file's
  // (mtime, length) so a DROP + re-CREATE at the same warehouse
  // location — which restarts version numbering — can never serve the
  // old table's metadata. One getFileStatus per load replaces the full
  // read + parse on a hit.
  private val MaxMetaCacheEntries = 64
  private val metaCache: java.util.Map[(String, Int, Long, Long), TableMeta] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Int, Long, Long), TableMeta](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Int, Long, Long), TableMeta]): Boolean =
          size() > MaxMetaCacheEntries
      })

  /** Spec observability: number of actual (cache-miss) JSON parses. */
  private[lake] val parseCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private[lake] def clearMetaCacheForTesting(): Unit = metaCache.clear()

  def loadVersion(location: String, v: Int, conf: Configuration): TableMeta = {
    val f = fs(location, conf)
    val vf = versionFile(location, v)
    val st = f.getFileStatus(vf)
    val key = (location, v, st.getModificationTime, st.getLen)
    // The cache holds the SLIM parsed form; every load hydrates fresh
    // lazy wrappers from it. Caching a hydrated form would share (or
    // worse, inline) file lists across loads — pinning O(history) file
    // metadata resident and starving the distributed pruned-planning
    // path, which keys off an unforced lazy wrapper.
    val hit = metaCache.get(key)
    if (hit != null)
      return hit.copy(snapshots = hit.snapshots.map(Manifests.hydrate(_, conf)))
    val in = f.open(vf)
    val parsed =
      try {
        val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        parseCount.incrementAndGet()
        Serialization.read[TableMeta](new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    metaCache.put(key, parsed)
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
    val bytes = Serialization.write(next).getBytes(StandardCharsets.UTF_8)
    def lostCas(e: Throwable): Nothing = {
      Manifests.drop(freshDirs, conf)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit to ${meta.location}: v${next.version} " +
          s"already exists (base version ${meta.version} is stale); " +
          "reload the table metadata and reapply", e)
    }
    // The local-vs-remote branch keys off the RESOLVED filesystem's
    // scheme, not the raw path URI: a scheme-less location resolves
    // through fs.defaultFS, and on an HDFS-defaulted cluster the NIO
    // path would write the version file to the driver's local disk
    // while readers list HDFS.
    val scheme = f.getUri.getScheme
    if (scheme == null || scheme == "file") {
      // Hadoop's local create(path, overwrite=false) is CHECK-then-act:
      // two simultaneous committers can both pass the existence check
      // and both "create" the version file — the loser's commit is
      // silently erased, no exception anywhere. NIO CREATE_NEW maps to
      // O_CREAT|O_EXCL, which the kernel arbitrates atomically, so
      // exactly one committer wins and the rest get the CAS conflict
      // they can retry on. (HDFS create is atomic in the NameNode and
      // keeps the Hadoop path below.)
      val p = java.nio.file.Paths.get(vf.toUri.getPath)
      val out =
        try java.nio.file.Files.newOutputStream(p,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch { case e: java.nio.file.FileAlreadyExistsException => lostCas(e) }
      try out.write(bytes)
      finally out.close()
    } else {
      val out =
        try f.create(vf, false) // atomic create-if-absent on HDFS
        catch { case e: java.io.IOException if f.exists(vf) => lostCas(e) }
      try out.write(bytes)
      finally out.close()
    }
    // Repoint the hint via write-temp + atomic rename so concurrent
    // readers never observe a truncated/empty hint file.
    val tmp = new Path(metaDir(meta.location),
      s".version-hint.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    if (scheme == null || scheme == "file") {
      // Pure NIO on local: ChecksumFileSystem writes would strand one
      // .crc sidecar per commit (the rename below is crc-unaware), and
      // POSIX rename(2) replaces atomically where Hadoop's local
      // FileContext rename(OVERWRITE) is delete-then-rename — a
      // no-hint window a concurrent loadTable could fall into
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        next.version.toString.getBytes(StandardCharsets.UTF_8))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(hintFile(meta.location).toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
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
    }
    retireOldVersions(next, conf)
    // prime the cache with the SLIM form it just serialized: the
    // committer's next statement would otherwise pay a full reload of
    // the metadata it just wrote. (Never the hydrated form — see
    // loadVersion's cache contract.)
    try {
      val st = f.getFileStatus(vf)
      metaCache.put((meta.location, next.version,
        st.getModificationTime, st.getLen), next)
    } catch { case _: Exception => () }
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
    // The (mtime, length) cache-key component has filesystem-dependent
    // granularity (seconds on object stores): a DROP + re-CREATE whose
    // fresh version file matches the old one's length within a tick
    // could be served the dropped table's metadata. Dropping is rare —
    // evict the location outright.
    metaCache.synchronized {
      val it = metaCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == location) it.remove()
    }
  }
}
