package graft.lake

/** Contract between the streaming ingest rings' epoch commit tags and
  * `expire_snapshots`' replay guard.
  *
  * An epoch tag (`<ring>-ingest-<scope>-<epoch>`, stamped into the
  * snapshot summary atomically with the epoch's data) is what makes a
  * foreachBatch replay exactly-once: the replay skips any table whose
  * MAIN history already holds the tag. Expiring a snapshot forgets
  * its tag — so expiring the NEWEST epoch-tagged snapshot of a scope
  * re-opens the one replay window the stream's checkpoint may still
  * revisit (foreachBatch replays at most the last uncommitted epoch),
  * and a crash replay across that expiry would re-append the epoch
  * SILENTLY. graft.streaming.IngestStreams states the operational
  * rule (snapshot retention must exceed the trigger interval); this
  * object is its enforcement:
  *
  *  - `expire_snapshots` REFUSES to expire a scope's newest tagged
  *    main-history snapshot — or to expire any snapshot BETWEEN it
  *    and the main head, which severs the parent chain and makes the
  *    surviving tag equally invisible to every future main-ancestry
  *    walk — unless called with `ignore_replay_guard => true`;
  *  - a permitted (override) expire records the forgotten epoch as a
  *    replay WATERMARK in the table properties — atomically with the
  *    expire's metadata commit — so a later replay of that epoch
  *    fails LOUDLY at the ingest guard (which checks the watermark
  *    whenever the tag is absent) instead of duplicating data. Epochs
  *    beyond the watermark ingest normally, so an operator who
  *    verified the forgotten epoch's data can resume with a fresh
  *    checkpoint whose offsets start past it.
  *
  * Only the ingest rings' tag shapes participate: other commit tags
  * carry no epoch ordering, so "newest" is not defined for them and
  * expiry cannot strand a replay guard that never consults them.
  */
object ReplayGuard {

  /** Commit-summary marker the IVF drift repair stamps on its
    * full-overwrite commit (graft.queries.VectorOps.repairStoredIvf):
    * the repaired snapshot IS the index's centroid source until the
    * build ref is moved onto it one commit later, so expiring the
    * newest repair-marked snapshot in that window strands centroid
    * resolution the same way expiring a newest epoch tag strands a
    * replay — the guard treats it identically (ordered by snapshot id
    * in place of an epoch). */
  val IvfRepairTag = "graft-ivf-repair"

  /** `<ring>-ingest-<scope>-<epoch>` → (ring-qualified scope, epoch).
    * The scope match is greedy, so only the trailing `-<digits>` is
    * the epoch — scopes themselves may contain dashes. */
  private val TagRe = "^((?:dedup|ivf)-ingest-.+)-([0-9]+)$".r

  def parseEpochTag(tag: String): Option[(String, Long)] = tag match {
    case TagRe(scope, ep) =>
      scala.util.Try(ep.toLong).toOption.map((scope, _))
    case _ => None
  }

  def watermarkKey(scope: String): String =
    s"graft.replay.watermark.$scope"

  /** Highest epoch of `scope` whose tagged snapshot a permitted
    * expire has forgotten from `m`'s history; None when no override
    * expire ever crossed this scope's newest tag. */
  def watermarkOf(m: TableMeta, scope: String): Option[Long] =
    m.properties.get(watermarkKey(scope))
      .flatMap(v => scala.util.Try(v.toLong).toOption)

  /** Per scope, the newest (max-epoch) tagged snapshot on the given
    * main ancestry: scope → (epoch, snapshotId). The IVF repair
    * marker participates as its own scope with epoch = snapshot id
    * (repairs carry no epoch counter; snapshot ids order them). */
  def newestTagged(mainAncestors: Seq[SnapshotMeta])
      : Map[String, (Long, Long)] =
    mainAncestors.flatMap(s =>
        s.summary.get("graft.commit.tag").flatMap(t =>
          parseEpochTag(t).orElse(
            if (t == IvfRepairTag) Some((IvfRepairTag, s.snapshotId))
            else None))
          .map { case (scope, ep) => (scope, ep, s.snapshotId) })
      .groupBy(_._1).view.mapValues { xs =>
        val best = xs.maxBy(_._2); (best._2, best._3)
      }.toMap
}
