package graft.connector

import graft.log.FileTopicLog
import graft.model.TopicBucket

import org.apache.hadoop.fs.{Path => HPath}

import java.nio.charset.StandardCharsets.UTF_8

/** Cross-topic transaction markers — the Kafka-transactions analog for
  * ROUTED (`topicColumn`) streaming writes.
  *
  * The routed sink publishes each discovered topic with its own full
  * exactly-once protocol (intent → segments → marker), in sorted topic
  * order. Atomicity is therefore PER TOPIC: in the crash window between
  * two topics' publishes, a reader can observe earlier-sorted topics'
  * rows for an epoch while later-sorted topics still lack theirs
  * (`RippleDataSource` VISIBILITY CONTRACT). The reference has no
  * cross-topic story at all — each produce is an independent
  * single-topic append (`internal/broker/producer/server/core.go:21-34`),
  * and consumers see whatever has landed (`consumer/server/core.go:46-64`).
  *
  * These markers close the gap the way Kafka's transactions do — with
  * visibility metadata, not write-path atomicity:
  *
  *   - A TRANSACTIONAL routed write (`option("transactional", true)`)
  *     drops a PENDING marker per participating topic BEFORE that topic
  *     publishes, recording per-bucket stable floors (the first offset
  *     the in-flight epoch may occupy — Kafka's "first unstable offset").
  *     After EVERY topic's publish completes, the pendings are deleted in
  *     the same sorted order. Offsets below every pending floor are
  *     STABLE — Kafka's last-stable-offset (LSO).
  *   - A `readCommitted` read caps each bucket at its stable end and
  *     subtracts ABORTED ranges; a plain read sees everything, including
  *     a crashed epoch's partial rows — exactly Kafka's
  *     `isolation.level=read_uncommitted` default.
  *   - An admin abort ([[abortStale]]) fences the epoch's replay (the
  *     aborted marker makes `publishTopic` drop its staged files), then
  *     records which published offsets belonged to the dead transaction.
  *     The rows stay in the log — Kafka aborts do not rewrite segments
  *     either; the aborted-transaction index makes read_committed
  *     consumers skip them, and that is what the marker does here.
  *
  * Marker files live next to the epoch commit markers, under
  * `<topic>/.commits/<queryId>/`:
  *
  *   - `epoch-<e>.txn` — pending. Body: one `bucket floor` line per
  *     staged bucket (floors recorded before publish), upgraded in place
  *     to `bucket start count` once the topic's offset assignment is
  *     known (so an abort can clamp to exactly the dead epoch's range).
  *   - `epoch-<e>.txnaborted` — abort fence + record. Written EMPTY
  *     first (the fence must exist before the published overlap is
  *     computed — a concurrent replay acquiring the bucket locks after
  *     this point abandons its publish), then atomically overwritten
  *     with the clamped `bucket start count` lines under the bucket
  *     locks. Kept until [[vacuum]] can prove the ranges sit below the
  *     retention floor (the rows are physically gone).
  *
  * Scale shape: writers pay three small metadata writes per topic per
  * epoch, ONLY when `transactional` is set. Plain readers pay nothing —
  * the marker directories are never listed. A `readCommitted` reader
  * pays one two-level listing of `.commits` per subscribed topic at scan
  * construction (O(active query dirs), driver-side), and the cap/range
  * maps ship to executors inside the plan. No shuffle anywhere.
  */
object TxnMarkers {
  val PendingSuffix = ".txn"
  val AbortedSuffix = ".txnaborted"

  private def commitsDir(log: FileTopicLog, topic: String): HPath =
    new HPath(new HPath(log.root, topic), ".commits")

  private[graft] def pendingPath(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): HPath =
    new HPath(new HPath(commitsDir(log, topic), qdir), s"epoch-$epoch$PendingSuffix")

  private[connector] def abortedPath(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): HPath =
    new HPath(new HPath(commitsDir(log, topic), qdir), s"epoch-$epoch$AbortedSuffix")

  /** One marker file: `ranges` maps bucket -> (start, count); count == -1
    * means the pre-assignment floor form (`bucket floor` — the epoch's
    * rows, if any land, start at or after `start`). `participants` is the
    * transaction's FULL topic set (round 19): a marker that knows its
    * siblings lets an admin abort resolve the whole transaction at once,
    * and lets a replay's commit point refuse to split a partially-aborted
    * epoch (r18 ADVICE #1 — a marker recording only its own topic's
    * ranges cannot detect that a sibling was fenced). Empty on markers
    * written before round 19, read as "just this topic".
    */
  case class Marker(topic: String, qdir: String, epoch: Long, path: HPath,
      mtimeMs: Long, ranges: Map[String, (Long, Long)],
      participants: Seq[String] = Nil)

  /** Header line carrying the transaction's participant topic set. The
    * '!' prefix cannot collide with a bucket line: bucket names are
    * validated `[A-Za-z0-9._-]+` before any staged file exists.
    */
  private val ParticipantsPrefix = "!participants "

  private def header(participants: Seq[String]): Seq[String] =
    if (participants.isEmpty) Nil
    else Seq(ParticipantsPrefix + participants.sorted.mkString(","))

  private[connector] def renderFloors(floors: Map[String, Long],
      participants: Seq[String] = Nil): Array[Byte] =
    (header(participants) ++
      floors.toSeq.sorted.map { case (b, f) => s"$b $f" })
      .mkString("\n").getBytes(UTF_8)

  private[connector] def renderRanges(ranges: Map[String, (Long, Long)],
      participants: Seq[String] = Nil): Array[Byte] =
    (header(participants) ++
      ranges.toSeq.sortBy(_._1).map { case (b, (s, c)) => s"$b $s $c" })
      .mkString("\n").getBytes(UTF_8)

  private def parseBody(body: String): (Seq[String], Map[String, (Long, Long)]) = {
    var participants: Seq[String] = Nil
    val ranges = body.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        if (line.startsWith(ParticipantsPrefix)) {
          participants = line.stripPrefix(ParticipantsPrefix)
            .split(',').iterator.map(_.trim).filter(_.nonEmpty).toSeq
          None
        } else line.split(' ') match {
          case Array(b, f)    => Some(b -> (f.toLong, -1L))
          case Array(b, s, c) => Some(b -> (s.toLong, c.toLong))
          case _ => throw new IllegalStateException(
            s"ripple: malformed transaction marker line '$line'")
        }
      }.toMap
    (participants, ranges)
  }

  private val EpochRe = raw"epoch-(\d+)(\.txn|\.txnaborted)".r

  /** Both marker families in ONE two-level listing — what a
    * `readCommitted` plan resolves per topic (caps need the pendings,
    * subtraction the aborteds; listing twice would double the metadata
    * round-trips for no information).
    */
  def listAll(log: FileTopicLog, topic: String): (Seq[Marker], Seq[Marker]) = {
    val all = list(log, topic, null)
    all.partition(_.path.getName.endsWith(PendingSuffix))
  }

  /** All markers with `suffix` under `topic`'s commit dirs (every marker
    * when `suffix` is null). Missing `.commits` (a topic with no epoch
    * writer yet) is the common case and answers empty without an error.
    */
  private def list(log: FileTopicLog, topic: String, suffix: String): Seq[Marker] = {
    val fs = log.fs
    val dir = commitsDir(log, topic)
    val qdirs =
      try fs.listStatus(dir).filter(_.isDirectory)
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    qdirs.toSeq.flatMap { q =>
      val files =
        try fs.listStatus(q.getPath)
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      files.toSeq.flatMap { f =>
        f.getPath.getName match {
          case EpochRe(e, s) if suffix == null || s == suffix =>
            // a marker deleted between listing and read resolved — skip it
            (try Some(log.readFileUtf8(f.getPath))
             catch { case _: java.io.FileNotFoundException => None })
              .map { body =>
                val (parts, ranges) = parseBody(body)
                Marker(topic, q.getPath.getName, e.toLong,
                  f.getPath, f.getModificationTime, ranges, parts)
              }
          case _ => None
        }
      }
    }
  }

  def listPending(log: FileTopicLog, topic: String): Seq[Marker] =
    list(log, topic, PendingSuffix)

  def listAborted(log: FileTopicLog, topic: String): Seq[Marker] =
    list(log, topic, AbortedSuffix)

  /** Per-bucket stable end for `readCommitted` reads: the minimum pending
    * floor/start across every in-flight transaction touching the bucket.
    * Offsets at or above the value belong (or may belong) to an
    * unresolved transaction and are withheld until it commits (pending
    * deleted) or aborts (ranges recorded). Buckets with no in-flight
    * transaction are absent — uncapped. This is Kafka's LSO, including
    * its stall: a hung transaction holds the cap until an admin abort
    * resolves it.
    */
  def stableEnds(log: FileTopicLog, topic: String): Map[String, Long] =
    stableEndsOf(listPending(log, topic))

  /** [[stableEnds]] from an already-listed pending set. */
  def stableEndsOf(pending: Seq[Marker]): Map[String, Long] =
    pending.flatMap(_.ranges.toSeq).groupMapReduce(_._1)(_._2._1)(math.min)

  /** Per-bucket aborted offset ranges `[start, end)`, merged across
    * markers, sorted. `readCommitted` partition planning subtracts them;
    * floor-form entries (count -1, a fence whose final ranges were not
    * yet recorded) contribute nothing — the transaction's pending marker
    * still caps the bucket below them until the abort completes.
    */
  def abortedRanges(log: FileTopicLog, topic: String): Map[String, Seq[(Long, Long)]] =
    abortedRangesOf(listAborted(log, topic))

  /** [[abortedRanges]] from an already-listed aborted set. */
  def abortedRangesOf(aborted: Seq[Marker]): Map[String, Seq[(Long, Long)]] =
    aborted.flatMap(_.ranges.toSeq)
      .collect { case (b, (s, c)) if c > 0 => b -> (s, s + c) }
      .groupMap(_._1)(_._2)
      .view.mapValues(_.sortBy(_._1)).toMap

  /** Subtract sorted disjoint `aborted` ranges from `[from, until)`,
    * yielding the surviving sub-ranges in order.
    */
  def subtract(from: Long, until: Long,
      aborted: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    var cur = from
    val out = Seq.newBuilder[(Long, Long)]
    aborted.foreach { case (s, e) =>
      if (e > cur && s < until) {
        if (s > cur) out += ((cur, math.min(s, until)))
        cur = math.max(cur, e)
      }
    }
    if (cur < until) out += ((cur, until))
    out.result()
  }

  private def commitMarkerPath(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): HPath =
    new HPath(new HPath(commitsDir(log, topic), qdir), s"epoch-$epoch")

  /** What one participant's state looked like UNDER its bucket locks. */
  private case class ParticipantView(topic: String, markerExists: Boolean,
      pendingExists: Boolean, clamped: Map[String, (Long, Long)])

  /** Abort in-flight transactions of `topic` whose pending marker is older
    * than `olderThanMs` — the admin resolution for a writer that crashed
    * and will never replay (Kafka's coordinator timeout-abort,
    * `transaction.timeout.ms`). A transaction aborts ATOMICALLY across
    * its WHOLE participant set (recorded in every pending marker): naming
    * any one participating topic resolves every sibling too — Kafka
    * aborts a transaction, not one topic's slice of it (r18 ADVICE #1:
    * a single-topic abort left siblings clearable by a later replay,
    * splitting the epoch into a committed half and an aborted half).
    * Per stale (query, epoch), in sorted participant order:
    *
    *   1. if EVERY participant already carries the epoch's commit marker,
    *      the transaction is fully published — it COMMITTED and only the
    *      pending clear was interrupted: finish the clear (delete the
    *      pendings), abort nothing (r18 ADVICE #3 — clamping a committed
    *      transaction would hide committed rows with no recovery path);
    *   2. write every participant's abort fence (atomic): any replay
    *      that acquires the bucket locks after this point sees the fence
    *      inside the lock and drops its staged files;
    *   3. per participant, under its bucket locks, clamp its pending's
    *      recorded ranges to offsets a segment actually covers (a crash
    *      before a segment landed leaves its planned offsets UNALLOCATED
    *      — a later writer will legitimately take them, so recording
    *      them aborted would hide innocent rows);
    *   4. if the under-lock views show the transaction committed after
    *      all (every commit marker present — a full replay slipped in
    *      between our listing and the fences), withdraw every fence and
    *      finish the clear; otherwise overwrite each fence with its
    *      clamped ranges and drop the pendings and intents. The epoch's
    *      rows, where published, stay in the log — visible to plain
    *      reads (Kafka read_uncommitted parity), subtracted by
    *      `readCommitted` reads.
    *
    * A transaction aborted while its writer is merely SLOW (not dead) is
    * dropped: the fences win the race deterministically through the
    * bucket locks — whichever side acquires them second sees the other's
    * state. Returns one [[Marker]] per (aborted transaction, participant
    * topic) with the final clamped ranges (empty = that participant
    * never published).
    */
  def abortStale(log: FileTopicLog, topic: String, olderThanMs: Long): Seq[Marker] = {
    require(olderThanMs >= 0, s"ripple: olderThanMs must be >= 0, got $olderThanMs")
    val fs = log.fs
    val now = System.currentTimeMillis()
    listPending(log, topic).filter(now - _.mtimeMs >= olderThanMs).flatMap { p =>
      val participants =
        (if (p.participants.nonEmpty) p.participants else Seq(topic)).sorted
      abortPreFenceSeam(p.qdir, p.epoch)
      // Committed-transaction pre-check (ADVICE #3): every participant's
      // commit marker present means every publish completed — the window
      // is between the last publish and clearPendingTxn (or a clear whose
      // deletes failed). Finish the clear; there is nothing to abort.
      if (participants.forall(t =>
          fs.exists(commitMarkerPath(log, t, p.qdir, p.epoch)))) {
        participants.foreach { t =>
          try fs.delete(pendingPath(log, t, p.qdir, p.epoch), false)
          catch { case _: java.io.IOException => () }
        }
        None
      } else {
        // Fence EVERY participant before taking any lock: a replay
        // arriving after this point abandons on whichever topic it
        // touches first under the locks — the whole transaction is dead
        // at once, never topic-by-topic. The initial fence body carries
        // the participant set (so SHOW TRANSACTIONS and a later vacuum
        // can reason about it) and no ranges.
        participants.foreach { t =>
          log.writeFileAtomic(abortedPath(log, t, p.qdir, p.epoch),
            renderRanges(Map.empty, participants))
        }
        abortLockSeam(p.qdir, p.epoch)
        // Per participant, re-read state UNDER its bucket locks — the
        // listing's view is stale the moment a concurrent writer holds
        // them: it may have upgraded floor→ranges and published
        // (clamping from the stale floor form would record nothing and
        // expose the published rows), the whole transaction may have
        // committed (markers everywhere — abort loses), or a replay may
        // have seen a fence and ABANDONED (pending gone, no marker —
        // the fence must stay or a second replay would publish after
        // all). Lock set: the pending's buckets when it exists (a
        // deterministic replay re-stages exactly those), else every
        // bucket of the topic (nothing published, nothing to clamp —
        // the locks only serialize against an in-flight abandon).
        val views = participants.map { t =>
          val pend = pendingPath(log, t, p.qdir, p.epoch)
          val bucketsOf =
            (try Some(parseBody(log.readFileUtf8(pend))._2.keys.toSeq)
             catch { case _: java.io.FileNotFoundException => None })
              .getOrElse(log.buckets(t).map(_.bucket))
          val tbs = bucketsOf.sorted.map(TopicBucket(t, _))
          withLocks(log, tbs) {
            val fresh =
              try Some(parseBody(log.readFileUtf8(pend))._2)
              catch { case _: java.io.FileNotFoundException => None }
            val clamped = fresh.getOrElse(Map.empty).flatMap {
              case (bucket, (start, count)) =>
                // floor form (count -1) UNDER THE LOCK means nothing
                // published: the upgrade to range form precedes any
                // segment, inside this same lock
                if (count <= 0) None
                else {
                  val segs = log.segments(TopicBucket(t, bucket))
                  val covered = segs.collect { case (_, s, c)
                      if s < start + count && s + c > start =>
                    (math.max(s, start), math.min(s + c, start + count))
                  }
                  if (covered.isEmpty) None
                  else Some(bucket -> (covered.map(_._1).min,
                    covered.map(_._2).max - covered.map(_._1).min))
                }
            }
            ParticipantView(t, fs.exists(commitMarkerPath(log, t, p.qdir, p.epoch)),
              fresh.isDefined, clamped)
          }
        }
        if (views.forall(_.markerExists)) {
          // the transaction committed between our listing and the
          // fences (a full replay passed every fence check first):
          // abort loses everywhere — the rows are legitimately
          // committed and must not be hidden; withdraw the fences and
          // finish the interrupted clear
          views.foreach { v =>
            try fs.delete(abortedPath(log, v.topic, p.qdir, p.epoch), false)
            catch { case _: java.io.IOException => () }
            try fs.delete(pendingPath(log, v.topic, p.qdir, p.epoch), false)
            catch { case _: java.io.IOException => () }
          }
          Seq.empty
        } else views.map { v =>
          // a fence with no ranges STAYS: it hides nothing, but it is
          // what stops a later replay from publishing the dead epoch
          // after all (deleting it would un-abort the topics the crash
          // never reached, splitting the transaction)
          val fence = abortedPath(log, v.topic, p.qdir, p.epoch)
          if (v.clamped.nonEmpty)
            log.writeFileAtomic(fence, renderRanges(v.clamped, participants))
          try fs.delete(pendingPath(log, v.topic, p.qdir, p.epoch), false)
          catch { case _: java.io.IOException => () }
          val intent = new HPath(commitsDir(log, v.topic),
            s"${p.qdir}/epoch-${p.epoch}.intent")
          try fs.delete(intent, false) catch { case _: java.io.IOException => () }
          Marker(v.topic, p.qdir, p.epoch, fence, now, v.clamped, participants)
        }
      }
    }
  }

  private val CommitEpochRe = raw"epoch-(\d+)".r

  /** Evidence a fenced epoch can no longer replay: a NEWER epoch's commit
    * marker in the same query dir on this topic. Structured Streaming
    * replays at most the last uncommitted epoch — once the query has
    * committed a later epoch through the same checkpoint, the fenced one
    * is behind the checkpoint's commit log and will never re-enter
    * `publish`.
    */
  private def newerEpochCommitted(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): Boolean = {
    val dir = new HPath(commitsDir(log, topic), qdir)
    val files =
      try log.fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return false }
    files.exists { f =>
      f.getPath.getName match {
        case CommitEpochRe(e) => e.toLong > epoch
        case _ => false
      }
    }
  }

  /** Garbage-collect aborted-transaction markers whose every range sits
    * BELOW the bucket's current retention floor — the aborted rows are
    * physically gone, so there is nothing left to subtract. Markers with
    * any still-retained range are kept: deleting one would expose the
    * aborted rows to `readCommitted` readers.
    *
    * A PURE FENCE (no positive-count ranges — the participant never
    * published) is collected only once a NEWER epoch has committed in the
    * same query dir (r18 ADVICE #2: grace alone is not evidence — if the
    * crashed query has not yet replayed, deleting the fence leaves no
    * record at all and a later restart publishes the dead epoch's rows,
    * un-aborting half the transaction; a newer committed epoch proves the
    * checkpoint has moved past the fenced one). Returns markers removed.
    */
  def vacuum(log: FileTopicLog, topic: String, graceMs: Long = 0L): Seq[Marker] = {
    require(graceMs >= 0, s"ripple: graceMs must be >= 0, got $graceMs")
    val fs = log.fs
    val now = System.currentTimeMillis()
    val floors: Map[String, Long] = log.buckets(topic).map { tb =>
      tb.bucket -> log.segments(tb).headOption.map(_._2).getOrElse(0L)
    }.toMap
    listAborted(log, topic).filter { m =>
      val aged = now - m.mtimeMs >= graceMs
      val pureFence = !m.ranges.exists(_._2._2 > 0)
      if (pureFence)
        aged && newerEpochCommitted(log, topic, m.qdir, m.epoch)
      else aged &&
        m.ranges.forall { case (b, (s, c)) =>
          // a bucket the log no longer has is gone wholesale
          c <= 0 || floors.get(b).forall(floor => s + c <= floor)
        }
    }.map { m =>
      try fs.delete(m.path, false) catch { case _: java.io.IOException => () }
      m
    }
  }

  /** Test seam: runs after the stale pending is listed and before the
    * committed pre-check / fence writes, so a spec can interleave a full
    * replay that COMMITS the transaction deterministically (the
    * committed-withdraw verdict). No-op in production.
    */
  private[graft] var abortPreFenceSeam: (String, Long) => Unit = (_, _) => ()

  /** Test seam: runs after every participant's abort fence is written and
    * before the bucket locks are taken, so a spec can interleave a racing
    * replay deterministically (abandoned-by-fence verdicts). No-op in
    * production.
    */
  private[graft] var abortLockSeam: (String, Long) => Unit = (_, _) => ()

  private def withLocks[A](log: FileTopicLog, tbs: Seq[TopicBucket])(body: => A): A =
    tbs match {
      case Seq() => body
      case head +: tail => log.withBucketLock(head)(withLocks(log, tail)(body))
    }
}
