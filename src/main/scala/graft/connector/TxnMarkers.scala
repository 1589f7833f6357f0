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

  private[connector] def pendingPath(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): HPath =
    new HPath(new HPath(commitsDir(log, topic), qdir), s"epoch-$epoch$PendingSuffix")

  private[connector] def abortedPath(log: FileTopicLog, topic: String,
      qdir: String, epoch: Long): HPath =
    new HPath(new HPath(commitsDir(log, topic), qdir), s"epoch-$epoch$AbortedSuffix")

  /** One marker file: `ranges` maps bucket -> (start, count); count == -1
    * means the pre-assignment floor form (`bucket floor` — the epoch's
    * rows, if any land, start at or after `start`).
    */
  case class Marker(topic: String, qdir: String, epoch: Long, path: HPath,
      mtimeMs: Long, ranges: Map[String, (Long, Long)])

  private[connector] def renderFloors(floors: Map[String, Long]): Array[Byte] =
    floors.toSeq.sorted.map { case (b, f) => s"$b $f" }
      .mkString("\n").getBytes(UTF_8)

  private[connector] def renderRanges(ranges: Map[String, (Long, Long)]): Array[Byte] =
    ranges.toSeq.sortBy(_._1).map { case (b, (s, c)) => s"$b $s $c" }
      .mkString("\n").getBytes(UTF_8)

  private def parseBody(body: String): Map[String, (Long, Long)] =
    body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      line.split(' ') match {
        case Array(b, f)    => b -> (f.toLong, -1L)
        case Array(b, s, c) => b -> (s.toLong, c.toLong)
        case _ => throw new IllegalStateException(
          s"ripple: malformed transaction marker line '$line'")
      }
    }.toMap

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
              .map(body => Marker(topic, q.getPath.getName, e.toLong,
                f.getPath, f.getModificationTime, parseBody(body)))
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

  /** Abort in-flight transactions of `topic` whose pending marker is older
    * than `olderThanMs` — the admin resolution for a writer that crashed
    * and will never replay (Kafka's coordinator timeout-abort,
    * `transaction.timeout.ms`). Per stale (query, epoch):
    *
    *   1. write the abort fence (empty `.txnaborted`, atomic): any replay
    *      that acquires the bucket locks after this point sees the fence
    *      inside the lock and drops its staged files;
    *   2. under the bucket locks, clamp the marker's recorded ranges to
    *      offsets a segment actually covers (a crash before a segment
    *      landed leaves its planned offsets UNALLOCATED — a later writer
    *      will legitimately take them, so recording them aborted would
    *      hide innocent rows) and overwrite the fence with the result;
    *   3. drop the pending and any intent. The epoch's rows, where
    *      published, stay in the log — visible to plain reads (Kafka
    *      read_uncommitted parity), subtracted by `readCommitted` reads.
    *
    * A transaction aborted while its writer is merely SLOW (not dead) is
    * dropped: the fence wins the race deterministically through the
    * bucket locks — whichever side acquires them second sees the other's
    * state. Returns one [[Marker]] per aborted transaction with the final
    * clamped ranges.
    */
  def abortStale(log: FileTopicLog, topic: String, olderThanMs: Long): Seq[Marker] = {
    require(olderThanMs >= 0, s"ripple: olderThanMs must be >= 0, got $olderThanMs")
    val fs = log.fs
    val now = System.currentTimeMillis()
    listPending(log, topic).filter(now - _.mtimeMs >= olderThanMs).flatMap { p =>
      val fence = abortedPath(log, topic, p.qdir, p.epoch)
      log.writeFileAtomic(fence, Array.emptyByteArray)
      abortLockSeam(p.qdir, p.epoch)
      val tbs = p.ranges.keys.toSeq.sorted.map(TopicBucket(topic, _))
      // Everything below re-reads state UNDER the bucket locks — the
      // listing's view of the pending is stale the moment a concurrent
      // writer holds the locks: it may have upgraded floor→ranges and
      // published (clamping from the stale floor form would record
      // nothing and expose the published rows), the whole transaction
      // may have committed (clearPendingTxn deleted the pending — abort
      // loses, and hiding committed rows would be wrong), or a replay
      // may have seen the fence and ABANDONED (pending gone, no marker —
      // the fence must stay or a second replay would publish after all).
      val marker = new HPath(p.path.getParent, s"epoch-${p.epoch}")
      val verdict: Option[Map[String, (Long, Long)]] = withLocks(log, tbs) {
        val fresh =
          try Some(parseBody(log.readFileUtf8(p.path)))
          catch { case _: java.io.FileNotFoundException => None }
        fresh match {
          case None if fs.exists(marker) => None // committed under us
          case None => Some(Map.empty) // abandoned by our fence — keep it
          case Some(ranges) => Some(ranges.flatMap {
            case (bucket, (start, count)) =>
              val tb = TopicBucket(topic, bucket)
              val segs = log.segments(tb)
              // floor form (count -1) UNDER THE LOCK means nothing
              // published: the upgrade to range form precedes any
              // segment, inside this same lock
              if (count <= 0) None
              else {
                val covered = segs.collect { case (_, s, c)
                    if s < start + count && s + c > start =>
                  (math.max(s, start), math.min(s + c, start + count))
                }
                if (covered.isEmpty) None
                else Some(bucket -> (covered.map(_._1).min,
                  covered.map(_._2).max - covered.map(_._1).min))
              }
          })
        }
      }
      verdict match {
        case None =>
          // the transaction committed between the listing and the locks:
          // abort loses — the rows are legitimately committed and must
          // not be hidden; replay is already a marker no-op, so the
          // fence has no job left
          try fs.delete(fence, false) catch { case _: java.io.IOException => () }
          None
        case Some(clamped) =>
          // an empty fence STAYS: it hides nothing, but it is what stops
          // a later replay from publishing the dead epoch after all
          // (deleting it would un-abort the topics the crash never
          // reached, splitting the transaction)
          if (clamped.nonEmpty) log.writeFileAtomic(fence, renderRanges(clamped))
          try fs.delete(p.path, false) catch { case _: java.io.IOException => () }
          val intent = new HPath(p.path.getParent, s"epoch-${p.epoch}.intent")
          try fs.delete(intent, false) catch { case _: java.io.IOException => () }
          Some(Marker(topic, p.qdir, p.epoch, fence, now, clamped))
      }
    }
  }

  /** Garbage-collect aborted-transaction markers whose every range sits
    * BELOW the bucket's current retention floor — the aborted rows are
    * physically gone, so there is nothing left to subtract and the fence
    * has nothing left to fence (retention implies the epoch's offsets can
    * never be republished). Markers with any still-retained range are
    * kept: deleting one would expose the aborted rows to `readCommitted`
    * readers. Returns markers removed.
    */
  def vacuum(log: FileTopicLog, topic: String, graceMs: Long = 0L): Seq[Marker] = {
    require(graceMs >= 0, s"ripple: graceMs must be >= 0, got $graceMs")
    val fs = log.fs
    val now = System.currentTimeMillis()
    val floors: Map[String, Long] = log.buckets(topic).map { tb =>
      tb.bucket -> log.segments(tb).headOption.map(_._2).getOrElse(0L)
    }.toMap
    listAborted(log, topic).filter { m =>
      now - m.mtimeMs >= graceMs &&
        m.ranges.forall { case (b, (s, c)) =>
          // a bucket the log no longer has is gone wholesale; floor-form
          // fences (c <= 0) hide nothing and age out with the grace alone
          c <= 0 || floors.get(b).forall(floor => s + c <= floor)
        }
    }.map { m =>
      try fs.delete(m.path, false) catch { case _: java.io.IOException => () }
      m
    }
  }

  /** Test seam: runs after the abort fence is written and before the
    * bucket locks are taken, so a spec can interleave a racing replay
    * deterministically (commit-under-us and abandoned-by-fence verdicts).
    * No-op in production.
    */
  private[graft] var abortLockSeam: (String, Long) => Unit = (_, _) => ()

  private def withLocks[A](log: FileTopicLog, tbs: Seq[TopicBucket])(body: => A): A =
    tbs match {
      case Seq() => body
      case head +: tail => log.withBucketLock(head)(withLocks(log, tail)(body))
    }
}
