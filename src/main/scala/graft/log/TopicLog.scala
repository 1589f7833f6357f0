package graft.log

import graft.model.{LogRecord, Payload, TopicBucket}

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable

/** Append-only per-bucket message log.
  *
  * Semantics mirror the reference's in-memory queue
  * (`internal/broker/queue/queue.go:32-61` in ripple-mq/ripple-server):
  * `append` pushes records at the tail, `range(from, until)` reads a slice
  * by offset with a clamped upper bound
  * (`pkg/utils/collection/concurrent_list.go:63-73`), and per-bucket order
  * is total. Unlike the reference the log is durable and bounded only by
  * storage — the reference keeps everything in RAM forever (TTL TODO at
  * `internal/broker/consumer/server/core.go:45`), which does not survive a
  * restart and cannot scale; replication comes from the storage layer
  * rather than a leader/follower gossip push
  * (`internal/broker/producer/server/core.go:68-103`).
  *
  * Single-writer-per-bucket is assumed, exactly as in the reference, where
  * the elected leader is the sole appender for its bucket
  * (`internal/lighthouse/election/election.go:50-79`).
  */
trait TopicLog {

  /** Append records; returns the offset of the first appended record.
    * Records become readable atomically and in order.
    */
  def append(tb: TopicBucket, rows: Seq[Payload]): Long

  /** Read offsets `[from, until)`; `until` is clamped to `size` — the
    * semantics of `Queue.SubArray` (`queue.go:58-61`).
    */
  def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord]

  /** Current end offset (== number of records ever appended). */
  def size(tb: TopicBucket): Long

  def buckets(topic: String): Seq[TopicBucket]
}

/** Pure in-memory log for unit tests and property checks — the closest
  * analog of the reference's `ConcurrentList`-backed queue
  * (`pkg/utils/collection/concurrent_list.go:39-73`).
  */
final class InMemoryLog extends TopicLog {
  private val store = mutable.Map.empty[TopicBucket, mutable.ArrayBuffer[LogRecord]]

  private def buf(tb: TopicBucket) = synchronized {
    store.getOrElseUpdate(tb, mutable.ArrayBuffer.empty)
  }

  override def append(tb: TopicBucket, rows: Seq[Payload]): Long = synchronized {
    val b = buf(tb)
    val start = b.size.toLong
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    rows.zipWithIndex.foreach { case (p, i) =>
      b += LogRecord(tb.topic, tb.bucket, start + i, p.id, p.data, now)
    }
    start
  }

  override def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord] = synchronized {
    val b = buf(tb)
    val lo = math.max(0L, from)
    val hi = math.min(until, b.size.toLong)
    if (hi <= lo) Seq.empty else b.slice(lo.toInt, hi.toInt).toSeq
  }

  override def size(tb: TopicBucket): Long = synchronized(buf(tb).size.toLong)

  override def buckets(topic: String): Seq[TopicBucket] = synchronized {
    store.keys.filter(_.topic == topic).toSeq.sortBy(_.bucket)
  }
}

/** Segment file layout + frame codec for the durable log.
  *
  * A segment file `seg-<start20>-<count10>.log` holds `count` records
  * beginning at offset `start`. Frames are length-prefixed, the same wire
  * discipline as the reference's transport
  * (`pkg/server/asynctcp/transport.go:114-145` — 4-byte big-endian length
  * prefix), but with a fixed header instead of GOB (which the reference
  * itself flags as non-portable, `internal/broker/consumer/server/core.go:14`):
  *
  * {{{ [len:int32][id:int32][tsMillis:int64][data:len-12 bytes] }}}
  *
  * Segments are immutable once published (write-temp + atomic rename), so a
  * retried epoch that re-appends the same segment name is a no-op — this is
  * what makes the streaming sink idempotent/exactly-once, replacing the
  * reference's ack-counting (`internal/broker/ack/ack.go:68-117`).
  */
object SegmentCodec {
  val SegmentPrefix = "seg-"
  val SegmentSuffix = ".log"
  val ManifestName = ".manifest"

  def segmentName(start: Long, count: Long): String =
    f"$SegmentPrefix$start%020d-$count%010d$SegmentSuffix"

  /** (startOffset, count) parsed from a segment file name. */
  def parse(name: String): Option[(Long, Long)] =
    if (!name.startsWith(SegmentPrefix) || !name.endsWith(SegmentSuffix)) None
    else name.stripPrefix(SegmentPrefix).stripSuffix(SegmentSuffix).split('-') match {
      case Array(s, c) => Some((s.toLong, c.toLong))
      case _           => None
    }

  def write(file: Path, rows: Seq[(Payload, Long)]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file.toFile), 1 << 16))
    try rows.foreach { case (p, tsMillis) =>
      val d = if (p.data == null) Array.emptyByteArray else p.data
      out.writeInt(4 + 8 + d.length)
      out.writeInt(p.id)
      out.writeLong(tsMillis)
      out.write(d)
    } finally out.close()
  }

  /** Frame iterator with an explicit `close()`: an offset-pruned read that
    * stops mid-segment releases the file handle WITHOUT decoding the
    * remaining frames (round 1 drained the iterator to close — O(segment)
    * wasted I/O per pruned scan).
    */
  final class FrameIterator(file: Path)
      extends Iterator[(Int, Long, Array[Byte])] with AutoCloseable {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file.toFile), 1 << 16))
    private var nextLen = readLen()
    private def readLen(): Int =
      try in.readInt()
      catch { case _: java.io.EOFException => in.close(); -1 }
    override def hasNext: Boolean = nextLen >= 0
    override def next(): (Int, Long, Array[Byte]) = {
      val id = in.readInt()
      val ts = in.readLong()
      val data = new Array[Byte](nextLen - 12)
      in.readFully(data)
      nextLen = readLen()
      (id, ts, data)
    }
    override def close(): Unit = { nextLen = -1; try in.close() catch { case _: Throwable => () } }
  }

  /** Iterate all frames of a segment: (id, tsMillis, data). */
  def read(file: Path): FrameIterator = new FrameIterator(file)

  /** Frame-level identity IGNORING timestamps: same (id, data) sequence.
    * The replay-idempotency check must use this, not raw byte equality —
    * a writer stamps wall-clock `ts` into frames when the input has no ts
    * column, so a replayed (byte-wise different) epoch still carries the
    * same logical records. Frame layout is fixed-width outside `data`, so
    * equal logical content implies equal file size (cheap prefilter).
    */
  def sameFrames(a: Path, b: Path): Boolean = {
    if (!Files.exists(a) || !Files.exists(b)) return false
    if (Files.size(a) != Files.size(b)) return false
    val ia = read(a); val ib = read(b)
    try {
      while (ia.hasNext && ib.hasNext) {
        val (idA, _, dataA) = ia.next()
        val (idB, _, dataB) = ib.next()
        if (idA != idB || !java.util.Arrays.equals(dataA, dataB)) return false
      }
      !ia.hasNext && !ib.hasNext
    } finally { ia.close(); ib.close() }
  }
}

/** Durable file-backed log: one directory per topic/bucket containing
  * immutable offset-named segment files. Directory layout doubles as the
  * metadata registry the reference keeps in ZooKeeper
  * (`/<topic>/<bucket>/...` znode tree, `internal/lighthouse/io/io.go:55-156`).
  */
final class FileTopicLog(val root: Path) extends TopicLog {
  Files.createDirectories(root)

  def bucketDir(tb: TopicBucket): Path = root.resolve(tb.topic).resolve(tb.bucket)

  private def manifestPath(tb: TopicBucket): Path =
    bucketDir(tb).resolve(SegmentCodec.ManifestName)

  private def checkNoOverlap(tb: TopicBucket, segs: Seq[(Path, Long, Long)]): Seq[(Path, Long, Long)] = {
    segs.sliding(2).foreach {
      case Seq((_, s1, c1), (p2, s2, _)) if s1 + c1 > s2 =>
        throw new IllegalStateException(
          s"overlapping segments in ${tb.path}: [$s1,+$c1) overlaps $p2 " +
            "(single-writer-per-bucket contract violated)")
      case _ =>
    }
    segs
  }

  /** AUTHORITATIVE segment view: a directory listing. The write path (offset
    * assignment) and manifest refresh use this; the read-planning path goes
    * through [[segments]], which prefers the per-bucket manifest — at 100 TB
    * a bucket holds millions of segment files and listing it per micro-batch
    * trigger is the planning bottleneck (the reference keeps this metadata
    * in its ZK tree, `internal/lighthouse/io/io.go:55-156`, for the same
    * reason).
    */
  def segmentsListed(tb: TopicBucket): Seq[(Path, Long, Long)] =
    checkNoOverlap(tb, segmentsRaw(tb))

  /** Directory listing WITHOUT the overlap check — for the publish path's
    * overlap arbitration, which must be able to observe a transient overlap
    * in order to resolve it (the checked views throw on one).
    */
  def segmentsRaw(tb: TopicBucket): Seq[(Path, Long, Long)] = {
    val dir = bucketDir(tb)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val files = dir.toFile.listFiles()
      if (files == null) Seq.empty
      else files.iterator.flatMap { f =>
        SegmentCodec.parse(f.getName).map { case (s, c) => (f.toPath, s, c) }
      }.toSeq.sortBy(_._2)
    }
  }

  /** Published segments, sorted by start offset: (path, start, count).
    * Gaps are legal (retention); OVERLAPS are not — they mean the
    * single-writer-per-bucket contract was violated and reads would
    * double-count, so fail loudly instead.
    *
    * Reads the bucket manifest when present (one small-file read instead of
    * a directory listing); every publish/retention path rewrites the
    * manifest atomically, so a missing or torn manifest only ever falls
    * back to the authoritative listing.
    */
  def segments(tb: TopicBucket): Seq[(Path, Long, Long)] = {
    val m = manifestPath(tb)
    if (!Files.exists(m)) segmentsListed(tb)
    else {
      val dir = bucketDir(tb)
      try {
        val names = Files.readAllLines(m)
        val segs = new mutable.ArrayBuffer[(Path, Long, Long)](names.size())
        names.forEach { name =>
          if (name.nonEmpty) SegmentCodec.parse(name) match {
            case Some((s, c)) => segs += ((dir.resolve(name), s, c))
            case None         => // torn/garbage line → distrust the whole file
              throw new java.io.IOException(s"bad manifest line: $name")
          }
        }
        checkNoOverlap(tb, segs.sortBy(_._2).toSeq)
      } catch {
        // any read/parse failure (torn write, bit rot, NumberFormatException
        // from a seg-prefixed-but-garbled name) → authoritative listing;
        // overlap violations must still propagate
        case e: IllegalStateException => throw e
        case scala.util.control.NonFatal(_) => segmentsListed(tb)
      }
    }
  }

  /** Crashed-holder takeover threshold. Bucket critical sections are
    * metadata-only (directory listing + renames); the bound must cover the
    * slowest listing, not typical cost. A section that somehow outlives
    * this loses exclusion — the owner-token release below at least keeps a
    * late finisher from unlocking the NEW holder.
    */
  private val LockStaleMs = 300000L

  /** Exclusive cross-driver mutation lock for one bucket: atomic
    * create-exclusive of `.lock` in the bucket directory, stolen if the
    * holder crashed (mtime older than `LockStaleMs`). The filesystem
    * rendering of the reference's per-bucket single-writer election
    * (`internal/lighthouse/election/election.go:50-79`, ZK ephemeral
    * nodes): offset assignment + segment link (publish) and
    * manifest-rewrite + delete (retention) must each be one critical
    * section per bucket — a check-after-link arbitration has an unfixable
    * hole, because a writer that verified-then-returned cannot yield
    * retroactively when a second writer links an overlapping segment a
    * moment later.
    *
    * Steal is ATOMIC: the stale lock is renamed to a unique name first, so
    * of N waiters that all observed staleness exactly one wins the rename;
    * the losers' decisions die with the NoSuchFileException — a plain
    * delete-then-create steal lets a slow loser delete the winner's FRESH
    * lock (check-then-act). Release deletes the lock only if it still
    * holds our owner token, which NARROWS (a filesystem has no
    * compare-and-delete, so it cannot fully close) the window where a
    * section that outlived LockStaleMs unlocks its usurper; long holders
    * should call [[touchBucketLock]] between sub-steps to refresh the
    * staleness clock.
    */
  def withBucketLock[A](tb: TopicBucket)(body: => A): A = {
    val dir = bucketDir(tb)
    val lock = dir.resolve(".lock")
    val token = java.util.UUID.randomUUID().toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
    var held = false
    while (!held) {
      try {
        Files.createFile(lock) // atomic create-exclusive
        // token write is a second step: if it fails (disk full, interrupt)
        // release the just-created lock instead of orphaning an ownerless
        // one for the whole staleness window. A process death BETWEEN the
        // two calls still orphans it — the stale steal is the backstop.
        try Files.write(lock, token)
        catch { case e: Throwable => Files.deleteIfExists(lock); throw e }
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            if (System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis > LockStaleMs) {
              val claimed = dir.resolve(s".lock-stale-${java.util.UUID.randomUUID()}")
              Files.move(lock, claimed, StandardCopyOption.ATOMIC_MOVE) // one winner
              Files.deleteIfExists(claimed)
            }
          } catch { case _: java.nio.file.NoSuchFileException => () } // lost or released
          Thread.sleep(5 + scala.util.Random.nextInt(20).toLong)
      }
    }
    try body finally {
      try {
        if (java.util.Arrays.equals(Files.readAllBytes(lock), token))
          Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Heartbeat for a held bucket lock: refresh its staleness clock. Call
    * between the sub-steps of a long critical section (directory listings
    * at large segment counts) so a live holder is not mistaken for a
    * crashed one.
    */
  def touchBucketLock(tb: TopicBucket): Unit =
    try Files.setLastModifiedTime(bucketDir(tb).resolve(".lock"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () }

  /** Atomically rewrite the bucket manifest from the directory listing.
    * Called after every publish/retention mutation; concurrent refreshes
    * are safe (each writes a full self-consistent snapshot via tmp +
    * atomic rename, and a lost update is re-healed by the next mutation).
    */
  def refreshManifest(tb: TopicBucket): Unit = {
    val dir = bucketDir(tb)
    if (!Files.isDirectory(dir)) return
    // raw listing: a transient overlap (another writer mid-arbitration) must
    // not abort THIS writer's refresh; readers still get the checked view.
    val names = segmentsRaw(tb).map(_._1.getFileName.toString)
    val tmp = dir.resolve(s".manifest-tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try Files.move(tmp, manifestPath(tb), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: Throwable => Files.deleteIfExists(tmp) }
  }

  override def size(tb: TopicBucket): Long = {
    val segs = segments(tb)
    if (segs.isEmpty) 0L else segs.map { case (_, s, c) => s + c }.max
  }

  /** End offset from the authoritative listing — what offset assignment on
    * the write path must use (a lagging manifest must never cause a writer
    * to hand out overlapping offsets).
    */
  def endOffsetListed(tb: TopicBucket): Long = {
    val segs = segmentsRaw(tb) // max() needs no overlap check
    if (segs.isEmpty) 0L else segs.map { case (_, s, c) => s + c }.max
  }

  override def append(tb: TopicBucket, rows: Seq[Payload]): Long = {
    val now = System.currentTimeMillis()
    // lock: two concurrent appenders must not read the same end offset
    Files.createDirectories(bucketDir(tb))
    withBucketLock(tb) {
      appendAt(tb, endOffsetListed(tb), rows.map(p => (p, now)))
    }
  }

  /** Idempotent positional append: publish a segment starting at `start`.
    * If that segment already exists (epoch retry), the call is a no-op.
    * Returns `start`.
    */
  def appendAt(tb: TopicBucket, start: Long, rows: Seq[(Payload, Long)]): Long = {
    if (rows.isEmpty) return start
    val dir = bucketDir(tb)
    Files.createDirectories(dir)
    val target = dir.resolve(SegmentCodec.segmentName(start, rows.size.toLong))
    if (!Files.exists(target)) {
      val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      SegmentCodec.write(tmp, rows)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // Concurrent publisher won the rename race — idempotent outcome.
        case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
      }
    }
    refreshManifest(tb)
    start
  }

  override def range(tb: TopicBucket, from: Long, until: Long): Seq[LogRecord] = {
    val hi = math.min(until, size(tb))
    val lo = math.max(0L, from)
    if (hi <= lo) return Seq.empty
    val out = Seq.newBuilder[LogRecord]
    segments(tb).foreach { case (path, start, count) =>
      if (start < hi && start + count > lo) {
        var off = start
        val it = SegmentCodec.read(path)
        try {
          while (it.hasNext && off < hi) {
            val (id, ts, data) = it.next()
            if (off >= lo) out += LogRecord(tb.topic, tb.bucket, off, id, data, new java.sql.Timestamp(ts))
            off += 1
          }
        } finally it.close()
      }
    }
    out.result()
  }

  override def buckets(topic: String): Seq[TopicBucket] = {
    val dir = root.resolve(topic)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val files = dir.toFile.listFiles()
      if (files == null) Seq.empty
      // dot-dirs (.staging, .commits) are connector workspace, not buckets
      else files.iterator.filter(f => f.isDirectory && !f.getName.startsWith("."))
        .map(f => TopicBucket(topic, f.getName))
        .toSeq.sortBy(_.bucket)
    }
  }

  def topics(): Seq[String] = {
    val files = root.toFile.listFiles()
    if (files == null) Seq.empty
    else files.iterator.filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).toSeq.sorted
  }

  /** Retention: delete whole segments entirely below `floorOffset` in every
    * bucket (offsets are preserved — names carry absolute starts, so reads
    * from >= floorOffset are unaffected). The reference retains forever
    * in RAM (TTL TODO at `internal/broker/consumer/server/core.go:45`);
    * here retention is a pure metadata op. Returns deleted segment count.
    */
  def truncateBefore(topic: String, floorOffset: Long): Int =
    truncateWhere(topic) { case (path, start, count) => start + count <= floorOffset }

  /** Time-based retention: delete whole segments older than `maxAgeMillis`
    * (by segment file mtime — set at publish, so always >= the newest
    * record's event time) in every bucket. Offsets are preserved exactly as
    * in [[truncateBefore]]; the reference never implemented its retention
    * TTL (`internal/broker/consumer/server/core.go:45` TODO). Returns the
    * deleted segment count.
    */
  def truncateOlderThan(topic: String, maxAgeMillis: Long,
      nowMillis: Long = System.currentTimeMillis()): Int = {
    val cutoff = nowMillis - maxAgeMillis
    truncateWhere(topic) { case (path, _, _) =>
      Files.getLastModifiedTime(path).toMillis < cutoff
    }
  }

  /** Shared retention walk: drop segments matching `expired`, never the
    * newest segment of a bucket (size() derives from segment names, so an
    * empty bucket would restart offsets at 0 and break monotonicity). The
    * manifest is rewritten WITHOUT the expired segments before any file is
    * deleted, so manifest-backed readers never plan a ghost segment.
    */
  private def truncateWhere(topic: String)(
      expired: ((Path, Long, Long)) => Boolean): Int = {
    var deleted = 0
    // Per-bucket lock: serializes with publishes, whose refreshManifest
    // would otherwise snapshot the directory between our manifest rewrite
    // and the deletes and reinstate ghost entries.
    buckets(topic).foreach { tb =>
      withBucketLock(tb) {
        val segs = segmentsListed(tb)
        val toDelete = segs.dropRight(1).filter(expired)
        if (toDelete.nonEmpty) {
          val keep = segs.filterNot(toDelete.contains)
          val dir = bucketDir(tb)
          val tmp = dir.resolve(s".manifest-tmp-${java.util.UUID.randomUUID()}")
          Files.write(tmp, keep.map(_._1.getFileName.toString).mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          Files.move(tmp, manifestPath(tb), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          toDelete.foreach { case (path, _, _) =>
            if (Files.deleteIfExists(path)) deleted += 1
          }
        }
      }
    }
    deleted
  }

  /** Create a topic with `numBuckets` buckets — the control-plane op the
    * reference exposes as gRPC `CreateBucket`
    * (`server/exposed/create.go:15-27`). Here it is a pure metadata op:
    * bucket placement/replication is the storage layer's job, so the
    * reference's random-with-replacement replica choice
    * (`internal/broker/broker.go:93-99`) has no equivalent.
    */
  def createTopic(topic: String, numBuckets: Int): Seq[TopicBucket] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    (0 until numBuckets).map { i =>
      val tb = TopicBucket(topic, f"b$i%04d")
      Files.createDirectories(bucketDir(tb))
      tb
    }
  }
}
