package graft.log

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.nio.charset.StandardCharsets.UTF_8

/** One committed segment: `name` is the data file (unique, never reused)
  * inside the bucket directory; `[start, start+count)` is its offset range.
  */
case class SegMeta(name: String, start: Long, count: Long)

/** Committed bucket state at `version` (−1 = never committed / empty).
  * `segs` is sorted by start offset.
  */
case class CommitState(version: Long, segs: Vector[SegMeta]) {
  def endOffset: Long =
    if (segs.isEmpty) 0L else segs.iterator.map(s => s.start + s.count).max
  def at(start: Long, count: Long): Option[SegMeta] =
    segs.find(s => s.start == start && s.count == count)
  def overlapping(start: Long, count: Long): Option[SegMeta] =
    segs.find(s => s.start < start + count && s.start + s.count > start &&
      !(s.start == start && s.count == count))
}

/** Sequenced put-if-absent commit log — the storage-plane protocol for
  * filesystems WITHOUT atomic rename (S3A, GCS, ABFS, …), where the
  * rename-based segment publish of [[FileTopicLog]] would be torn-write
  * unsafe. This is the public Delta-Lake/Iceberg commit-log pattern
  * re-expressed for the topic log:
  *
  *   - Data files are written under UNIQUE names directly in the bucket
  *     directory. An object store PUT is atomic-visible (the object appears
  *     whole at close or not at all), and an uncommitted data file is
  *     invisible to readers — so data writes need no staging or rename.
  *   - The bucket's authoritative segment list lives in `.commitlog/`:
  *     version-numbered delta files `c-<v>` committed with CREATE-EXCLUSIVE
  *     (put-if-absent — S3 conditional PUT `If-None-Match`, GCS
  *     `ifGenerationMatch(0)`, ABFS conditional create; surfaced through
  *     `FileSystem.create(path, overwrite = false)`). Exactly one writer
  *     wins each version; losers re-read and retry with fresh state, so
  *     two drivers can never commit overlapping offsets — the mutual
  *     exclusion the rename protocol gets from the bucket lock comes from
  *     the commit sequence itself here, and the lock degrades to a
  *     contention throttle.
  *   - Every `checkpointInterval`-th version also writes a full-state
  *     checkpoint `k-<v>`; reading is one directory listing plus the latest
  *     checkpoint and its delta suffix, never an unbounded replay.
  *     Versions more than one interval behind the newest checkpoint are
  *     garbage-collected, so the listing stays O(interval).
  *
  * The reference keeps all of this in ZooKeeper znodes + RAM
  * (`internal/lighthouse/io/io.go:55-156`,
  * `pkg/utils/collection/concurrent_list.go:39-73` in
  * ripple-mq/ripple-server) and cannot run on an object store at all.
  *
  * Delta file format (UTF-8 lines): `A <start> <count> <name>` adds a
  * segment, `D <name>` drops one. Checkpoints carry only `A` lines.
  */
final class CommitLog(fs: FileSystem, dir: HPath, checkpointInterval: Int = 64) {
  require(checkpointInterval > 0, "checkpointInterval must be positive")

  private def cPath(v: Long) = new HPath(dir, f"c-$v%020d")
  private def kPath(v: Long) = new HPath(dir, f"k-$v%020d")

  private def parseVersion(name: String): Option[(Char, Long)] =
    if ((name.startsWith("c-") || name.startsWith("k-")) && name.length == 22)
      try Some((name.charAt(0), name.substring(2).toLong))
      catch { case _: NumberFormatException => None }
    else None

  private def listVersions(): Seq[(Char, Long)] =
    (try fs.listStatus(dir)
     catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] })
      .iterator.flatMap(st => parseVersion(st.getPath.getName)).toSeq

  private def readLines(p: HPath): Seq[String] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, UTF_8).split('\n').toSeq.filter(_.nonEmpty)
    } finally in.close()
  }

  private def applyLines(segs: Vector[SegMeta], lines: Seq[String], src: HPath): Vector[SegMeta] = {
    var cur = segs
    lines.foreach { line =>
      line.split(' ') match {
        case Array("A", s, c, name) => cur = cur :+ SegMeta(name, s.toLong, c.toLong)
        case Array("D", name)       => cur = cur.filterNot(_.name == name)
        case _ => throw new java.io.IOException(s"bad commit line in $src: $line")
      }
    }
    cur
  }

  /** Current committed state: latest checkpoint + delta suffix. Retries on
    * the bounded race where a concurrent checkpoint GC deletes a just-listed
    * version file (re-listing always converges — GC only removes versions
    * a full interval behind the newest checkpoint).
    */
  def read(): CommitState = {
    var attempt = 0
    while (true) {
      val vs = listVersions()
      if (vs.isEmpty) return CommitState(-1L, Vector.empty)
      val latest = vs.iterator.map(_._2).max
      val base = vs.iterator.filter(v => v._1 == 'k' && v._2 <= latest)
        .map(_._2).foldLeft(-1L)(math.max)
      try {
        var segs =
          if (base < 0) Vector.empty[SegMeta]
          else applyLines(Vector.empty, readLines(kPath(base)), kPath(base))
        var v = base + 1
        while (v <= latest) {
          segs = applyLines(segs, readLines(cPath(v)), cPath(v))
          v += 1
        }
        return CommitState(latest, segs.sortBy(_.start))
      } catch {
        case _: java.io.FileNotFoundException if attempt < 5 =>
          attempt += 1 // listed a version GC'd underneath us; converges
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Attempt to commit `adds`/`removes` as version `state.version + 1` via
    * put-if-absent. Returns the new state on the win, `None` when another
    * writer took the version (caller re-reads and retries). Overlap and
    * duplicate checks belong to the CALLER (it has the semantics); this
    * layer only guarantees the sequenced, lost-update-free append.
    */
  def tryCommit(state: CommitState, adds: Seq[SegMeta], removes: Set[String]): Option[CommitState] = {
    require(adds.nonEmpty || removes.nonEmpty, "empty commit")
    val v = state.version + 1
    val lines =
      removes.toSeq.sorted.map(n => s"D $n") ++
        adds.map(a => s"A ${a.start} ${a.count} ${a.name}")
    if (!createExclusive(cPath(v), lines.mkString("\n").getBytes(UTF_8))) return None
    // Resurrection guard: a writer stalled long enough that version v was
    // committed by others AND already GC'd can "win" create-exclusive on a
    // version readers ignore (read() applies only versions above the newest
    // checkpoint's base) — its rows would silently never become visible.
    // Detect it right after the win: a checkpoint more than one interval
    // ahead proves v was inside the GC floor; drop the file and retry. A
    // false positive would need >= interval further commits between the
    // create and this listing and still only costs a retry, never a loss.
    val newestCk = listVersions().iterator.filter(_._1 == 'k').map(_._2).foldLeft(-1L)(math.max)
    if (newestCk - checkpointInterval > v) {
      try fs.delete(cPath(v), false) catch { case _: java.io.IOException => () }
      return None
    }
    val next = CommitState(v,
      (state.segs.filterNot(s => removes.contains(s.name)) ++ adds).sortBy(_.start))
    if (v > 0 && v % checkpointInterval == 0) checkpointAndGc(v, next)
    Some(next)
  }

  /** Full-state checkpoint at `v` + GC of versions a full interval behind.
    * Two committers racing the same checkpoint write identical content
    * (state after v is deterministic from the log), so the loser's
    * create-exclusive refusal is ignored.
    */
  private def checkpointAndGc(v: Long, state: CommitState): Unit = {
    val lines = state.segs.map(s => s"A ${s.start} ${s.count} ${s.name}")
    createExclusive(kPath(v), lines.mkString("\n").getBytes(UTF_8))
    // readers that listed within the last interval of commits still resolve;
    // older in-flight reads retry via read()'s FNF loop
    val floor = v - checkpointInterval
    listVersions().filter(_._2 < floor).foreach { case (kind, old) =>
      val p = if (kind == 'k') kPath(old) else cPath(old)
      try fs.delete(p, false) catch { case _: java.io.IOException => () }
    }
  }

  /** Typed-first classification of a put-if-absent refusal at `p`. The
    * typed exceptions cover every tested scheme — Hadoop's local/RawLocal
    * family and the conditional-PUT rig raise
    * `o.a.h.fs.FileAlreadyExistsException` (at create() on HDFS-like
    * stores, at close() on conditional-PUT stores), `PathExistsException`
    * is the Hadoop path-API spelling, and `java.nio` surfaces from direct
    * `Files` shortcuts. An UNTYPED IOException counts as a refusal only as
    * a logged last resort: its message must say the target exists AND the
    * target must be observably present — a message like "Parent path does
    * not exist" is a storage fault that must surface as itself, not burn
    * the caller's bounded retries into a misleading contention error.
    */
  private def isRefusal(e: Throwable, p: HPath): Boolean = e match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case _: java.nio.file.FileAlreadyExistsException => true
    case _: org.apache.hadoop.fs.PathExistsException => true
    case io: java.io.IOException =>
      val m = io.getMessage
      val sniff = m != null && (m.contains("already exists") ||
        m.toLowerCase.contains("precondition") || m.contains("If-None-Match"))
      sniff && (try fs.exists(p)
        catch { case _: java.io.IOException => false }) && {
        CommitLog.log.warn(s"CommitLog: classifying untyped refusal at $p " +
          s"by message + target-exists probe ($io); the store should raise " +
          "a typed FileAlreadyExistsException")
        true
      }
    case _ => false
  }

  /** Write `bytes` at `p` atomically and only if absent. True on the win;
    * false when the target exists (put-if-absent refusal, [[isRefusal]]).
    */
  private def createExclusive(p: HPath, bytes: Array[Byte]): Boolean = {
    fs.mkdirs(dir)
    val out =
      try fs.create(p, false)
      catch { case e: java.io.IOException if isRefusal(e, p) => return false }
    try { out.write(bytes); out.close(); true }
    catch {
      case e: java.io.IOException if isRefusal(e, p) => false
      case e: Throwable =>
        // a non-exclusivity failure may have left a torn visible file on a
        // NON-object store (object stores materialize at close, so there is
        // nothing to tear); best-effort removal keeps the version readable
        try { out.close() } catch { case _: Throwable => () }
        try fs.delete(p, false) catch { case _: Throwable => () }
        throw e
    }
  }
}

object CommitLog {
  private[log] lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[CommitLog])
}
