package graft.connector

import graft.log.LogFs

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Broker-side per-consumer offset surface — the reference's consumer
  * state (`internal/broker/consumer/server/core.go:46-64,77-85`: every
  * consumer ID owns an independent cursor over the full log; fan-out, not
  * work-sharing) made visible in this engine.
  *
  * A consumer ID maps to a MANAGED NAMESPACE under the topic:
  * `<root>/<topic>/.consumers/<id>/` holding
  *
  *   - `ckpt/` — a streaming-query checkpoint reserved for this consumer
  *     ([[checkpoint]]); a query that uses it gets exactly-once resume, and
  *     its committed offsets are readable here without any side channel
  *     (the checkpoint IS the offset store, SURVEY A9);
  *   - `cursor.json` — a secondary cursor the `ripple` source itself
  *     appends from `MicroBatchStream.commit(end)` when the `consumerId`
  *     option is set. Spark delivers that callback one epoch late (batch
  *     N's commit arrives while batch N+1 plans), so this file may trail
  *     the final epoch — always BEHIND-or-equal, never ahead: replaying
  *     from it is at-least-once, the safe direction. The reference's async
  *     ZK write has the opposite (over-advance) failure, `core.go:61-62`;
  *     that bug is deliberately not reproduced.
  *
  * [[load]] returns the per-bucket MAX of the two records — both are lower
  * bounds on durably-committed progress, so the max is too. A FRESH
  * checkpoint with the same `consumerId` therefore resumes from the
  * consumer's last committed position instead of offset zero (Kafka
  * consumer-group resume; the reference's "reconnecting consumer keeps its
  * place"). Resuming the SAME checkpoint ignores all of this — the
  * checkpoint wins, exactly-once within a query lineage.
  *
  * All paths go through the Hadoop FileSystem API ([[graft.log.LogFs]]),
  * addressed from the same `root` URI as the log itself. The cursor swap
  * uses tmp + rename; on HDFS the replace is delete-then-rename, whose
  * transient missing-cursor window is safe — [[load]] treats a missing
  * cursor as "no secondary record" and falls back to the checkpoint's
  * committed ends, which are behind-or-equal by construction.
  *
  * Dot-dirs are invisible to the bucket registry
  * ([[graft.log.TopicLog]]), so the namespace cannot collide with data
  * buckets.
  */
object ConsumerOffsets {

  /** Same charset the bucket registry enforces — keeps IDs path-safe and
    * the cursor JSON escape-free.
    */
  private val IdPattern = "[A-Za-z0-9._-]+".r

  def requireValidId(id: String): String = {
    require(IdPattern.matches(id) && id != "." && id != "..",
      s"ripple: consumerId '$id' must match [A-Za-z0-9._-]+")
    id
  }

  private def fsFor(root: String): FileSystem =
    LogFs.get(new HPath(root), LogFs.activeHadoopConf)

  private def consumersDir(root: String, topic: String): HPath =
    new HPath(new HPath(root, topic), ".consumers")

  private def consumerDir(root: String, topic: String, id: String): HPath =
    new HPath(consumersDir(root, topic), requireValidId(id))

  private def readUtf8(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** The managed checkpoint directory for `id` (created on demand). Pass as
    * the query's `checkpointLocation` to make this consumer's progress
    * exactly-once AND visible through [[all]]/[[load]].
    */
  def checkpoint(root: String, topic: String, id: String): String = {
    val d = new HPath(consumerDir(root, topic, id), "ckpt")
    val fs = fsFor(root)
    fs.mkdirs(d)
    fs.makeQualified(d).toString
  }

  /** A group MEMBER's managed checkpoint — one per (member, count) under
    * the shared consumer namespace (members can never share one
    * checkpoint: Spark pins a query's identity to it). [[load]] merges
    * every member checkpoint's committed ends into the group position,
    * exactly as it merges the member cursor files.
    */
  def memberCheckpoint(root: String, topic: String, id: String,
      member: Int, members: Int): String = {
    val d = new HPath(consumerDir(root, topic, id), s"ckpt-$member-of-$members")
    val fs = fsFor(root)
    fs.mkdirs(d)
    fs.makeQualified(d).toString
  }

  /** Atomically record `ends` as `id`'s secondary cursor. Single-writer per
    * (topic, consumerId) is assumed — the same contract the streaming
    * checkpoint already imposes on the query.
    */
  def commit(root: String, topic: String, id: String, ends: Map[String, Long],
      member: Option[(Int, Int)] = None): Unit = {
    val fs = fsFor(root)
    val dir = consumerDir(root, topic, id)
    fs.mkdirs(dir)
    // A group MEMBER owns a disjoint bucket subset of the shared
    // consumerId: it commits to its OWN cursor file ([[claimMember]]) so
    // sibling members never clobber each other's buckets (cursor.json is
    // a whole-map swap); [[load]] merges every member file back into the
    // group's position.
    val name = member match {
      case Some((i, n)) => s"cursor-$i-of-$n.json"
      case None         => "cursor.json"
    }
    val target = new HPath(dir, name)
    val tmp = new HPath(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try { out.write(RippleOffset(ends).json().getBytes("UTF-8")); out.close() }
    catch { case e: Throwable => try fs.delete(tmp, false) catch { case _: Throwable => () }; throw e }
    if (!fs.rename(tmp, target)) { // HDFS refuses replace: delete + retry
      fs.delete(target, false)
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"cursor swap $tmp -> $target failed")
      }
    }
  }

  /** `id`'s committed position: per-bucket max of the managed checkpoint's
    * latest committed batch and the secondary cursor; None if this consumer
    * has never committed either.
    */
  def load(root: String, topic: String, id: String): Option[Map[String, Long]] = {
    val fs = fsFor(root)
    val d = consumerDir(root, topic, id)
    val cursor = {
      val f = new HPath(d, "cursor.json")
      try Some(RippleOffset.fromJson(readUtf8(fs, f)).ends)
      catch { case _: java.io.FileNotFoundException => None }
    }
    // group members' cursor-<i>-of-<n>.json files and ckpt-<i>-of-<n>/
    // managed checkpoints: disjoint bucket maps by construction (static
    // hash assignment), merged by max like everything else — the union
    // IS the group's position
    val listed =
      try fs.listStatus(d)
      catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
    val memberCursors: Seq[Map[String, Long]] = listed.toSeq.filter { st =>
      val n = st.getPath.getName
      n.startsWith("cursor-") && n.endsWith(".json")
    }.flatMap { st =>
      try Some(RippleOffset.fromJson(readUtf8(fs, st.getPath)).ends)
      catch { case _: java.io.FileNotFoundException => None }
    }
    val memberCkpts: Seq[Map[String, Long]] = listed.toSeq.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("ckpt-")
    }.flatMap(st => checkpointEnds(fs, st.getPath))
    val ckpt = checkpointEnds(fs, new HPath(d, "ckpt"))
    val all = cursor.toSeq ++ memberCursors ++ memberCkpts ++ ckpt.toSeq
    if (all.isEmpty) None
    else Some(all.flatMap(_.toSeq).groupMapReduce(_._1)(_._2)(math.max))
  }

  // ---- consumer-group load-splitting (round 19) -----------------------

  private val ClaimRe = raw"(\d+)-of-(\d+)".r

  /** Record member `i`-of-`n`'s STATIC bucket claim under the shared
    * `consumerId` and refuse overlapping layouts loudly: every claim file
    * under `members/` must agree on the member COUNT — a member of a
    * 2-way split and a member of a 3-way split would both own some
    * buckets (the hash partitions differ), double-reading them. A claim
    * with the SAME (i, n) is a RESTART and overwrites silently (static
    * assignment is stable, so the restarted member owns exactly the same
    * buckets). Changing the layout is rebalance-on-restart by contract:
    * stop every member, [[dropClaims]] (or delete the consumer), start
    * the new layout.
    */
  def claimMember(root: String, topic: String, id: String,
      member: Int, members: Int): Unit = {
    val fs = fsFor(root)
    val dir = new HPath(consumerDir(root, topic, id), "members")
    fs.mkdirs(dir)
    val conflicting =
      try fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case ClaimRe(_, n) if n.toInt != members => n.toInt
      }.toSeq.distinct.sorted
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    if (conflicting.nonEmpty) throw new IllegalStateException(
      s"ripple: consumer '$id' on topic '$topic' already has member " +
        s"claims for a ${conflicting.mkString("/")}-way split — a " +
        s"$members-way member would overlap their buckets; stop the " +
        "group and drop its claims (Ripple.dropGroupClaims) before " +
        "changing the layout")
    val f = new HPath(dir, s"$member-of-$members")
    val out = fs.create(f, true)
    try out.write(Array.emptyByteArray) finally out.close()
  }

  /** Release every member claim of `id` — the rebalance gate: run with
    * the group STOPPED, then start the new layout (members resume from
    * the merged [[load]] position, at-least-once across the boundary for
    * buckets that changed owners).
    */
  def dropClaims(root: String, topic: String, id: String): Unit = {
    val fs = fsFor(root)
    try fs.delete(new HPath(consumerDir(root, topic, id), "members"), true)
    catch { case _: java.io.FileNotFoundException => () }
  }

  /** Remove `id`'s managed checkpoint (reset support): a resumed
    * checkpoint always outranks the cursor, so any position rewrite that
    * left the checkpoint in place would be silently ignored by the next
    * resume. The caller must ensure no query is running under this
    * consumer (the Kafka "group must be inactive to reset" contract —
    * not enforceable from here).
    *
    * LOUD on failure: a swallowed delete error here is exactly the
    * silent-no-op reset the reset contract forbids — resetConsumer would
    * commit the cursor and report success while the surviving checkpoint
    * outranks it on the next resume. A delete that fails (or leaves the
    * directory behind) therefore throws; only a genuinely-absent
    * checkpoint is a no-op.
    */
  def dropCheckpoint(root: String, topic: String, id: String): Unit = {
    val fs = fsFor(root)
    val d = new HPath(consumerDir(root, topic, id), "ckpt")
    val failed =
      try { fs.delete(d, true); fs.exists(d) }
      catch { case e: java.io.IOException =>
        if (try fs.exists(d) catch { case _: java.io.IOException => true })
          throw new java.io.IOException(
            s"ripple: could not remove managed checkpoint $d for consumer " +
              s"'$id' — aborting the reset: a surviving checkpoint would " +
              "outrank the rewritten cursor and silently undo it", e)
        false // delete raced with something that removed it — goal state
      }
    if (failed) throw new java.io.IOException(
      s"ripple: managed checkpoint $d for consumer '$id' still exists " +
        "after delete — aborting the reset: a surviving checkpoint would " +
        "outrank the rewritten cursor and silently undo it")
  }

  /** IDs of every REGISTERED consumer (a namespace dir exists), including
    * ones that never committed — the deletion/expiry surface must see
    * those too ([[load]]-less registrations still hold a checkpoint dir).
    */
  def registered(root: String, topic: String): Seq[String] = {
    val fs = fsFor(root)
    val listed =
      try fs.listStatus(consumersDir(root, topic))
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    listed.iterator
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName).toSeq.sorted
  }

  /** Milliseconds of `id`'s last OBSERVABLE commit activity: the max over
    * the secondary cursor's mtime and the newest entry under the managed
    * checkpoint's `commits/` (the file a successful epoch writes last) —
    * both move on every committed batch, so an ACTIVE consumer's activity
    * stamp is always recent. Falls back to the consumer dir's own mtime
    * for a registered-but-never-committed consumer (registration counts
    * as activity — a just-created consumer must not expire before its
    * first epoch). None when the consumer is not registered.
    *
    * Granularity caveat: mtimes carry the filesystem's stamp resolution
    * (1 s on some substrates); expiry thresholds are hours-to-days, so
    * the resolution is noise.
    */
  def lastActivityMs(root: String, topic: String, id: String): Option[Long] = {
    val fs = fsFor(root)
    val d = consumerDir(root, topic, id)
    val base =
      try fs.getFileStatus(d).getModificationTime
      catch { case _: java.io.FileNotFoundException => return None }
    Some(math.max(base, fileActivityMs(root, topic, id).getOrElse(-1L)))
  }

  /** FILE-backed activity only — the cursor's mtime and the newest
    * checkpoint commit; None without either. This is what expiry keys on:
    * object stores stamp every object PUT (Last-Modified) but synthesize
    * directory mtimes, so the dir-mtime fallback above is display-grade,
    * not expiry-grade. A consumer with NO file stamp has never committed
    * anything — it holds no cursor, clamps nothing, and expiring it buys
    * nothing, so [[graft.api.Ripple.expireConsumers]] skips it instead of
    * trusting a substrate-dependent dir stamp.
    */
  def fileActivityMs(root: String, topic: String, id: String): Option[Long] = {
    val fs = fsFor(root)
    val d = consumerDir(root, topic, id)
    def mtime(p: HPath): Long =
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => -1L }
    val commits =
      try fs.listStatus(new HPath(new HPath(d, "ckpt"), "commits"))
        .iterator.map(_.getModificationTime).foldLeft(-1L)(math.max)
      catch { case _: java.io.FileNotFoundException => -1L }
    // group members' cursor files and managed checkpoints count too: an
    // active 4-way group whose shared cursor.json never moves must not
    // read as expired
    val memberActivity =
      try fs.listStatus(d).iterator.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("cursor-") && n.endsWith(".json"))
          Iterator.single(st.getModificationTime)
        else if (st.isDirectory && n.startsWith("ckpt-"))
          try fs.listStatus(new HPath(st.getPath, "commits"))
            .iterator.map(_.getModificationTime)
          catch { case _: java.io.FileNotFoundException => Iterator.empty }
        else Iterator.empty
      }.foldLeft(-1L)(math.max)
      catch { case _: java.io.FileNotFoundException => -1L }
    val best = math.max(math.max(mtime(new HPath(d, "cursor.json")), commits),
      memberActivity)
    if (best < 0) None else Some(best)
  }

  /** Remove `id`'s ENTIRE registered state — cursor, managed checkpoint,
    * namespace dir (`kafka-consumer-groups --delete` analog): the cursor
    * stops clamping `protectConsumers` retention and the next use of this
    * ID starts fresh from the retained log. Loud on an unknown consumer (a
    * typo must not read as "deleted") and on a refused/partial delete (a
    * surviving cursor would keep blocking retention while this call
    * reported success). Same inactive-consumer contract as
    * [[dropCheckpoint]]: the caller ensures no query is running under this
    * ID — not enforceable from here.
    */
  def delete(root: String, topic: String, id: String): Unit = {
    val fs = fsFor(root)
    val d = consumerDir(root, topic, id)
    val existed =
      try fs.exists(d)
      catch { case _: java.io.IOException => true }
    if (!existed) throw new IllegalArgumentException(
      s"ripple: topic '$topic' has no registered consumer '$id'")
    val gone =
      try { fs.delete(d, true); !fs.exists(d) }
      catch { case e: java.io.IOException =>
        throw new java.io.IOException(
          s"ripple: deleteConsumer('$id') on topic '$topic' failed — the " +
            s"filesystem refused the recursive delete of $d; the cursor " +
            "still clamps protectConsumers retention", e)
      }
    if (!gone) throw new java.io.IOException(
      s"ripple: consumer state $d still exists after delete — " +
        s"deleteConsumer('$id') aborted; the cursor still clamps " +
        "protectConsumers retention")
  }

  /** Every consumer's committed position for `topic` — the introspection
    * surface the reference exposes through its consumer server state.
    */
  def all(root: String, topic: String): Map[String, Map[String, Long]] = {
    val fs = fsFor(root)
    val d = consumersDir(root, topic)
    val listed =
      try fs.listStatus(d)
      catch { case _: java.io.FileNotFoundException => return Map.empty }
    listed.iterator
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        val id = st.getPath.getName
        load(root, topic, id).map(id -> _)
      }.toMap
  }

  /** The latest COMMITTED per-bucket ends recorded in a streaming-query
    * checkpoint of a single-`ripple`-source query: highest batch id present
    * in `commits/`, looked up in `offsets/<batch>` (v1 format: version
    * line, OffsetSeqMetadata line, then one serialized offset per source).
    */
  private def checkpointEnds(fs: FileSystem, ckpt: HPath): Option[Map[String, Long]] = {
    val commits = new HPath(ckpt, "commits")
    val listed =
      try fs.listStatus(commits)
      catch { case _: java.io.FileNotFoundException => return None }
    val latest = listed.iterator
      .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).maxOption
    latest.flatMap { b =>
      val off = new HPath(new HPath(ckpt, "offsets"), b.toString)
      val lines =
        try readUtf8(fs, off).split('\n').toSeq
        catch { case _: java.io.FileNotFoundException => return None }
      // drop "v1" + metadata; a single-source query leaves one offset line
      lines.drop(2).headOption.map(l => RippleOffset.fromJson(l).ends)
    }
  }
}
