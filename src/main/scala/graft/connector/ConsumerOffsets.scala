package graft.connector

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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

  private def consumersDir(root: String, topic: String): Path =
    Paths.get(root).resolve(topic).resolve(".consumers")

  private def consumerDir(root: String, topic: String, id: String): Path =
    consumersDir(root, topic).resolve(requireValidId(id))

  /** The managed checkpoint directory for `id` (created on demand). Pass as
    * the query's `checkpointLocation` to make this consumer's progress
    * exactly-once AND visible through [[all]]/[[load]].
    */
  def checkpoint(root: String, topic: String, id: String): String = {
    val d = consumerDir(root, topic, id).resolve("ckpt")
    Files.createDirectories(d)
    d.toString
  }

  /** Atomically record `ends` as `id`'s secondary cursor. Single-writer per
    * (topic, consumerId) is assumed — the same contract the streaming
    * checkpoint already imposes on the query.
    */
  def commit(root: String, topic: String, id: String, ends: Map[String, Long]): Unit = {
    val target = consumerDir(root, topic, id).resolve("cursor.json")
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(".cursor.json.tmp")
    Files.write(tmp, RippleOffset(ends).json().getBytes("UTF-8"))
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** `id`'s committed position: per-bucket max of the managed checkpoint's
    * latest committed batch and the secondary cursor; None if this consumer
    * has never committed either.
    */
  def load(root: String, topic: String, id: String): Option[Map[String, Long]] = {
    val d = consumerDir(root, topic, id)
    val cursor = {
      val f = d.resolve("cursor.json")
      if (!Files.isRegularFile(f)) None
      else Some(RippleOffset.fromJson(new String(Files.readAllBytes(f), "UTF-8")).ends)
    }
    val ckpt = checkpointEnds(d.resolve("ckpt"))
    (cursor, ckpt) match {
      case (None, None) => None
      case (a, b) =>
        val l = a.getOrElse(Map.empty); val r = b.getOrElse(Map.empty)
        Some((l.keySet ++ r.keySet).map { k =>
          k -> math.max(l.getOrElse(k, 0L), r.getOrElse(k, 0L))
        }.toMap)
    }
  }

  /** Every consumer's committed position for `topic` — the introspection
    * surface the reference exposes through its consumer server state.
    */
  def all(root: String, topic: String): Map[String, Map[String, Long]] = {
    val d = consumersDir(root, topic)
    if (!Files.isDirectory(d)) Map.empty
    else Files.list(d).iterator().asScala
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .flatMap { p =>
        val id = p.getFileName.toString
        load(root, topic, id).map(id -> _)
      }.toMap
  }

  /** The latest COMMITTED per-bucket ends recorded in a streaming-query
    * checkpoint of a single-`ripple`-source query: highest batch id present
    * in `commits/`, looked up in `offsets/<batch>` (v1 format: version
    * line, OffsetSeqMetadata line, then one serialized offset per source).
    */
  private def checkpointEnds(ckpt: Path): Option[Map[String, Long]] = {
    val commits = ckpt.resolve("commits")
    if (!Files.isDirectory(commits)) return None
    val latest = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).maxOption
    latest.flatMap { b =>
      val off = ckpt.resolve("offsets").resolve(b.toString)
      if (!Files.isRegularFile(off)) None
      else {
        val lines = Files.readAllLines(off).asScala
        // drop "v1" + metadata; a single-source query leaves one offset line
        lines.drop(2).headOption.map(l => RippleOffset.fromJson(l).ends)
      }
    }
  }
}
