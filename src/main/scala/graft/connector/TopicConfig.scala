package graft.connector

import com.fasterxml.jackson.databind.ObjectMapper
import graft.log.FileTopicLog
import org.apache.hadoop.fs.{Path => HPath}

/** Per-topic persisted configuration — Kafka's topic-level config parity
  * (`retention.ms` / `retention.bytes` live ON the topic there; producers
  * don't carry retention). Until round 15 this engine's hygiene knobs were
  * writer options only (`retentionMs`/`retentionBytes`/
  * `autoCompactSegments`/`compactDistributeMinBytes` on the sink), which
  * has the classic operational failure: FIVE pipelines write one topic,
  * four carry the options, the fifth (added later, by someone else)
  * doesn't — and that writer's publishes never apply retention or
  * compaction, so the footprint and segment count drift until an operator
  * notices. Persisting the policy on the topic makes it apply to EVERY
  * writer by default.
  *
  * Document: one JSON object at `<topic>/.config`, only present keys set:
  * `{"v":1[,"retentionMs":…][,"retentionBytes":…]
  * [,"autoCompactSegments":…][,"compactDistributeMinBytes":…]}`.
  * Replaced atomically as a whole ([[graft.api.Ripple.setTopicConfig]] is
  * read-modify-write at the caller; concurrent admin writers last-wins,
  * the same single-admin contract as schema evolution). The reference has
  * no per-topic config at all — retention was never implemented
  * (`internal/broker/consumer/server/core.go:45` TODO) and its TOML is
  * process-global (`config/config.go:15-47`).
  *
  * Resolution order at the sink (see [[EffectiveBuckets.resolve]]): an
  * EXPLICITLY-set writer option wins (even an explicit "off" — the
  * `…Set` flags on [[RippleConf]] record presence, so option-level
  * overrides are exact, not sentinel-guessed); otherwise the topic
  * config; otherwise the engine default. Streaming writers resolve ONCE
  * at query start — a config change applies to new queries/batch writes
  * immediately and to running streams at restart (documented; Kafka's
  * broker-side dynamic config is live, ours is write-start).
  *
  * A malformed/torn config document is LOUD everywhere (read, write
  * resolve): guessing "no config" would silently stop applying retention
  * the operator believes is on — the same refusal principle as
  * [[SnapshotPins]].
  */
final case class TopicConfig(
    retentionMs: Option[Long] = None,
    retentionBytes: Option[Long] = None,
    autoCompactSegments: Option[Int] = None,
    compactDistributeMinBytes: Option[Long] = None,
    compression: Option[String] = None,
    cleanupPolicy: Option[String] = None,
    compactionKeyHeap: Option[Int] = None,
    tombstoneRetentionMs: Option[Long] = None) {
  def isEmpty: Boolean =
    retentionMs.isEmpty && retentionBytes.isEmpty &&
      autoCompactSegments.isEmpty && compactDistributeMinBytes.isEmpty &&
      compression.isEmpty && cleanupPolicy.isEmpty &&
      compactionKeyHeap.isEmpty && tombstoneRetentionMs.isEmpty
  /** Validation mirrors the writer-option rules (loud, same messages'
    * spirit): non-positive retention windows/budgets are configuration
    * errors, not "off" (absence is off).
    */
  def validated: TopicConfig = {
    retentionMs.foreach(v => require(v > 0,
      s"ripple: topic config retentionMs must be positive, got $v"))
    retentionBytes.foreach(v => require(v > 0,
      s"ripple: topic config retentionBytes must be positive, got $v"))
    autoCompactSegments.foreach(v => require(v >= 2,
      s"ripple: topic config autoCompactSegments must be >= 2, got $v"))
    compactDistributeMinBytes.foreach(v => require(v > 0,
      s"ripple: topic config compactDistributeMinBytes must be positive, got $v"))
    compression.foreach(graft.log.Codecs.id) // loud on an unknown codec name
    cleanupPolicy.foreach(p => require(p == "delete" || p == "compact",
      s"ripple: topic config cleanupPolicy must be 'delete' or 'compact', " +
        s"got '$p'"))
    compactionKeyHeap.foreach(v => require(v >= 1024,
      s"ripple: topic config compactionKeyHeap must be >= 1024 entries, " +
        s"got $v — it caps the keyed-compaction id->offset state per task " +
        "(the Kafka log.cleaner.dedupe.buffer.size analog); beyond it the " +
        "rewrite spills to sorted runs on task-local disk"))
    tombstoneRetentionMs.foreach(v => require(v >= 0,
      s"ripple: topic config tombstoneRetentionMs must be >= 0, got $v " +
        "(0 drops latest-per-key tombstones at the first compaction; " +
        "the Kafka delete.retention.ms analog)"))
    this
  }
  /** Render as Kafka-style `k=v` pairs (sorted) — the DESCRIBE surface. */
  def render: String = Seq(
    autoCompactSegments.map("autoCompactSegments=" + _),
    cleanupPolicy.map("cleanupPolicy=" + _),
    compactDistributeMinBytes.map("compactDistributeMinBytes=" + _),
    compactionKeyHeap.map("compactionKeyHeap=" + _),
    compression.map("compression=" + _),
    retentionBytes.map("retentionBytes=" + _),
    retentionMs.map("retentionMs=" + _),
    tombstoneRetentionMs.map("tombstoneRetentionMs=" + _))
    .flatten.mkString(",")
}

object TopicConfig {
  private val mapper = new ObjectMapper()

  private def path(log: FileTopicLog, topic: String): HPath =
    new HPath(new HPath(log.root, topic), ".config")

  /** The topic's persisted config; empty when none was ever set. Torn or
    * malformed documents are LOUD (see class doc).
    */
  def read(log: FileTopicLog, topic: String): TopicConfig = {
    val p = path(log, topic)
    val text =
      try log.readFileUtf8(p)
      catch { case _: java.io.FileNotFoundException => return TopicConfig() }
    def bad(why: String): Nothing = throw new IllegalStateException(
      s"ripple: topic config $p is unreadable ($why) — refusing to guess " +
        "whether retention/compaction policy is set; repair or delete the " +
        "config file.")
    val node =
      try mapper.readTree(text)
      catch { case e: java.io.IOException => bad(e.getMessage) }
    if (node == null || !node.isObject) bad("not a JSON object")
    if (node.path("v").asInt(-1) != 1) bad("unsupported version")
    def long(k: String): Option[Long] =
      if (!node.has(k)) None
      else {
        // a non-numeric value is a malformed DOCUMENT (asLong would
        // silently coerce it to 0 and fail as a bogus "must be positive")
        if (!node.path(k).canConvertToLong) bad(s"'$k' is not an integer")
        Some(node.path(k).asLong())
      }
    def int(k: String): Option[Int] = long(k).map { v =>
      // range-check before narrowing: a hand-edited 2^32+2 must take the
      // loud malformed-document path, not silently truncate to 2 (a
      // valid-looking policy)
      if (v < Int.MinValue || v > Int.MaxValue)
        bad(s"'$k' out of int range: $v")
      v.toInt
    }
    def str(k: String): Option[String] =
      if (!node.has(k)) None
      else {
        if (!node.path(k).isTextual) bad(s"'$k' is not a string")
        Some(node.path(k).asText())
      }
    try TopicConfig(
      retentionMs = long("retentionMs"),
      retentionBytes = long("retentionBytes"),
      autoCompactSegments = int("autoCompactSegments"),
      compactDistributeMinBytes = long("compactDistributeMinBytes"),
      compression = str("compression"),
      cleanupPolicy = str("cleanupPolicy"),
      compactionKeyHeap = int("compactionKeyHeap"),
      tombstoneRetentionMs = long("tombstoneRetentionMs"))
      .validated
    catch {
      // an unknown codec NAME in a persisted document is a malformed
      // document (same loudness class as a torn write), not a caller
      // usage error
      case e: IllegalArgumentException => bad(e.getMessage)
    }
  }

  /** Replace the topic's config document (validated; an EMPTY config
    * deletes the file — absence is the canonical "no policy").
    */
  def write(log: FileTopicLog, topic: String, cfg: TopicConfig): Unit = {
    require(log.buckets(topic).nonEmpty,
      s"ripple: topic '$topic' does not exist")
    val p = path(log, topic)
    if (cfg.isEmpty) {
      try log.fs.delete(p, false)
      catch { case _: java.io.FileNotFoundException => () }
      return
    }
    cfg.validated
    val root = mapper.createObjectNode()
    root.put("v", 1)
    cfg.retentionMs.foreach(root.put("retentionMs", _))
    cfg.retentionBytes.foreach(root.put("retentionBytes", _))
    cfg.autoCompactSegments.foreach(v => root.put("autoCompactSegments", v))
    cfg.compactDistributeMinBytes.foreach(root.put("compactDistributeMinBytes", _))
    cfg.compression.foreach(root.put("compression", _))
    cfg.cleanupPolicy.foreach(root.put("cleanupPolicy", _))
    cfg.compactionKeyHeap.foreach(v => root.put("compactionKeyHeap", v))
    cfg.tombstoneRetentionMs.foreach(root.put("tombstoneRetentionMs", _))
    log.writeFileAtomic(p, mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Fold the topic's persisted config into a writer's conf: an
    * explicitly-set option wins per key; config fills the rest. Called
    * once per write, driver-side.
    */
  def applyDefaults(conf: RippleConf): RippleConf = {
    val cfg = read(conf.log, conf.topic)
    if (cfg.isEmpty) conf
    else conf.copy(
      retentionMs =
        if (conf.retentionMsSet) conf.retentionMs
        else cfg.retentionMs.getOrElse(conf.retentionMs),
      retentionBytes =
        if (conf.retentionBytesSet) conf.retentionBytes
        else cfg.retentionBytes.getOrElse(conf.retentionBytes),
      autoCompactSegments =
        if (conf.autoCompactSegmentsSet) conf.autoCompactSegments
        else cfg.autoCompactSegments.getOrElse(conf.autoCompactSegments),
      compactDistributeMinBytes =
        if (conf.compactDistributeMinBytesSet) conf.compactDistributeMinBytes
        else cfg.compactDistributeMinBytes.getOrElse(conf.compactDistributeMinBytes),
      compression =
        if (conf.compressionSet) conf.compression
        else cfg.compression.getOrElse(conf.compression),
      cleanupPolicy =
        if (conf.cleanupPolicySet) conf.cleanupPolicy
        else cfg.cleanupPolicy.getOrElse(conf.cleanupPolicy),
      compactionKeyHeap =
        if (conf.compactionKeyHeapSet) conf.compactionKeyHeap
        else cfg.compactionKeyHeap.getOrElse(conf.compactionKeyHeap),
      tombstoneRetentionMs =
        if (conf.tombstoneRetentionMsSet) conf.tombstoneRetentionMs
        else cfg.tombstoneRetentionMs.getOrElse(conf.tombstoneRetentionMs))
  }
}
