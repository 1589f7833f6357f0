package graft.connector

import graft.log.FileTopicLog

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-topic payload schema registry (round-11 verdict #5): the lift schema
  * lives in topic metadata (`<root>/<topic>/.schema`, a StructType JSON
  * document), registered at create or first packed write — so `lift` needs
  * no caller-supplied schema and `CREATE TABLE ... USING ripple` with
  * `lift 'true'` exposes the payload columns directly. The reference keeps
  * topic metadata in its ZK tree (`internal/topic/topic.go:12-25` in
  * ripple-mq/ripple-server) but payloads stay untyped byte blobs there
  * (GOB, flagged non-portable at `internal/broker/consumer/server/core.go:14`);
  * the registry is what turns a topic into a TABLE.
  *
  * Drift policy: registration against an existing DIFFERENT schema fails
  * loudly — a second producer shipping a new payload shape must migrate
  * explicitly (new topic, or [[dropSchema]] + re-register), never silently
  * fork the readers' view of the columns.
  */
object TopicSchemas {

  private def path(log: FileTopicLog, topic: String): HPath =
    new HPath(new HPath(log.root, topic), ".schema")

  /** The registered payload schema, if any. A torn/garbage document reads
    * as a loud parse failure, not as "no schema" — silently reverting a
    * typed topic to blobs would break every lifted reader downstream.
    */
  def get(log: FileTopicLog, topic: String): Option[StructType] =
    try Some(DataType.fromJson(log.readFileUtf8(path(log, topic))).asInstanceOf[StructType])
    catch { case _: java.io.FileNotFoundException => None }

  /** The registered schema or a loud, actionable absence. */
  def require(log: FileTopicLog, topic: String): StructType =
    get(log, topic).getOrElse(throw new IllegalArgumentException(
      s"topic '$topic' has no registered payload schema. Register one with " +
        "Ripple.createTopic(root, topic, n, schema) or write through " +
        "Ripple.writePacked (which registers the frame's schema), or pass " +
        "an explicit schema to Ripple.lift."))

  /** Register `schema` for `topic`; idempotent for the same schema,
    * LOUD on drift (see class doc). Field ORDER is part of the contract —
    * lifted column order is user-visible.
    */
  def register(log: FileTopicLog, topic: String, schema: StructType): Unit =
    get(log, topic) match {
      case Some(existing) if existing != schema =>
        throw new IllegalStateException(
          s"topic '$topic' already has a registered payload schema\n  " +
            s"registered: ${existing.simpleString}\n  incoming:   " +
            s"${schema.simpleString}\nSchema drift on a shared topic breaks " +
            "every lifted reader; migrate to a new topic or drop the old " +
            "schema explicitly (TopicSchemas.dropSchema) after draining " +
            "consumers.")
      case Some(_) => ()
      case None =>
        log.writeFileAtomic(path(log, topic),
          schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  /** Explicit schema removal — the migration escape hatch. */
  def dropSchema(log: FileTopicLog, topic: String): Unit =
    try log.fs.delete(path(log, topic), false)
    catch { case _: java.io.IOException => () }
}
