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

  /** A frame schema SATISFIES the registered one when names, types, and
    * order match and the frame is at most as nullable per field — data
    * stricter than the contract is fine; data that may carry nulls where
    * the contract promises none is not.
    */
  private def satisfies(registered: StructType, incoming: StructType): Boolean =
    registered.length == incoming.length &&
      registered.fields.zip(incoming.fields).forall { case (r, i) =>
        r.name == i.name && r.dataType == i.dataType && (r.nullable || !i.nullable)
      }

  /** Register `schema` for `topic`; idempotent for a schema that satisfies
    * the registered one, LOUD on drift (see class doc). Field ORDER is
    * part of the contract — lifted column order is user-visible.
    */
  def register(log: FileTopicLog, topic: String, schema: StructType): Unit =
    get(log, topic) match {
      case Some(existing) if !satisfies(existing, schema) =>
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

  /** ADDITIVE evolution — the one compatible schema change: the registered
    * fields must be an exact PREFIX of the new schema (names, types,
    * nullability), and every appended field must be nullable, so every
    * already-written payload lifts under the new schema with NULLs in the
    * new columns (the JSON parser's missing-field behavior — no rewrite,
    * no versioning). Anything else (rename, retype, reorder, drop,
    * non-nullable add) stays a loud refusal: those changes make old blobs
    * unreadable or silently wrong.
    */
  def evolve(log: FileTopicLog, topic: String, schema: StructType): Unit = {
    val existing = require(log, topic)
    if (existing == schema) return
    // prefix: same names/types in order, nullability never NARROWED
    val prefixOk = schema.fields.length >= existing.fields.length &&
      existing.fields.zip(schema.fields).forall { case (e, p) =>
        e.name == p.name && e.dataType == p.dataType && (p.nullable || !e.nullable)
      }
    val addedNullable = schema.fields.drop(existing.fields.length).forall(_.nullable)
    if (!prefixOk || !addedNullable)
      throw new IllegalStateException(
        s"topic '$topic': schema evolution must be ADDITIVE — registered " +
          s"fields an exact prefix, appended fields nullable.\n  registered: " +
          s"${existing.simpleString}\n  proposed:   ${schema.simpleString}\n" +
          "Old payloads could not lift under this change; migrate to a new " +
          "topic instead.")
    log.writeFileAtomic(path(log, topic),
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
