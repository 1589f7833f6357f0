package graft.connector

import org.apache.spark.sql.connector.read.streaming.Offset

/** Streaming offset for the `ripple` source: end offset per bucket.
  *
  * Plays the role of the reference's per-consumer offset persisted in
  * ZooKeeper (`internal/broker/consumer/server/core.go:46-64`), except it
  * lives in the query checkpoint, which makes the commit transactional with
  * the batch — deliberately NOT reproducing the reference's over-advance
  * bug (`core.go:61-62`, SURVEY A9).
  *
  * Serialized as a canonical sorted JSON object {"bucket":end,...} so that
  * equal offsets have equal JSON (Spark compares offsets by serialized
  * form).
  */
case class RippleOffset(ends: Map[String, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (b, e) => s""""${b}":$e""" }
      .mkString("{", ",", "}")
}

object RippleOffset {
  /** Bucket names are restricted to [A-Za-z0-9._-] by the registry, so the
    * parser needs no escape handling.
    */
  def fromJson(s: String): RippleOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) RippleOffset(Map.empty)
    else RippleOffset(body.split(',').map { kv =>
      val Array(k, v) = kv.split(':')
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
    }.toMap)
  }
}
