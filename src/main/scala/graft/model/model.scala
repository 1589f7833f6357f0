package graft.model

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * The reference's fundamental record is an opaque byte blob with a
  * client-assigned int32 id (`internal/broker/queue/queue.go:15-19` in
  * ripple-mq/ripple-server). We keep that record shape as the typed payload
  * and add the Kafka-connector-style envelope metadata columns (topic,
  * bucket, offset, ts) that make the log queryable from Spark SQL.
  */
final case class Payload(id: Int, data: Array[Byte]) {
  override def equals(o: Any): Boolean = o match {
    case Payload(i, d) => i == id && java.util.Arrays.equals(d, data)
    case _             => false
  }
  override def hashCode(): Int = id * 31 + java.util.Arrays.hashCode(data)
}

/** Topic + bucket pair — the unit of placement, replication and ordering in
  * the reference (`internal/topic/topic.go:12-21`). A bucket maps to one
  * Spark input partition of the streaming source.
  */
final case class TopicBucket(topic: String, bucket: String) {
  /** Stable identity for the bucket, mirroring the reference's
    * md5(topic/bucket) id (`internal/topic/topic.go:17-21`) without
    * depending on its byte layout.
    */
  def path: String = s"$topic/$bucket"
}

/** A record as it appears in the log with envelope metadata. */
final case class LogRecord(
    topic: String,
    bucket: String,
    offset: Long,
    id: Int,
    data: Array[Byte],
    ts: java.sql.Timestamp)

object Schemas {
  /** Record-headers column type — the Kafka connector's `headers` shape
    * (KIP-82 / `includeHeaders=true` parity): ordered (key, value) pairs,
    * duplicate keys legal, value nullable. An array of structs, NOT a
    * map — header order and duplicates are part of the record.
    */
  val headersType: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true)
  )), containsNull = false)

  /** Envelope schema of a topic scan — the idiomatic Spark rendering of an
    * opaque-payload message queue (key/value BINARY + metadata columns).
    */
  val envelope: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("bucket", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("id", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true)
  ))

  /** Envelope + trailing `headers` column — the `includeHeaders=true`
    * read schema (null when the record carries no headers).
    */
  val envelopeWithHeaders: StructType =
    StructType(envelope.fields :+
      StructField("headers", headersType, nullable = true))

  /** Payload-only schema (what producers write). */
  val payload: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = true)
  ))

  /** Lifted topic schema: underscore-prefixed envelope metadata followed by
    * the registered payload fields — payload fields may legitimately be
    * named ts/id/offset, so the metadata prefix prevents collisions (the
    * same convention [[graft.api.Ripple.lift]] has always produced).
    */
  def lifted(payload: StructType,
      includeHeaders: Boolean = false): StructType = StructType(Seq(
    StructField("_topic", StringType, nullable = false),
    StructField("_bucket", StringType, nullable = false),
    StructField("_offset", LongType, nullable = false),
    StructField("_id", IntegerType, nullable = false),
    StructField("_ts", TimestampType, nullable = true)
  ) ++ (if (includeHeaders)
          Seq(StructField("_headers", headersType, nullable = true))
        else Seq.empty)
    ++ payload.fields)
}
