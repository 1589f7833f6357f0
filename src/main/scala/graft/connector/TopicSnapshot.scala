package graft.connector

import com.fasterxml.jackson.databind.ObjectMapper

/** Snapshot token codec — the corpus-pinning surface of the connector.
  *
  * A snapshot captures each bucket's committed offset range `[floor, end)`
  * at capture time as a small JSON token; a later batch read carrying the
  * token (option `snapshot`) sees EXACTLY that state — appends after the
  * capture are invisible, in-place compaction is transparent (it preserves
  * offsets by contract), and retention that has truncated past a pinned
  * floor fails the read loudly through [[RippleDataLoss]] instead of
  * silently returning fewer rows. This is what makes a training run
  * reproducible against a live topic: pin once, store the token with the
  * run config, and every re-read is the same corpus or a loud error.
  *
  * The reference can only replay from a caller-remembered offset per
  * consumer (`internal/broker/consumer/server/core.go:46-64` in
  * ripple-mq/ripple-server) and never truncates, so "the corpus I trained
  * on" is not a first-class object there; here it is one string.
  *
  * Token shape (versioned, forward-refusable):
  * `{"v":1,"topic":"t","buckets":{"b0":[floor,end],...}}`, plus
  * `"schemaV":n` when the topic carries a registered payload schema at
  * capture time — a later LIFTED read of the pin parses payloads with
  * THAT schema version ([[TopicSchemas.schemaAt]]), so evolving the
  * schema after the capture cannot change what the pinned corpus looks
  * like. Offsets are per-bucket and capture is one metadata pass — exact
  * within each bucket; across buckets the capture is a consistent-prefix
  * cut, not a global barrier (the same contract as any partitioned log's
  * end-offset poll).
  */
object TopicSnapshot {

  private val mapper = new ObjectMapper()

  def encode(topic: String, ranges: Map[String, (Long, Long)],
      schemaV: Option[Int] = None): String = {
    val root = mapper.createObjectNode()
    root.put("v", 1)
    root.put("topic", topic)
    schemaV.foreach(v => root.put("schemaV", v))
    val bs = root.putObject("buckets")
    ranges.toSeq.sortBy(_._1).foreach { case (b, (lo, hi)) =>
      val arr = bs.putArray(b)
      arr.add(lo); arr.add(hi)
    }
    mapper.writeValueAsString(root)
  }

  /** Parse a token into (topic, bucket -> [floor, end), schema version).
    * Loud on anything malformed — a snapshot read must never degrade to a
    * full read. Tokens cut before schema versioning existed carry no
    * `schemaV` and decode to None (the read lifts with the current
    * schema, the pre-versioning behavior).
    */
  def decode(token: String): (String, Map[String, (Long, Long)], Option[Int]) = {
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(s"ripple: malformed snapshot token ($why): $token")
    val root =
      try mapper.readTree(token)
      catch { case e: java.io.IOException => bad(e.getMessage) }
    if (root == null || !root.isObject) bad("not a JSON object")
    if (root.path("v").asInt(-1) != 1) bad(s"unsupported version ${root.path("v")}")
    val topic = root.path("topic").asText(null)
    if (topic == null || topic.isEmpty) bad("missing topic")
    val bs = root.path("buckets")
    if (!bs.isObject) bad("missing buckets object")
    val out = Map.newBuilder[String, (Long, Long)]
    val it = bs.fields()
    while (it.hasNext) {
      val e = it.next()
      val arr = e.getValue
      if (!arr.isArray || arr.size() != 2 ||
          !arr.get(0).canConvertToLong || !arr.get(1).canConvertToLong)
        bad(s"bucket '${e.getKey}' range is not [lo, hi]")
      val lo = arr.get(0).asLong(); val hi = arr.get(1).asLong()
      if (lo < 0 || hi < lo) bad(s"bucket '${e.getKey}' range [$lo, $hi) is not a valid offset range")
      out += e.getKey -> (lo, hi)
    }
    val schemaV =
      if (!root.has("schemaV")) None
      else {
        val n = root.path("schemaV")
        if (!n.canConvertToInt || n.asInt() < 1) bad("schemaV is not a positive int")
        Some(n.asInt())
      }
    (topic, out.result(), schemaV)
  }
}
