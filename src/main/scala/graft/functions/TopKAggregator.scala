package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A (candidate, score) pair scored against one query group. */
case class Scored(query_id: Long, vec_id: Long, cos: Double)

/** One retained hit. */
case class TopHit(vec_id: Long, cos: Double)

/** Typed UDAF (SURVEY §2 Table B "UDF / UDAF" row): keeps the k best
  * (score, id) pairs per group in a bounded buffer.
  *
  * This is the scalable shape for per-query top-k similarity: a window
  * `row_number() <= k` must shuffle EVERY scored (query, candidate) row to
  * rank them, while this aggregator reduces map-side — each partition
  * ships at most k hits per group, so the shuffle is O(groups × k)
  * instead of O(corpus × queries). At 100 TB that is the difference
  * between a scan-and-reduce and an impossible shuffle.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[TopHit], Seq[TopHit]] {

  require(k > 0, s"k must be positive, got $k")

  /** Descending score, ascending id on ties — same deterministic order as
    * the window formulation it replaces.
    */
  private val ord: Ordering[TopHit] = Ordering.by(h => (-h.cos, h.vec_id))

  override def zero: Seq[TopHit] = Seq.empty

  override def reduce(buf: Seq[TopHit], x: Scored): Seq[TopHit] = {
    val h = TopHit(x.vec_id, x.cos)
    if (buf.size < k) (buf :+ h).sorted(ord)
    else if (ord.lt(h, buf.last)) (buf.init :+ h).sorted(ord)
    else buf
  }

  override def merge(a: Seq[TopHit], b: Seq[TopHit]): Seq[TopHit] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[TopHit]): Seq[TopHit] = buf

  override def bufferEncoder: Encoder[Seq[TopHit]] = ExpressionEncoder[Seq[TopHit]]()
  override def outputEncoder: Encoder[Seq[TopHit]] = ExpressionEncoder[Seq[TopHit]]()
}
