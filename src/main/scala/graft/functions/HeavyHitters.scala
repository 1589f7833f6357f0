package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries buffer: stored counts are RELATIVE to `offset` (an entry's
  * effective weight is `count - offset`; entries at or below the offset
  * are logically absent and reclaimed lazily). The offset turns MG's
  * "decrement every counter" step into an O(1) increment plus an
  * allocation-free staleness scan — without it, every cache miss on a
  * saturated summary rebuilds the whole k-entry map, O(n·k) allocation
  * churn on exactly the long-tail streams the sketch exists for.
  */
case class MGBuf(counts: Map[String, Long], offset: Long)

/** Misra–Gries heavy-hitters summary: a k-entry (item, weight) table with
  * the guarantee that EVERY item whose true frequency exceeds n/(k+1)
  * survives (weights are undercounts by at most n/(k+1); absence proves
  * freq ≤ n/(k+1), presence proves nothing — callers re-count the ≤ k
  * candidates exactly). NULL items are ignored.
  *
  * This is the frequent-items shape for when the distinct-item domain is
  * too large to group: the full groupBy shuffles partial counts for EVERY
  * distinct item, while each MG partial here is a bounded k-entry map
  * regardless of domain size, and the merge (Agarwal et al., "Mergeable
  * Summaries": sum weights, subtract the (k+1)-th largest, drop ≤ 0)
  * preserves the guarantee across partitions — so the whole aggregation
  * shuffles O(partitions × k), not O(distinct items).
  */
class MisraGries(k: Int)
    extends Aggregator[String, MGBuf, Seq[(String, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, t: String): MGBuf =
    if (t == null) b
    else b.counts.get(t) match {
      case Some(c) if c > b.offset => b.copy(counts = b.counts.updated(t, c + 1))
      case Some(_) => // stale entry (decremented to zero): reclaim in place
        b.copy(counts = b.counts.updated(t, b.offset + 1))
      case None if b.counts.size < k =>
        b.copy(counts = b.counts.updated(t, b.offset + 1))
      case None =>
        // reclaim stale entries if any exist (amortized: a prune that
        // frees s slots pays for s subsequent inserts); the exists probe
        // is an allocation-free scan, so the common saturated-miss path
        // costs one scan + one O(1) offset bump — no map rebuild
        if (b.counts.exists { case (_, c) => c <= b.offset }) {
          val live = b.counts.filter { case (_, c) => c > b.offset }
          MGBuf(live.updated(t, b.offset + 1), b.offset)
        } else b.copy(offset = b.offset + 1) // decrement-all in O(1)
    }

  private def effective(b: MGBuf): Map[String, Long] =
    b.counts.collect { case (t, c) if c > b.offset => (t, c - b.offset) }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val ea = effective(a)
    val summed = effective(b).foldLeft(ea) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) MGBuf(summed, 0L)
    else {
      // subtract the (k+1)-th largest weight from everything, keep > 0
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      MGBuf(summed.collect { case (t, c) if c > cut => (t, c - cut) }, 0L)
    }
  }

  /** Descending weight, ties by item — deterministic presentation. */
  override def finish(b: MGBuf): Seq[(String, Long)] =
    effective(b).toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
