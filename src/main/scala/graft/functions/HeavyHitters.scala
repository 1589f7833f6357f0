package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary: a k-entry (item, weight) table with
  * the guarantee that EVERY item whose true frequency exceeds n/(k+1)
  * survives (weights are undercounts by at most n/(k+1); absence proves
  * freq ≤ n/(k+1), presence proves nothing — callers re-count the ≤ k
  * candidates exactly).
  *
  * This is the frequent-items shape for when the distinct-item domain is
  * too large to group: the full groupBy shuffles partial counts for EVERY
  * distinct item, while each MG partial here is a bounded k-entry map
  * regardless of domain size, and the merge (Agarwal et al., "Mergeable
  * Summaries": sum counts, subtract the (k+1)-th largest, drop ≤ 0)
  * preserves the guarantee across partitions — so the whole aggregation
  * shuffles O(partitions × k), not O(distinct items).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], t: String): Map[String, Long] =
    m.get(t) match {
      case Some(c) => m.updated(t, c + 1)
      case None if m.size < k => m.updated(t, 1L)
      case None => // decrement-all; entries hitting 0 drop out
        m.collect { case (i, c) if c > 1 => (i, c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest weight from everything, keep > 0
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      summed.collect { case (t, c) if c > cut => (t, c - cut) }
    }
  }

  /** Descending weight, ties by item — deterministic presentation. */
  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
