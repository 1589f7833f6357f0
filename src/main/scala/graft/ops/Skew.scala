package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-skew management for joins whose key distribution is hot — the
  * classic 100 TB failure mode: one popular join key (a viral URL's
  * domain, an empty-string default, a bot user) lands an entire shuffle
  * partition on one task, and the stage runs at the speed of that
  * straggler while 999 executors idle.
  *
  * AQE's runtime skew-join splitting (enabled in this engine's sessions)
  * handles the SORT-MERGE case after the fact; [[saltedJoin]] is the
  * PLANNED fix — it never builds the hot partition in the first place,
  * works under any join strategy, and its fan-out is an explicit, sized
  * knob rather than a runtime heuristic.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join with the left side's hot keys spread over `salts`
    * sub-partitions: every left row gets a deterministic salt in
    * [0, salts), the right side is replicated once per salt value, and the
    * join key becomes (keys…, salt) — so a key that used to be one shuffle
    * partition becomes `salts` independent ones, each joining against its
    * own copy of the right rows. Output is EXACTLY the plain join (salting
    * partitions the probe space; every (left, right) key match still meets
    * exactly once — in the left row's salt partition).
    *
    * Cost model: the right side ships `salts`× (choose the SMALLER side as
    * `right`); the left side ships once, as always. Use when the right
    * side is too big to broadcast but the left's key histogram is skewed —
    * the regime between `broadcast()` (tiny right) and a plain shuffle
    * join (uniform keys).
    *
    * The salt derives from a hash of the whole left row (caller can pass
    * `saltOn` — e.g. a unique id column — when rows can repeat), so it is
    * deterministic under retries and partition relayout: a replayed task
    * salts its rows identically.
    *
    * `joinType`: inner or left/left_outer (right/full would need the salt
    * on the preserved side to be exhaustive, which replication breaks).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Option[Column] = None): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // accept every alias Spark's own parser does: left == left_outer ==
    // leftouter
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(jt == "inner" || jt == "left",
      s"saltedJoin supports inner/left joins, got $joinType")
    val basis = saltOn.getOrElse(xxhash64(struct(left.columns.map(col): _*)))
    val l = left.withColumn(SaltCol, pmod(basis, lit(salts.toLong)).cast("int"))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
