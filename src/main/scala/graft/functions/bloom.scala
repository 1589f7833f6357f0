package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, BooleanType, IntegerType}
import org.apache.spark.sql.graft.bridge

/** Distributed Bloom filter over 64-bit key hashes — the membership
  * pre-filter for incremental dedup: "is this document's fingerprint
  * possibly in the historical corpus?" Guarantees NO false negatives
  * (a definite "absent" needs no further work); false positives are
  * confirmed by an exact join of only the colliding slice.
  *
  * Build: [[BloomBuildAggregator]] — each task folds its rows into a local
  * bitset, partial bitsets OR-merge up the aggregation tree, so the build
  * is one scan with map-side combine and the shuffled state is the bitset
  * itself, independent of row count. Probe: [[BloomProbe]] reads the
  * bitset(s) from a `sparkContext.broadcast` — ONE torrent-distributed
  * copy per executor, never a per-stage plan payload — and tests k
  * positions per row inside codegen.
  *
  * Sizing: `BloomParams.forItems` gives the textbook m/k for ONE bitset,
  * refusing past 2^31 bits (256 MB, ~2e8 items at 1% fpp) rather than
  * silently degrading the fpp. Past that, [[BloomParams.shardsFor]] splits
  * the key space by a salted hash ([[BloomShardOf]]) into enough shards
  * that each bitset fits; build and probe route by the same salt, so a key
  * always meets the bitset it was folded into.
  *
  * Hash scheme (shared by build and probe — must match bit-for-bit):
  * double hashing pos_i = (h + i·mix(h)) mod m over the caller's xxhash64
  * key hash, mix = splitmix64 finalizer. Shard routing uses
  * mix(h ^ ShardSalt) — the salt decorrelates the shard index from the
  * in-filter probe positions.
  */
object BloomParams {

  /** (numBits rounded up to a multiple of 64, numHashFunctions). Refuses
    * rather than silently degrading: past ~2^31 bits the realized
    * false-positive rate would quietly be orders of magnitude worse than
    * requested and the "tiny colliding slice" contract would collapse into
    * a near-full anti-join — shard first ([[shardsFor]]) so each filter
    * stays under the cap.
    */
  def forItems(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = bitsNeeded(expectedItems, fpp)
    require(m <= Int.MaxValue.toLong - 63,
      s"bloom filter for $expectedItems items @ fpp=$fpp needs $m bits (> 2^31): " +
        "shard by fingerprint prefix and build one filter per shard")
    val mr = (((m + 63) / 64) * 64).toInt
    val k = math.max(1, math.round(mr.toDouble / expectedItems * math.log(2.0)).toInt)
    (mr, k)
  }

  /** Textbook bit count for n items at the requested fpp. */
  def bitsNeeded(expectedItems: Long, fpp: Double): Long = {
    val ln2 = math.log(2.0)
    math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
  }

  /** Smallest shard count that keeps every per-shard bitset under the
    * 2^31-bit single-array cap. 1 for anything a single filter handles;
    * a 5e9-item corpus at 1% fpp needs 23 shards (~5.6 GB of bitsets
    * total — broadcast-distributed once, not a plan constant).
    */
  def shardsFor(expectedItems: Long, fpp: Double): Int = {
    val cap = Int.MaxValue.toLong - 63
    var shards = math.max(1L, (bitsNeeded(expectedItems, fpp) + cap - 1) / cap)
    // The build sizes each filter from ceil(items/shards), which can need a
    // few more bits than totalBits/shards — when the total lands within a
    // hair of shards×cap the per-shard filter would still trip forItems'
    // refusal. Bump until the sizing the build actually uses fits.
    while (bitsNeeded((expectedItems + shards - 1) / shards, fpp) > cap) shards += 1
    require(shards <= Int.MaxValue, "absurd shard count")
    shards.toInt
  }

  /** Salt for shard routing — decorrelates the shard index from the
    * double-hashing probe positions (both consume the same xxhash64 key).
    */
  val ShardSalt = 0x5851F42D4C957F2DL

  def shardOf(h: Long, shards: Int): Int =
    java.lang.Math.floorMod(mix(h ^ ShardSalt), shards.toLong).toInt

  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def setBits(bits: Array[Long], numBits: Int, k: Int, h: Long): Unit = {
    val h2 = mix(h)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h + i * h2, numBits.toLong).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def testBits(bits: Array[Long], numBits: Int, k: Int, h: Long): Boolean = {
    val h2 = mix(h)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h + i * h2, numBits.toLong).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Builds the bitset from a column of 64-bit key hashes. */
class BloomBuildAggregator(numBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numBits % 64 == 0 && numBits > 0, s"numBits $numBits must be a positive multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(bits: Array[Long], h: Long): Array[Long] = {
    BloomParams.setBits(bits, numBits, k, h)
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(bits: Array[Long]): Array[Long] = bits

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Shard index of a key hash: `shardOf(h, shards)` as a codegen'd column —
  * the build side groups by this, the probe side ([[BloomProbe]]) computes
  * the identical value inline, so a key always meets its own shard's
  * bitset.
  */
case class BloomShardOf(child: Expression, shards: Int) extends UnaryExpression {

  require(shards >= 1)

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(BloomParams.shardOf(input.asInstanceOf[Long], shards))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val z = ctx.freshName("z")
      s"""
         |long $z = ($h ^ ${BloomParams.ShardSalt}L) + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |$z = $z ^ ($z >>> 31);
         |${ev.value} = (int) java.lang.Math.floorMod($z, ${shards}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BloomShardOf = copy(child = c)
  override def prettyName: String = "bloom_shard_of"
}

/** Probe: true iff the key hash MAY be in the set the bitset was built
  * from (false ⇒ definitely absent). The bitsets arrive via
  * `sparkContext.broadcast` — resolved ONCE per generated-class instance
  * into a plain `long[][]` local, so the per-row cost is the same k-probe
  * loop as an embedded constant, without the plan-payload cost of one
  * (up to 256 MB × shards) copy per stage serialization.
  *
  * With multiple shards the row's shard index is computed inline with the
  * same salted splitmix64 as [[BloomShardOf]]; every shard bitset must be
  * the same length (enforced at construction).
  */
case class BloomProbe(child: Expression, bc: Broadcast[Array[Array[Long]]], k: Int)
    extends UnaryExpression {

  // Driver-side at construction/codegen; executors re-resolve via bc.value.
  @transient private lazy val shardsArr: Array[Array[Long]] = bc.value
  private val numShards: Int = { // captured while still on the driver
    val a = bc.value
    require(a.nonEmpty, "no shards")
    require(a.forall(_.length == a(0).length), "shard bitsets must be equal-sized")
    a.length
  }
  private val numBits: Int = bc.value(0).length * 64

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val s = if (numShards == 1) 0 else BloomParams.shardOf(h, numShards)
    java.lang.Boolean.valueOf(BloomParams.testBits(shardsArr(s), numBits, k, h))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val bcRef = ctx.addReferenceObj("bloomBc", bc,
        "org.apache.spark.broadcast.Broadcast")
      // resolve the broadcast once per generated-class instance, not per row
      val bits2d = ctx.addMutableState("long[][]", "bloomShards",
        v => s"$v = (long[][]) ($bcRef).value();")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val bits = ctx.freshName("bits")
      val z = ctx.freshName("z")
      val shardCode =
        if (numShards == 1) s"long[] $bits = $bits2d[0];"
        else
          s"""long $z = ($h ^ ${BloomParams.ShardSalt}L) + 0x9E3779B97F4A7C15L;
             |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
             |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
             |$z = $z ^ ($z >>> 31);
             |long[] $bits = $bits2d[(int) java.lang.Math.floorMod($z, ${numShards}L)];""".stripMargin
      s"""
         |$shardCode
         |long $h2 = $h + 0x9E3779B97F4A7C15L;
         |$h2 = ($h2 ^ ($h2 >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$h2 = ($h2 ^ ($h2 >>> 27)) * 0x94D049BB133111EBL;
         |$h2 = $h2 ^ ($h2 >>> 31);
         |boolean $hit = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  int $pos = (int) java.lang.Math.floorMod($h + $i * $h2, ${numBits}L);
         |  if (($bits[$pos >>> 6] & (1L << ($pos & 63))) == 0L) { $hit = false; break; }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BloomProbe = copy(child = c)
  override def prettyName: String = "bloom_probe"
}

object bloom {

  /** Single-filter probe; wraps the bitset in a one-shard broadcast so it
    * ships to executors once instead of riding every stage's task closure.
    */
  def might_contain(hash: Column, bits: Array[Long], k: Int): Column = {
    val sc = SparkSession.active.sparkContext
    might_contain_sharded(hash, sc.broadcast(Array(bits)), k)
  }

  /** Sharded probe against broadcast bitsets (routes by [[BloomShardOf]]'s
    * salted hash).
    */
  def might_contain_sharded(hash: Column, bc: Broadcast[Array[Array[Long]]],
      k: Int): Column =
    bridge.column(BloomProbe(bridge.expression(hash), bc, k))

  def shard_of(hash: Column, shards: Int): Column =
    bridge.column(BloomShardOf(bridge.expression(hash), shards))
}
