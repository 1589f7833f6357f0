package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, BooleanType}
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
  * itself, independent of row count. Probe: [[BloomMightContain]] embeds
  * the (driver-collected) bitset like a broadcast and tests k positions
  * per row inside codegen.
  *
  * Sizing: `BloomParams.forItems` gives the textbook m/k, refusing past
  * 2^31 bits (256 MB, ~2e8 items at 1% fpp) rather than silently
  * degrading the fpp; beyond that, shard the corpus by fingerprint prefix
  * and build one filter per shard (the probe side routes by the same
  * prefix), keeping each bitset broadcast-sized.
  *
  * Hash scheme (shared by build and probe — must match bit-for-bit):
  * double hashing pos_i = (h + i·mix(h)) mod m over the caller's xxhash64
  * key hash, mix = splitmix64 finalizer.
  */
object BloomParams {

  /** (numBits rounded up to a multiple of 64, numHashFunctions). Refuses
    * rather than silently degrading: past ~2^31 bits (≈1.7e8 items at 1%
    * fpp per 256 MB of bitset, ~2e9 items at the cap) the realized
    * false-positive rate would quietly be orders of magnitude worse than
    * requested and the "tiny colliding slice" contract would collapse into
    * a near-full anti-join — at that scale, shard the corpus by
    * fingerprint prefix and build one filter per shard instead.
    */
  def forItems(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2.0)
    val m = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    require(m <= Int.MaxValue.toLong - 63,
      s"bloom filter for $expectedItems items @ fpp=$fpp needs $m bits (> 2^31): " +
        "shard by fingerprint prefix and build one filter per shard")
    val mr = (((m + 63) / 64) * 64).toInt
    val k = math.max(1, math.round(mr.toDouble / expectedItems * ln2).toInt)
    (mr, k)
  }

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

/** Probe: true iff the key hash MAY be in the set the bitset was built
  * from (false ⇒ definitely absent). The bitset rides along like a
  * broadcast value via `addReferenceObj`, and the k-position test runs in
  * generated code inside the surrounding WholeStageCodegen stage.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  private val numBits = bits.length * 64

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      BloomParams.testBits(bits, numBits, k, input.asInstanceOf[Long]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val bitsRef = ctx.addReferenceObj("bits", bits, "long[]")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      s"""
         |long $h2 = $h + 0x9E3779B97F4A7C15L;
         |$h2 = ($h2 ^ ($h2 >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$h2 = ($h2 ^ ($h2 >>> 27)) * 0x94D049BB133111EBL;
         |$h2 = $h2 ^ ($h2 >>> 31);
         |boolean $hit = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  int $pos = (int) java.lang.Math.floorMod($h + $i * $h2, ${numBits}L);
         |  if (($bitsRef[$pos >>> 6] & (1L << ($pos & 63))) == 0L) { $hit = false; break; }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BloomMightContain = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object bloom {
  def might_contain(hash: Column, bits: Array[Long], k: Int): Column =
    bridge.column(BloomMightContain(bridge.expression(hash), bits, k))
}
