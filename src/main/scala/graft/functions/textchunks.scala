package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Content-defined chunk statistics from a words array, in ONE pass with
  * ONE reused byte buffer — element j = (n_words, chunk_hash) of the j-th
  * CDC chunk: a word whose hash ≡ 0 (mod `modulus`) CLOSES its chunk, the
  * trailing partial chunk (if any) is emitted last, and `chunk_hash` is
  * the hash of the chunk's words joined by single spaces.
  *
  * This replaces the declarative `aggregate` fold in
  * [[graft.ops.Dedup.cdcChunks]], which appends each word to an
  * array<string> accumulator and each closed chunk to an
  * array<array<string>> accumulator — O(words²/chunks) COPIED cells per
  * row at the ArrayData level (every append copies the whole accumulator),
  * plus a posexplode that ships whole chunk word-arrays only to hash and
  * count them. Here the per-row garbage is the word-bytes array + one
  * small struct per chunk.
  *
  * Hash families and their bit-identity guarantees are [[GramHashes]]'s
  * (`portable = false` → XXH64 seed 42 == `xxhash64`; `portable = true` →
  * first 60 md5 bits == `conv(substring(md5(s),1,15),16,10)`), applied to
  * BOTH the per-word boundary test (`pmod(hash(word), modulus) == 0`,
  * null word → not a boundary, matching the fold's null-condition
  * `otherwise` branch) and the chunk-join hash (null words contribute
  * neither bytes nor separator — `concat_ws` semantics — but DO count in
  * `n_words`, matching `size(chunk)`). Property-tested identical to the
  * fold in FunctionsSpec.
  */
case class CdcChunkStats(child: Expression, modulus: Int, portable: Boolean)
    extends UnaryExpression {
  require(modulus >= 1, s"modulus=$modulus must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n_words", LongType, nullable = false),
      StructField("chunk_hash", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("cdcChunkStats", this, classOf[CdcChunkStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($arr);"
    })

  def compute(words: ArrayData): ArrayData = {
    val t = words.numElements()
    if (t == 0) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](t)
    var total = 0
    var i = 0
    while (i < t) {
      val w = words.getUTF8String(i)
      if (w != null) { wb(i) = w.getBytes; total += wb(i).length }
      i += 1
    }
    val buf = GramHashes.buffer(total + t)
    val out = new scala.collection.mutable.ArrayBuffer[Any](t / modulus + 1)
    var start = 0 // first word index of the current chunk
    i = 0
    while (i < t) {
      // boundary test on the single word's hash; null word never closes
      val boundary = wb(i) != null && {
        val h = GramHashes.hashBytes(wb(i), wb(i).length, portable)
        java.lang.Math.floorMod(h, modulus.toLong) == 0L
      }
      if (boundary) {
        val len = GramHashes.assembleRange(wb, start, i + 1, buf)
        out += new GenericInternalRow(Array[Any]((i + 1 - start).toLong,
          GramHashes.hashBytes(buf, len, portable)))
        start = i + 1
      }
      i += 1
    }
    if (start < t) { // trailing partial chunk
      val len = GramHashes.assembleRange(wb, start, t, buf)
      out += new GenericInternalRow(Array[Any]((t - start).toLong,
        GramHashes.hashBytes(buf, len, portable)))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunkStats = copy(child = c)
  override def prettyName: String = "cdc_chunk_stats"
}

/** Sliding-window minima of a long array, deduped to first occurrence —
  * element order and values identical to
  * `array_distinct(transform(sequence(1, n−w+1), j => array_min(slice(gh,
  * j, w))))` for n ≥ w, `array(array_min(gh))` for 1 ≤ n < w, empty for
  * n = 0 (the [[graft.ops.Dedup.winnowFingerprints]] select chain).
  *
  * The declarative form allocates a sequence array plus a sliced copy per
  * window and scans w elements per position — O(n·w) work and O(n)
  * allocations per row; this is the classic monotonic-deque sliding
  * minimum: O(n) work, two scratch arrays per row. Input elements must be
  * non-null (the fused [[GramHashes]] output — the only caller shape).
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window w=$w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("winnowMins", this, classOf[WinnowMins].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($arr);"
    })

  def compute(gh: ArrayData): ArrayData = {
    val n = gh.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      var mn = gh.getLong(0)
      var i = 1
      while (i < n) { val v = gh.getLong(i); if (v < mn) mn = v; i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(n, 64))
    var i = 0
    while (i < n) {
      val v = gh.getLong(i)
      while (tail > head && gh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = gh.getLong(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowMins = copy(child = c)
  override def prettyName: String = "winnow_mins"
}
