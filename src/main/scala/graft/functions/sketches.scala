package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.bridge

/** Custom Catalyst expressions for the sketch hot paths (SURVEY §4: the
  * only justified custom Catalyst work besides the connector).
  *
  * The declarative versions of these ops (64 `transform`/`aggregate`
  * higher-order lambdas per row) evaluate one boxed lambda call per
  * element×hash — measured ~2.4 ms/doc at sf0.1. These expressions do the
  * same arithmetic in tight primitive JVM loops (~100× less overhead),
  * with identical results. Inputs are pre-hashed `array<long>` columns so
  * the xxhash64 stage stays in codegen'd built-ins.
  */

/** MinHash signature: for each (a,b) pair, min over elements of
  * (a*h + b) mod p, p = 2^31-1. Input: array<long> of 31-bit hashes.
  */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val asRef = ctx.addReferenceObj("as", as, "long[]")
      val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$asRef.length];
         |java.util.Arrays.fill($sig, $n == 0 ? 0L : Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $asRef.length; $j++) {
         |    long $v = java.lang.Math.floorMod($asRef[$j] * $h + $bsRef[$j], ${P}L);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(as(j) * h + bs(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash from an array<long> of element hashes: bit k of the
  * result is set iff sum over elements of (±1 by bit k of the hash) > 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sums = ctx.freshName("sums")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $sums = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $sums[$k]++; else $sums[$k]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($sums[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) > 0) sig |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Exact Jaccard similarity of two string arrays (hash-set based — the
  * built-in array_intersect + size pair walks both arrays twice through
  * generic comparators).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[Any](b.numElements() * 2)
    i = 0
    while (i < b.numElements()) { setB.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) { if (setB.contains(it.next())) inter += 1 }
    val union = setA.size() + setB.size() - inter
    java.lang.Double.valueOf(if (union == 0) 1.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}

/** Jaccard over PRE-SORTED distinct string arrays: a linear merge walk —
  * no per-pair hash sets, no allocation. Callers sort once per row with
  * `array_sort` (binary UTF8 order, the same comparator used here); the
  * value is identical to [[JaccardSim]] on the same sets.
  */
case class SortedJaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    java.lang.Double.valueOf(if (union == 0) 1.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard_sim"
}

/** Jaccard over PRE-SORTED distinct long arrays (64-bit shingle hashes):
  * the pairwise-join representation — 8 bytes/shingle instead of a UTF8
  * string, primitive compares in the merge walk. With 64-bit hashes the
  * collision probability over millions of shingles is ~2^-40, so counts
  * match string-set jaccard exactly in practice.
  */
case class SortedJaccardLongSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    java.lang.Double.valueOf(if (union == 0) 1.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardLongSim =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard_long_sim"
}

/** Cosine similarity over two array<double> columns — primitive loop
  * replacement for the zip_with + aggregate chain. Implements `doGenCode`,
  * so it fuses into the surrounding WholeStageCodegen stage instead of
  * paying the CodegenFallback virtual call per row.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // Zero-norm → 0.0, not NaN: Spark orders NaN as the LARGEST double, so
    // a NaN here would rank a zero vector first in every top-k.
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / math.sqrt(na) / math.sqrt(nb))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Top-n nearest centroids (by cosine, descending; ties by ascending
  * centroid id) for one vector — the shuffle-free replacement for the
  * crossJoin(centroids) + Window argmax plan, which shuffled corpus × C
  * rows just to take a per-row argmax. Centroids are a driver-side array
  * (C is small by construction — it's a coarse quantizer), embedded in the
  * expression like a broadcast. The cosine accumulation order is identical
  * to [[CosineSim]], so the selected ids match the window formulation
  * bitwise. `cents` must be sorted by ascending cid for the tie-break.
  */
case class TopCentroids(child: Expression, cents: Array[Array[Double]],
    cids: Array[Long], n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = cents.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val p = cents(c)
      val m = math.min(arr.numElements(), p.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = arr.getDouble(i); val y = p(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      cos(c) = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na) / math.sqrt(nb)
      c += 1
    }
    val take = math.min(n, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Long](take)
    var r = 0
    while (r < take) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 || cos(j) > cos(best))) best = j
        j += 1
      }
      taken(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val cos = ctx.freshName("cos")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val take = ctx.freshName("take")
      s"""
         |double[] $cos = new double[$centsRef.length];
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] p = $centsRef[$c];
         |  int m = java.lang.Math.min($arr.numElements(), p.length);
         |  double dot = 0.0, na = 0.0, nb = 0.0;
         |  for (int $i = 0; $i < m; $i++) {
         |    double x = $arr.getDouble($i); double y = p[$i];
         |    dot += x * y; na += x * x; nb += y * y;
         |  }
         |  $cos[$c] = (na == 0.0 || nb == 0.0)
         |    ? 0.0 : dot / java.lang.Math.sqrt(na) / java.lang.Math.sqrt(nb);
         |}
         |int $take = java.lang.Math.min($n, $centsRef.length);
         |boolean[] $taken = new boolean[$centsRef.length];
         |long[] $out = new long[$take];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $best = -1;
         |  for (int $j = 0; $j < $centsRef.length; $j++) {
         |    if (!$taken[$j] && ($best < 0 || $cos[$j] > $cos[$best])) $best = $j;
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $cidsRef[$best];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TopCentroids = copy(child = c)
  override def prettyName: String = "top_centroids"
}

/** Random-hyperplane LSH band keys for one embedding: numBands keys, bit i
  * of band b set iff dot(v, planes[b*planesPerBand + i]) >= 0. Replaces
  * numPlanes interpreted zip_with + aggregate lambda chains per row (the
  * same hotspot class MinHashSig/SimHash64 fixed — ~2.4 ms/doc) with one
  * primitive loop; the dot accumulation order matches the sequential
  * `aggregate` fold, so the produced keys are identical.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]],
    planesPerBand: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numBands = planes.length / planesPerBand
    val out = new Array[Long](numBands)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val m = math.min(arr.numElements(), pl.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += arr.getDouble(i) * pl(i); i += 1 }
      if (dot >= 0) out(p / planesPerBand) |= (1L << (p % planesPerBand))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$planesRef.length / $planesPerBand];
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] pl = $planesRef[$p];
         |  int m = java.lang.Math.min($arr.numElements(), pl.length);
         |  double dot = 0.0;
         |  for (int $i = 0; $i < m; $i++) { dot += $arr.getDouble($i) * pl[$i]; }
         |  if (dot >= 0) $out[$p / $planesPerBand] |= (1L << ($p % $planesPerBand));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSig = copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}

/** Product-quantization encode: the vector is split into m contiguous
  * subvectors; each maps to the id of its nearest (squared-L2) codebook
  * centroid — ties to the lower id. `codebooks` is [m][ksub][dsub],
  * flattened row-major per subspace. One primitive loop per row encodes
  * all m subspaces (8 bytes/vector at m=8 — the compression that lets a
  * 100 TB embedding corpus sit in executor memory as codes).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val out = new Array[Int](m)
    var j = 0
    var base = 0
    while (j < m) {
      val cents = codebooks(j)
      val dsub = cents(0).length
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = arr.getDouble(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = bestC
      base += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val out = ctx.freshName("out")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val cents = ctx.freshName("cents")
      val dsub = ctx.freshName("dsub")
      val bestC = ctx.freshName("bestC")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |int[] $out = new int[$cbRef.length];
         |int $base = 0;
         |for (int $j = 0; $j < $cbRef.length; $j++) {
         |  double[][] $cents = $cbRef[$j];
         |  int $dsub = $cents[0].length;
         |  int $bestC = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $diff = $arr.getDouble($base + $i) - $cents[$c][$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |  $base += $dsub;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** Per-query ADC (asymmetric distance computation) lookup tables: for each
  * subspace j and centroid c, the squared L2 distance between the query's
  * j-th subvector and that centroid — flattened to array<double> of
  * length m·ksub. Computed once per QUERY row; corpus rows then score by
  * m table lookups instead of a dim-length float loop.
  */
case class PqTables(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val ksub = codebooks(0).length
    val out = new Array[Double](m * ksub)
    var j = 0
    var base = 0
    while (j < m) {
      val cents = codebooks(j)
      val dsub = cents(0).length
      var c = 0
      while (c < ksub) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = arr.getDouble(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        out(j * ksub + c) = d
        c += 1
      }
      base += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val out = ctx.freshName("out")
      val ksub = ctx.freshName("ksub")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val cents = ctx.freshName("cents")
      val dsub = ctx.freshName("dsub")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |int $ksub = $cbRef[0].length;
         |double[] $out = new double[$cbRef.length * $ksub];
         |int $base = 0;
         |for (int $j = 0; $j < $cbRef.length; $j++) {
         |  double[][] $cents = $cbRef[$j];
         |  int $dsub = $cents[0].length;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $diff = $arr.getDouble($base + $i) - $cents[$c][$i];
         |      $d += $diff * $diff;
         |    }
         |    $out[$j * $ksub + $c] = $d;
         |  }
         |  $base += $dsub;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqTables = copy(child = c)
  override def prettyName: String = "pq_tables"
}

/** ADC score: approximate squared L2 distance between a query and a
  * PQ-encoded corpus vector — Σ_j tables[j·ksub + codes[j]]. m array
  * lookups per (query, candidate) pair; with m=8 that is 16× less work
  * than a 64-dim float loop, which is the point of PQ search.
  */
case class PqAdcDist(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** left = codes array<int>, right = tables array<double>. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val tables = r.asInstanceOf[ArrayData]
    var d = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      d += tables.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    java.lang.Double.valueOf(d)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tables) => {
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      s"""
         |double $d = 0.0;
         |for (int $j = 0; $j < $codes.numElements(); $j++) {
         |  $d += $tables.getDouble($j * $ksub + $codes.getInt($j));
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDist =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_dist"
}

/** v − centroid(cid): the residual an IVF-PQ index encodes. The centroid
  * table rides as a reference object (broadcast semantics, like
  * [[TopCentroids]]) with an O(1) cid→index hash lookup — NOT a
  * plan-embedded map literal, whose `element_at` is a linear scan over all
  * C entries per row and whose doubles serialize into every stage's
  * expression tree (~25 MB at C=4096, dim=768).
  */
case class CentroidResidual(left: Expression, right: Expression,
    cm: Array[Array[Double]], cids: Array[Long]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // built once on the driver, shipped with the (serializable) expression
  private val idx: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](cids.length * 2)
    cids.zipWithIndex.foreach { case (c, i) => m.put(c, i) }
    m
  }

  /** left = vec array<double>, right = cid long. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val ix = idx.get(r.asInstanceOf[Long])
    if (ix == null)
      throw new IllegalStateException(s"unknown centroid id $r")
    val cent = cm(ix)
    val n = arr.numElements()
    // loud like the unknown-cid path: a silent partial subtraction would
    // produce garbage residuals (and garbage PQ codes) downstream
    if (n != cent.length)
      throw new IllegalStateException(
        s"vector dim $n != centroid dim ${cent.length} for centroid id $r")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = arr.getDouble(i) - cent(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, cid) => {
      val cmRef = ctx.addReferenceObj("cm", cm, "double[][]")
      val idxRef = ctx.addReferenceObj("cidIdx", idx, "java.util.HashMap")
      val ix = ctx.freshName("ix")
      val cent = ctx.freshName("cent")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |Integer $ix = (Integer) $idxRef.get($cid);
         |if ($ix == null)
         |  throw new IllegalStateException("unknown centroid id " + $cid);
         |double[] $cent = $cmRef[$ix.intValue()];
         |int $n = $arr.numElements();
         |if ($n != $cent.length)
         |  throw new IllegalStateException(
         |    "vector dim " + $n + " != centroid dim " + $cent.length);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $arr.getDouble($i) - $cent[$i]; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CentroidResidual = copy(left = l, right = r)
  override def prettyName: String = "centroid_residual"
}

/** Column-level wrappers. */
object sketches {
  private def c(e: Expression): Column = bridge.column(e)
  private def e(col: Column): Expression = bridge.expression(col)

  def minhash_sig(hashes: Column, as: Array[Long], bs: Array[Long]): Column =
    c(MinHashSig(e(hashes), as, bs))
  def simhash64(hashes: Column): Column = c(SimHash64(e(hashes)))
  def jaccard_sim(a: Column, b: Column): Column = c(JaccardSim(e(a), e(b)))
  def sorted_jaccard_sim(a: Column, b: Column): Column = c(SortedJaccardSim(e(a), e(b)))
  def sorted_jaccard_long_sim(a: Column, b: Column): Column = c(SortedJaccardLongSim(e(a), e(b)))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))
  def top_centroids(vec: Column, cents: Array[Array[Double]],
      cids: Array[Long], n: Int): Column = c(TopCentroids(e(vec), cents, cids, n))
  def hyperplane_sig(vec: Column, planes: Array[Array[Double]],
      planesPerBand: Int): Column = c(HyperplaneSig(e(vec), planes, planesPerBand))
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    c(PqEncode(e(vec), codebooks))
  def pq_tables(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    c(PqTables(e(vec), codebooks))
  def pq_adc_dist(codes: Column, tables: Column, ksub: Int): Column =
    c(PqAdcDist(e(codes), e(tables), ksub))
  def centroid_residual(vec: Column, cid: Column, cm: Array[Array[Double]],
      cids: Array[Long]): Column = c(CentroidResidual(e(vec), e(cid), cm, cids))
}
