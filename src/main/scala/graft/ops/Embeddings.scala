package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics and linear compression: exact distributed
  * covariance and driver-side PCA — the whitening/dimension-reduction
  * step an embedding pipeline runs before ANN indexing or clustering
  * (smaller vectors → smaller indexes, decorrelated components → better
  * quantizers; OPQ/whitening in the FAISS tradition).
  *
  * Scale split (the same shape as [[Bpe]] and IVF training): the
  * CORPUS-SIZED work is exactly one aggregation whose state is bounded by
  * d(d+1)/2 cells regardless of row count — map-side combine reduces each
  * partition to one partial accumulator, the shuffle moves only
  * partitions × d² cells. The eigendecomposition then runs on the DRIVER
  * on a d×d matrix (d ≤ a few thousand by construction of any embedding
  * column; 64×64 here) — distributing an O(d³) solve over a d²-sized
  * input would pay orchestration for kilobytes. Projection is per-row,
  * embarrassingly parallel, the basis broadcast with the task closure.
  */
object Embeddings {

  /** Pairwise covariance of an embedding column, one row per (i ≤ j)
    * component pair: (i, j, n, cov) with
    * cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n) / (n−1).
    *
    * Per input row the pair explode generates d(d+1)/2 internal rows —
    * fused into the scan by codegen, never shuffled (the groupBy combines
    * map-side to d² cells, so the shuffle moves partitions × d² rows no
    * matter the corpus size). For d ≥ ~1k at full corpus scale, prefer
    * sampling rows (covariance estimation converges long before 100 TB)
    * over paying d²·N products — the STATE is bounded either way.
    *
    * `quantizeStep`: None (production) accumulates IEEE doubles — fast,
    * order-dependent in the last bits. Some(s) rounds every component to
    * the nearest multiple of `s` FIRST (`floor(x/s + 0.5)` — floor on an
    * identical double is bit-deterministic in every engine, unlike
    * decimal rounding of double PRODUCTS, whose shortest-representation
    * vs binary-value rounding differs between Spark and DuckDB) and
    * accumulates exact integers in DECIMAL(38,0); the result is the
    * covariance of the quantized matrix, identical on any engine — the
    * q132 gate runs s = 1e-6, the [[graft.ops.TextAnalysis.portableHash60]]
    * pattern of paying portability cost only where cross-engine exactness
    * is the point.
    */
  def embeddingCovariance(df: DataFrame, vecCol: String,
      quantizeStep: Option[Double] = None): DataFrame = {
    val base = Spread.toCores(df).select(col(vecCol).cast("array<double>").as("v"))
    val q = quantizeStep.map(1.0 / _)
    val expl0 = base.select(col("v"), posexplode(col("v")).as(Seq("i", "x")))
    val expl = q match {
      case Some(inv) => expl0.withColumn("x",
        floor(col("x") * lit(inv) + lit(0.5)).cast("long"))
      case None => expl0
    }
    val pairs = expl.select(col("i"), col("x"),
        posexplode(slice(col("v"), col("i") + 1, size(col("v")))).as(Seq("dj", "y")))
      .select(col("i"), (col("i") + col("dj")).as("j"), col("x"),
        (q match {
          case Some(inv) => floor(col("y") * lit(inv) + lit(0.5)).cast("long")
          case None => col("y")
        }).as("y"))
      .select(col("i"), col("j"), (col("x") * col("y")).as("xy"))
    def acc(c: org.apache.spark.sql.Column) =
      if (q.isDefined) sum(c.cast("decimal(38,0)")) else sum(c)
    val sxy = pairs.groupBy(col("i"), col("j")).agg(acc(col("xy")).as("sxy"))
    val sx = expl.groupBy(col("i"))
      .agg(acc(col("x")).as("sx"), count(lit(1)).as("cnt"))
    val scale = q.map(inv => inv * inv).getOrElse(1.0)
    sxy
      .join(sx.select(col("i"), col("sx").as("sx_i"), col("cnt").as("n")), Seq("i"))
      .join(sx.select(col("i").as("j"), col("sx").as("sx_j")), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        (((col("sxy").cast("double") -
          col("sx_i").cast("double") * col("sx_j").cast("double") / col("n").cast("double"))
          / (col("n").cast("double") - 1.0)) / lit(scale)).as("cov"))
  }

  /** PCA basis: top-`k` eigenvectors of the covariance matrix, eigenvalues
    * descending. The d×d solve runs on the driver (bounded by
    * construction); classic cyclic Jacobi — O(d³) per sweep, converges in
    * a handful of sweeps for symmetric matrices, and needs no external
    * linear-algebra dependency.
    */
  case class PcaBasis(dim: Int, eigenvalues: Array[Double],
      components: Array[Array[Double]], mean: Array[Double])

  def pcaFit(df: DataFrame, vecCol: String, k: Int): PcaBasis = {
    val covRows = embeddingCovariance(df, vecCol)
      .select(col("i"), col("j"), col("cov")).collect() // d(d+1)/2 rows, bounded
    val d = covRows.iterator.map(_.getInt(1)).max + 1
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val a = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    val meanRow = df.select(col(vecCol).cast("array<double>").as("v"))
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(col("x").cast("decimal(30,12)")).cast("double") / count(lit(1))).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))

    // cyclic Jacobi eigendecomposition of symmetric a, in place
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a, d)
    while (off > 1e-12 && sweep < 50) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) rotate(a, v, p, q, d)
          q += 1
        }
        p += 1
      }
      off = offDiag(a, d); sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    // deterministic sign: largest-|component| entry of each eigenvector
    // is made positive (eigenvectors are only defined up to sign)
    val comps = order.take(k).map { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      val m = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(m) < 0) vec.map(-_) else vec
    }.toArray
    PcaBasis(d, order.take(k).map(i => a(i)(i)).toArray, comps, meanRow)
  }

  private def offDiag(a: Array[Array[Double]], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, d: Int): Unit = {
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
    // tan of the rotation angle: sign(θ)/(|θ|+√(θ²+1)); θ=0 → 45° (t=1)
    val t = if (theta == 0.0) 1.0
      else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  /** Prototype-based cluster pruning — the "D4" data-selection step
    * (Tirumala et al. 2023: SemDedup's near-dup removal followed by
    * pruning the most PROTOTYPICAL points of each k-means cluster; the
    * points nearest their centroid are the ones the cluster already
    * represents, so dropping them costs the least information per token).
    * [[graft.ops.Dedup.semanticNearDups]] is the near-dup half; this is
    * the prototype half.
    *
    * Mechanics: seed centroids = the `numClusters` smallest ids
    * (deterministic, same convention as the IVF family), `kmeansIters`
    * Lloyd re-centerings, hard-assign every vector to its nearest centroid
    * (cosine argmax — zero shuffle, the per-row
    * [[graft.functions.TopCentroids]] expression over the driver-collected
    * table), then per cluster rank members by cosine-to-centroid
    * DESCENDING (ties → ascending id) and mark the top
    * floor(dropFrac · cluster_size) as pruned.
    *
    * Scale shape: training/assignment are the IVF build everyone already
    * pays (bounded driver state: numClusters × dim). The ranking is ONE
    * shuffle keyed by cluster id; per-task state is one cluster, so skew is
    * bounded by cluster imbalance — at 100 TB pick numClusters so
    * corpus/numClusters rows fit a task (D4 runs ~10⁴-10⁵ clusters at that
    * point), exactly the knob the IVF index already scales by. No
    * all-pairs anything: cost is corpus × dim per iteration + one window.
    *
    * `meanQuantizeInv`: the [[graft.ops.Similarity.kmeansIterate]]
    * portable-replay switch — Some(inv) makes the Lloyd means (and hence
    * every assignment, rank and keep decision) bit-replayable in another
    * engine; None is the production double path.
    *
    * Output: (id, cluster, proto_rank, cluster_size, kept) — one row per
    * input vector; `kept = proto_rank > floor(dropFrac · cluster_size)`.
    * `cluster` is the MIN member id (the [[graft.ops.Dedup.dupClusters]]
    * naming convention) — internal centroid indexes are positional and
    * engine-specific, the min-member key is stable and replayable.
    */
  def prototypePrune(emb: DataFrame, idCol: String, vecCol: String,
      numClusters: Int, dropFrac: Double, kmeansIters: Int = 1,
      meanQuantizeInv: Option[Double] = None): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac=$dropFrac must be in [0, 1)")
    val cents = Similarity.kmeansIterate(emb, idCol, vecCol,
      Similarity.centroids(emb, idCol, vecCol, numClusters),
      kmeansIters, meanQuantizeInv)
    val assigned = Similarity.ivfAssign(emb, idCol, vecCol, cents)
    val scored = assigned
      .join(broadcast(cents.select(col("cid"),
        col("centroid").cast("array<double>").as("centroid"))), Seq("cid"))
      .select(col("vec_id"), col("cid"),
        Similarity.cosine(col("cv"), col("centroid")).as("proto_cos"))
    val byProto = Window.partitionBy(col("cid"))
      .orderBy(col("proto_cos").desc, col("vec_id"))
    val byCluster = Window.partitionBy(col("cid"))
    scored
      .withColumn("proto_rank", row_number().over(byProto).cast("long"))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("cluster", min(col("vec_id")).over(byCluster))
      .select(col("vec_id").as("id"), col("cluster"), col("proto_rank"),
        col("cluster_size"),
        (col("proto_rank") > floor(lit(dropFrac) * col("cluster_size")))
          .as("kept"))
  }

  /** Project `vecCol` onto a fitted basis: out = components · (x − mean).
    * Per-row, zero shuffle; the (k×d) basis ships with the task closure
    * (a few hundred KB at most).
    */
  def pcaProject(df: DataFrame, vecCol: String, basis: PcaBasis,
      out: String = "pca"): DataFrame = {
    val compCols = basis.components.map { comp =>
      aggregate(
        zip_with(col(vecCol).cast("array<double>"), typedlit(comp.toSeq),
          (x, w) => x * w),
        lit(0.0), (acc, t) => acc + t) -
        lit(comp.zip(basis.mean).map { case (w, m) => w * m }.sum)
    }
    df.withColumn(out, array(compCols.toSeq: _*))
  }
}
