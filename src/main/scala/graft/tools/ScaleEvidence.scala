package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 scale-evidence main (verdict task 1): attribute the two sf1
  * ratios the round-7 probe graded "weak" with measured numbers instead of
  * plausible stories.
  *
  *  - q99 (salted join, 3.85–5.16× at 10× data): measure SHUFFLE BYTES at
  *    sf0.1 and sf1 for the salted plan vs the plain shuffle join AQE's
  *    skew handling would run, same aggregation on top. The salted plan
  *    ships the right side `salts`× by construction — the hypothesis is
  *    that its super-linear-looking ratio is that constant-factor
  *    replication interacting with the 10× corpus, not a quadratic term.
  *    Whichever plan is faster at sf1 should be what q99 runs.
  *  - q121 (quality classifier, 5.9–7.1× at a 0.65 s base): split cost
  *    into fixed overhead F and per-row scan cost v by timing the same
  *    classifier on 1× and 10× in the SAME session: t(n) = F + v·n gives
  *    F = (10·t1 − t10)/9. If F dominates t1, the big ratio is the
  *    fixed-floor amortizing away, not super-linear work.
  *
  * Prints one JSON line; numbers land in DESIGN §7.
  */
object ScaleEvidence {

  /** Sums shuffle read/write bytes across all stages that complete while
    * `f` runs — driver-side aggregated TaskMetrics, no event log needed.
    */
  final class ShuffleMeter extends SparkListener {
    @volatile var write = 0L
    @volatile var read = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write += m.shuffleWriteMetrics.bytesWritten
        read += m.shuffleReadMetrics.totalBytesRead
      }
    }
  }

  private def measure(spark: SparkSession, label: String)(
      f: => DataFrame): (Double, Long, Long) = {
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // listener bus is async (and private): give the final stage events a
    // beat to drain before reading the counters
    Thread.sleep(300)
    spark.sparkContext.removeSparkListener(meter)
    System.err.println(f"[evidence] $label%-28s ${sec}%8.2fs shufW=${meter.write / 1e6}%9.1fMB shufR=${meter.read / 1e6}%9.1fMB")
    (sec, meter.write, meter.read)
  }

  private def q99Frame(s: SparkSession, d: String, salted: Boolean): DataFrame = {
    val li = s.read.parquet(s"$d/lineitem.parquet")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val joined =
      if (salted) graft.ops.Skew.saltedJoin(li, ord, Seq("l_orderkey"), salts = 8,
        forceSalt = true) // measure the salted machinery, not the adaptive bypass
      else li.join(ord, Seq("l_orderkey")) // plain join; AQE skew split on
    joined.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(30, 6))).cast("double").as("sum_qty"))
  }

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-evidence")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf1 = "target/sf1"
    ScaleProbe.ensureSf1(spark, sf01, sf1)

    def med3(f: => (Double, Long, Long)): (Double, Long, Long) = {
      val xs = Seq(f, f, f).sortBy(_._1)
      xs(1)
    }

    // warmup: touch both corpora so first-scan dictionary/footer costs
    // land outside every measured window
    Seq(sf01, sf1).foreach { d =>
      spark.read.parquet(s"$d/lineitem.parquet").limit(1).collect()
      spark.read.parquet(s"$d/documents.parquet").limit(1).collect()
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (salted <- Seq(true, false); (d, tag) <- Seq((sf01, "sf01"), (sf1, "sf1"))) {
      val name = s"q99_${if (salted) "salted" else "aqe_plain"}_$tag"
      val (sec, w, r) = med3(measure(spark, name)(q99Frame(spark, d, salted)))
      results(name) =
        s"""{"sec":${math.rint(sec * 100) / 100},"shuffle_write_mb":${w / 1000000},"shuffle_read_mb":${r / 1000000}}"""
    }

    // q121 fixed/variable split — same session, median of 3 per scale
    val q121 = graft.SparkEntry.queries("q121_quality_classifier")
    val n1 = spark.read.parquet(s"$sf01/documents.parquet").count()
    val (t1, _, _) = med3(measure(spark, "q121_sf01")(q121(spark, sf01)))
    val (t10, _, _) = med3(measure(spark, "q121_sf1")(q121(spark, sf1)))
    val fixed = math.max(0.0, (10 * t1 - t10) / 9)
    val varPerMRows = (t10 - t1) / (9.0 * n1) * 1e6
    results("q121_split") =
      s"""{"t_sf01":${math.rint(t1 * 1000) / 1000},"t_sf1":${math.rint(t10 * 1000) / 1000},"fixed_sec":${math.rint(fixed * 1000) / 1000},"var_sec_per_1m_rows":${math.rint(varPerMRows * 1000) / 1000},"rows_sf01":$n1}"""

    // q141 fixed/variable split — the same amortization-floor check for
    // the span-corruption fold (a pure scan op like q121; its probe
    // ratio reads high for the same fixed-floor reason)
    val q141 = graft.SparkEntry.queries("q141_span_corrupt")
    val nd1 = spark.read.parquet(s"$sf01/documents.parquet").count()
    val (s1, _, _) = med3(measure(spark, "q141_sf01")(q141(spark, sf01)))
    val (s10, _, _) = med3(measure(spark, "q141_sf1")(q141(spark, sf1)))
    val fixed141 = math.max(0.0, (10 * s1 - s10) / 9)
    val var141 = (s10 - s1) / (9.0 * nd1) * 1e6
    results("q141_split") =
      s"""{"t_sf01":${math.rint(s1 * 1000) / 1000},"t_sf1":${math.rint(s10 * 1000) / 1000},"fixed_sec":${math.rint(fixed141 * 1000) / 1000},"var_sec_per_1m_rows":${math.rint(var141 * 1000) / 1000},"rows_sf01":$nd1}"""

    // q54 pair-volume attribution (round 10): the banded-LSH near-dup's
    // sf1 ratio (~3.8-4.1× at 10× data — already sublinear) should be
    // shuffle VOLUME, not pair explosion: the contamination-free corpus
    // replication keeps verified-pair counts growing LINEARLY with the
    // corpus (per-replica structure identical, cross-replica vocab
    // disjoint). Measured: seconds + shuffle bytes + output pairs at both
    // scales — pairs ≈ 10×, bytes ≈ 10×, time ≈ 4× = linear work on more
    // parallel slack, no quadratic term.
    val q54 = graft.SparkEntry.queries("q54_dedup_minhash")
    for ((d, tag) <- Seq((sf01, "sf01"), (sf1, "sf1"))) {
      val (sec, w, r) = med3(measure(spark, s"q54_$tag")(q54(spark, d)))
      val pairs = q54(spark, d).count()
      results(s"q54_$tag") =
        s"""{"sec":${math.rint(sec * 100) / 100},"pairs":$pairs,"shuffle_write_mb":${w / 1000000},"shuffle_read_mb":${r / 1000000}}"""
    }

    println(results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
