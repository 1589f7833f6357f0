package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution experiment for the bimodal q74-sf1 / q110 bench cells
  * (round-12 verdict #3): hypothesis — the slow mode is STORAGE-POOL
  * pressure from accumulated localCheckpoint blocks of earlier queries in
  * the long-lived bench JVM. ContextCleaner frees a localCheckpoint's
  * blocks only after the driver GC collects the Dataset, so the pool's
  * occupancy at cell time depends on GC timing, not on the query — the
  * cached `grams`/band frames inside q74/q110 then evict to disk or
  * recompute, and the whole RUN co-spikes (which is exactly the committed
  * history's shape: in-band calib_io, n=3-confirmed slow cells, multiple
  * queries hot in the same runs).
  *
  * Protocol (prints one line per phase):
  *   1. fresh-ish session → q74 at target/sf1      (expect FAST)
  *   2. run a localCheckpoint-heavy battery WITHOUT gc → q74 again
  *      (expect SLOW if H1 holds), recording getRDDStorageInfo before
  *   3. System.gc() + pause (ContextCleaner drains) → q74 again
  *      (expect FAST again)
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-cache-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rddBlocks(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.numCachedPartitions).sum, infos.map(_.memSize).sum)
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def cell(tag: String, name: String): Double = {
      val (nb, mem) = rddBlocks()
      val g0 = gcMs()
      val s = graft.tools.ScaleProbe.timeNoop(spark, sf1, name,
        graft.SparkEntry.queries(name))
      println(f"[cacheprobe] $tag $name%-22s ${s}%.2f s  gc ${gcMs() - g0} ms  " +
        f"(pre: $nb blocks, ${mem / 1e6}%.0f MB cached)")
      s
    }

    cell("phase1-clean", "q74_dup_spans")
    cell("phase1-clean", "q110_cross_neardup")
    // battery: checkpoint-heavy ops leave dead localCheckpoint blocks
    Seq("q103_pagerank", "q139_soft_dedup", "q115_keep_best", "q68_dup_clusters",
        "q54_dedup_minhash", "q130_minhash_index", "q147_curate")
      .foreach { n => if (graft.SparkEntry.queries.contains(n))
        graft.tools.ScaleProbe.timeNoop(spark, sf1, n, graft.SparkEntry.queries(n)) }
    cell("phase2-dirty", "q74_dup_spans")
    cell("phase2-dirty", "q110_cross_neardup")
    (1 to 3).foreach { _ => System.gc(); Thread.sleep(2000) }
    cell("phase3-gc", "q74_dup_spans")
    cell("phase3-gc", "q110_cross_neardup")
    // phase 4: driver-heap pressure — fill most of the old gen with LIVE
    // objects (retained during the cells), the state a long bench run's
    // accumulated session structures approximate
    val ballast = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    try {
      val target = (Runtime.getRuntime.maxMemory * 0.6).toLong / 8
      var n = 0L
      while (n < target) { ballast += new Array[Long](1 << 20); n += (1 << 20) }
      println(s"[cacheprobe] ballast ${ballast.size} MB-blocks live")
      cell("phase4-heap", "q74_dup_spans")
      cell("phase4-heap", "q110_cross_neardup")
    } finally ballast.clear()
    spark.stop()
  }
}
