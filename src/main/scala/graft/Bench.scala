package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: each query is fully materialized through the `noop` sink —
  * `count()` would let Catalyst prune all value columns and flatter the
  * numbers. AQE is on (runtime shuffle coalescing + skew handling), shuffle
  * partitions match cores.
  *
  * Each query is timed as the MEDIAN of 3 back-to-back materializations
  * (round-7 lesson: the committed artifact was a host-noise outlier run —
  * min-of-2 lets a stall that hits the faster sample of a pair inflate the
  * reported number, and this machine's storage throughput swings ~1.65×
  * run-to-run at identical load; see DESIGN §7). Two defenses on top of
  * the median: (a) if the median still lands >3× the query's own committed
  * history (BENCH_HISTORY.jsonl median) while the CPU/IO calibs are flat —
  * i.e. the code didn't change speed, the host did — two more samples are
  * taken and the median recomputed over all 5; (b) the emitted JSON
  * carries `dispersion` (median over queries of per-query relative spread
  * (max-min)/median) and a per-query `spread` map in the full artifact, so
  * a noisy run is VISIBLE in the committed record instead of silently
  * overstating cost. The JSON also carries `calib`/`calib_mt`/`calib_io`:
  * fixed single-thread / all-cores LCG loops and a 256 MB disk round-trip
  * measured in the same JVM, so any run's numbers can be read against the
  * host speed at the time it ran. On top of the per-cell markers the
  * artifact carries a RUN-level verdict (`offband_run` +
  * `offband_run_tripped`): dispersion, the fraction of cells above 1.5×
  * their committed history, and the CPU/disk calibs vs history — a
  * BENCH_rN.json self-describes as noisy without BENCH_HISTORY.jsonl.
  */
object Bench {

  /** Fixed CPU-bound loop — a host-speed yardstick, not a Spark benchmark. */
  private def lcgLoop(): Long = {
    var x = 0L
    var i = 0
    while (i < 200000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
    x
  }

  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    if (lcgLoop() == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** Same loop on every core at once — measured host MULTI-core capacity.
    * The single-thread calib stayed flat (~0.26 s) across runs whose Spark
    * totals swung 1.5×: co-tenant saturation shows up only under parallel
    * load, and this is the yardstick that exposes it.
    */
  private def calibrateParallel(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { _ =>
      val t = new Thread(() => { if (lcgLoop() == 42L) System.err.println("") })
      t.start(); t
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Disk yardstick: write+fsync+read 256 MB of scratch (the medium shuffle
    * files and spills live on). One observed slow run had flat CPU calibs
    * but an inflated total — storage is the remaining host variable.
    */
  private[graft] def calibrateIo(): Double = {
    val t0 = System.nanoTime()
    val tmp = java.nio.file.Files.createTempFile("graft-calib", ".bin")
    try {
      val block = new Array[Byte](1 << 20)
      java.util.Arrays.fill(block, 0x5a.toByte)
      val out = new java.io.FileOutputStream(tmp.toFile)
      try {
        var i = 0
        while (i < 256) { out.write(block); i += 1 }
        out.getFD.sync()
      } finally out.close()
      val in = new java.io.FileInputStream(tmp.toFile)
      try { while (in.read(block) > 0) () } finally in.close()
    } finally java.nio.file.Files.deleteIfExists(tmp)
    (System.nanoTime() - t0) / 1e9
  }
  /** Shuffle-class yardstick (round-19, r18 verdict #1): a fixed-size
    * in-memory aggregation + exchange microbench. The r18 record showed
    * heavy shuffle-bound cells (q54/q55/q174) co-elevated across runs whose
    * single-thread CPU and sequential-IO calibs were FLAT — the host can
    * degrade in a dimension (page cache / shuffle-file path / scheduler)
    * neither yardstick measures, and the offband verdict could not name
    * it. This measures exactly that class of work: 8M synthetic rows
    * hash-exchanged into a 100k-group aggregation and drained through the
    * noop sink — no parquet, no disk data dependence, fixed size.
    */
  private[graft] def calibrateShuffle(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 8000000L, 1L, 32)
      .select(pmod(org.apache.spark.sql.functions.xxhash64(col("id")),
        lit(100000L)).as("k"), col("id").as("v"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      graft.tools.ScaleProbe.timeNoop(spark, sfDir, name, fn)

    // JIT/session warmup outside the measured window
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    val calib = calibrate()
    val calibMt = calibrateParallel(cpus.toInt)
    val calibIo = calibrateIo()
    val calibShuffle = calibrateShuffle(spark)

    // Per-query committed history (median of past full runs) + historical
    // calib_io median: the yardsticks for the >3×-outlier re-run below.
    val history = BenchHistory.load("BENCH_HISTORY.jsonl")
    // "calibs are flat" = this run's host looks like the history's host:
    // CPU calib within 1.3× of its history median AND disk round-trip
    // within 2× (storage is the variable that actually swings on this box;
    // a slow disk calib means the whole run is slow for host reasons and
    // re-running won't help).
    val calibsFlat = history.calibMedian.forall(h => calib <= h * 1.3) &&
      history.calibIoMedian.forall(h => calibIo <= h * 2.0)

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // Median-of-3; if the median is >2× this query's committed-history
    // median while the calibs say the host is healthy, the samples — not
    // the code — are suspect: take 2 more and re-median over all 5. A cell
    // whose final median is STILL >2× history carries `offband_cell` in
    // the artifact (ported from the sf1 probe, round-12 verdict #1: the
    // driver's snapshot committed ~6 co-spiked 2-5× cells with no per-cell
    // markers — the full-run path could not say "this cell is noise" the
    // way the probe blocks could).
    // Returns (seconds, samplesUsed, relativeSpread, offband).
    def run(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Int, Double, Boolean) = {
      // Heap hygiene OUTSIDE the timed window (the ScaleProbe pattern,
      // round-12 CacheProbe attribution: q74 at 74.6 s with 67.4 s GC
      // under 60% live-heap ballast vs 5.7 s clean) — allocation-heavy
      // cells are GC-bound under the old-gen occupancy a long bench JVM
      // accumulates, which was exactly the co-spiked-cells signature.
      System.gc()
      def hist = history.queryMedian(name)
      var samples = List(once(name, fn))
      if (samples.head < 0) return (samples.head, 1, 0.0, false)
      (1 to 2).foreach { _ => samples = once(name, fn) :: samples }
      if (samples.exists(_ < 0)) return (samples.filter(_ >= 0).min, samples.size, 0.0, false)
      var m = median(samples)
      val suspect = calibsFlat && hist.exists(h => h > 0 && m > 2.0 * h)
      if (suspect) {
        System.err.println(s"[bench] $name median $m >2x history; re-sampling")
        (1 to 2).foreach { _ => samples = once(name, fn) :: samples }
        samples = samples.filter(_ >= 0)
        m = median(samples)
      }
      val spread = if (m > 0) (samples.max - samples.min) / m else 0.0
      val offband = hist.exists(h => h > 0 && m > 2.0 * h)
      if (offband) System.err.println(
        s"[bench] $name median $m still >2x history after escalation; " +
          "marking offband_cell")
      (m, samples.size, spread, offband)
    }

    // Dev loop: SPARK_GRAFT_ONLY=q74_dup_spans,q54_dedup_minhash restricts
    // the run to a comma-separated subset. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queryResults = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> run(name, fn)
      }
    // One-time ingest/build costs, each reported as its own `qNNNi` metric
    // so the matching query number reads as pure query cost (builds are
    // forced fresh here; the query samples above reused the session's
    // artifacts via their markers): q100's bucketed tables, and the
    // persisted ANN indexes of q82/q83/q113 — a 100 TB deployment builds
    // those offline, so their k-means + clustered writes are ingest, not
    // probe (round-6 verdict #3).
    val ingestFns: Seq[(String, () => Unit)] = Seq(
      "q100i_bucketed_ingest" -> (() =>
        graft.queries.ConnectorQueries.q100Ingest(spark, sfDir, force = true)),
      "q82i_ivf_build" -> (() =>
        { graft.queries.OpsQueries.q82Index(spark, sfDir, force = true); () }),
      "q83i_pq_build" -> (() =>
        { graft.queries.OpsQueries.q83Index(spark, sfDir, force = true); () }),
      "q113i_ivf_meta_build" -> (() =>
        { graft.queries.OpsQueries.q113Index(spark, sfDir, force = true); () }),
      "q123i_ivfpq_build" -> (() =>
        { graft.queries.OpsQueries.q123Index(spark, sfDir, force = true); () }),
      "q124i_bm25_build" -> (() =>
        { graft.queries.OpsQueries.q124Index(spark, sfDir, force = true); () }),
      "q130i_minhash_build" -> (() =>
        { graft.queries.OpsQueries.q130Index(spark, sfDir, force = true); () }))
    val ingestResults = ingestFns.map { case (name, fn) =>
      val sec = if (!only.forall(_.contains(name))) -1.0
      else {
        val t0 = System.nanoTime()
        try { fn(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // the same failure sentinel every query uses — a failed
               // ingest must not read as a fast successful one
        }
      }
      name -> (sec, 1, 0.0, false)
    }
    val results = (queryResults ++ ingestResults).sortBy(_._1)
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // Cells still >2× their committed-history median after escalation:
    // the committed artifact names its own noise (or real regressions)
    // per cell, matching the sf1 probe's offband_cell discipline.
    val offbandCells = results.collect { case (k, (_, _, _, true)) => k }
    // Headline noise indicator: median over measured queries of each
    // query's relative spread (max-min)/median across its samples. A quiet
    // run sits well under 0.5; a storage-stall run shows up here instead
    // of silently inflating per-query numbers.
    val dispersion = {
      val spreads = queryResults.map(_._2._3).filter(_ > 0).sorted
      if (spreads.isEmpty) 0.0
      else if (spreads.size % 2 == 1) spreads(spreads.size / 2)
      else (spreads(spreads.size / 2 - 1) + spreads(spreads.size / 2)) / 2
    }

    // RUN-level offband verdict (round-14, r13 verdict #2): the r13 driver
    // snapshot was a degraded run whose per-cell markers worked but whose
    // headline never said "this RUN is offband" — a consumer had to
    // cross-reference BENCH_HISTORY.jsonl to learn the total was noise.
    // Four yardsticks, each against committed history; ANY trip flags the
    // run and names the tripped yardstick in the artifact:
    //   - dispersion: committed clean runs sit at 0.46-0.61 — above 0.75
    //     the samples themselves are smeared (storage or CPU contention);
    //   - cells_vs_history: fraction of history-backed cells whose median
    //     landed >1.5x their committed median (clean runs: a few percent;
    //     the r13 degraded snapshot: most of the map co-inflated);
    //   - calib_mt: the CPU-BOUND calibration the r13 verdict asked for —
    //     all-cores LCG capacity vs history (co-tenant CPU saturation is
    //     exactly the mode calib_io was blind to; the single-thread calib
    //     stays flat under it);
    //   - calib_io: the disk round-trip vs history (the storage mode).
    val cellsVsHistoryFrac = {
      val withHist = queryResults.flatMap { case (k, (m, _, _, _)) =>
        if (m < 0) None else history.queryMedian(k).filter(_ > 0).map(h => m / h)
      }
      if (withHist.isEmpty) 0.0
      else withHist.count(_ > 1.5).toDouble / withHist.size
    }
    val offbandTripped = Seq(
      (dispersion > 0.75) -> "dispersion",
      (cellsVsHistoryFrac > 0.25) -> "cells_vs_history",
      history.calibMtMedian.exists(h => calibMt > 1.5 * h) -> "calib_mt",
      history.calibIoMedian.exists(h => calibIo > 2.0 * h) -> "calib_io",
      // the shuffle-class yardstick (r18 verdict #1): trips once committed
      // history exists for it; 1.5× like calib_mt (it is CPU+memory-bound,
      // not storage-bound, so the tighter band applies)
      history.calibShuffleMedian.exists(h => calibShuffle > 1.5 * h) -> "calib_shuffle"
    ).collect { case (true, name) => name }
    val offbandRun = offbandTripped.nonEmpty
    val offbandRunField =
      s""","offband_run":$offbandRun,"offband_run_tripped":[${
        offbandTripped.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""cells_above_history_frac":${math.rint(cellsVsHistoryFrac * 1000) / 1000}"""
    if (offbandRun) System.err.println(
      s"[bench] RUN OFFBAND: tripped ${offbandTripped.mkString(", ")} " +
        s"(dispersion $dispersion, cells>1.5x frac $cellsVsHistoryFrac, " +
        s"calib_mt $calibMt vs hist ${history.calibMtMedian.getOrElse(-1.0)}, " +
        s"calib_io $calibIo vs hist ${history.calibIoMedian.getOrElse(-1.0)})")

    // Streaming throughput (produce→consume rows/sec + per-epoch latency)
    // — the reference's core capability, measured once per bench run (the
    // topic log is written fresh each time; best-of-N would only re-measure
    // the page cache). Failure degrades to zeros rather than killing the
    // batch numbers.
    val stream = try BenchStream.run(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] stream failed: ${e.getMessage}")
        BenchStream.StreamStats(0L, 0.0, 0.0, 0.0, 0, 0.0, 0.0)
      }
    // "{...}" → "," + inner fields, for splicing into the JSON lines below
    val streamFields = "," + stream.json.stripPrefix("{").stripSuffix("}")

    // sf1 scale probe (10× corpus, top-expensive queries, single samples):
    // full per-query block goes to BENCH_FULL.json; stdout carries only the
    // max ratio (the 2000-char stdout budget can't fit the detail). Opt out
    // with SPARK_GRAFT_SF1=0. Only meaningful when benching sf0.1.
    val sf1Block: Option[String] =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "0" ||
          !sfDir.contains("sf0.1")) None
      else try Some(graft.tools.ScaleProbe.probe(spark, sfDir, "target/sf1",
        // widened with the round-8 probe list (26 queries) + round-9
        // headroom for history-outlier escalations (median-of-3 cells)
        budgetSec = 800.0))
      catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 probe failed: ${e.getMessage}")
        None
      }
    val sf1Full = sf1Block.map(b => s""","sf1":$b""").getOrElse("")
    val sf1Short = sf1Block.map { b =>
      if (b.contains("\"skipped_for_disk\":true")) {
        // the probe refused to commit offband cells — surface that verdict,
        // not an empty-looking block
        val io = """"calib_io":([0-9.]+)""".r.findFirstMatchIn(b)
          .map(_.group(1)).getOrElse("-1")
        s""","sf1":{"skipped_for_disk":true,"calib_io":$io}"""
      } else {
      // max of the "ratio":X values — the one number that answers "did
      // anything scale super-linearly?" — PLUS which query it was (the
      // round-6 lesson: a bare max_ratio whose owner was lost with the
      // overwritten detail file is unactionable).
      // no closing-brace anchor: entries carry trailing fields (n, hist)
      val entryRe =
        """"(q[0-9]+[a-z]*)":\{"sf01":[0-9.\-]+,"sf1":[0-9.\-]+,"ratio":([0-9.\-]+)""".r
      // the synthetic metadata-plane cells (compaction, seek) are excluded
      // from the headline: their ~linear segment-count ratios are the
      // CLAIM under test, not a query scaling anomaly
      val pairs = entryRe.findAllMatchIn(b)
        .map(m => (m.group(1), m.group(2).toDouble)).filter(_._2 > 0)
        .filterNot(p => graft.tools.ScaleProbe.SyntheticCellKeys.contains(p._1)).toSeq
      val (mq, mx) = if (pairs.nonEmpty) pairs.maxBy(_._2) else ("", -1.0)
      s""","sf1":{"max_ratio":${math.rint(mx * 100) / 100},"max_q":"$mq","queries":${pairs.length},"detail":"BENCH_HISTORY.jsonl"}"""
      }
    }.getOrElse("")

    // One-number pipeline bench (round-7 verdict stretch): the user-facing
    // "curate a crawl" cost — Curate.run end-to-end over the sf1 corpus
    // (10× documents), separate from the per-op micro-benches. Stage
    // attribution comes from the pipeline's own eager milestones; the
    // remaining lazy tail is the final materialization window. Skipped
    // when the sf1 corpus wasn't generated (probe opted out).
    val curateFields: String =
      if (sf1Block.forall(_.contains("\"skipped_for_disk\":true"))) "" // no block, or no corpus probed
      else try {
        val phases = scala.collection.mutable.ListBuffer.empty[(String, Double)]
        val docs = spark.read.parquet("target/sf1/documents.parquet")
        val rowsIn = docs.count()
        val t0 = System.nanoTime()
        val result = graft.ops.Curate.run(docs, "doc_id", "text", "source",
          graft.ops.Curate.Config(
            normalizeUnicode = true, qualityFilter = true,
            classifierFilter = true, exactDedup = true,
            nearDupThreshold = Some(0.5),
            dsirTargetSources = Seq("src0", "src1", "src2")),
          phases = Some(phases))
        val rowsOut = result.docs.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val eager = phases.map(_._2).sum
        val stages = (phases :+ ("final_materialize" -> (sec - eager)))
          .map { case (n, s) => "\"" + n + "\":" + (math.rint(s * 100) / 100) }
          .mkString("{", ",", "}")
        s""","curate_sf1":{"sec":${math.rint(sec * 100) / 100},"rows_in":$rowsIn,"rows_out":$rowsOut,"stages":$stages}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] curate_sf1 failed: ${e.getMessage}")
        ""
      }

    // Full fidelity (full query names, ns precision, per-query sample
    // counts) goes to a FILE; stdout gets a COMPACT line. The harness that
    // collects bench output keeps only the last 2000 chars of stdout, and
    // the full per-query map (~4 KB at 78 queries) overflows that, cutting
    // off the line's start and making it unparseable. Short qNN keys at
    // millisecond precision keep the whole line ~1.2 KB.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qsFull = results.map { case (k, (v, _, _, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ns = results.map { case (k, (_, n, _, _)) => "\"" + k + "\":" + n }.mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, _, sp, _)) => "\"" + k + "\":" + r3(sp) }
      .mkString("{", ",", "}")
    val offbandField =
      s""","offband_cells":[${offbandCells.map("\"" + _ + "\"").mkString(",")}]"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","method":"median_of_3_escalate_5","calib":$calib,"calib_mt":$calibMt,"calib_io":$calibIo,"calib_shuffle":$calibShuffle,"dispersion":${r3(dispersion)}$offbandRunField$offbandField$streamFields$sf1Full$curateFields,"queries":$qsFull,"samples":$ns,"spread":$spreads,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // BENCH_FULL.json is gitignored and clobbered by every run — round 6
    // lost the identity of its 4.21× sf1 scaler that way. The same full
    // line therefore also APPENDS to a committed history file, stamped so
    // rounds are attributable after the fact. Restricted dev-loop runs
    // (SPARK_GRAFT_ONLY) are excluded: their partial totals would read as
    // anomalously fast full rounds in the committed record.
    if (only.isEmpty) {
      val stamp = java.time.Instant.now().toString
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (s"""{"at":"$stamp",""" + full.stripPrefix("{") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      // The stdout one-liner can no longer carry 185 cells inside its
      // 1950-char budget, so since round 18 every PERF artifact had
      // per_query: {} (r19 verdict #1 — the measurement contract was
      // effectively dead). This committed, stable-named artifact restores
      // it: the FULL-NAME per-query map of the latest full run, overwritten
      // per run, diffable by the driver/judge without parsing history.
      // Restricted SPARK_GRAFT_ONLY dev runs are excluded like history —
      // a partial map must not masquerade as a full run's.
      val queriesArtifact =
        s"""{"at":"$stamp","calib":${r3(calib)},"calib_mt":${r3(calibMt)},""" +
        s""""calib_io":${r3(calibIo)},"calib_shuffle":${r3(calibShuffle)},""" +
        s""""offband_run":$offbandRun,"sf":"$sfDir","cpus":$cpus,""" +
        s""""total":${r3(total)},"queries":$qsFull}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_QUERIES.json"),
        queriesArtifact.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // Short keys must stay UNIQUE: "q54_planted" truncated to "q54" would
    // shadow q54_dedup_minhash in the JSON map — planted twins keep a "p".
    def shortKey(k: String): String =
      k.takeWhile(_ != '_') + (if (k.endsWith("_planted")) "p" else "")
    // The harness keeps only the LAST 2000 chars of stdout: a longer line
    // loses its head and stops parsing as JSON. Degrade per-query precision
    // (3 → 2 decimals) before that happens, and as a last resort drop the
    // per-query map entirely (headline metrics survive; the file has all
    // detail). ONE template — the fallbacks only swap the queries field.
    def shortLine(prec: Double => Double, queriesJson: Option[String] = None): String = {
      val qs = queriesJson.getOrElse(results.map { case (k, (v, _, _, _)) =>
        "\"" + shortKey(k) + "\":" + prec(v) }.mkString("{", ",", "}"))
      val off = // usually empty; short keys keep the line inside budget
        if (offbandCells.isEmpty) ""
        else s""","offband_cells":[${offbandCells.map(k => "\"" + shortKey(k) + "\"").mkString(",")}]"""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","method":"median_of_3_escalate_5","calib":${r3(calib)},"calib_mt":${r3(calibMt)},"calib_io":${r3(calibIo)},"calib_shuffle":${r3(calibShuffle)},"dispersion":${r3(dispersion)}$offbandRunField$off$streamFields$sf1Short$curateFields,"queries":$qs,"sf":"$sfDir","detail":"BENCH_FULL.json"}"""
    }
    val candidates = Iterator(
      shortLine(r3),
      shortLine(v => math.rint(v * 100) / 100),
      shortLine(r3, Some("\"omitted_see_detail\"")))
    val line = candidates.find(_.length <= 1950).getOrElse(
      shortLine(r3, Some("\"omitted_see_detail\"")))
    // The same line also lands in a FILE: stdout passes through sbt (whose
    // [success] epilogue still trails the run even with the raw
    // outputStrategy), so a tail-parser has to scan backwards for the
    // first parseable line — BENCH_LINE.json is the scan-free copy.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LINE.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
