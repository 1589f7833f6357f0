package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profile of a single declared query — the measurement the ANN/
  * many-small-jobs cells need (guide §1.1: decide whether time is compute
  * or scheduling/fixed overhead before optimizing either). Runs one query
  * N times through the bench's own noop-sink methodology and prints every
  * Spark job's duration and call site, so "this cell is K jobs of ~M ms
  * fixed cost each" is committed evidence rather than a guess.
  *
  *   sbt "runMain graft.tools.JobProbe q95_knn_ivfpq 2"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <queryName> [samples]")
    val name = args(0)
    val samples = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-job-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect() // warmup

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) rows.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    }
    (1 to samples).foreach { i =>
      rows.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      val sec = ScaleProbe.timeNoop(spark, sfDir, name, fn)
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; give the tail job a beat to land
      Thread.sleep(300)
      val jobs = rows.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"[jobprobe] $name sample $i: total $sec%.3f s, ${jobs.length} jobs")
      jobs.foreach { case (id, d, site) =>
        println(f"[jobprobe]   job $id%3d  $d%7.3f s  $site")
      }
      println(f"[jobprobe] sample $i job-sum ${jobs.map(_._2).sum}%.3f s " +
        f"(gap to total = driver/planning/collect time)")
    }
    spark.stop()
  }
}
