package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-probe a single query's sf0.1→sf1 ratio with multiple samples —
  * the follow-up tool for a suspicious single-sample ratio in the bench's
  * sf1 block (the probe takes one sample per scale by design; this takes
  * the median of N so a host stall can be ruled in or out).
  *
  *   sbt "runMain graft.tools.ProbeOne q74_dup_spans 3"
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeOne <queryName> [samples]")
    val name = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf1 = "target/sf1"
    ScaleProbe.ensureSf1(spark, sf01, sf1)
    val fn = ScaleProbe.probed(sf1).collectFirst { case (`name`, f) => f }
      .getOrElse(graft.SparkEntry.queries(name))
    def med(d: String): Double = {
      val xs = (1 to samples).map(_ => ScaleProbe.timeNoop(spark, d, name, fn)).sorted
      xs(xs.length / 2)
    }
    val a = med(sf01)
    val b = med(sf1)
    println(f"""{"query":"$name","samples":$samples,"sf01":$a%.2f,"sf1":$b%.2f,"ratio":${b / a}%.2f}""")
    spark.stop()
  }
}
