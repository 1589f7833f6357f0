package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone replica of Bench's `curate_sf1` block — the dev loop for the
  * pipeline-cost work (round-19 verdict #1: final_materialize was 64% of
  * the sf1 pipeline). Same corpus (target/sf1), same Config, same stage
  * attribution, without paying the 40-minute full bench per A/B side.
  *
  *   sbt "runMain graft.tools.CurateProbe [samples]"
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val samples = if (args.nonEmpty) args(0).toInt else 2
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.ensureSf1(spark, sf01, "target/sf1")
    (1 to samples).foreach { i =>
      System.gc()
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
        .map { case (n, s) => f""""$n":${math.rint(s * 100) / 100}%.2f""" }
        .mkString("{", ",", "}")
      println(f"""[curateprobe] sample $i: {"sec":$sec%.2f,"rows_in":$rowsIn,"rows_out":$rowsOut,"stages":$stages}""")
    }
    spark.stop()
  }
}
