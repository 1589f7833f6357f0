package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-heavy per-row operators.
  *
  * A parquet file is splittable only at row-group boundaries; a single-row-
  * group file therefore scans as ONE task, and every per-row stage fused
  * onto that scan (shingling, hashing, signatures, regex chains) runs on
  * one core no matter how many the cluster has — measured: q54's shingle+
  * hash stage used 2 of 32 cores on the sf0.1 fixtures. At real scale the
  * input arrives as thousands of files/row groups and this is moot, which
  * is exactly why the repartition must be CONDITIONAL: an unconditional
  * one would shuffle the whole corpus for nothing at 100 TB.
  */
object Spread {

  /** Repartition `df` to the session's core count IFF its current plan
    * yields fewer partitions; otherwise pass through untouched.
    */
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
