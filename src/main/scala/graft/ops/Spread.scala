package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}

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

  /** Repartition `df` to the session's core count IFF its parallelism was
    * not already pinned wide and its leaf scans yield fewer partitions;
    * otherwise pass through untouched.
    *
    * The probe must not execute anything: `df.rdd` under AQE materializes
    * every upstream shuffle stage just to expose partition counts (a full
    * hidden pass over the input per probe). Instead: (a) a WIDE-ENOUGH
    * `Repartition`/`RepartitionByExpression` anywhere in the logical plan
    * means parallelism was already chosen — by this function or the
    * caller; a narrow one (`coalesce(1)`, `repartition(2)`) is precisely
    * the shape the guard must fix and does NOT pin; (b) otherwise, leaf
    * scan parallelism is read off the pre-AQE physical plan, whose leaf
    * `execute()` only CONSTRUCTS the scan RDD (partition metadata, no
    * jobs). (b) can overestimate for frames whose last stage is an
    * AQE-coalesced shuffle; callers feeding such frames into per-row-heavy
    * ops pick their own partitioning.
    */
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val pinned = df.queryExecution.logical.collectFirst {
      case r: Repartition if r.numPartitions >= target => r
      case r: RepartitionByExpression if r.optNumPartitions.forall(_ >= target) => r
    }.isDefined
    if (pinned) return df
    val leafParts = df.queryExecution.sparkPlan.collectLeaves()
      .map(_.execute().getNumPartitions)
    if (leafParts.nonEmpty && leafParts.max >= target) df
    else df.repartition(target)
  }
}
