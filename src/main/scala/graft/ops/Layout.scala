package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout management — the write-side half of scan performance.
  * At 100 TB the fastest filter is the one that never reads the file:
  * parquet footers carry per-column min/max, and Spark skips whole
  * row-groups/files whose range can't match a pushed-down predicate.
  * That only works if the data is CLUSTERED so each file covers a narrow
  * range of the filter column — an unsorted corpus has every file
  * spanning the full domain and nothing is ever skipped.
  */
object Layout {

  /** Write `df` as parquet range-clustered on `clusterCols`: rows are
    * range-partitioned (each output file covers a contiguous, mostly
    * disjoint slice of the cluster-key domain) and sorted within each
    * file (so row-group min/max inside a file are tight too).
    *
    * `numFiles` sizes the output explicitly — at scale, pick
    * corpus_size / target_file_size (128-512 MB files are the sweet spot;
    * thousands of tiny files push the bottleneck to the driver's listing).
    *
    * One range-exchange (sampling pass + shuffle) buys every future scan
    * min/max skipping — the batch rendering of an index build.
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[Column],
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) ranges of `keyCol` for a parquet directory —
    * the observable the clustering exists to narrow. Used by tests to
    * assert disjointness and by operators to estimate skipping potential.
    */
  def fileRanges(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("rows"))
}
