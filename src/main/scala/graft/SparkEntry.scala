package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query surface:
  *   - [[graft.queries.Relational]] — SURVEY §2 Table B relational/streaming
  *     query surface over the testdata star schema;
  *   - ops/connector query groups are merged in as they land.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-style 3-way join + aggregation + top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_agg_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.ConnectorQueries.queries ++
      graft.queries.OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.ConnectorQueries.oracle ++
      graft.queries.OpsQueries.oracle
}
