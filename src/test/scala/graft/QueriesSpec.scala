package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the SparkEntry query surface on sf0.001 — the full
  * value-level gate is the driver's DuckDB oracle (tools/check_oracle.py
  * replicates it locally at sf0.01).
  */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run and are non-degenerate on sf0.001") {
    val empties = Set("q06_anti_join", "q22_except") // legitimately empty
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!empties(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 aggregate values are sane") {
    val row = SparkEntry.queries("q01_agg")(spark, sf)
      .filter("l_returnflag = 'A'").collect()
    assert(row.nonEmpty)
    assert(row.head.getAs[Double]("sum_qty") > 0.0)
  }
}
