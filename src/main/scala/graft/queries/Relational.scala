package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2 Table B — the relational query surface the engine exposes over
  * topic data, expressed with Spark built-ins (the reference itself has no
  * relational operators at all; see SURVEY §2). Every query here has a
  * DuckDB-oracle twin in [[Relational.oracle]] with identical column names
  * and types.
  *
  * Determinism-for-the-oracle conventions:
  *   - large double sums accumulate in DECIMAL (exact, order-independent)
  *     and cast to double once at the end — a double sum's low bits depend
  *     on partial-aggregation order and would hash-mismatch;
  *   - computed integers are cast to long (DuckDB's year()/length()/count
  *     are BIGINT while Spark's are int);
  *   - no raw timestamp outputs (parquet ns vs us precision) — epoch
  *     millis/seconds instead;
  *   - every top-k ordering carries a unique-key tie-break.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has drifted across testdata generations — parquet
    * TIMESTAMP(NANOS) in some drops, plain `timestamp[us]` in others — so
    * dispatch on the read schema instead of assuming either:
    *   - TIMESTAMP(NANOS): Spark 4 refuses to read it natively; under
    *     `nanosAsLong` it surfaces as LongType, which we convert with
    *     integer division (a double-typed `/` would lose precision above
    *     2^53 ns; the testdata has no sub-microsecond components, so the
    *     truncation is lossless);
    *   - `timestamp[us]` (isAdjustedToUTC=false → TIMESTAMP_NTZ): cast once
    *     to session-TZ TimestampType — the session TZ is pinned to UTC, so
    *     the wall-clock instants match the DuckDB oracle exactly.
    * Setting `nanosAsLong` is harmless for non-NANOS files (it only changes
    * how NANOS columns decode), so it stays on unconditionally.
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ (or future drift): one lossless cast, UTC session
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Exact order-independent sum of a double expression: accumulate as
    * DECIMAL(30,6), emit double.
    */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")
  private def dsumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"

  /** As-of join, merged-timeline form: for each `left` row, the latest
    * `right` row with `rightKey = leftKey` and `rightTime <= leftTime`
    * (ties on `rightTime` broken by the LARGEST `rightTieBreak`). Left
    * rows with no match are dropped (inner as-of). Output: left columns
    * followed by the matched right row's columns.
    *
    * Scale shape — why this exists next to the join+window form (q32):
    * the composed form materializes every (left, earlier-right) pair
    * before row_number picks one, so a key with n right rows amplifies
    * the shuffle n× per left row. Here both inputs union into ONE
    * timeline, shuffle ONCE on the key, sort once per partition, and the
    * running `last(ignoreNulls)` carries the latest right row forward —
    * O(|left| + |right|) rows end to end, skew-safe for power keys.
    * Crossover: the pair form wins only when right rows per key ≈ 1;
    * at 100 TB assume they aren't.
    */
  def asofMerged(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTieBreak: Seq[String]): DataFrame = {
    val (rRows, lRows, tbCols) = asofRows(left, leftKey, leftTime,
      right, rightKey, rightTime, rightTieBreak)
    val w = Window.partitionBy(col("__k"))
      .orderBy((Seq(col("__t"), col("__kind")) ++ tbCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rRows.unionAll(lRows)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1 && col("__m").isNotNull)
      .select(col("__l.*"), col("__m.*"))
  }

  /** Shared merged-timeline row prep: right rows as (key, time, kind=0,
    * null, payload, tieBreaks…), left rows as (key, time, kind=1, payload,
    * null, null-tieBreaks…) — the null/cast rationale is in the comments
    * inside.
    */
  /** Time-series resample + forward fill: per key, a regular time grid
    * from `date_trunc(truncUnit, min(t))` to `max(t)` at `step`, each
    * grid point carrying the latest observation at or before it — the
    * gap-filling/downsampling pass every event-series consumer needs
    * (dashboards, feature snapshots, training-time joins).
    *
    * Built by COMPOSITION: grid generation (per-key `sequence` explode)
    * feeds [[asofMerged]], so the fill inherits the merged-timeline
    * shape — ONE shuffle on the key, O(|grid| + |events|) rows, no
    * per-grid-point range probe. Observations collapse to one row per
    * (key, t) first (max(value) — a deterministic tie rule both engines
    * share), so the as-of match is unambiguous on duplicate timestamps.
    * Grid points before a key's first observation drop (inner as-of),
    * mirroring engines' native ASOF JOIN semantics.
    *
    * Output: (key, grid ts, value).
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, step: String = "1 day",
      truncUnit: String = "day"): DataFrame = {
    val obs = events.groupBy(col(keyCol).as("__rk"), col(tsCol).as("__rt"))
      .agg(max(col(valCol)).as("__val"))
    val spans = events.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__t0"),
        max(col(tsCol)).as("__t1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__t0"), col("__t1"),
        expr(s"interval $step"))).as("__gts"))
    asofMerged(grid, keyCol, "__gts", obs, "__rk", "__rt", Seq.empty)
      .select(col(keyCol), col("__gts").as("grid_ts"), col("__val").as("value"))
  }

  /** Interval-overlap join: rows of `left` and `right` with equal keys
    * whose CLOSED time intervals intersect (`lStart <= rEnd AND rStart <=
    * lEnd`) — sessions × promo windows, validity ranges × observations.
    *
    * Scale shape: the naive formulation is a theta-join (every same-key
    * pair compared — quadratic per key, and Spark plans it as BNLJ when
    * the only equi-key is low-cardinality). Here each interval EXPLODES
    * into the coarse time buckets it covers, the join runs as a plain
    * equi-join on (key, bucket) — shuffle-partitionable, AQE-skew-
    * splittable — and the exact predicate filters the candidates; a
    * `dropDuplicates` collapses pairs that met in several buckets. Cost
    * is O(intervals × span/bucket) exploded rows, the standard
    * time-bucketing trade: pick `bucketSeconds` near the typical
    * interval length.
    *
    * Buckets are computed ARITHMETICALLY (epoch-second floor-div, plain
    * longs) rather than with `window()` — Catalyst refuses a second
    * time-window expression in a tree that already contains one (e.g.
    * sessions built with `session_window` feeding this join), and a long
    * equi-key is cheaper to shuffle than a struct anyway.
    *
    * Left/right column names must be disjoint (enforced) — both sides'
    * columns flatten into the output.
    */
  def intervalOverlapJoin(left: DataFrame, lKey: String, lStart: String,
      lEnd: String, right: DataFrame, rKey: String, rStart: String,
      rEnd: String, bucketSeconds: Long = 86400L): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both carry: $overlap")
    def bucketIdx(c: Column): Column =
      floor(unix_seconds(c).cast("double") / bucketSeconds).cast("long")
    // Multi-bucket matches collapse on synthetic per-side ROW ids, not on
    // value columns: a theta-join keeps the multiplicity of duplicate
    // input rows, and deduping on values would silently merge them. The
    // ids are assigned BEFORE the explode, so the same input pair meeting
    // in several buckets carries the same (lid, rid) and collapses to one
    // output row, while two identical-valued input rows carry distinct
    // ids and both survive.
    def bucketed(df: DataFrame, s: String, e: String, b: String,
        idc: String) =
      df.withColumn(idc, monotonically_increasing_id())
        .withColumn(b, explode(sequence(bucketIdx(col(s)), bucketIdx(col(e)))))
    val lb = bucketed(left, lStart, lEnd, "__lb", "__lid")
    val rb = bucketed(right, rStart, rEnd, "__rb", "__rid")
    lb.join(rb, col(lKey) === col(rKey) && col("__lb") === col("__rb"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .dropDuplicates("__lid", "__rid")
      .drop("__lb", "__rb", "__lid", "__rid")
  }

  private def asofRows(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTieBreak: Seq[String]): (DataFrame, DataFrame, Seq[String]) = {
    requireAsofSafe(left, right)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val tbTypes = rightTieBreak.map(c => right.schema(c).dataType)
    val tbCols = rightTieBreak.indices.map(i => s"__tb$i")
    // NULL keys/times can never satisfy `rightKey = leftKey AND rightTime
    // <= leftTime` (SQL three-valued logic — the join+window form drops
    // them), but in a merged timeline a null-time right row would sort
    // FIRST (asc = NULLS FIRST) and be carried forward as a bogus "latest"
    // match, and null keys from both sides would meet in the null
    // partition — filter both sides up front. The filter runs on the CAST
    // time (the actual sort key): a string time that fails the timestamp
    // cast is null in the ordering even though the raw column isn't.
    // Right rows sort BEFORE left rows at equal time (kind 0 < 1) — the
    // inclusive `<=` of the as-of contract.
    val rRows = right
      .filter(col(rightKey).isNotNull &&
        col(rightTime).cast("timestamp").isNotNull)
      .select(
        Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
          lit(0).as("__kind"), lit(null).cast(lType).as("__l"),
          struct(right.columns.map(col): _*).as("__r")) ++
          rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)
    val lRows = left
      .filter(col(leftKey).isNotNull &&
        col(leftTime).cast("timestamp").isNotNull)
      .select(
        Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
          lit(1).as("__kind"), struct(left.columns.map(col): _*).as("__l"),
          lit(null).cast(rType).as("__r")) ++
          tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__tb$i") }: _*)
    (rRows, lRows, tbCols)
  }

  /** Guard for the merged as-of forms: the internal scratch names must not
    * collide with input columns (a left `__k` would be silently shadowed),
    * and the output flattens BOTH sides, so shared left/right names would
    * produce ambiguous duplicate columns — rename before calling.
    */
  private def requireAsofSafe(left: DataFrame, right: DataFrame): Unit = {
    val reserved = Set("__k", "__t", "__kind", "__l", "__r", "__m", "__b",
      "__cin")
    val clash = (left.columns ++ right.columns).distinct
      .filter(c => reserved.contains(c) || c.startsWith("__tb"))
    require(clash.isEmpty,
      s"asofMerged reserves internal column names; rename: ${clash.mkString(", ")}")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      "asofMerged flattens both sides into one row; shared column names " +
        s"would be ambiguous duplicates — rename on one side: ${dup.mkString(", ")}")
  }

  /** [[asofMerged]] with a time-bucketed two-pass plan for PATHOLOGICAL
    * hot keys: `asofMerged` puts each key's whole timeline in ONE window
    * partition, so a single key holding 10^8 rows serializes in one task.
    * Here rows split into tumbling `bucketInterval` buckets and the window
    * partitions by (key, bucket) — the hot key becomes #buckets parallel
    * tasks. The as-of carry across bucket boundaries is recovered from a
    * per-(key, bucket) summary table (the latest right row per bucket,
    * `max` over the (time, tieBreak…) struct = the sort order's last),
    * run through a tiny per-key running-`last` window (one row per
    * occupied bucket) and joined back on (key, bucket) — where the
    * preceding shuffle already co-located the rows.
    *
    * Same contract and output as [[asofMerged]]; strictly more plan (one
    * extra aggregation + small join), so reach for it when a key's
    * per-interval row count is bounded but its total isn't. The interval
    * is data-dependent: pick one holding per-task rows ≲ 10^6.
    */
  def asofMergedBucketed(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTieBreak: Seq[String], bucketInterval: String): DataFrame = {
    val (rRows, lRows, tbCols) = asofRows(left, leftKey, leftTime,
      right, rightKey, rightTime, rightTieBreak)
    val base = rRows.unionAll(lRows)
      .withColumn("__b", window(col("__t"), bucketInterval).getField("start"))
    // latest right row per occupied (key, bucket): max over the struct
    // whose leading fields are the within-bucket sort key
    val lastPerBucket = base.filter(col("__kind") === 0)
      .groupBy(col("__k"), col("__b"))
      .agg(max(struct((Seq(col("__t")) ++ tbCols.map(col) :+ col("__r")): _*))
        .as("__mx"))
    // carry = latest right in any EARLIER bucket, spread across every
    // occupied bucket (left-only buckets included via the spine)
    val spine = base.select(col("__k"), col("__b")).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = spine.join(lastPerBucket, Seq("__k", "__b"), "left")
      .withColumn("__cin",
        last(col("__mx"), ignoreNulls = true).over(wCarry).getField("__r"))
      .select(col("__k"), col("__b"), col("__cin"))
    val wIn = Window.partitionBy(col("__k"), col("__b"))
      .orderBy((Seq(col("__t"), col("__kind")) ++ tbCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(carried, Seq("__k", "__b"))
      .withColumn("__m",
        coalesce(last(col("__r"), ignoreNulls = true).over(wIn), col("__cin")))
      .filter(col("__kind") === 1 && col("__m").isNotNull)
      .select(col("__l.*"), col("__m.*"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation ----------------------------------------------------
    "q01_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),
    "q02_filter_project" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1995-01-01")) && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    }),
    "q03_join_agg_topk" -> ((s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),
    "q04_left_join" -> ((s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
    }),
    "q05_semi_join" -> ((s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val bigOrders = t(s, d, "orders").filter($"o_totalprice" > 150000.0)
      cust.join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    }),
    "q06_anti_join" -> ((s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_nationkey")
    }),
    "q07_full_join" -> ((s, d) => {
      import s.implicits._
      val nat = t(s, d, "nation")
      val sup = t(s, d, "supplier")
      nat.join(sup, $"n_nationkey" === $"s_nationkey", "full_outer")
        .groupBy($"n_name")
        .agg(count($"s_suppkey").as("n_suppliers"))
    }),
    "q08_theta_join" -> ((s, d) => {
      import s.implicits._
      val reg = t(s, d, "region")
      val nat = t(s, d, "nation")
      reg.join(nat, $"n_regionkey" =!= $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n"))
    }),
    "q09_join_5way" -> ((s, d) => {
      import s.implicits._
      val reg = t(s, d, "region").filter($"r_name" =!= "EUROPE")
      val nat = t(s, d, "nation")
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    // ---- distinct -------------------------------------------------------
    "q10_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
    }),
    "q11_count_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),
    // The HLL estimate itself is engine-internal, but its CONTRACT is not:
    // |estimate − exact| must sit inside the configured error band. Both
    // engines emit the exact count plus the band verdict — the oracle says
    // `true`, so a drifting sketch hash-mismatches. 15% = 3× the default
    // 5% rsd (≈3σ; the estimator is deterministic, so the gate is stable).
    "q12_approx_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("n_exact"))
        .select($"l_returnflag", $"n_exact",
          (abs($"approx_parts" - $"n_exact") <=
            $"n_exact" * lit(0.15)).as("within_band"))
    }),
    // ---- grouping sets / rollup / cube ---------------------------------
    "q13_rollup" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
    }),
    "q14_cube" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),
    "q15_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(1) AS n
               FROM orders_v
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")
    }),
    // ---- window functions ----------------------------------------------
    "q16_window_rank" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
    }),
    "q17_window_lag" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, d, "orders")
        .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
        .select($"o_custkey", $"o_orderkey",
          datediff(to_date($"o_orderdate"), to_date($"prev_date")).cast("long").as("days_since_prev"))
    }),
    "q18_window_frame" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, d, "orders")
        .withColumn("running_spend",
          sum($"o_totalprice".cast(DecimalType(30, 6))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running_spend")
    }),
    // ---- sort / limit / top-k ------------------------------------------
    "q19_sort_limit" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").orderBy($"o_totalprice".desc, $"o_orderkey").limit(20)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),
    // ---- set operations -------------------------------------------------
    "q20_union" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".cast("long").as("nationkey"))
        .union(t(s, d, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
        .groupBy($"nationkey").agg(count(lit(1)).as("n"))
    }),
    "q21_intersect" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".cast("long").as("nationkey"))
        .intersect(t(s, d, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
    }),
    "q22_except" -> ((s, d) => {
      import s.implicits._
      t(s, d, "nation").select($"n_nationkey".cast("long").as("nationkey"))
        .except(t(s, d, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
    }),
    // ---- scalar functions ----------------------------------------------
    "q23_string_fns" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select(
          $"p_partkey",
          upper($"p_brand").as("brand_u"),
          lower($"p_type").as("type_l"),
          length($"p_name").cast("long").as("name_len"),
          substring($"p_name", 1, 8).as("name_pre"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
          $"p_name".contains("green").cast("long").as("has_green"),
          trim($"p_name").as("name_trim"))
    }),
    "q24_date_fns" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          quarter($"o_orderdate").cast("long").as("qtr"),
          unix_millis(date_trunc("month", $"o_orderdate")).as("month_start_ms"))
    }),
    "q25_math_fns" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select(
          $"p_partkey",
          abs($"p_retailprice" - 1000.0).as("abs_diff"),
          ceil($"p_retailprice").cast("long").as("price_ceil"),
          floor($"p_retailprice" / 10.0).cast("long").as("price_floor10"),
          sqrt($"p_retailprice").as("price_sqrt"),
          ($"p_size" % 7).cast("long").as("size_mod7"))
    }),
    "q26_json_fns" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k_val"),
          $"event_type")
        .filter($"k_val" > 50)
    }),
    "q27_case_when" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .withColumn("price_band",
          when($"o_totalprice" < 50000.0, "low")
            .when($"o_totalprice" < 150000.0, "mid")
            .otherwise("high"))
        .groupBy($"price_band", $"o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
    }),
    // ---- subqueries -----------------------------------------------------
    "q28_in_subquery" -> ((s, d) => {
      import s.implicits._
      val rich = t(s, d, "customer").filter($"c_acctbal" > 5000.0).select($"c_custkey")
      t(s, d, "orders")
        .join(rich, $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    }),
    "q29_scalar_subquery" -> ((s, d) => {
      import s.implicits._
      val ord = t(s, d, "orders")
      val threshold = ord.agg((max($"o_totalprice") * 0.5).as("thr"))
      ord.crossJoin(broadcast(threshold))
        .filter($"o_totalprice" > $"thr")
        .agg(count(lit(1)).as("n_above"))
    }),
    "q30_having" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n_items"), dsum($"l_quantity").as("qty"))
        .filter($"n_items" > 50)
    }),
    "q31_exists_correlated" -> ((s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem").filter($"l_quantity" > 45.0)
      t(s, d, "orders")
        .join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice")
    }),
    // ---- as-of join (composed from built-ins: join + window top-1):
    // for each event, the latest order of the same user at-or-before ts ----
    "q32_asof_join" -> ((s, d) => {
      import s.implicits._
      val ord = t(s, d, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val ev = events(s, d).select($"user_id", $"ts", $"event_id")
      val w = Window.partitionBy($"event_id").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      ev.join(ord, $"o_custkey" === $"user_id" && $"o_orderdate" <= $"ts")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast is
        // the identity wall-clock → epoch mapping DuckDB's epoch_ms uses.
        .select($"event_id", $"o_orderkey",
          unix_millis($"o_orderdate".cast("timestamp")).as("order_ms"))
    }),
    // ---- as-of, merged-timeline form: same contract as q32, ONE shuffle.
    // The join+window q32 shape materializes every (event, earlier-order)
    // pair before taking top-1 — a user with 10^5 orders amplifies the
    // shuffle 10^5× per event. This form unions both tables into one
    // timeline, sorts once per user, and carries the latest order forward
    // with last(ignoreNulls) — O(|events| + |orders|) rows end to end.
    "q105_asof_merged" -> ((s, d) => {
      import s.implicits._
      val ord = t(s, d, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val ev = events(s, d).select($"user_id", $"ts", $"event_id")
      asofMerged(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate",
          rightTieBreak = Seq("o_orderkey"))
        .select($"event_id", $"o_orderkey",
          unix_millis($"o_orderdate".cast("timestamp")).as("order_ms"))
    }),
    // ---- resample + forward fill: grid generation composed with the
    // merged-timeline as-of — the gap-filling pass an event series needs.
    // Values pass through unmodified (no float arithmetic) → exact oracle
    // against DuckDB's native ASOF JOIN.
    "q127_resample_ffill" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).filter($"user_id" < 200)
        .select($"user_id", $"ts", $"value")
      Relational.resampleFfill(ev, "user_id", "ts", "value")
        .select($"user_id", unix_millis($"grid_ts").as("grid_ms"), $"value")
    }),
    // ---- interval overlap join: sessions × per-type activity spans —
    // the bucketed equi-join shape (explode to day buckets, exact filter,
    // dedup) vs the oracle's direct inequality join.
    "q128_interval_join" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).filter($"user_id" < 200)
      val sess = ev.groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_ev"))
        .select($"user_id", $"session_window.start".as("s_start"),
          $"session_window.end".as("s_end"), $"n_ev")
      val spans = ev.groupBy($"user_id".as("sp_user"), $"event_type")
        .agg(min($"ts").as("sp_start"), max($"ts").as("sp_end"))
      Relational.intervalOverlapJoin(sess, "user_id", "s_start", "s_end",
          spans, "sp_user", "sp_start", "sp_end")
        .select($"user_id", unix_millis($"s_start").as("sess_ms"),
          $"event_type", $"n_ev")
    }),
    // ---- pivot ----------------------------------------------------------
    "q33_pivot" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .select($"l_linestatus",
          coalesce($"A", lit(0L)).as("n_a"),
          coalesce($"N", lit(0L)).as("n_n"),
          coalesce($"R", lit(0L)).as("n_r"))
    }),
    // ---- time bucketing (batch analog of streaming tumbling window) ----
    "q34_time_bucket" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy(unix_millis(date_trunc("hour", $"ts")).as("hour_ms"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
    }),
    "q35_dedup_keep_first" -> ((s, d) => {
      import s.implicits._
      events(s, d).groupBy($"user_id", $"event_type")
        .agg(min($"event_id").as("first_event"), count(lit(1)).as("n"))
    }),
    // statistical moments from EXACT decimal sums (stddev/var built-ins
    // accumulate doubles order-dependently and can't hash-match an oracle;
    // sum/sumsq in DECIMAL then one double evaluation is deterministic)
    "q39_stats_moments" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum($"l_quantity").as("s1"),
          dsum($"l_quantity" * $"l_quantity").as("s2"))
        .select($"l_returnflag", $"n",
          ($"s1" / $"n").as("mean"),
          (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_samp"),
          sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("stddev_samp"))
    }),
    // exact discrete percentiles by integer row selection: the chosen
    // value is an actual data element (rank ceil(q*n) under a unique total
    // order), so it hash-matches across engines — interpolated percentile
    // built-ins accumulate doubles engine-specifically and cannot
    "q44_percentile_disc" -> ((s, d) => {
      import s.implicits._
      val wp = org.apache.spark.sql.expressions.Window.partitionBy($"l_returnflag")
      val ws = wp.orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      t(s, d, "lineitem")
        .select($"l_returnflag", $"l_extendedprice",
          row_number().over(ws).cast("long").as("rn"),
          count(lit(1)).over(wp).as("n"))
        .groupBy($"l_returnflag")
        .agg(
          max(when($"rn" === ceil($"n" * 0.5).cast("long"), $"l_extendedprice")).as("p50"),
          max(when($"rn" === ceil($"n" * 0.9).cast("long"), $"l_extendedprice")).as("p90"),
          max(when($"rn" === ceil($"n" * 0.99).cast("long"), $"l_extendedprice")).as("p99"))
    }),
    // approx percentile under its rank-error CONTRACT (the q12 pattern for
    // sketches whose internals are engine-specific): `approx_percentile`
    // with accuracy A guarantees the returned element's rank is within
    // eps = 1/A of the target rank. The gate re-ranks the approximate
    // answer against the exact column — cnt(<= ap) must reach (p - eps)·n
    // and cnt(< ap) must not pass (p + eps)·n (the two-sided form is
    // tie-safe). The sketch value itself never crosses engines; its
    // CONTRACT does, as a boolean the oracle asserts true.
    "q112_approx_percentile" -> ((s, d) => {
      import s.implicits._
      val eps = 1.0 / 1000
      val li = t(s, d, "lineitem").select($"l_returnflag", $"l_extendedprice")
      val ap = li.groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("ap"))
      li.join(broadcast(ap), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when($"l_extendedprice" <= $"ap", 1L).otherwise(0L)).as("le"),
          sum(when($"l_extendedprice" < $"ap", 1L).otherwise(0L)).as("lt"))
        .select($"l_returnflag", $"n",
          ($"le" >= ($"n" * (0.5 - eps) - 1) &&
            $"lt" <= ($"n" * (0.5 + eps) + 1)).as("within_band"))
    }),
    "q38_right_join" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey", "right")
        .groupBy($"c_nationkey")
        .agg(count($"o_orderkey").as("n_orders"), countDistinct($"c_custkey").as("n_custs"))
    }),
    // range join: equi key + band predicate (Catalyst plans hash join with
    // a residual range filter; at scale AQE handles the skew)
    "q37_range_join" -> ((s, d) => {
      import s.implicits._
      val part = t(s, d, "part").select($"p_partkey", $"p_brand", $"p_size")
      t(s, d, "lineitem")
        .join(part, $"l_partkey" === $"p_partkey" &&
          $"l_quantity" >= $"p_size" - 5 && $"l_quantity" <= $"p_size" + 5)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
    }),
    // batch session windows (gap = 30 min); oracle is the classic
    // gaps-and-islands SQL. Boundary semantics: Spark sessions are
    // [start, last+gap), so an event exactly gap after its predecessor
    // starts a NEW session — the oracle splits on diff >= gap to match.
    "q36_session_batch" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id",
          unix_millis($"session_window.start").as("sess_start_ms"),
          unix_millis($"session_window.end").as("sess_end_ms"),
          $"n")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  count(1) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05""".stripMargin,
    "q03_join_agg_topk" ->
      s"""SELECT l_orderkey,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY 1
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q04_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q07_full_join" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY 1""".stripMargin,
    "q08_theta_join" ->
      """SELECT r_name, count(1) AS n
        |FROM region JOIN nation ON n_regionkey <> r_regionkey
        |GROUP BY 1""".stripMargin,
    "q09_join_5way" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(1) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name <> 'EUROPE'
         |GROUP BY 1""".stripMargin,
    "q10_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q11_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs, count(1) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    // the oracle asserts the sketch CONTRACT: the estimate Spark computed
    // must sit within the error band of the exact count (which both
    // engines agree on) — `true` is the expected verdict, not filler
    "q12_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |  true AS within_band
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q13_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(1) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,
    "q16_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q17_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
        |FROM orders""".stripMargin,
    "q18_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,
    "q19_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q20_union" ->
      """SELECT nationkey, count(1) AS n FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |GROUP BY 1""".stripMargin,
    "q21_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""".stripMargin,
    "q22_except" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nationkey FROM nation
        |EXCEPT
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""".stripMargin,
    "q23_string_fns" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  lower(p_type) AS type_l,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_name, 1, 8) AS name_pre,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  CAST(CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS BIGINT) AS has_green,
        |  trim(p_name) AS name_trim
        |FROM part""".stripMargin,
    "q24_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms
        |FROM orders""".stripMargin,
    "q25_math_fns" ->
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000.0) AS abs_diff,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice / 10.0) AS BIGINT) AS price_floor10,
        |  sqrt(p_retailprice) AS price_sqrt,
        |  CAST(p_size % 7 AS BIGINT) AS size_mod7
        |FROM part""".stripMargin,
    "q26_json_fns" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  event_type
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin,
    "q27_case_when" ->
      s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
         |            WHEN o_totalprice < 150000.0 THEN 'mid'
         |            ELSE 'high' END AS price_band,
         |  o_orderstatus, count(1) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY 1, 2""".stripMargin,
    "q28_in_subquery" ->
      """SELECT o_orderstatus, count(1) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |GROUP BY 1""".stripMargin,
    "q29_scalar_subquery" ->
      """SELECT count(1) AS n_above FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.5 FROM orders)""".stripMargin,
    "q30_having" ->
      s"""SELECT l_suppkey, count(1) AS n_items, ${dsumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY 1 HAVING count(1) > 50""".stripMargin,
    "q31_exists_correlated" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)""".stripMargin,
    "q32_asof_join" ->
      """SELECT event_id, o_orderkey, epoch_ms(o_orderdate) AS order_ms FROM (
        |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin,
    // q105 implements the SAME as-of contract as q32 via the merged
    // timeline — one oracle, two physical shapes
    // q128: the oracle joins the SAME sessions (q36's gaps-and-islands
    // replay) and spans with a direct inequality predicate — the bucketed
    // equi-join must produce the identical pair set.
    "q128_interval_join" ->
      """WITH e AS (SELECT * FROM events WHERE user_id < 200),
        |sess AS (
        |  SELECT user_id, min(ts) AS s_start,
        |    max(ts) + INTERVAL 30 MINUTE AS s_end, count(1) AS n_ev
        |  FROM (
        |    SELECT user_id, ts,
        |      sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS grp
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                  IS NULL THEN 1
        |             WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                  >= INTERVAL 30 MINUTE THEN 1
        |             ELSE 0 END AS new_sess
        |      FROM e))
        |  GROUP BY user_id, grp),
        |span AS (SELECT user_id AS sp_user, event_type,
        |           min(ts) AS sp_start, max(ts) AS sp_end
        |         FROM e GROUP BY 1, 2)
        |SELECT s.user_id, epoch_ms(s.s_start) AS sess_ms, sp.event_type, s.n_ev
        |FROM sess s JOIN span sp ON s.user_id = sp.sp_user
        |  AND s.s_start <= sp.sp_end AND sp.sp_start <= s.s_end""".stripMargin,
    // q127: native ASOF JOIN replays the composed grid+ffill exactly —
    // same per-(key, ts) max-collapse, same trunc'd inclusive grid.
    "q127_resample_ffill" ->
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 200),
        |o AS (SELECT user_id, ts, max(value) AS value FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, date_trunc('day', min(ts)) AS t0, max(ts) AS t1
        |      FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS gts
        |      FROM s)
        |SELECT g.user_id, epoch_ms(g.gts) AS grid_ms, o.value
        |FROM g ASOF JOIN o ON g.user_id = o.user_id AND g.gts >= o.ts""".stripMargin,
    "q105_asof_merged" ->
      """SELECT event_id, o_orderkey, epoch_ms(o_orderdate) AS order_ms FROM (
        |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin,
    "q33_pivot" ->
      """SELECT l_linestatus,
        |  count(1) FILTER (WHERE l_returnflag = 'A') AS n_a,
        |  count(1) FILTER (WHERE l_returnflag = 'N') AS n_n,
        |  count(1) FILTER (WHERE l_returnflag = 'R') AS n_r
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q34_time_bucket" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
         |  count(1) AS n, ${dsumSql("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q35_dedup_keep_first" ->
      """SELECT user_id, event_type, min(event_id) AS first_event, count(1) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q37_range_join" ->
      s"""SELECT p_brand, count(1) AS n, ${dsumSql("l_extendedprice")} AS total
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
         |GROUP BY 1""".stripMargin,
    "q39_stats_moments" ->
      s"""SELECT l_returnflag, n,
         |  s1 / n AS mean,
         |  (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
         |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp
         |FROM (
         |  SELECT l_returnflag, count(1) AS n,
         |    ${dsumSql("l_quantity")} AS s1,
         |    ${dsumSql("l_quantity * l_quantity")} AS s2
         |  FROM lineitem GROUP BY 1)""".stripMargin,
    "q44_percentile_disc" ->
      """SELECT l_returnflag,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
        |      THEN l_extendedprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
        |      THEN l_extendedprice END) AS p90,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT)
        |      THEN l_extendedprice END) AS p99
        |FROM (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |    count(1) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |GROUP BY 1""".stripMargin,
    "q112_approx_percentile" ->
      """SELECT l_returnflag, count(1) AS n, true AS within_band
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q38_right_join" ->
      """SELECT c_nationkey, count(o_orderkey) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_custs
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q36_session_batch" ->
      """SELECT user_id,
        |  epoch_ms(min(ts)) AS sess_start_ms,
        |  epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS sess_end_ms,
        |  count(1) AS n
        |FROM (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                IS NULL THEN 1
        |           WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                >= INTERVAL 30 MINUTE THEN 1
        |           ELSE 0 END AS new_sess
        |    FROM events))
        |GROUP BY user_id, grp""".stripMargin
  )
}
