package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryModule, Tables}

/** Core relational operator coverage (SURVEY.md §2.1–2.7) expressed
  * Spark-first over the shared TPC-H-ish test tables.
  *
  * Every query has a DuckDB oracle. Conventions for oracle parity:
  *   - every computed column is aliased identically on both sides;
  *   - aggregates over doubles are rounded (summation order differs
  *     between engines in the low bits);
  *   - per-row double arithmetic is left exact (same IEEE ops on both
  *     sides);
  *   - timestamps compared as values are reduced to `unix_micros` /
  *     `epoch_us` where engine-side timestamp *types* would differ.
  *
  * Scale notes (100 TB mindset): filters sit directly on the scan so
  * Catalyst pushes them into parquet; aggregations are partial-agg
  * friendly (plain groupBy over codegen'd exprs); the one deliberately
  * small side (nation/region) is broadcast.
  */
object Relational extends QueryModule {
  import Tables._

  // ---------------------------------------------------------------- q1
  // TPC-H Q1-shaped pricing summary: scan-filter → hash aggregate.
  // Reference analogue: SUM(...) GROUP BY country (demo-notebook.py:397-416).
  private def q1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // Money sums via exact DECIMAL arithmetic (the source doubles are
        // exact 2dp decimals): decimal sums are order-independent, so
        // both engines produce bit-identical values with NO rounding —
        // float sums differ in low bits with summation order and any
        // rounding grid has straddle-the-boundary hash failures
        // (ADVICE r1; observed live at 2dp). Quantities are integral
        // doubles (< 2^53) so their float sum is already exact. Averages
        // are derived as exact-sum / count — one deterministic IEEE
        // division instead of an order-sensitive float avg.
        sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (sum($"l_discount".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }
  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
      |  sum(l_extendedprice::DECIMAL(18,2) *
      |      (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  // Projection + pushed-down range predicate + per-row arithmetic
  // (SURVEY P1/P2; per-row doubles stay exact on both engines).
  private def q2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-02-01").cast("timestamp") &&
              $"l_returnflag" === "R")
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
  }
  private val q2Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-02-01'
      |  AND l_returnflag = 'R'""".stripMargin

  // ---------------------------------------------------------------- q3
  // 3-way equi-join + aggregate (TPC-H Q3 shape). customer is small →
  // Catalyst broadcasts it under AQE; orders⋈lineitem shuffles on the
  // join key only once because the aggregate reuses o_orderkey.
  private def q3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = orders(s, d).filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      // exact decimal revenue — see q1's rationale
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
             .cast("double").as("revenue"))
  }
  private val q3Sql =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  sum(l_extendedprice::DECIMAL(18,2) *
      |      (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q4
  // Semi-join (EXISTS) + aggregate — TPC-H Q4 shape. left_semi avoids
  // materializing the join (SURVEY §2.3 note: MERGE's not-matched clause
  // is the anti-join dual of this).
  private def q4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-07-01").cast("timestamp"))
    val l = lineitem(s, d).filter($"l_returnflag" === "R")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }
  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  // Right-outer equi-join + null default — the reference's validation
  // join (J1 + F6, demo-notebook.py:527-538): per-nation supplier
  // account totals right-joined to ALL nations, absent → 0.
  private def q5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perNation = supplier(s, d)
      .groupBy($"s_nationkey")
      // exact decimal sum — see q1's rationale
      .agg(sum($"s_acctbal".cast("decimal(18,2)")).cast("double").as("total_bal"))
    val n = nation(s, d)
    perNation
      .join(n, perNation("s_nationkey") === n("n_nationkey"), "right_outer")
      .select($"n_name", coalesce($"total_bal", lit(0.0)).as("total_bal"))
  }
  private val q5Sql =
    """SELECT n_name, coalesce(total_bal, 0.0) AS total_bal
      |FROM (SELECT s_nationkey, sum(s_acctbal::DECIMAL(18,2))::DOUBLE AS total_bal
      |      FROM supplier GROUP BY s_nationkey) sup
      |RIGHT JOIN nation ON sup.s_nationkey = n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q6
  // Ranking window + keep-latest filter — the reference's intra-batch
  // dedup idiom (W1, demo-notebook.py:263-267) over the events table:
  // latest event per user. event_id desc is the deterministic tiebreak.
  private def q6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    events(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
  }
  private val q6Sql =
    """SELECT user_id, event_id, event_type, value
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
      |      FROM events)
      |WHERE rnk = 1""".stripMargin

  // ----------------------------------------------------- q_qualify_dedup
  /** The reference's dedup statement VERBATIM-shaped: `QUALIFY rnk = 1`
    * (demo-notebook.py:267 — Databricks SQL; vanilla Spark 4 lacks the
    * keyword). [[graft.catalog.GraftSqlParser]] rewrites QUALIFY into
    * the ranked-subquery filter at parse time, so a reference user can
    * paste their statement unchanged; the oracle runs DuckDB's NATIVE
    * QUALIFY over the same text shape, pinning the rewrite to a real
    * engine's semantics. Same result contract as q6_window_dedup. */
  private def qQualifyDedup(s: SparkSession, d: String): DataFrame = {
    events(s, d).createOrReplaceTempView("qualify_events")
    val plan = new graft.catalog.GraftSqlParser(s.sessionState.sqlParser,
      Some(s)).parsePlan(
        """SELECT user_id, event_id, event_type, value,
          |  CAST(row_number() OVER (PARTITION BY user_id
          |    ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rnk
          |FROM qualify_events
          |QUALIFY rnk = 1""".stripMargin)
    org.apache.spark.sql.graftshim.SparkInternals.ofRows(s, plan)
  }
  private val qQualifyDedupSql =
    """SELECT user_id, event_id, event_type, value,
      |  CAST(row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rnk
      |FROM events
      |QUALIFY rnk = 1""".stripMargin

  // ---------------------------------------------------------------- q7
  // Content hash for change detection — F1 (md5 over concatenated
  // business fields, demo-notebook.py:168). Timestamp folded in as
  // unix_micros so both engines hash identical strings. Uses
  // null-propagating `concat` (any NULL field → NULL hash), matching the
  // reference's semantics for the inter-batch dup guard — `concat_ws`
  // would silently skip NULLs (VERDICT r1 finding 1). Separators prevent
  // ("ab","c") vs ("a","bc") collisions. DuckDB `||` propagates NULL too.
  private def q7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select(
      $"event_id",
      md5(concat(
        $"event_id".cast("string"), lit("|"),
        $"user_id".cast("string"), lit("|"),
        $"event_type", lit("|"),
        unix_micros($"ts").cast("string"))).as("data_hash"))
  }
  private val q7Sql =
    """SELECT event_id,
      |  md5(event_id::VARCHAR || '|' || user_id::VARCHAR || '|' ||
      |      event_type || '|' || epoch_us(ts)::VARCHAR) AS data_hash
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q8
  // Signed-delta CASE — THE core incremental-aggregation algorithm (A2,
  // demo-notebook.py:401-413): negate retractions, sum per group.
  private def q8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("delta_value",
        when($"event_type" === "error", -$"value").otherwise($"value"))
      .groupBy($"user_id")
      .agg(round(sum($"delta_value"), 2).as("net_value"))
  }
  private val q8Sql =
    """SELECT user_id,
      |  round(sum(CASE WHEN event_type = 'error' THEN -value ELSE value END), 2)
      |    AS net_value
      |FROM events GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- q9
  // Timezone normalization — F4 (to_utc_timestamp(ts,'Europe/Paris'),
  // demo-notebook.py:253). Compared as epoch micros: DuckDB's
  // TIMESTAMPTZ and Spark's TIMESTAMP would not hash-match as types.
  private def q9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select(
      $"event_id",
      unix_micros(to_utc_timestamp($"ts", "Europe/Paris")).as("utc_micros"))
  }
  private val q9Sql =
    """SELECT event_id,
      |  epoch_us(timezone('Europe/Paris', ts)) AS utc_micros
      |FROM events""".stripMargin

  // --------------------------------------------------------------- q10
  // Multi-key mixed-direction sort (O1, demo-notebook.py:372). The sort
  // itself is verified by value equality; a global sort at scale is a
  // range-partitioned exchange — only ever do it on final output.
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .filter($"event_type".isin("signup", "purchase"))
      // asc_nulls_last: Spark's asc default is NULLS FIRST, DuckDB's is
      // NULLS LAST — latent oracle divergence on nullable keys (ADVICE r1).
      .orderBy($"event_type".asc_nulls_last, $"value".desc, $"event_id".asc_nulls_last)
      .select($"event_id", $"event_type", $"value")
  }
  private val q10Sql =
    """SELECT event_id, event_type, value
      |FROM events
      |WHERE event_type IN ('signup', 'purchase')
      |ORDER BY event_type ASC, value DESC, event_id ASC""".stripMargin

  // --------------------------------------------------------------- q11
  // Top-k per group (O3 generalized from k=1): 3 highest-value events
  // per event_type. Two-phase (VERDICT r1: a single window partitioned by
  // a handful of event_type values funnels every row of a type through
  // ONE reducer at scale): phase 1 takes a local top-k within each
  // (event_type, input-partition) — parallel across partitions, correct
  // under ANY row placement because a per-slice top-k is a superset of
  // the global top-k — so the final window sees ≤ k·numPartitions rows.
  private def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 3
    val ord = Seq($"value".desc, $"event_id".asc_nulls_last)
    val local = Window.partitionBy($"event_type", $"_slice").orderBy(ord: _*)
    val global = Window.partitionBy($"event_type").orderBy(ord: _*)
    events(s, d)
      .withColumn("_slice", spark_partition_id())
      .withColumn("_lrnk", row_number().over(local))
      .filter($"_lrnk" <= k)
      .withColumn("rnk", row_number().over(global))
      .filter($"rnk" <= k)
      .select($"event_type", $"rnk", $"event_id", $"value")
  }
  private val q11Sql =
    """SELECT event_type, rnk, event_id, value
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
      |      FROM events)
      |WHERE rnk <= 3""".stripMargin

  // --------------------------------------------------------------- q12
  // Exact distinct aggregation (expand-based in Spark; verifies the
  // distinct path the reference never exercises but a real engine needs).
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("distinct_parts"),
        countDistinct($"l_suppkey").as("distinct_supps"),
        count(lit(1)).as("n_rows"))
  }
  private val q12Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q13
  // Point lookup on key (P2, `where id = 298` demo-notebook.py:152) —
  // at scale this is pure pushdown + partition/row-group pruning.
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .filter($"o_orderkey" === 298L)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
  }
  private val q13Sql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey = 298""".stripMargin

  // --------------------------------------------------------------- q14
  // Salted equi-join — the explicit skew tool (graft.operators.SkewOps):
  // each big-side key is split `salts` ways and the small side
  // replicated to match, so a hot key spreads over `salts` reducers.
  // The oracle is the PLAIN join: salting must be result-invisible.
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = lineitem(s, d).select($"l_orderkey", $"l_extendedprice")
    val small = orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    graft.operators.SkewOps.saltedEquiJoin(big, small, "l_orderkey", salts = 8)
      .groupBy($"o_orderstatus")
      .agg(
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }
  private val q14Sql =
    """SELECT o_orderstatus,
      |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS total_price,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderstatus""".stripMargin

  // --------------------------------------------------------------- q15
  // Exact percentiles per group (beyond the reference's surface — a
  // complete engine needs order statistics). Both engines use linear
  // interpolation at rank (n-1)p; 4dp rounding absorbs the last-ulp
  // difference of the interpolation arithmetic.
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
  }
  private val q15Sql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.95), 4) AS p95,
      |  round(quantile_cont(value, 0.99), 4) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // --------------------------------------------------------------- q16
  // ROLLUP hierarchy aggregation with grouping indicators (also beyond
  // the reference; quantities are integral so sums are exact doubles).
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("long").as("g_flag"),
        grouping($"l_linestatus").cast("long").as("g_status"))
  }
  private val q16Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  sum(l_quantity) AS sum_qty,
      |  grouping(l_returnflag)::BIGINT AS g_flag,
      |  grouping(l_linestatus)::BIGINT AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ------------------------------------------------------------- q_cube
  // CUBE over two dimensions — all four grouping-set combinations in
  // one pass (q16's ROLLUP walks only the hierarchy's prefixes).
  private def qCube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("long").as("g_flag"),
        grouping($"l_linestatus").cast("long").as("g_status"))
  }
  private val qCubeSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  sum(l_quantity) AS sum_qty,
      |  grouping(l_returnflag)::BIGINT AS g_flag,
      |  grouping(l_linestatus)::BIGINT AS g_status
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ------------------------------------------------------- q_json_props
  // Semi-structured extraction from the events' JSON `props` column,
  // both ways Spark 4 offers: `from_json` with an explicit schema (the
  // right call when the shape is known — a codegen'd struct the
  // optimizer prunes like any column) and `parse_json` → VARIANT +
  // `variant_get` (the open-shape path — parse once, bind fields
  // lazily, no schema migration when producers add keys). Both stay
  // per-row and shuffle-free; the oracle extracts the same field with
  // DuckDB's JSON functions, pinning value-level agreement of the two
  // Spark paths AND the two engines.
  private def qJsonProps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select(
      $"event_id",
      from_json($"props", lit("k INT")).getField("k").cast("long").as("k_schema"),
      variant_get(parse_json($"props"), "$.k", "long").as("k_variant"))
  }
  private val qJsonPropsSql =
    """SELECT event_id,
      |  json_extract(props, '$.k')::BIGINT AS k_schema,
      |  json_extract(props, '$.k')::BIGINT AS k_variant
      |FROM events""".stripMargin

  // ------------------------------------------------------------ q_ntile
  // Quartile assignment WITHIN each priority class — ntile partitioned
  // by a real key, so the sort is per-group, not a single global
  // total-order partition (the global form is the classic scale
  // anti-pattern: one task sorts the world). The order key is made
  // unique with the tiebreaker column — ntile under ties is otherwise
  // nondeterministic between engines.
  private def qNtile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc_nulls_last, $"o_orderkey".asc_nulls_last)
    orders(s, d).select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
      ntile(4).over(w).as("quartile"))
  }
  private val qNtileSql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  ntile(4) OVER (PARTITION BY o_orderpriority
      |                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
      |FROM orders""".stripMargin

  // ---------------------------------------------------------- q_set_ops
  // INTERSECT / EXCEPT chain over customer key sets: urgent-order
  // customers ∩ F-status customers ∖ AUTOMOBILE segment. Spark plans
  // both as hash semi/anti joins over distinct keys (same engine shape
  // as q4/q_anti_join) — set semantics (DISTINCT) match both engines.
  private def qSetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    val fStatus = orders(s, d).filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("c_custkey"))
    val auto = customer(s, d).filter($"c_mktsegment" === "AUTOMOBILE")
      .select($"c_custkey")
    urgent.intersect(fStatus).except(auto)
  }
  private val qSetOpsSql =
    """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin

  // ---------------------------------------------------- q_corr_subquery
  // Correlated scalar subqueries issued as SQL TEXT: per-customer order
  // count and max price. Catalyst decorrelates both into ONE left
  // outer aggregate join (RewriteCorrelatedScalarSubquery) — the naive
  // per-row re-execution a tuple-at-a-time engine would do simply does
  // not exist in the plan, which is what makes the construct usable at
  // scale. The oracle runs the IDENTICAL statement.
  private val qCorrSubquerySqlText =
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c
      |WHERE c_acctbal > 9000""".stripMargin

  private def qCorrSubquery(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(qCorrSubquerySqlText)
  }

  // ------------------------------------------------------------ q_pivot
  // Wide pivot: order counts and exact-decimal revenue per priority ×
  // status. Pivot values are EXPLICIT — with them the plan is a single
  // hash aggregate over conditional expressions; without them Spark
  // first runs a distinct-values job over the whole input to discover
  // the columns, an extra full scan you never want at 100 TB.
  private def qPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("rev"))
  }
  private val qPivotSql =
    """SELECT o_orderpriority,
      |  count(*) FILTER (o_orderstatus = 'F') AS F_n,
      |  sum(o_totalprice::DECIMAL(18,2)) FILTER (o_orderstatus = 'F')::DOUBLE AS F_rev,
      |  count(*) FILTER (o_orderstatus = 'O') AS O_n,
      |  sum(o_totalprice::DECIMAL(18,2)) FILTER (o_orderstatus = 'O')::DOUBLE AS O_rev,
      |  count(*) FILTER (o_orderstatus = 'P') AS P_n,
      |  sum(o_totalprice::DECIMAL(18,2)) FILTER (o_orderstatus = 'P')::DOUBLE AS P_rev
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------- q_unpivot
  // Long-form melt of three measure columns into (measure, value) —
  // the inverse reshaping. Spark's `unpivot` is a per-row generator
  // (no shuffle, no join): each input row expands to 3 output rows in
  // the same task, so it scales linearly and preserves partitioning.
  // The filter bounds the oracle row count, pushed below the expand.
  private def qUnpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_orderkey" < 1000)
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .unpivot(
        ids = Array($"l_orderkey", $"l_linenumber"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        variableColumnName = "measure",
        valueColumnName = "value")
  }
  private val qUnpivotSql =
    """SELECT l_orderkey, l_linenumber, m.measure, m.value
      |FROM lineitem,
      |  LATERAL (VALUES ('l_quantity', l_quantity),
      |                  ('l_extendedprice', l_extendedprice),
      |                  ('l_discount', l_discount)) AS m(measure, value)
      |WHERE l_orderkey < 1000""".stripMargin

  // --------------------------------------------------------------- q17/q18
  // A DELIBERATELY skewed join — ~75% of lineitem lands on one hot key —
  // resolved two ways over identical data and oracle:
  //   q17: plain shuffle join, relying on AQE's runtime skew-split (the
  //        merge hint keeps it a shuffle join so the skew is real; at
  //        production partition sizes OptimizeSkewedJoin splits the hot
  //        partition — SkewOpsSpec asserts the split fires);
  //   q18: the explicit salted rewrite (SkewOps) of the same join.
  // BENCH_r{N} carries both timings side by side: the measured
  // salted-vs-AQE comparison for the skew story.
  private def skewedSides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val big = lineitem(s, d).select(
      when($"l_orderkey" % 4 =!= 0, 1L).otherwise($"l_orderkey").as("k"),
      $"l_quantity")
    val small = orders(s, d).select($"o_orderkey".as("k"), $"o_orderstatus")
    (big, small)
  }
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (big, small) = skewedSides(s, d)
    big.join(small.hint("merge"), "k")
      .groupBy($"o_orderstatus")
      .agg(sum($"l_quantity").cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (big, small) = skewedSides(s, d)
    // the hot key is structural (the construction above pins it), so
    // hot-key-targeted salting applies: only key 1 is salted/replicated
    graft.operators.SkewOps.saltedEquiJoin(big, small, "k", salts = 16,
      hotKeys = Some(Seq(1L)))
      .groupBy($"o_orderstatus")
      .agg(sum($"l_quantity").cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
  }
  private val qSkewSql =
    """SELECT o_orderstatus,
      |  sum(l_quantity)::DOUBLE AS sum_qty,
      |  count(*) AS n_items
      |FROM (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_orderkey END AS k,
      |             l_quantity
      |      FROM lineitem) b
      |JOIN orders ON b.k = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------- q_anti_join
  /** Left ANTI join (q4's semi-join mirrored): customers with NO
    * high-value order — the NOT EXISTS shape. The filter sits on the
    * right side's scan (pushed), and the anti join needs only the join
    * key from the right — a build side of distinct keys, not rows. */
  private def qAntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .join(orders(s, d).filter($"o_totalprice" > 300000.0),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }
  private val qAntiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)""".stripMargin

  // ------------------------------------------------------ q_running_total
  /** Cumulative window + lag in one pass: per-user running value total
    * (exact DECIMAL, so the running value is order-independent in value
    * and deterministic in position via the (ts, event_id) sort) and the
    * gap to the previous event — the frame/offset window idioms §2.6's
    * ranking dedup didn't exercise. One shuffle on user_id serves both
    * window functions. */
  private def qRunningTotal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val order = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
      .select($"user_id", $"event_id", $"ts_us",
        sum($"value".cast("decimal(18,2)")).over(frame)
          .cast("double").as("running_value"),
        ($"ts_us" - lag($"ts_us", 1).over(order)).as("gap_us"))
  }
  private val qRunningTotalSql =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  sum(value::DECIMAL(18,2)) OVER w_frame::DOUBLE AS running_value,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w_order AS gap_us
      |FROM events
      |WINDOW
      |  w_order AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
      |  w_frame AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |              ROWS UNBOUNDED PRECEDING)""".stripMargin

  // ------------------------------------------------------- q_range_frame
  /** Event-time RANGE window frame: per user, the count and exact
    * (DECIMAL) sum of activity in the trailing 10 minutes of each
    * event — the windowed-feature shape (rolling engagement, rate
    * limiting) that ROWS frames get wrong under irregular event
    * spacing. The frame bound is epoch-microsecond arithmetic on both
    * engines; peers at one timestamp are included identically. One
    * user_id shuffle, no join. */
  private def qRangeFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tenMinUs = 600000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-tenMinUs, 0)
    events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
      .select($"user_id", $"event_id", $"ts_us",
        count(lit(1)).over(w).as("n_last_10m"),
        sum($"value".cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_last_10m"))
  }
  private val qRangeFrameSql =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER w AS n_last_10m,
      |  sum(value::DECIMAL(18,2)) OVER w::DOUBLE AS sum_last_10m
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------- q_grouping_sets
  /** Arbitrary GROUPING SETS (beyond q16's ROLLUP hierarchy and
    * q_cube's full lattice): the two one-dimension marginals plus the
    * grand total, skipping the 2-D cell — the exact set a reporting
    * layer asks for. One pass, Spark's Expand + partial aggregation. */
  // ---------------------------------------------------- q_abc_analysis
  /** ABC (Pareto-class) inventory analysis: parts ranked by revenue,
    * classified A while the cumulative share stays ≤ 80 %, B to 95 %,
    * C past that — the classification behind stocking policy, and the
    * general "which 20 % of keys carry 80 % of the mass" cut. Revenue
    * accumulates in exact integer cents; the class predicate compares
    * integer cross-products (`cum·100 ≤ total·80`), so the boundary is
    * engine-exact, never a float share.
    *
    * The per-part aggregate is the only corpus-scale shuffle; the
    * exact global running sum over the |parts| relation comes from
    * [[graft.operators.RankOps.withGlobalOrder]] — bucketed
    * distributed sort, so the plan holds even for key spaces far too
    * large to sort in one partition. */
  private def qAbcAnalysis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // staged once: ranking passes and the total read the |parts|-row
    // revenue table from scratch parquet, not the lineitem aggregation
    val rev = graft.operators.RankOps.staged(
      lineitem(s, d)
        .select($"l_partkey",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .groupBy($"l_partkey")
        .agg(sum($"cents").as("rev_cents")),
      "abc-rev", d)
    val total = rev.agg(sum($"rev_cents").as("total_cents"))
    graft.operators.RankOps.withGlobalOrder(rev,
        $"rev_cents", ascending = false, tiebreaks = Seq($"l_partkey"),
        runningSums = Seq(($"rev_cents", "cum_cents")))
      .crossJoin(broadcast(total))
      .select($"l_partkey", $"rev_cents", $"cum_cents",
        when($"cum_cents" * 100 <= $"total_cents" * 80, "A")
          .when($"cum_cents" * 100 <= $"total_cents" * 95, "B")
          .otherwise("C").as("abc_class"))
  }
  private val qAbcAnalysisSql =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents FROM rev),
      |c AS (
      |  SELECT *,
      |    CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey ASC)
      |      AS BIGINT) AS cum_cents
      |  FROM rev)
      |SELECT l_partkey, rev_cents, cum_cents,
      |  CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
      |       WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c, t""".stripMargin

  private def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
        $"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("long").as("g_flag"),
        grouping($"l_linestatus").cast("long").as("g_status"))
  }
  private val qGroupingSetsSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  sum(l_quantity) AS sum_qty,
      |  grouping(l_returnflag)::BIGINT AS g_flag,
      |  grouping(l_linestatus)::BIGINT AS g_status
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  // ---------------------------------------------------------- q_asof_join
  /** Backward as-of join (graft.operators.AsofJoin): every purchase
    * picks up the same user's latest click at-or-before it — the
    * point-in-time feature-lookup join. The Spark plan is the
    * union+window single-shuffle formulation (no Join node, no per-key
    * pair blow-up — AsofJoinSpec); the oracle is DuckDB's NATIVE
    * `ASOF LEFT JOIN`, so two entirely different algorithms must agree
    * row-for-row. Click ties at one (user, ts) are collapsed upstream
    * (max value) to keep the match deterministic in both engines. */
  private def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val left = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val right = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"value").as("v"))
    graft.operators.AsofJoin
      .asof(left, right, Seq("user_id"), "ts", "ts", Seq("v"), "click_")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value",
        unix_micros($"click_time").as("click_ts_us"), $"click_v".as("click_value"))
  }
  private val qAsofJoinSql =
    """WITH l AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |r AS (SELECT user_id, ts, max(value) AS click_value FROM events
      |      WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
      |       epoch_us(r.ts) AS click_ts_us, r.click_value
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  // --------------------------------------------------------- q_range_join
  /** Band join (graft.operators.RangeJoin): error×click event pairs of
    * the same user within one hour — planned as a bucketized EQUI-join
    * (left explodes into 3 candidate time buckets), never a nested-loop
    * pair scan. The oracle states the naive theta-join; the bucket
    * rewrite must produce exactly that pair set, exactly once. */
  private val BAND_TOL_US = 3600000000L // 1 hour
  private def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val l = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id", $"ts".as("err_ts"))
    val r = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    graft.operators.RangeJoin
      .bandJoin(l, r, Seq("user_id"), "err_ts", "click_ts", BAND_TOL_US)
      .select($"err_id", $"user_id", unix_micros($"err_ts").as("err_ts_us"),
        $"click_id", unix_micros($"click_ts").as("click_ts_us"))
  }
  private val qRangeJoinSql =
    s"""SELECT l.event_id AS err_id, l.user_id, epoch_us(l.ts) AS err_ts_us,
      |       r.event_id AS click_id, epoch_us(r.ts) AS click_ts_us
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      | AND l.event_type = 'error' AND r.event_type = 'click'
      | AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= $BAND_TOL_US""".stripMargin

  // ------------------------------------------------------ q_plan_shape
  /** The `DESCRIBE SHAPE` statement over a canonical star-join
    * aggregate: filtered fact scan (pushed predicate + pruned schema),
    * broadcast dimension join, two-phase hash aggregate. The oracle is
    * the EXPECTED shape as literal rows, which makes this a cross-
    * engine-checked plan-regression tripwire: if pushdown, pruning,
    * broadcast choice, or the shuffle count ever drifts, the row
    * hash-fails the round. Shape facts exclude partition counts and
    * paths, so the result is identical across sf dirs and cluster
    * sizes ([[graft.catalog.DescribeShapeCommand]]). */
  private def qPlanShape(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("shape_customer")
    nation(s, d).createOrReplaceTempView("shape_nation")
    // pin the session confs the EXPECTED literal shape assumes (the
    // broadcast-size threshold behind the BroadcastHashJoin row and
    // whole-stage codegen behind the span count) around the compile,
    // the way DescribeShapeCommand itself pins AQE off — so only real
    // plan regressions trip the oracle, never a legitimate session
    // conf difference
    val pins = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.codegen.wholeStage" -> "true")
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    val rows =
      try {
        pins.foreach { case (k, v) => s.conf.set(k, v) }
        graft.catalog.GraftSql.execute(s,
          """DESCRIBE SHAPE
            |SELECT n.n_name, count(*) AS n_cust
            |FROM shape_customer c
            |JOIN shape_nation n ON c.c_nationkey = n.n_nationkey
            |WHERE c.c_acctbal > 0 GROUP BY n.n_name""".stripMargin)
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("category", StringType, nullable = false),
      StructField("node", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("detail", StringType, nullable = true)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  // ------------------------------------------------------ q_global_rank
  /** The `GLOBAL RANK` SQL statement ([[graft.catalog
    * .GlobalRankStatement]]) end-to-end: customers ranked by exact
    * account-balance cents, with tie-aware rank, total-ordered row
    * number, inclusive running sum, and corpus count — all four output
    * families in one statement. The plan is RankOps' bucketed
    * distributed sort (a parser spec pins zero partition-less Window
    * nodes); the oracle states the equivalent DuckDB window forms, so
    * the SQL front-end, the distributed primitive, and a real window
    * engine must agree bit-for-bit. Balances are compared in integer
    * cents (exact on both engines). */
  private def qGlobalRankSql(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("grank_customer")
    val plan = new graft.catalog.GraftSqlParser(s.sessionState.sqlParser,
      Some(s)).parsePlan(
        """GLOBAL RANK bal_rank ROW_NUMBER rn
          |  RUNNING SUM(cents) AS cum_cents COUNT n_cust
          |FROM (SELECT c_custkey,
          |        CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          |      FROM grank_customer)
          |ORDER BY cents DESC TIEBREAK c_custkey""".stripMargin)
    // plain session: expand the deferred node directly (the extensions
    // path expands it via the injected GlobalRankResolution rule)
    val expanded = plan match {
      case g: graft.catalog.GlobalRankNode => g.built
      case p => p
    }
    org.apache.spark.sql.graftshim.SparkInternals.ofRows(s, expanded)
  }
  private val qGlobalRankSqlOracle =
    """WITH c AS (SELECT c_custkey,
      |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |           FROM customer)
      |SELECT c_custkey, cents,
      |  CAST(rank() OVER (ORDER BY cents DESC) AS BIGINT) AS bal_rank,
      |  CAST(row_number() OVER (ORDER BY cents DESC, c_custkey)
      |    AS BIGINT) AS rn,
      |  CAST(sum(cents) OVER (ORDER BY cents DESC, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_cents,
      |  CAST(count(*) OVER () AS BIGINT) AS n_cust
      |FROM c""".stripMargin

  // ---------------------------------------------- q_global_rank_running
  /** GLOBAL RANK's full RUNNING-aggregate family (SUM / MIN / MAX /
    * AVG) in one statement — prefix extrema and mean over the exact
    * distributed global order. MIN/MAX run over a column that is NOT
    * the sort key (prefix extrema of the key itself are trivial), AVG
    * is stated as running-sum / row-number in BOTH engines so the IEEE
    * division matches bit-for-bit. */
  private def qGlobalRankRunning(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("grank_customer")
    val plan = new graft.catalog.GraftSqlParser(s.sessionState.sqlParser,
      Some(s)).parsePlan(
        """GLOBAL RANK bal_rank
          |  RUNNING SUM(cents) AS cum_cents
          |  RUNNING MIN(c_custkey) AS min_key
          |  RUNNING MAX(c_custkey) AS max_key
          |  RUNNING AVG(cents) AS avg_cents
          |FROM (SELECT c_custkey, c_nationkey,
          |        CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          |      FROM grank_customer)
          |ORDER BY cents DESC TIEBREAK c_custkey""".stripMargin)
    val expanded = plan match {
      case g: graft.catalog.GlobalRankNode => g.built
      case p => p
    }
    org.apache.spark.sql.graftshim.SparkInternals.ofRows(s, expanded)
  }
  private val qGlobalRankRunningOracle =
    """WITH c AS (SELECT c_custkey, c_nationkey,
      |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |           FROM customer)
      |SELECT c_custkey, c_nationkey, cents,
      |  CAST(rank() OVER (ORDER BY cents DESC) AS BIGINT) AS bal_rank,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cum_cents,
      |  CAST(min(c_custkey) OVER w AS BIGINT) AS min_key,
      |  CAST(max(c_custkey) OVER w AS BIGINT) AS max_key,
      |  CAST(sum(cents) OVER w AS BIGINT) /
      |    CAST(row_number() OVER (ORDER BY cents DESC, c_custkey)
      |      AS DOUBLE) AS avg_cents
      |FROM c
      |WINDOW w AS (ORDER BY cents DESC, c_custkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ------------------------------------------------- q_global_percentile
  /** Exact corpus-scale PERCENTILE placement — the curation primitive
    * behind "keep the top decile by quality / length": percent_rank
    * ((rank−1)/(n−1), ties share) and ntile(10) deciles over the exact
    * distributed global order, no partition-less window anywhere. Both
    * derive from the primitive's exact rank / row number / count by
    * integer arithmetic, so DuckDB's native window forms must agree
    * bit-for-bit. */
  private def qGlobalPercentile(s: SparkSession, d: String): DataFrame = {
    documents(s, d).createOrReplaceTempView("grank_docs")
    val plan = new graft.catalog.GraftSqlParser(s.sessionState.sqlParser,
      Some(s)).parsePlan(
        """GLOBAL RANK len_rank PERCENT_RANK pr NTILE(10) decile
          |FROM (SELECT doc_id, CAST(n_chars AS BIGINT) AS len
          |      FROM grank_docs)
          |ORDER BY len DESC TIEBREAK doc_id""".stripMargin)
    val expanded = plan match {
      case g: graft.catalog.GlobalRankNode => g.built
      case p => p
    }
    org.apache.spark.sql.graftshim.SparkInternals.ofRows(s, expanded)
  }
  private val qGlobalPercentileOracle =
    """WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS len
      |           FROM documents)
      |SELECT doc_id, len,
      |  CAST(rank() OVER (ORDER BY len DESC) AS BIGINT) AS len_rank,
      |  percent_rank() OVER (ORDER BY len DESC) AS pr,
      |  CAST(ntile(10) OVER (ORDER BY len DESC, doc_id) AS BIGINT)
      |    AS decile
      |FROM c""".stripMargin

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_plan_shape"        -> qPlanShape _,
    "q_global_rank"       -> qGlobalRankSql _,
    "q_global_rank_running" -> qGlobalRankRunning _,
    "q_global_percentile" -> qGlobalPercentile _,
    "q_abc_analysis"      -> qAbcAnalysis _,
    "q1_pricing_summary"  -> q1 _,
    "q2_filter_project"   -> q2 _,
    "q3_join_agg"         -> q3 _,
    "q4_semi_join"        -> q4 _,
    "q5_right_outer_nvl"  -> q5 _,
    "q6_window_dedup"     -> q6 _,
    "q_qualify_dedup"     -> qQualifyDedup _,
    "q7_data_hash"        -> q7 _,
    "q8_signed_delta"     -> q8 _,
    "q9_utc_normalize"    -> q9 _,
    "q10_multikey_sort"   -> q10 _,
    "q11_topk_per_group"  -> q11 _,
    "q12_distinct_agg"    -> q12 _,
    "q13_point_lookup"    -> q13 _,
    "q14_salted_join"     -> q14 _,
    "q15_percentiles"     -> q15 _,
    "q16_rollup"          -> q16 _,
    "q_cube"              -> qCube _,
    "q_pivot"             -> qPivot _,
    "q_unpivot"           -> qUnpivot _,
    "q_json_props"        -> qJsonProps _,
    "q_ntile"             -> qNtile _,
    "q_set_ops"           -> qSetOps _,
    "q_corr_subquery"     -> qCorrSubquery _,
    "q17_skew_aqe"        -> q17 _,
    "q18_skew_salted"     -> q18 _,
    "q_asof_join"         -> qAsofJoin _,
    "q_range_join"        -> qRangeJoin _,
    "q_anti_join"         -> qAntiJoin _,
    "q_running_total"     -> qRunningTotal _,
    "q_range_frame"       -> qRangeFrame _,
    "q_grouping_sets"     -> qGroupingSets _)

  /** The EXPECTED plan shape as literal rows — the oracle side of the
    * q_plan_shape regression tripwire (see [[qPlanShape]]): pushdown,
    * pruning, broadcast choice, shuffle count, codegen spans. */
  private val qPlanShapeSql =
    """SELECT * FROM (VALUES
      |  ('aggregate', 'HashAggregate', CAST(2 AS BIGINT),
      |   CAST(NULL AS VARCHAR)),
      |  ('broadcast', 'BroadcastExchange', CAST(1 AS BIGINT),
      |   CAST(NULL AS VARCHAR)),
      |  ('codegen', 'WholeStageCodegen', CAST(3 AS BIGINT),
      |   CAST(NULL AS VARCHAR)),
      |  ('exchange', 'hashpartitioning', CAST(1 AS BIGINT),
      |   CAST(NULL AS VARCHAR)),
      |  ('join', 'BroadcastHashJoin', CAST(1 AS BIGINT),
      |   CAST(NULL AS VARCHAR)),
      |  ('scan', 'FileSourceScan', CAST(1 AS BIGINT),
      |   'PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0), IsNotNull(c_nationkey)], ReadSchema: struct<c_nationkey:int,c_acctbal:double>'),
      |  ('scan', 'FileSourceScan', CAST(1 AS BIGINT),
      |   'PushedFilters: [IsNotNull(n_nationkey)], ReadSchema: struct<n_nationkey:int,n_name:string>')
      |) AS t(category, node, n, detail)""".stripMargin

  override val oracles: Seq[(String, String)] = Seq(
    "q_plan_shape"        -> qPlanShapeSql,
    "q_global_rank"       -> qGlobalRankSqlOracle,
    "q_global_rank_running" -> qGlobalRankRunningOracle,
    "q_global_percentile" -> qGlobalPercentileOracle,
    "q_abc_analysis"      -> qAbcAnalysisSql,
    "q1_pricing_summary"  -> q1Sql,
    "q2_filter_project"   -> q2Sql,
    "q3_join_agg"         -> q3Sql,
    "q4_semi_join"        -> q4Sql,
    "q5_right_outer_nvl"  -> q5Sql,
    "q6_window_dedup"     -> q6Sql,
    "q_qualify_dedup"     -> qQualifyDedupSql,
    "q7_data_hash"        -> q7Sql,
    "q8_signed_delta"     -> q8Sql,
    "q9_utc_normalize"    -> q9Sql,
    "q10_multikey_sort"   -> q10Sql,
    "q11_topk_per_group"  -> q11Sql,
    "q12_distinct_agg"    -> q12Sql,
    "q13_point_lookup"    -> q13Sql,
    "q14_salted_join"     -> q14Sql,
    "q15_percentiles"     -> q15Sql,
    "q16_rollup"          -> q16Sql,
    "q_cube"              -> qCubeSql,
    "q_pivot"             -> qPivotSql,
    "q_unpivot"           -> qUnpivotSql,
    "q_json_props"        -> qJsonPropsSql,
    "q_ntile"             -> qNtileSql,
    "q_set_ops"           -> qSetOpsSql,
    "q_corr_subquery"     -> qCorrSubquerySqlText,
    "q17_skew_aqe"        -> qSkewSql,
    "q18_skew_salted"     -> qSkewSql,
    "q_asof_join"         -> qAsofJoinSql,
    "q_range_join"        -> qRangeJoinSql,
    "q_anti_join"         -> qAntiJoinSql,
    "q_running_total"     -> qRunningTotalSql,
    "q_range_frame"       -> qRangeFrameSql,
    "q_grouping_sets"     -> qGroupingSetsSql)
}
