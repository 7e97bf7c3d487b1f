package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q.{Def, dec, t}

/** The relational operator surface (SURVEY.md §2.2): scans, projection,
  * filter, joins (broadcast/semi/anti/multiway/as-of), aggregation
  * (hash/distinct/rollup/cube/conditional), window functions (ranking,
  * running frames, range frames, sessionization), sort/limit, set ops,
  * scalar functions, subqueries.
  *
  * Scale notes are per-query; the common principles: dimension joins are
  * broadcast, fact-side aggregations are partial (map-side) by construction,
  * filters/projections sit directly on the parquet scan so pushdown/pruning
  * reach the source, and window queries shuffle once on their partition key.
  */
object RelationalQueries {

  val defs: Map[String, Def] = Map(

    // TPC-H Q1 shape: full-scan partial aggregation; at 100 TB this is a
    // scan + map-side combine + 6-group reduce — no data-size shuffle.
    "q01_pricing_summary" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))
              * (dec(lit(1)) + dec(col("l_tax")))).cast("double").as("sum_charge"),
            // avg via exact integral division at micro resolution, then ONE
            // bigint→double cast + division — never a decimal-cast double
            // fed into arithmetic (the q54-class cross-engine ulp hazard).
            (expr("CAST((sum(CAST(l_quantity AS DECIMAL(12,2))) * 1000000) div count(1) AS BIGINT)")
              .cast("double") / lit(1e6)).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        CAST((CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(30,2)) * 100 AS HUGEINT) * 10000) // COUNT(*) AS BIGINT) / 1000000.0 AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Row-level projection + filter: predicate and 4-column read schema push
    // to the parquet scan (of 11 columns).
    "q02_filter_project" -> Def(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("disc_amount"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS disc_amount
        FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 10
        ORDER BY l_orderkey, l_linenumber""")),

    // TPC-H Q3 shape: small-side (filtered customer) broadcast into orders,
    // result broadcast into lineitem — zero shuffle joins at scale, one
    // shuffle for the final aggregation.
    "q03_join_agg_topk" -> Def(
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        li.join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(20)
      },
      Some("""SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 20""")),

    // Left-semi join (EXISTS): semi joins ship only the join key — at scale
    // the big-quantity lineitem keys are distinct-reduced before the join.
    "q04_semi_join" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
        val li = t(s, d, "lineitem").filter(col("l_quantity") > 45)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Left-anti join (NOT EXISTS).
    "q05_anti_join" -> Def(
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // TPC-H Q5 shape: 5-way join; all dimensions broadcast (region, nation,
    // customer, supplier are tiny at any SF), lineitem⋈orders is the only
    // shuffle-bearing join, and AQE can pick SMJ/SHJ for it.
    "q06_multijoin_revenue" -> Def(
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // Global sort + limit: Spark executes as per-partition top-k + single
    // merge (TakeOrderedAndProject) — no full sort at scale.
    "q07_order_limit" -> Def(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // Ranking window: top-3 customers per nation; one shuffle on the
    // partition key, rank filter applied before any downstream work.
    "q08_window_topk_per_group" -> Def(
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_nationkey"), col("rk"))
      },
      Some("""SELECT c_nationkey, rk, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer) WHERE rk <= 3 ORDER BY c_nationkey, rk""")),

    // Running-frame window: prefix sums are evaluated sequentially within
    // the frame, and the sums are exact decimals -> deterministic.
    "q09_window_running" -> Def(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("long").as("order_seq"),
            sum(dec(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"),
            coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_orderkey"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        ROW_NUMBER() OVER w AS order_seq,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        COALESCE(LAG(o_orderkey, 1) OVER w, -1) AS prev_orderkey
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq""")),

    // Set operations (distinct semantics in both engines).
    "q10_setops" -> Def(
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k"))
        val mk = (op: String, df: org.apache.spark.sql.DataFrame) =>
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        mk("except", a.except(b))
          .union(mk("intersect", a.intersect(b)))
          .union(mk("union", a.union(b).distinct()))
          .orderBy(col("op"))
      },
      Some("""SELECT op, n FROM (
        SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT o_custkey AS k FROM orders EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        ) ORDER BY op""")),

    // ROLLUP with grouping() disambiguation (null grouping keys coalesced so
    // ordering is engine-independent).
    "q11_rollup" -> Def(
      (s, d) => t(s, d, "customer")
        .rollup(col("c_nationkey"), col("c_mktsegment"))
        .agg(grouping(col("c_nationkey")).cast("long").as("g_nation"),
          grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .select(
          col("g_nation"),
          coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
          col("g_seg"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("g_nation"), col("nationkey"), col("g_seg"), col("segment")),
      Some("""SELECT CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nation,
        COALESCE(c_nationkey, -1) AS nationkey,
        CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        COALESCE(c_mktsegment, 'ALL') AS segment,
        COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM customer GROUP BY ROLLUP(c_nationkey, c_mktsegment)
        ORDER BY g_nation, nationkey, g_seg, segment""")),

    // Distinct aggregation (expands to two-phase aggregate in Spark).
    "q12_distinct_agg" -> Def(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          sum_distinct(dec(col("l_quantity"))).cast("double").as("sum_dist_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Scalar function battery: strings, math, dates, JSON-free expressions.
    "q13_scalar_funcs" -> Def(
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderpriority"), 1, 3).as("prio_pre"),
          length(col("o_orderstatus")).cast("long").as("status_len"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          expr("replace(o_orderpriority, '-', '_')").as("prio_repl"),
          lpad(col("o_orderkey").cast("string"), 10, "0").as("key_pad"),
          (col("o_orderkey") % 7).as("key_mod"),
          abs(col("o_orderkey") - 1000).as("key_absdiff"),
          floor(col("o_totalprice")).as("price_floor"),
          ceil(col("o_totalprice")).as("price_ceil"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
          quarter(col("o_orderdate")).cast("long").as("o_quarter"),
          date_trunc("month", col("o_orderdate")).as("o_month_start"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        UPPER(o_orderpriority) AS prio_upper,
        SUBSTR(o_orderpriority, 1, 3) AS prio_pre,
        LENGTH(o_orderstatus) AS status_len,
        CONCAT_WS('|', o_orderstatus, o_orderpriority) AS status_prio,
        REPLACE(o_orderpriority, '-', '_') AS prio_repl,
        LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_pad,
        o_orderkey % 7 AS key_mod,
        ABS(o_orderkey - 1000) AS key_absdiff,
        CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
        YEAR(o_orderdate) AS o_year,
        MONTH(o_orderdate) AS o_month,
        DAY(o_orderdate) AS o_day,
        QUARTER(o_orderdate) AS o_quarter,
        CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS o_month_start
        FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""")),

    // HAVING (post-aggregation filter).
    "q14_having" -> Def(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("spend"))
        .filter(col("n_orders") >= 16)
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 16 ORDER BY o_custkey""")),

    // Scalar subquery: global average broadcast against every row.
    "q15_scalar_subquery" -> Def(
      (s, d) => {
        val c = t(s, d, "customer")
        // the threshold is a micro-resolution exact integral division (trunc
        // toward zero in BOTH engines — Spark `div` and DuckDB `//` agree on
        // negatives) so the row membership is bit-deterministic.
        val avgBal = c.agg(
          expr("CAST((sum(CAST(c_acctbal AS DECIMAL(12,2))) * 1000000) div count(1) AS BIGINT)")
            .cast("double").divide(lit(1e6)).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select(col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST((CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(30,2)) * 100 AS HUGEINT) * 10000) // COUNT(*) AS BIGINT) / 1000000.0 FROM customer)
        ORDER BY c_custkey""")),

    // Conditional aggregation (manual pivot — exact integer counts).
    "q16_conditional_agg" -> Def(
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          count(when(col("c_mktsegment") === "BUILDING", lit(1))).as("n_building"),
          count(when(col("c_mktsegment") === "AUTOMOBILE", lit(1))).as("n_auto"),
          count(when(col("c_acctbal") < 0, lit(1))).as("n_negative"),
          max(when(col("c_acctbal") >= 0, col("c_acctbal"))).as("max_pos_bal"))
        .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey,
        COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n_building,
        COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS n_auto,
        COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
        MAX(CASE WHEN c_acctbal >= 0 THEN c_acctbal END) AS max_pos_bal
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // CUBE over two keys.
    "q17_cube" -> Def(
      (s, d) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"))
        .select(
          col("g_flag"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          col("g_status"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy(col("g_flag"), col("flag"), col("g_status"), col("status")),
      Some("""SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        COALESCE(l_returnflag, 'ALL') AS flag,
        CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        COALESCE(l_linestatus, 'ALL') AS status,
        COUNT(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY g_flag, flag, g_status, status""")),

    // As-of join: each purchase matched to the user's most recent prior (or
    // simultaneous) signup — the union+last_value formulation is a single
    // sort per user partition, not an n² range join (SURVEY.md §2.2 joins).
    "q18_asof_join" -> Def(
      (s, d) => {
        val e = t(s, d, "events").filter(col("event_type").isin("purchase", "signup"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("last_signup",
            last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            coalesce(col("last_signup"), lit(-1L)).as("asof_signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some("""SELECT event_id AS purchase_id, user_id,
        COALESCE(last_signup, -1) AS asof_signup_id FROM (
          SELECT event_id, user_id, event_type,
            LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
          FROM events WHERE event_type IN ('purchase', 'signup'))
        WHERE event_type = 'purchase' ORDER BY purchase_id""")),

    // Range-frame window (time-range join restated as a frame — scales as
    // one sort per user instead of an n² self-join).
    "q19_range_window" -> Def(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("events_last_hour"),
            sum(dec(col("value"))).over(w).cast("double").as("value_last_hour"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        COUNT(*) OVER w AS events_last_hour,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_last_hour
        FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // Full outer join: per-nation customer vs supplier presence (keys
    // coalesced so nulls never reach the ORDER BY).
    "q21_outer_join" -> Def(
      (s, d) => {
        val c = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = t(s, d, "supplier").filter(col("s_acctbal") > 4000)
          .groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.withColumnRenamed("nk", "c_nk")
          .join(sup.withColumnRenamed("nk", "s_nk"),
            col("c_nk") === col("s_nk"), "full_outer")
          .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey,
        COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
          WHERE s_acctbal > 4000 GROUP BY 1) s ON c.nk = s.nk
        ORDER BY nationkey""")),

    // GROUPING SETS through the SQL surface (spark.sql on a registered
    // view) — distinct from rollup/cube, arbitrary set list.
    "q22_groupingsets" -> Def(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
            COALESCE(o_orderstatus, 'ALL') AS status,
            CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
            COALESCE(o_orderpriority, 'ALL') AS priority,
            COUNT(*) AS n
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
            (o_orderstatus, o_orderpriority))
          ORDER BY g_status, status, g_prio, priority""")
      },
      Some("""SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        COALESCE(o_orderstatus, 'ALL') AS status,
        CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          (o_orderstatus, o_orderpriority))
        ORDER BY g_status, status, g_prio, priority""")),

    // HLL sketch aggregation (approx_count_distinct). Sketch VALUES are
    // engine-specific (DuckDB's HLL estimates differently), so hash
    // parity on the estimate itself is impossible — but the estimator's
    // CONTRACT is oracle-checkable: emit the exact count plus a
    // within-5%-of-exact flag (rsd is configured at 1%, so 5% is a firm
    // bound, not a coin flip) and let the driver hash THAT. An estimate
    // drifting out of band flips the flag and fails the gate.
    "q23_approx_distinct" -> Def(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders")).cast("double") <=
            lit(0.05) * col("exact_orders")).cast("bigint").as("within_5pct"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_orderkey) AS exact_orders,
        CAST(1 AS BIGINT) AS within_5pct
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Exact percentiles (sort-based linear interpolation — deterministic,
    // unlike the approx sketch) per group.
    "q25_percentiles" -> Def(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, array(0.25, 0.9))").getItem(0).as("p25"),
          expr("percentile(o_totalprice, array(0.25, 0.9))").getItem(1).as("p90"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.25) AS p25,
        quantile_cont(o_totalprice, 0.9) AS p90
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Statistical aggregates with exact arithmetic: mean/variance/stddev
    // from decimal power sums (Σx, Σx²) — built-in stddev/var use running
    // float accumulation whose result depends on partition order, so the
    // deterministic form is the power-sum identity evaluated in decimals
    // with one final double conversion.
    "q26_stats_exact" -> Def(
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("c_acctbal"))).as("s1"),
          sum(dec(col("c_acctbal")) * dec(col("c_acctbal"))).as("s2"))
        // mean and variance via exact decimal algebra + integral division
        // at micro resolution, bit-deterministic in both engines (integral
        // division truncates toward zero; no decimal-cast double ever
        // enters arithmetic — the q54-class ulp hazard). The numerator
        // n·s2 − s1² stays EXACT in DECIMAL(38,4) through the documented
        // bounds (n < 1e10 via the DECIMAL(10,0) gate, s1 < 1e15, s2 <
        // 1e23 ⇒ numerator < 1e33), and the ×1e6 micro scaling uses the
        // split identity floor(num·1e6/d) = (num div d)·1e6 +
        // ((num mod d)·1e6) div d so no intermediate needs more than 33
        // digits — the naive num·1e6 would demand 39 and silently
        // down-cast (overflow → null) past n ≈ 3e6. d = n(n−1) is built
        // in DECIMAL(23,0): the BIGINT product would overflow at n > 3e9.
        .withColumn("num",
          expr("""CAST(CAST(n AS DECIMAL(10,0)) * CAST(s2 AS DECIMAL(27,4))
                 - CAST(s1 AS DECIMAL(17,2)) * CAST(s1 AS DECIMAL(17,2))
                 AS DECIMAL(38,4))"""))
        .withColumn("d",
          expr("CAST(n AS DECIMAL(11,0)) * CAST(n - 1 AS DECIMAL(11,0))"))
        .select(col("c_mktsegment"), col("n"),
          (expr("CAST((s1 * 1000000) div n AS BIGINT)")
            .cast("double") / lit(1e6)).as("mean_bal"),
          (expr("""CAST((num div d) * 1000000
                 + (CAST(num % d AS DECIMAL(25,4))
                    * CAST(1000000 AS DECIMAL(7,0))) div d AS BIGINT)""")
            .cast("double") / lit(1e6)).as("var_bal"))
        .orderBy(col("c_mktsegment")),
      // sums are exact decimals; mean/var are exact integral divisions at
      // micro resolution mirrored below via HUGEINT cent/1e-4 units
      // (trunc-toward-zero in both engines)
      Some("""SELECT c_mktsegment, n,
        CAST((CAST(CAST(s1 AS DECIMAL(30,2)) * 100 AS HUGEINT) * 10000) // n AS BIGINT) / 1000000.0 AS mean_bal,
        CAST(((n * CAST(CAST(s2 AS DECIMAL(30,4)) * 10000 AS HUGEINT)
              - CAST(CAST(s1 AS DECIMAL(30,2)) * 100 AS HUGEINT) * CAST(CAST(s1 AS DECIMAL(30,2)) * 100 AS HUGEINT))
             * 100) // (n * (n - 1)) AS BIGINT) / 1000000.0 AS var_bal
        FROM (SELECT c_mktsegment, COUNT(*) AS n,
          SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s1,
          SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS s2
          FROM customer GROUP BY c_mktsegment)
        ORDER BY c_mktsegment""")),

    // Sessionization (30-min gap): lag + cumulative flag sum — the batch
    // analog of session_window, one sort per user.
    "q20_sessionize" -> Def(
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ord))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""SELECT user_id, session_id, COUNT(*) AS n_events,
        MIN(ts) AS session_start, MAX(ts) AS session_end FROM (
          SELECT user_id, ts, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (
            SELECT user_id, ts, event_id,
              CASE WHEN LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
            FROM events))
        GROUP BY user_id, session_id ORDER BY user_id, session_id"""))
  )
}
