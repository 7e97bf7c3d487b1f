package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q.{Def, dec, t}
import graft.ops.{Anomaly, Behavior, Expectations, HistogramCube, Layout, SketchCube}

/** Second tranche of the relational surface (SURVEY.md §2.2): pivot,
  * generator/UDTF-shape (explode with ordinality), JSON functions, the
  * ranking/distribution window battery, multiset set-ops, date/regex scalar
  * functions, and array aggregation.
  *
  * Same scale principles as RelationalQueries: single-shuffle aggregations
  * with map-side partials, windows shuffle once on their partition key,
  * generators are narrow (no shuffle), and every query's filter/projection
  * reaches the parquet scan.
  */
object SurfaceQueries {

  val defs: Map[String, Def] = Map(

    // PIVOT with an explicit value list (pivot on unknown values would need
    // a driver-side distinct pass — the explicit list keeps it one job).
    "q27_pivot" -> Def(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Generator / UDTF shape: posexplode = explode with ordinality — a
    // narrow per-row fan-out, no shuffle (the reference's pgoutput decode
    // P1 is the same bytes -> 0..n rows shape).
    "q28_explode_tokens" -> Def(
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(split(col("text"), " ", -1)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""SELECT doc_id, i - 1 AS pos, t[i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE doc_id < 10),
        UNNEST(generate_series(1, len(t))) AS g(i)
        ORDER BY doc_id, pos""")),

    // JSON functions: path extraction, typed parse, and envelope
    // construction (to_json omits nulls, so the constructed payload uses a
    // coalesced value — same rule in the oracle).
    "q29_json_funcs" -> Def(
      (s, d) => {
        val kStr = get_json_object(col("props"), "$.k")
        val kNum = coalesce(kStr.cast("long"), lit(-1L))
        t(s, d, "events")
          .select(col("event_id"), kStr.as("k_str"), kNum.as("k_num"),
            to_json(struct(col("event_id"), kNum.as("k"))).as("payload_json"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_num,
        '{"event_id":' || event_id || ',"k":' ||
          COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) || '}' AS payload_json
        FROM events ORDER BY event_id""")),

    // Ranking/distribution window battery: dense_rank, percent_rank,
    // cume_dist, ntile, first/nth_value over an explicit full frame. The
    // unique tie-breaker in the ORDER BY makes peer groups single rows, so
    // the distribution functions are deterministic.
    "q30_window_battery" -> Def(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders").filter(col("o_orderkey") <= 3000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            dense_rank().over(w).cast("long").as("drank"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"),
            ntile(4).over(w).cast("long").as("quartile"),
            first(col("o_orderkey")).over(full).as("top_key"),
            nth_value(col("o_orderkey"), 3).over(full).as("third_key"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
        DENSE_RANK() OVER w AS drank,
        PERCENT_RANK() OVER w AS prank,
        CUME_DIST() OVER w AS cdist,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        FIRST_VALUE(o_orderkey) OVER wf AS top_key,
        NTH_VALUE(o_orderkey, 3) OVER wf AS third_key
        FROM orders WHERE o_orderkey <= 3000
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey),
          wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey""")),

    // Multiset set-ops (INTERSECT ALL / EXCEPT ALL keep duplicates —
    // different operator than q10's distinct-semantics set ops).
    "q31_multiset_ops" -> Def(
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k"))
        val mk = (op: String, df: org.apache.spark.sql.DataFrame) =>
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        mk("except_all", a.exceptAll(b))
          .union(mk("intersect_all", a.intersectAll(b)))
          .orderBy(col("op"))
      },
      Some("""SELECT op, n FROM (
        SELECT 'except_all' AS op, COUNT(*) AS n FROM
          (SELECT o_custkey AS k FROM orders EXCEPT ALL
           SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT 'intersect_all' AS op, COUNT(*) AS n FROM
          (SELECT o_custkey AS k FROM orders INTERSECT ALL
           SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        ) ORDER BY op""")),

    // Date arithmetic + regex/string-split scalar battery.
    "q32_dates_regex" -> Def(
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("d_plus30"),
          add_months(col("o_orderdate"), 2).as("d_plus2mo"),
          last_day(col("o_orderdate")).as("d_month_end"),
          datediff(lit(java.sql.Date.valueOf("1995-06-15")), col("o_orderdate"))
            .cast("long").as("days_to_ref"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          regexp_extract(col("o_orderpriority"), "(\\d+)", 1).as("prio_num"),
          expr("split_part(o_orderpriority, '-', 2)").as("prio_word"))
        .orderBy(col("o_orderkey")),
      // DuckDB dayofweek() is 0=Sunday; Spark's is 1=Sunday -> +1.
      Some("""SELECT o_orderkey,
        CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d_plus30,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS d_plus2mo,
        last_day(o_orderdate) AS d_month_end,
        date_diff('day', o_orderdate, DATE '1995-06-15') AS days_to_ref,
        dayofweek(o_orderdate) + 1 AS dow,
        regexp_extract(o_orderpriority, '(\d+)', 1) AS prio_num,
        split_part(o_orderpriority, '-', 2) AS prio_word
        FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""")),

    // Custom typed Aggregator (UDAF surface): exact bounded top-k — the
    // map-side-combinable alternative to the q08 window top-k (each
    // partition ships at most k entries per group instead of every row).
    "q34_topk_aggregator" -> Def(
      (s, d) => {
        val topk = udaf(new graft.functions.TopKAggregator(3))
        // Serialized to one string per group: the driver's canonicalizer
        // hashes cells with pandas and can't sort array<struct> values.
        // %.2f on both sides avoids Jackson-vs-DuckDB double rendering.
        t(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(topk(col("c_acctbal"), col("c_custkey")).as("top3"))
          .select(col("c_nationkey"),
            concat_ws("|", transform(col("top3"), e =>
              concat(format_string("%.2f", e.getField("bal")), lit(":"),
                e.getField("key").cast("string")))).as("top3_str"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey,
        array_to_string(list_transform(
          (list({'bal': c_acctbal, 'key': c_custkey}
                ORDER BY c_acctbal DESC, c_custkey))[1:3],
          e -> printf('%.2f', e.bal) || ':' || CAST(e.key AS VARCHAR)), '|') AS top3_str
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // TPC-H Q14 shape: LIKE-filtered broadcast dimension join + conditional
    // ratio aggregate over the fact table (part is broadcast; lineitem
    // never shuffles — the aggregation is a map-side partial + 1-row final).
    "q36_promo_revenue" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part")
        val rev = dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type").like("PROMO%"), rev)).cast("double").as("promo_rev"),
            sum(rev).cast("double").as("total_rev"),
            // pct at micro resolution via exact integral division of the two
            // decimal sums (q54-class hazard if done as double/double) —
            // trunc(promo·1e8/total)/1e6 ≡ 100·promo/total to 1e-6.
            (expr("""CAST((CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END)
                     AS DECIMAL(27,4)) * 100000000)
                   div sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                   AS BIGINT)""")
              .cast("double") / lit(1e6)).as("promo_pct"))
      },
      Some("""SELECT
        CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END) AS DOUBLE) AS promo_rev,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_rev,
        CAST((CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END) AS DECIMAL(30,4)) * 10000 AS HUGEINT) * 100000000)
          // CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) * 10000 AS HUGEINT) AS BIGINT) / 1000000.0 AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey""")),

    // Correlated scalar subquery through the SQL front-end (Catalyst
    // decorrelates it to an aggregate + join — no per-row re-execution).
    "q35_correlated_subquery" -> Def(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_q35")
        // per-customer avg threshold as an exact micro-resolution integral
        // division (q54-class hazard if done as a decimal-cast double
        // division) — row membership is bit-deterministic in both engines.
        s.sql("""SELECT o_orderkey, o_custkey,
            CAST(o_totalprice AS DOUBLE) AS price
          FROM orders_q35 o
          WHERE o_totalprice > 2 * (SELECT CAST((SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) * 1000000) div COUNT(*) AS BIGINT) / 1e6
                                    FROM orders_q35 i
                                    WHERE i.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey,
        CAST(o_totalprice AS DOUBLE) AS price
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT CAST((CAST(CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(30,2)) * 100 AS HUGEINT) * 10000) // COUNT(*) AS BIGINT) / 1000000.0
                                  FROM orders i
                                  WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")),

    // Array aggregation: per-customer sorted order-key list (collect_list
    // is unordered across partitions — sort_array canonicalizes, which is
    // the deterministic form at any parallelism).
    "q33_array_agg" -> Def(
      // The array itself is JSON-serialized for the driver compare (pandas
      // can't hash ndarray cells); both engines render array<bigint> as
      // compact `[1,2,3]`. The collect_list/sort_array operator stays under
      // test — only the final rendering changed.
      (s, d) => t(s, d, "orders").filter(col("o_custkey") < 200)
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"), to_json(col("order_keys")).as("order_keys_json"),
          col("n_orders"),
          element_at(col("order_keys"), 1).as("first_key"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
        CAST(to_json(list(o_orderkey ORDER BY o_orderkey)) AS VARCHAR) AS order_keys_json,
        COUNT(*) AS n_orders,
        MIN(o_orderkey) AS first_key
        FROM orders WHERE o_custkey < 200
        GROUP BY o_custkey ORDER BY o_custkey""")),

    // LATERAL correlated subquery: top-2 customers per nation. Catalyst
    // decorrelates the lateral into a ranked window join — verified in
    // ScaleSpec (no per-row subplan execution).
    "q37_lateral_join" -> Def(
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("g_nation")
        t(s, d, "customer").createOrReplaceTempView("g_customer")
        s.sql("""SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
          FROM g_nation n,
          LATERAL (SELECT c_name, c_acctbal FROM g_customer
                   WHERE c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          ORDER BY n.n_name, acctbal DESC, c.c_name""")
      },
      Some("""SELECT n_name, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM nation n, LATERAL (SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n_name, acctbal DESC, c_name""")),

    // Regression/correlation aggregates computed from exact decimal moment
    // sums (n, Sx, Sy, Sxy, Sxx, Syy) — one shuffle with map-side partials;
    // the only floating-point work is the final closed-form formula, same
    // expression both engines, rendered at fixed precision (%.6f) for the
    // hash compare. (Built-in corr/regr_* accumulate doubles in partition
    // order — not reproducible across engines, unusable under an exact
    // gate.)
    "q38_stats_corr" -> Def(
      (s, d) => {
        val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
        val agg = t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
        val nD = col("n").cast("double")
        def D(c: String) = col(c).cast("double")
        val cov = nD * D("sxy") - D("sx") * D("sy")
        val varX = nD * D("sxx") - D("sx") * D("sx")
        val varY = nD * D("syy") - D("sy") * D("sy")
        agg.select(col("l_returnflag"), col("n"),
            format_string("%.6f", cov / varX).as("slope"),
            format_string("%.6f", cov / sqrt(varX * varY)).as("corr"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH a AS (SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          printf('%.6f', (n*sxy - sx*sy) / (n*sxx - sx*sx)) AS slope,
          printf('%.6f', (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))) AS corr
        FROM a ORDER BY l_returnflag""")),

    // Ordered string aggregation (listagg/string_agg): sort inside the
    // collected array so the result is deterministic under any partitioning
    // (collect_list order is partition-dependent; array_sort removes that).
    "q39_listagg" -> Def(
      (s, d) => {
        val n = t(s, d, "nation"); val r = t(s, d, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        COUNT(*) AS n_nations FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // UNPIVOT (wide -> long relational reshape), the inverse of q27's
    // pivot: metrics computed with exact decimal sums, then melted.
    "q40_unpivot" -> Def(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "metric", "value")
        .orderBy(col("l_returnflag"), col("metric")),
      Some("""SELECT l_returnflag, metric, value
        FROM (SELECT l_returnflag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
          FROM lineitem GROUP BY l_returnflag)
          UNPIVOT (value FOR metric IN (sum_qty, sum_price))
        ORDER BY l_returnflag, metric""")),

    // Tumbling time-bucket aggregation (the batch analog of the streaming
    // window aggregate): date_trunc bucket + count/distinct/min/max — all
    // order-independent aggregates, one shuffle.
    "q41_time_bucket" -> Def(
      (s, d) => t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
        COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""")),

    // Higher-order-function battery over array columns: lambda filter,
    // fold (aggregate), transform+slice, and existential — the declared
    // HOF surface (used pervasively by the text operators) as its own
    // oracle-checked row. All narrow: one scan, zero shuffles.
    "q42_hof_battery" -> Def(
      (s, d) => {
        val arr = split(col("text"), " ", -1)
        t(s, d, "documents")
          .select(col("doc_id"),
            size(filter(arr, tk => length(tk) > 5)).cast("long").as("n_long"),
            aggregate(arr, lit(0L), (a, tk) => a + length(tk)).as("total_len"),
            array_join(transform(slice(arr, 1, 3), tk => upper(tk)), "|").as("head_upper"),
            exists(arr, tk => tk === "the").as("has_the"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        len(list_filter(string_split(text, ' '), tk -> LENGTH(tk) > 5)) AS n_long,
        CAST(list_sum(list_transform(string_split(text, ' '), tk -> LENGTH(tk))) AS BIGINT) AS total_len,
        array_to_string(list_transform(string_split(text, ' ')[1:3], tk -> upper(tk)), '|') AS head_upper,
        list_contains(string_split(text, ' '), 'the') AS has_the
        FROM documents ORDER BY doc_id""")),

    // Map-function battery: per-user event-type histogram as a MAP column
    // (map_from_entries over a collected struct list), then map lookups /
    // key introspection. The map machinery is Spark-side; the oracle is the
    // semantically-equal flat SQL — which is exactly the point: map ops
    // must not change the answers. Two shuffles (pre-agg + per-user
    // collect), both with map-side partials.
    "q43_map_funcs" -> Def(
      (s, d) => {
        val perType = t(s, d, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        perType.groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
            .as("m"))
          .select(col("user_id"),
            size(map_keys(col("m"))).cast("long").as("n_types"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
            coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
            array_min(map_keys(col("m"))).as("first_type"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        COUNT(DISTINCT event_type) AS n_types,
        CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
        CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
        MIN(event_type) AS first_type
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Time-series gap fill: densify each priority's sparse daily
    // high-value revenue onto a full calendar (sequence generator over the
    // observed min..max span) and carry the last observed value forward
    // (last-IGNORE-NULLS running window). Scale shape: the calendar derives
    // from the already-aggregated daily frame (tiny), the left join and the
    // window both partition on the same key, and revenue is decimal-exact
    // until one final cast. The oracle emulates IGNORE NULLS portably via
    // the non-null-prefix-count group trick.
    "q44_gap_fill" -> Def(
      (s, d) => {
        val daily = t(s, d, "orders")
          .filter(col("o_totalprice") > 400000)
          .groupBy(col("o_orderpriority").as("pri"),
            to_date(col("o_orderdate")).as("dt"))
          .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
        val cal = daily.groupBy(col("pri"))
          .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
          .select(col("pri"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("dt"))
        val w = Window.partitionBy(col("pri")).orderBy(col("dt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("pri", "dt"), "left")
          .select(col("pri"), col("dt"), col("rev_dec").isNull.as("is_gap"),
            last(col("rev_dec"), ignoreNulls = true).over(w)
              .cast("double").as("rev_filled"))
          .orderBy(col("pri"), col("dt"))
      },
      Some("""WITH daily AS (SELECT o_orderpriority AS pri,
            CAST(o_orderdate AS DATE) AS dt,
            SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
          FROM orders WHERE o_totalprice > 400000 GROUP BY 1, 2),
        span AS (SELECT pri, MIN(dt) AS d0, MAX(dt) AS d1 FROM daily GROUP BY 1),
        cal AS (SELECT pri, CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
            CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS dt FROM span),
        j AS (SELECT cal.pri, cal.dt, daily.rev_dec FROM cal
          LEFT JOIN daily ON cal.pri = daily.pri AND cal.dt = daily.dt),
        g AS (SELECT pri, dt, rev_dec,
            COUNT(rev_dec) OVER (PARTITION BY pri ORDER BY dt) AS grp FROM j)
        SELECT pri, dt, rev_dec IS NULL AS is_gap,
          CAST(MAX(rev_dec) OVER (PARTITION BY pri, grp) AS DOUBLE) AS rev_filled
        FROM g ORDER BY pri, dt""")),

    // TPC-H Q22 shape (global sales opportunity): scalar aggregate
    // threshold + NOT EXISTS anti join + grouped report. The "above
    // average balance" test runs as an exact-decimal cross-multiplication
    // (bal*n > sum) — no floating division anywhere, so the qualifying
    // set is engine-exact. The 1-row threshold broadcasts; the anti join
    // builds on orders' custkey.
    "q45_sales_opportunity" -> Def(
      (s, d) => {
        val c = t(s, d, "customer")
          .withColumn("cntrycode", col("c_nationkey") % 10)
          .filter(col("cntrycode").isin(1, 2, 3, 4, 5))
        val thr = c.filter(col("c_acctbal") > 0)
          .agg(sum(dec(col("c_acctbal"))).as("s"), count(lit(1)).as("n"))
        val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey"))
        c.join(broadcast(thr))
          .filter(dec(col("c_acctbal")) * col("n") > col("s"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
          .orderBy(col("cntrycode"))
      },
      Some("""WITH c AS (SELECT c_custkey, c_acctbal,
            c_nationkey % 10 AS cntrycode FROM customer
          WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)),
        thr AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s,
            COUNT(*) AS n FROM c WHERE c_acctbal > 0)
        SELECT cntrycode, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM c, thr
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY 1 ORDER BY cntrycode""")),

    // Data profiling (the ingest-time audit): per-column null/distinct/
    // min/max in ONE aggregation pass, unpivoted to a row per column.
    // Exact distincts here (oracle-checkable); approx_count_distinct is
    // the documented 100 TB swap.
    "q46_profile" -> Def(
      (s, d) => graft.ops.Profile.profile(t(s, d, "orders"),
          Seq("o_orderstatus", "o_orderpriority", "o_totalprice"))
        .orderBy(col("col_name")),
      Some("""SELECT 'o_orderstatus' AS col_name,
          COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_nulls,
          COUNT(DISTINCT o_orderstatus) AS n_distinct,
          CAST(MIN(o_orderstatus) AS VARCHAR) AS min_s,
          CAST(MAX(o_orderstatus) AS VARCHAR) AS max_s FROM orders
        UNION ALL SELECT 'o_orderpriority',
          COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
          COUNT(DISTINCT o_orderpriority),
          CAST(MIN(o_orderpriority) AS VARCHAR),
          CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_totalprice',
          COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
          COUNT(DISTINCT o_totalprice),
          CAST(MIN(o_totalprice) AS VARCHAR),
          CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
        ORDER BY col_name""")),

    // Bitwise + boolean aggregate battery: bit_and/bit_or/bit_xor over
    // integer keys (bitmap/flag-set folding), bool_and/bool_or predicates,
    // count_if. All commutative-associative single-pass aggregates —
    // map-side partials, one shuffle on the group key, integer-exact in
    // any engine.
    "q47_bitwise_bool_agg" -> Def(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("bit_and(l_linenumber)").as("flags_and"),
          expr("bit_or(l_linenumber)").as("flags_or"),
          expr("bit_xor(l_orderkey)").as("keys_xor"),
          expr("bool_and(l_quantity > 0)").as("all_positive"),
          expr("bool_or(l_discount > 0.05)").as("any_discounted"),
          expr("count_if(l_tax > 0.04)").as("n_taxed"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
          bit_and(l_linenumber) AS flags_and,
          bit_or(l_linenumber) AS flags_or,
          bit_xor(l_orderkey) AS keys_xor,
          bool_and(l_quantity > 0) AS all_positive,
          bool_or(l_discount > 0.05) AS any_discounted,
          CAST(count_if(l_tax > 0.04) AS BIGINT) AS n_taxed
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Relational division ("FOR ALL"): customers whose orders span EVERY
    // priority. Classic operator with no SQL keyword — expressed as
    // count-distinct-per-group == global count-distinct. One grouped agg
    // + a 1-row broadcast (never a per-row scalar-subquery re-scan);
    // both sides are map-side-partial count-distincts.
    "q48_division" -> Def(
      (s, d) => {
        val orders = t(s, d, "orders")
        val total = orders.agg(countDistinct(col("o_orderpriority")).as("n_total"))
        orders.groupBy(col("o_custkey"))
          .agg(countDistinct(col("o_orderpriority")).as("n_used"))
          .crossJoin(broadcast(total))
          .filter(col("n_used") === col("n_total"))
          .select(col("o_custkey"), col("n_used"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_used
        FROM orders GROUP BY o_custkey
        HAVING COUNT(DISTINCT o_orderpriority) =
          (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
        ORDER BY o_custkey""")),

    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // match each other — the semantics CDC key-matching needs when a
    // nullable column participates in identity. Planned as a hash join
    // like any equi-join (null-safe keys are join keys, not filters).
    "q49_nullsafe_join" -> Def(
      (s, d) => {
        val o = t(s, d, "orders").withColumn("k",
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderstatus")))
        val dim = o.groupBy(col("k").as("dk")).agg(count(lit(1)).as("dim_n"))
        o.join(dim, col("k") <=> col("dk"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), max(col("dim_n")).as("dim_n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH o AS (SELECT o_orderstatus,
          CASE WHEN o_orderstatus = 'P' THEN NULL
               ELSE o_orderstatus END AS k FROM orders),
        dim AS (SELECT k AS dk, COUNT(*) AS dim_n FROM o GROUP BY k)
        SELECT o_orderstatus, COUNT(*) AS n, MAX(dim_n) AS dim_n
        FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.dk
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Schema-evolution union (unionByName + allowMissingColumns): two
    // snapshots of a table with different column sets merge by NAME, the
    // missing column null-filled — how heterogeneous-schema eras of a
    // CDC/crawl corpus combine without positional-union corruption.
    "q50_union_by_name" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
        val eraA = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val eraB = o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
        eraA.unionByName(eraB, allowMissingColumns = true)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            count(col("o_totalprice")).as("n_priced"),
            count(col("o_orderpriority")).as("n_prioritized"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH u AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice,
            CAST(NULL AS VARCHAR) AS o_orderpriority
          FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL BY NAME
          SELECT o_orderkey, o_orderpriority, o_orderstatus,
            CAST(NULL AS DECIMAL(15,2)) AS o_totalprice
          FROM orders WHERE o_orderkey % 2 = 1)
        SELECT o_orderstatus, COUNT(*) AS n,
          COUNT(o_totalprice) AS n_priced,
          COUNT(o_orderpriority) AS n_prioritized
        FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Bloom-prefiltered fact-dim join under the driver gate: the filter
    // is result-invisible (false positives only, real join restores
    // exactness), so the oracle is the PLAIN join — like q24's salting,
    // the scale technique must not change the answer.
    "q51_bloom_join" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
        val dim = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.ops.JoinOpt.bloomPrefilteredJoin(li, dim, "l_orderkey",
            expectedItems = 100000L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Bounded-time self-join via bucket blocking: event pairs on the same
    // user within 60 s. The join key is (user, minute-bucket) with the
    // left side exploded into its bucket and both neighbours — a ≤60 s
    // pair has |bucket_a − bucket_b| ≤ 1 in EITHER direction (the pair
    // condition is id_a < id_b, which says nothing about time order), so
    // candidate volume stays per-(user,bucket)-bounded — never a per-user
    // t×t product. The exact |Δt| filter runs after the equi-join; the
    // oracle brute-forces the same pairs.
    "q53_interval_selfjoin" -> Def(
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val bucket = (unix_micros(col("ts")) / lit(60000000L)).cast("long")
        val left = e.select(col("event_id").as("id_a"),
            col("user_id").as("u"), col("ts").as("ts_a"),
            explode(array(bucket - 1, bucket, bucket + 1)).as("bk"))
        val right = e.select(col("event_id").as("id_b"),
          col("user_id").as("u"), col("ts").as("ts_b"),
          bucket.as("bk"))
        left.join(right, Seq("u", "bk"))
          .filter(col("id_a") < col("id_b") &&
            abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))) <= 60000000L)
          .select(col("u").as("user_id"), col("id_a"), col("id_b"),
            (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("delta_us"))
          .distinct()
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
          CAST(date_diff('microsecond', a.ts, b.ts) AS BIGINT) AS delta_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(date_diff('microsecond', a.ts, b.ts)) <= 60000000
        ORDER BY id_a, id_b""")),

    // Recursive CTE (Spark 4.1 WITH RECURSIVE): generate the contiguous
    // month calendar between the first and last order — zero-filled months
    // included, which no non-recursive form can produce from the data
    // alone — and left-join per-month order stats. Scale shape: recursion
    // depth = #months (bounded, driver-side tiny frame); the only
    // data-size work is one per-month aggregation shuffle; the month
    // series broadcasts into the join.
    //
    // Oracle-parity: the compared output is all DATE/BIGINT — revenue is
    // emitted as exact integer cents (sum of DECIMAL(12,2) is integral in
    // cents by construction), never a wide DECIMAL, and the ORACLE builds
    // the month spine with generate_series instead of a recursive CTE.
    // Recursive-CTE evaluation and wide-DECIMAL rendering both varied
    // across oracle-engine builds (r2/r3 red rows); the Spark side keeps
    // WITH RECURSIVE — that is the operator under test — while the oracle
    // only needs the same rows via the most boring constructs available.
    "q55_recursive_calendar" -> Def(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_q55")
        // the recursion carries `hi` in its own state: the bounds
        // aggregate runs ONCE in the anchor — a `JOIN bounds` in the
        // recursive step would rescan+reaggregate orders per iteration
        // (measured 8.7 s vs 0.6 s at sf0.1)
        s.sql("""WITH RECURSIVE months(m, hi) AS (
            SELECT to_date(date_trunc('MONTH', MIN(o_orderdate))),
                   to_date(date_trunc('MONTH', MAX(o_orderdate)))
            FROM orders_q55
            UNION ALL
            SELECT add_months(m, 1), hi FROM months WHERE m < hi),
          per_month AS (
            SELECT to_date(date_trunc('MONTH', o_orderdate)) AS m,
                   COUNT(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2))
                        * CAST(100 AS DECIMAL(3,0)) AS BIGINT) AS revenue_cents
            FROM orders_q55 GROUP BY 1)
          SELECT months.m, CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
                 CAST(COALESCE(revenue_cents, 0) AS BIGINT) AS revenue_cents
          FROM months LEFT JOIN per_month ON months.m = per_month.m
          ORDER BY months.m""")
      },
      Some("""WITH bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS TIMESTAMP) AS hi
          FROM orders),
        months AS (
          SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
          FROM bounds),
        per_month AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 COUNT(*) AS n_orders,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2))
                      * CAST(100 AS DECIMAL(3,0)) AS BIGINT) AS revenue_cents
          FROM orders GROUP BY 1)
        SELECT months.m, CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(revenue_cents, 0) AS BIGINT) AS revenue_cents
        FROM months LEFT JOIN per_month ON months.m = per_month.m
        ORDER BY months.m""")),

    // Ratio-to-report: each nation's share of its region's revenue — the
    // share-of-total window over a grouped aggregate. The compared output
    // is all-BIGINT by design: revenue and the region total are exact
    // integer cents (the decimal sum is integral in cents by
    // construction), and the share is integer parts-per-MILLION via plain
    // BIGINT integral division (Spark `div` ≡ oracle `//`, both truncate
    // toward zero on positives). No wide DECIMALs, no HUGEINT, no
    // decimal→double — every construct the r2/r3 oracle-build divergences
    // fingerprinted is gone from both sides. ppm (not ppb) keeps
    // revenue_cents*1e6 inside BIGINT through ~$9e10 of per-nation
    // revenue (≈TPC-H sf10); past that Spark's ANSI overflow fails loudly
    // rather than silently — widen to a two-step split division if a
    // deployment ever needs ppb at that scale. Two shuffles: the group-by
    // and the region-partitioned window over the tiny aggregate.
    // Linear-regression battery (regr_slope / regr_intercept / regr_r2
    // semantics) computed EXACTLY: decimal-exact component sums (sx, sy,
    // sxx, syy, sxy — partitioning-independent), each cast to double
    // once, then one fixed IEEE expression per statistic on both engines.
    // Native regr_* aggregates would float-sum in engine-specific order;
    // this form is bit-portable and map-side combinable (one shuffle).
    "q56_regr_battery" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem")
        // integral cents: scale-0 decimal sums cast to double convert a
        // plain integer — correctly rounded identically in both engines
        // (a fractional-scale decimal→double cast can round differently:
        // observed 1-ulp r2 divergence with DECIMAL(38,4) sums). slope
        // and r2 are scale-invariant; intercept rescales by one /100.
        val xI = (dec(col("l_quantity")) * lit(100)).cast("decimal(14,0)")
        val yI = (dec(col("l_extendedprice")) * lit(100)).cast("decimal(14,0)")
        val agg = li.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(xI).as("sx_i"), sum(yI).as("sy_i"),
          sum(xI * xI).as("sxx_i"), sum(yI * yI).as("syy_i"),
          sum(xI * yI).as("sxy_i"))
        val nD = col("n").cast("double")
        def dd(c: String) = col(c).cast("double")
        val covN = nD * dd("sxy_i") - dd("sx_i") * dd("sy_i")
        val varX = nD * dd("sxx_i") - dd("sx_i") * dd("sx_i")
        val varY = nD * dd("syy_i") - dd("sy_i") * dd("sy_i")
        agg.select(col("l_returnflag"), col("n"),
            (covN / varX).as("slope"),
            (((dd("sy_i") - (covN / varX) * dd("sx_i")) / nD) / lit(100.0))
              .as("intercept"),
            ((covN * covN) / (varX * varY)).as("r2"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH i AS (SELECT l_returnflag,
          CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS DECIMAL(14,0)) AS xi,
          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS DECIMAL(14,0)) AS yi
        FROM lineitem),
        a AS (SELECT l_returnflag, COUNT(*) AS n,
          SUM(xi) AS sx_i, SUM(yi) AS sy_i,
          SUM(xi * xi) AS sxx_i, SUM(yi * yi) AS syy_i,
          SUM(xi * yi) AS sxy_i
        FROM i GROUP BY 1),
        c AS (SELECT l_returnflag, n,
          CAST(n AS DOUBLE) AS nd,
          CAST(sx_i AS DOUBLE) AS sx, CAST(sy_i AS DOUBLE) AS sy,
          CAST(sxx_i AS DOUBLE) AS sxx, CAST(syy_i AS DOUBLE) AS syy,
          CAST(sxy_i AS DOUBLE) AS sxy FROM a)
        SELECT l_returnflag, n,
          (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope,
          ((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd)
            / 100.0 AS intercept,
          ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
            / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
        FROM c ORDER BY l_returnflag""")),

    "q54_ratio_to_report" -> Def(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val rev = t(s, d, "customer")
          .join(t(s, d, "orders"),
            col("c_custkey") === col("o_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(expr("""CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                AS DECIMAL(28,2))
                            * CAST(100 AS DECIMAL(3,0)) AS BIGINT)""")
            .as("revenue_cents"))
        val w = Window.partitionBy(col("r_name"))
        rev.withColumn("region_total_cents",
            sum(col("revenue_cents")).over(w))
          .withColumn("share_ppm",
            expr("(revenue_cents * CAST(1000000 AS BIGINT)) div region_total_cents"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""WITH rev AS (SELECT r_name, n_name,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               * CAST(100 AS DECIMAL(3,0)) AS BIGINT) AS revenue_cents
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
        SELECT r_name, n_name, revenue_cents,
          CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
            AS region_total_cents,
          CAST((revenue_cents * CAST(1000000 AS BIGINT)) //
               CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
            AS BIGINT) AS share_ppm
        FROM rev ORDER BY r_name, n_name""")),

    // VARIANT (Spark 4's semi-structured type): props parsed ONCE into a
    // variant value, then typed extraction (try_variant_get), canonical
    // re-serialization (to_json of a variant), and the extracted number
    // flowing through a window aggregate — the open-schema ingestion
    // pattern where JSON is shredded at the scan and every consumer reads
    // the binary-encoded variant instead of re-parsing text. q29 is the
    // string-function formulation of the same extraction; this is the
    // typed path.
    "q57_variant" -> Def(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = parse_json(col("props"))
        t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            coalesce(try_variant_get(v, "$.k", "bigint"), lit(-1L)).as("k_num"),
            to_json(v).as("canon_json"))
          .withColumn("k_sum_type",
            sum(col("k_num")).over(Window.partitionBy(col("event_type"))))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type,
        COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_num,
        '{"k":' || json_extract(props, '$.k') || '}' AS canon_json,
        CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1))
          OVER (PARTITION BY event_type) AS BIGINT) AS k_sum_type
        FROM events ORDER BY event_id""")),

    // Mergeable distinct-count cube (SketchCube): the fact is scanned ONCE
    // into per-(flag, status) HLL sketches; BOTH rollups below (per-flag and
    // grand-total) are answered by register-union over the cube — at 100 TB
    // every later cardinality question touches #slices rows, not the fact.
    // Sketch estimates are engine-specific, so the oracle gates the q23
    // contract: exact count + a within-5%-of-exact flag (lgK=14 → RSE≈0.8%,
    // the band is firm); a drifting estimate flips the flag and fails the
    // hash.
    "q58_sketch_cube" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val cube = SketchCube.build(li,
          Seq("l_returnflag", "l_linestatus"), "l_orderkey")
        val flagEst = SketchCube.estimate(
            SketchCube.rollup(cube, Seq("l_returnflag")))
          .select(col("l_returnflag"), col("n_rows"), col("distinct_est"))
        val globalEst = SketchCube.estimate(SketchCube.rollup(cube, Nil))
          .select(lit("ALL").as("l_returnflag"), col("n_rows"),
            col("distinct_est"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
          .unionByName(li.agg(countDistinct(col("l_orderkey"))
            .as("exact_orders"))
            .select(lit("ALL").as("l_returnflag"), col("exact_orders")))
        flagEst.unionByName(globalEst).join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"), col("n_rows"),
            (abs(col("distinct_est") - col("exact_orders")).cast("double") <=
              lit(0.05) * col("exact_orders")).cast("bigint").as("within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_orderkey) AS exact_orders,
          COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS within_5pct
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT 'ALL', COUNT(DISTINCT l_orderkey), COUNT(*), CAST(1 AS BIGINT)
        FROM lineitem
        ORDER BY l_returnflag""")),

    // Time-range rollup off the sketch cube: the cube's finest grain
    // includes the TIME dimension (order month), so "distinct customers
    // in any month range" is a register-union over that range's slices —
    // the time-travel cardinality question answered without ever
    // re-scanning history (at 100 TB the months are immutable landed
    // partitions; only the cube rows for the asked range are read).
    // Gate: q23-contract (exact + within-5% flag) for two ranges + the
    // full span.
    "q71_cube_time_range" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        val cube = SketchCube.build(o, Seq("month"), "o_custkey")
        def estimateRange(label: String, from: String, to: String) =
          SketchCube.estimate(
              SketchCube.rollup(cube.filter(col("month").between(from, to)),
                Nil))
            .select(lit(label).as("range"), col("n_rows"),
              col("distinct_est"))
        val est = estimateRange("1995_h1", "1995-01", "1995-06")
          .unionByName(estimateRange("1996_97", "1996-01", "1997-12"))
          .unionByName(estimateRange("all", "0000-00", "9999-99"))
        def exactRange(label: String, from: String, to: String) =
          o.filter(col("month").between(from, to))
            .agg(countDistinct(col("o_custkey")).as("exact_custs"))
            .select(lit(label).as("range"), col("exact_custs"))
        val exact = exactRange("1995_h1", "1995-01", "1995-06")
          .unionByName(exactRange("1996_97", "1996-01", "1997-12"))
          .unionByName(exactRange("all", "0000-00", "9999-99"))
        est.join(exact, Seq("range"))
          .select(col("range"), col("exact_custs"), col("n_rows"),
            (abs(col("distinct_est") - col("exact_custs")).cast("double") <=
              lit(0.05) * col("exact_custs")).cast("bigint").as("within_5pct"))
          .orderBy(col("range"))
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
          o_custkey FROM orders)
        SELECT '1995_h1' AS range,
          COUNT(DISTINCT o_custkey) AS exact_custs,
          COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS within_5pct
        FROM m WHERE month BETWEEN '1995-01' AND '1995-06'
        UNION ALL
        SELECT '1996_97', COUNT(DISTINCT o_custkey), COUNT(*), CAST(1 AS BIGINT)
        FROM m WHERE month BETWEEN '1996-01' AND '1997-12'
        UNION ALL
        SELECT 'all', COUNT(DISTINCT o_custkey), COUNT(*), CAST(1 AS BIGINT)
        FROM m
        ORDER BY range""")),

    // Distinct GROWTH CURVE off the cube: cumulative distinct customers
    // by month = for each month, a register-union over the cube slices up
    // to it — a tiny cube×months broadcast non-equi join (~80×80 sketch
    // rows) instead of re-scanning the fact once per curve point (the
    // cost that makes growth curves unaffordable computed naively at
    // 100 TB: 80 curve points = 80 fact scans). Same q23-contract gate.
    "q72_cube_growth_curve" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        val cube = SketchCube.build(o, Seq("month"), "o_custkey")
        val months = cube.select(col("month").as("upto")).distinct()
        val cum = cube.join(broadcast(months), col("month") <= col("upto"))
          .groupBy(col("upto"))
          .agg(hll_union_agg(col("key_sketch")).as("key_sketch"),
            sum(col("n_rows")).as("n_rows"))
        val est = SketchCube.estimate(cum)
          .select(col("upto"), col("n_rows"), col("distinct_est"))
        val exact = o.select(col("month").as("m2"), col("o_custkey"))
          .join(broadcast(months), col("m2") <= col("upto"))
          .groupBy(col("upto"))
          .agg(countDistinct(col("o_custkey")).as("exact_custs"))
        est.join(exact, Seq("upto"))
          .select(col("upto"), col("exact_custs"), col("n_rows"),
            (abs(col("distinct_est") - col("exact_custs")).cast("double") <=
              lit(0.05) * col("exact_custs")).cast("bigint").as("within_5pct"))
          .orderBy(col("upto"))
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
          o_custkey FROM orders),
        months AS (SELECT DISTINCT month AS upto FROM m)
        SELECT upto, COUNT(DISTINCT o_custkey) AS exact_custs,
          COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS within_5pct
        FROM m JOIN months ON m.month <= months.upto
        GROUP BY upto ORDER BY upto""")),

    // Z-order layout cells: the Morton interleave is pure integer
    // shift/mask arithmetic (Layout.zvalue2 — codegen'd, and the SAME
    // masks generate the DuckDB oracle expression, so the gate is an
    // exact hash). Each z-cell (top 6 interleaved bits) is a 128×128
    // rectangle in (custkey-bucket, price-cents-bucket) space — the
    // min/max spans emitted per cell ARE the file-skipping bound a
    // z-clustered layout gives a 2-D box predicate.
    "q59_zorder_cells" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("xb", pmod(col("o_custkey"), lit(1024L)))
          .withColumn("yb", pmod(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
            lit(1024L)))
        o.withColumn("zv", Layout.zvalue2(col("xb"), col("yb")))
          .groupBy(shiftright(col("zv"), 14).as("zcell"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
            min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
          .orderBy(col("zcell"))
      },
      Some(s"""WITH b AS (SELECT (o_custkey % 1024) AS xb,
          ((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) % 1024)
            AS yb FROM orders),
        z AS (SELECT xb, yb, ${Layout.zvalue2Sql("xb", "yb")} AS zv FROM b)
        SELECT (zv >> 14) AS zcell, COUNT(*) AS n,
          MIN(xb) AS x_min, MAX(xb) AS x_max,
          MIN(yb) AS y_min, MAX(yb) AS y_max
        FROM z GROUP BY 1 ORDER BY 1""")),

    // 3-D Z-order cells: q59's layout with a TIME dimension added — the
    // common real shape (entity × measure × day) where a box predicate
    // must prune on any of the three. Top 9 interleaved bits = 512 cells,
    // each a 128×128×128 box; same mask-generated oracle, exact hash.
    "q67_zorder3_cells" -> Def(
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("xb", pmod(col("o_custkey"), lit(1024L)))
          .withColumn("yb", pmod(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
            lit(1024L)))
          .withColumn("zb", pmod(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("bigint"), lit(1024L)))
        o.withColumn("zv", Layout.zvalue3(col("xb"), col("yb"), col("zb")))
          .groupBy(shiftright(col("zv"), 21).as("zcell"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
            min(col("yb")).as("y_min"), max(col("yb")).as("y_max"),
            min(col("zb")).as("z_min"), max(col("zb")).as("z_max"))
          .orderBy(col("zcell"))
      },
      Some(s"""WITH b AS (SELECT (o_custkey % 1024) AS xb,
          ((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) % 1024)
            AS yb,
          (datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            % 1024) AS zb
          FROM orders),
        z AS (SELECT xb, yb, zb,
          ${Layout.zvalue3Sql("xb", "yb", "zb")} AS zv FROM b)
        SELECT (zv >> 21) AS zcell, COUNT(*) AS n,
          MIN(xb) AS x_min, MAX(xb) AS x_max,
          MIN(yb) AS y_min, MAX(yb) AS y_max,
          MIN(zb) AS z_min, MAX(zb) AS z_max
        FROM z GROUP BY 1 ORDER BY 1""")),

    // Mergeable quantile cube (HistogramCube): one fact scan into
    // per-(priority, $1000-bucket) counts; p50/p95/p99 for every priority
    // AND the grand total are answered from the CUBE via a window cumsum
    // (the 'ALL' slice is a count-addition rollup — no fact rescan, no
    // sort). Unlike GK/KLL sketches the estimate is deterministic BIGINT
    // arithmetic (ceil-rank + uniform in-bucket interpolation), so the
    // oracle is an exact hash match, max error = one bucket width by
    // construction.
    "q61_histogram_quantiles" -> Def(
      (s, d) => {
        val f = t(s, d, "orders").select(
          col("o_orderpriority").as("prio"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        val cube = HistogramCube.build(f, Seq("prio"), col("cents"), 100000L)
        val globalSlice = HistogramCube.rollup(cube, Nil)
          .select(lit("ALL").as("prio"), col("bucket"), col("n"))
        HistogramCube.quantiles(cube.unionByName(globalSlice),
            Seq("prio"), 100000L, Seq(50, 95, 99))
          .select(col("prio"), col("q_pct"), col("est"))
          .orderBy(col("prio"), col("q_pct"))
      },
      Some("""WITH f AS (SELECT o_orderpriority AS prio,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        h AS (SELECT prio, cents // 100000 AS bucket, COUNT(*) AS n
          FROM f GROUP BY 1, 2),
        hall AS (SELECT prio, bucket, n FROM h
          UNION ALL
          SELECT 'ALL' AS prio, bucket, SUM(n) AS n FROM h GROUP BY bucket),
        t AS (SELECT prio, bucket, n,
            SUM(n) OVER (PARTITION BY prio ORDER BY bucket) AS cum,
            SUM(n) OVER (PARTITION BY prio) AS total FROM hall),
        j AS (SELECT prio, q_pct, bucket, n, cum, total,
            GREATEST((total * q_pct + 99) // 100, 1) AS rk
          FROM t CROSS JOIN (SELECT * FROM (VALUES (50), (95), (99))
            AS v(q_pct)))
        SELECT prio, CAST(q_pct AS BIGINT) AS q_pct,
          CAST(bucket * 100000 + ((rk - (cum - n)) * 100000) // n AS BIGINT)
            AS est
        FROM j WHERE cum - n < rk AND rk <= cum
        ORDER BY prio, q_pct""")),

    // Join-cardinality estimation off the sketch cube: inclusion-
    // exclusion over three conditional register-unions answers "how many
    // distinct orders appear under BOTH flags" without touching the fact
    // (the pre-join sizing question a planner asks). The exact overlap
    // (one groupBy for the gate) confirms the estimate within 10% —
    // A/R overlap is ~73% of either set here, so the union-relative HLL
    // error (~0.8% RSE) is ~5 sigma inside the band, firm at every SF.
    "q62_join_cardinality" -> Def(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val cube = SketchCube.build(li, Seq("l_returnflag"), "l_orderkey")
        val est = SketchCube.overlapEstimate(cube, "l_returnflag", "A", "R")
        val exact = li.groupBy(col("l_orderkey"))
          .agg(max((col("l_returnflag") === "A").cast("int")).as("ia"),
            max((col("l_returnflag") === "R").cast("int")).as("ir"))
          .agg(sum(col("ia").cast("long")).as("exact_a"),
            sum(col("ir").cast("long")).as("exact_r"),
            sum((col("ia") * col("ir")).cast("long")).as("exact_overlap"))
        est.crossJoin(broadcast(exact))
          .select(col("slice_a"), col("slice_b"), col("exact_a"),
            col("exact_r"), col("exact_overlap"),
            (abs(col("overlap_est") - col("exact_overlap")).cast("double") <=
              lit(0.10) * col("exact_overlap")).cast("bigint")
              .as("within_10pct"))
          .orderBy(col("slice_a"))
      },
      Some("""WITH f AS (SELECT l_orderkey,
          MAX(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ia,
          MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ir
        FROM lineitem GROUP BY 1)
        SELECT 'A' AS slice_a, 'R' AS slice_b,
          CAST(SUM(ia) AS BIGINT) AS exact_a,
          CAST(SUM(ir) AS BIGINT) AS exact_r,
          CAST(SUM(ia * ir) AS BIGINT) AS exact_overlap,
          CAST(1 AS BIGINT) AS within_10pct
        FROM f ORDER BY slice_a""")),

    // Ordered funnel (Behavior.funnel): signup -> view -> purchase, each
    // stage qualified only AT OR AFTER the previous stage's first reach
    // (running-min composition inside ONE entity-partitioned window —
    // one events shuffle however many stages, vs the textbook
    // N-self-joins plan that rescans events per stage). Deterministic
    // under ts ties via the event_id tiebreak, so the oracle replays the
    // identical window program and the gate is an exact hash.
    "q63_funnel" -> Def(
      (s, d) => Behavior.funnel(t(s, d, "events"), "user_id", "event_type",
          "ts", "event_id", Seq("signup", "view", "purchase"))
        .orderBy(col("stage")),
      Some("""WITH r AS (SELECT user_id, ts, event_id, event_type,
            MIN(CASE WHEN event_type = 'signup' THEN ts END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0
          FROM events),
        r2 AS (SELECT *, CASE WHEN event_type = 'view' AND cum0 IS NOT NULL
            THEN ts END AS reach1 FROM r),
        r3 AS (SELECT *, MIN(reach1)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
          FROM r2),
        r4 AS (SELECT *, CASE WHEN event_type = 'purchase'
            AND cum1 IS NOT NULL THEN ts END AS reach2 FROM r3),
        hits AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS h0,
            MAX(CASE WHEN reach1 IS NOT NULL THEN 1 ELSE 0 END) AS h1,
            MAX(CASE WHEN reach2 IS NOT NULL THEN 1 ELSE 0 END) AS h2
          FROM r4 GROUP BY 1),
        s AS (SELECT CAST(SUM(h0) AS BIGINT) AS n0,
            CAST(SUM(h1) AS BIGINT) AS n1,
            CAST(SUM(h2) AS BIGINT) AS n2 FROM hits)
        SELECT stage, stage_name, n_entities,
          CAST((n_entities * 1000000) // GREATEST(n0, 1) AS BIGINT)
            AS conversion_ppm
        FROM (
          SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name,
            n0 AS n_entities, n0 FROM s
          UNION ALL SELECT CAST(2 AS BIGINT), 'view', n1, n0 FROM s
          UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', n2, n0 FROM s)
        ORDER BY stage""")),

    // Time-to-convert percentiles — operator COMPOSITION: the funnel's
    // per-entity stage times (one entity window) feed the mergeable
    // histogram cube (signup→purchase minutes, $60-minute buckets), and
    // p50/p90 come off the cube — the conversion-latency SLA number.
    // All BIGINT (epoch-micros difference, ceil-rank interpolation), so
    // the oracle replays both programs and the gate is an exact hash.
    "q66_time_to_convert" -> Def(
      (s, d) => {
        val st = Behavior.stageTimes(t(s, d, "events"), "user_id",
          "event_type", "ts", "event_id", Seq("signup", "purchase"))
        val deltas = st.filter(col("t1").isNotNull)
          .select(floor(((unix_micros(col("t1")) - unix_micros(col("t0")))
            .cast("decimal(38,0)")) / lit(60000000L)).cast("bigint").as("m"))
        val cube = HistogramCube.build(deltas, Nil, col("m"), 60L)
        HistogramCube.quantiles(cube, Nil, 60L, Seq(50, 90))
          .select(col("q_pct"), col("est").as("est_minutes"))
          .orderBy(col("q_pct"))
      },
      Some("""WITH r AS (SELECT user_id, ts, event_id, event_type,
            MIN(CASE WHEN event_type = 'signup' THEN ts END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0
          FROM events),
        r2 AS (SELECT *, CASE WHEN event_type = 'purchase'
            AND cum0 IS NOT NULL THEN ts END AS reach1 FROM r),
        st AS (SELECT user_id,
            MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
            MIN(reach1) AS t1 FROM r2 GROUP BY 1),
        delta AS (SELECT (epoch_us(t1) - epoch_us(t0)) // 60000000 AS m
          FROM st WHERE t1 IS NOT NULL),
        h AS (SELECT m // 60 AS bucket, COUNT(*) AS n FROM delta GROUP BY 1),
        t AS (SELECT bucket, n, SUM(n) OVER (ORDER BY bucket) AS cum,
            SUM(n) OVER () AS total FROM h),
        j AS (SELECT q_pct, bucket, n, cum, total,
            GREATEST((total * q_pct + 99) // 100, 1) AS rk
          FROM t CROSS JOIN (SELECT * FROM (VALUES (50), (90)) v(q_pct)))
        SELECT CAST(q_pct AS BIGINT) AS q_pct,
          CAST(bucket * 60 + ((rk - (cum - n)) * 60) // n AS BIGINT)
            AS est_minutes
        FROM j WHERE cum - n < rk AND rk <= cum
        ORDER BY q_pct""")),

    // Funnel with a CONVERSION DEADLINE: q63's program where each stage
    // must land within 1 hour of the previous stage's first reach — the
    // real product-funnel contract ("purchased within the hour"). Same
    // single entity window; the deadline is one integer comparison
    // inside the qualification predicate.
    "q69_funnel_deadline" -> Def(
      (s, d) => Behavior.funnel(t(s, d, "events"), "user_id", "event_type",
          "ts", "event_id", Seq("signup", "view", "purchase"),
          maxGapSeconds = 3600L)
        .orderBy(col("stage")),
      Some("""WITH r AS (SELECT user_id, ts, event_id, event_type,
            MIN(CASE WHEN event_type = 'signup' THEN ts END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0
          FROM events),
        r2 AS (SELECT *, CASE WHEN event_type = 'view' AND cum0 IS NOT NULL
            AND epoch_us(ts) - epoch_us(cum0) <= 3600000000
            THEN ts END AS reach1 FROM r),
        r3 AS (SELECT *, MIN(reach1)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
          FROM r2),
        r4 AS (SELECT *, CASE WHEN event_type = 'purchase'
            AND cum1 IS NOT NULL
            AND epoch_us(ts) - epoch_us(cum1) <= 3600000000
            THEN ts END AS reach2 FROM r3),
        hits AS (SELECT user_id,
            MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS h0,
            MAX(CASE WHEN reach1 IS NOT NULL THEN 1 ELSE 0 END) AS h1,
            MAX(CASE WHEN reach2 IS NOT NULL THEN 1 ELSE 0 END) AS h2
          FROM r4 GROUP BY 1),
        s AS (SELECT CAST(SUM(h0) AS BIGINT) AS n0,
            CAST(SUM(h1) AS BIGINT) AS n1,
            CAST(SUM(h2) AS BIGINT) AS n2 FROM hits)
        SELECT stage, stage_name, n_entities,
          CAST((n_entities * 1000000) // GREATEST(n0, 1) AS BIGINT)
            AS conversion_ppm
        FROM (
          SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name,
            n0 AS n_entities, n0 FROM s
          UNION ALL SELECT CAST(2 AS BIGINT), 'view', n1, n0 FROM s
          UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', n2, n0 FROM s)
        ORDER BY stage""")),

    // Weekly cohort retention (Behavior.cohortRetention): entities
    // cohorted by first-event week (one entity-partitioned window), then
    // (cohort, offset) activity rollup — the second behavioral-analytics
    // staple, one events shuffle + one count-distinct aggregation. Week
    // arithmetic is date_trunc('week') + day-diff div 7: integer-exact
    // and identical in both engines.
    "q64_cohort_retention" -> Def(
      (s, d) => Behavior.cohortRetention(t(s, d, "events"), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset")),
      Some("""WITH c AS (SELECT user_id,
            CAST(date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
              AS DATE) AS cohort_week,
            date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
              AS cohort_ts,
            date_trunc('week', ts) AS wk
          FROM events),
        d AS (SELECT DISTINCT user_id, cohort_week,
            CAST(datediff('day', cohort_ts, wk) // 7 AS BIGINT)
              AS week_offset
          FROM c)
        SELECT cohort_week, week_offset,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_entities
        FROM d GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Robust anomaly detection (Anomaly.madOutliers): per-event-type
    // minute-count series flagged by the median/MAD test — the
    // monitoring op where mean/stddev z-scores are wrecked by the very
    // spikes they hunt. Medians are ceil-rank order statistics over
    // integers (two key-partitioned sort windows + broadcast med/mad
    // joins), deterministic in both engines, so the oracle is an exact
    // hash — no sketch, no band.
    "q65_anomaly_mad" -> Def(
      (s, d) => {
        val series = t(s, d, "events")
          .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
          .agg(count(lit(1)).as("v"))
        Anomaly.madOutliers(series, Seq("event_type"), "v", 3)
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (SELECT event_type, date_trunc('minute', ts) AS mn,
          CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, v,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n FROM m),
        med AS (SELECT event_type,
            MAX(CASE WHEN rn * 2 = n + (n % 2) THEN v END) AS med
          FROM r GROUP BY 1),
        d AS (SELECT m.event_type, v, med, ABS(v - med) AS dd
          FROM m JOIN med USING (event_type)),
        r2 AS (SELECT event_type, dd,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dd) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n FROM d),
        mad AS (SELECT event_type,
            MAX(CASE WHEN rn * 2 = n + (n % 2) THEN dd END) AS mad
          FROM r2 GROUP BY 1)
        SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(MAX(med) AS BIGINT) AS med, CAST(MAX(mad) AS BIGINT) AS mad,
          CAST(SUM(CASE WHEN dd > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
            AS n_outliers
        FROM d JOIN mad USING (event_type)
        GROUP BY 1 ORDER BY 1""")),

    // Event-sequence transition matrix: per-entity next-event via ONE
    // lead() window (same single entity shuffle as the funnel), rolled to
    // (from, to) counts with row probabilities in ppm — the Markov-chain
    // view of user behavior (what follows what), the path-analysis
    // staple next to q63's funnel. Deterministic under ts ties via the
    // event_id tiebreak; all-integer output.
    "q68_transitions" -> Def(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val byFrom = Window.partitionBy(col("from_type"))
        pairs
          .withColumn("from_total", sum(col("n")).over(byFrom))
          .withColumn("prob_ppm",
            floor(col("n").cast("decimal(20,0)") * 1000000 /
              col("from_total")).cast("bigint"))
          .select(col("from_type"), col("to_type"), col("n"), col("prob_ppm"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH p AS (SELECT event_type AS from_type,
            LEAD(event_type, 1) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS to_type
          FROM events),
        c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          CAST((n * 1000000) // CAST(SUM(n) OVER (PARTITION BY from_type)
            AS BIGINT) AS BIGINT) AS prob_ppm
        FROM c ORDER BY from_type, to_type""")),

    // RFM segmentation (Behavior.rfmSegments): quartile bins WITHOUT the
    // textbook global-sort NTILE — thresholds come off a HistogramCube
    // per metric (three O(1) driver longs, broadcast as literals), bins
    // are comparisons, so nothing in the plan is a single-partition
    // window and the op survives a billion entities. The oracle's
    // threshold CTEs are emitted by the SAME Scala helper the operator's
    // semantics are written against, so they cannot drift.
    "q70_rfm_segments" -> Def(
      (s, d) => graft.ops.Behavior.rfmSegments(t(s, d, "events"),
          "user_id", "ts", "value")
        .orderBy(col("r_bin"), col("f_bin"), col("m_bin")),
      Some(s"""WITH m AS (SELECT user_id,
          datediff('day', CAST(MAX(ts) AS DATE),
            (SELECT CAST(MAX(ts) AS DATE) FROM events)) AS recency_days,
          CAST(COUNT(*) AS BIGINT) AS frequency,
          GREATEST(0, CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT))
            AS monetary_cents
        FROM events GROUP BY 1),
        tr AS ${Behavior.rfmThresholdSql("m", "recency_days", 1L)},
        tf AS ${Behavior.rfmThresholdSql("m", "frequency", 1L)},
        tm AS ${Behavior.rfmThresholdSql("m", "monetary_cents", 1000L)}
        SELECT r_bin, f_bin, m_bin, CAST(COUNT(*) AS BIGINT) AS n_entities
        FROM (SELECT
            1 + CAST(recency_days > (SELECT thr FROM tr WHERE q_pct = 25)
                AS BIGINT)
              + CAST(recency_days > (SELECT thr FROM tr WHERE q_pct = 50)
                AS BIGINT)
              + CAST(recency_days > (SELECT thr FROM tr WHERE q_pct = 75)
                AS BIGINT) AS r_bin,
            1 + CAST(frequency > (SELECT thr FROM tf WHERE q_pct = 25)
                AS BIGINT)
              + CAST(frequency > (SELECT thr FROM tf WHERE q_pct = 50)
                AS BIGINT)
              + CAST(frequency > (SELECT thr FROM tf WHERE q_pct = 75)
                AS BIGINT) AS f_bin,
            1 + CAST(monetary_cents > (SELECT thr FROM tm WHERE q_pct = 25)
                AS BIGINT)
              + CAST(monetary_cents > (SELECT thr FROM tm WHERE q_pct = 50)
                AS BIGINT)
              + CAST(monetary_cents > (SELECT thr FROM tm WHERE q_pct = 75)
                AS BIGINT) AS m_bin
          FROM m)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // WITHIN-SESSION transition matrix: q68's Markov view restricted to
    // 30-minute-gap sessions — the edge between a user's last event
    // tonight and first event tomorrow is noise, not behavior, and
    // cross-session edges systematically inflate self-transitions of
    // common types. Sessionize (one lag + running sum, q20's program)
    // and lead() inside (user, session): still ONE entity shuffle —
    // the session window reuses the user partitioning.
    "q73_session_transitions" -> Def(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = t(s, d, "events")
          .withColumn("prev_us",
            lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > lit(1800000000L))
              .cast("long"))
          .withColumn("session_id", sum(col("new_sess")).over(byUser))
        val bySession = Window
          .partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts"), col("event_id"))
        sess.withColumn("to_type", lead(col("event_type"), 1).over(bySession))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH s AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - LAG(epoch_us(ts), 1)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
                > 1800000000
              THEN 1 ELSE 0 END AS new_sess
          FROM events),
        s2 AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM s),
        p AS (SELECT event_type AS from_type,
            LEAD(event_type, 1) OVER (PARTITION BY user_id, session_id
              ORDER BY ts, event_id) AS to_type
          FROM s2)
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM p WHERE to_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Data-quality expectation suite (Expectations): three row-level
    // predicates + key uniqueness in ONE scan of orders (each check is a
    // map-side-partial SUM of a boolean cast), plus referential integrity
    // as a broadcast anti-join against the customer key set — the landed-
    // batch gate a corpus pipeline runs before data joins the corpus.
    "q60_expectations" -> Def(
      (s, d) => {
        import Expectations.RowCheck
        val o = t(s, d, "orders")
        val rowChecks = Expectations.audit(o, Seq(
            RowCheck("custkey_present",
              col("o_custkey").isNotNull && col("o_custkey") > 0L),
            RowCheck("price_bounds",
              col("o_totalprice") > 0.0 && col("o_totalprice") < 1000000.0),
            RowCheck("status_domain",
              col("o_orderstatus").isin("F", "O", "P"))),
          uniqueCols = Seq("o_orderkey"))
        val fk = Expectations.fkAudit(o, "o_custkey",
          t(s, d, "customer"), "c_custkey", "fk_customer")
        rowChecks.unionByName(fk)
          .select(col("check").as("check_name"), col("total"),
            col("violations"), col("passed").cast("bigint").as("passed"))
          .orderBy(col("check_name"))
      },
      Some("""WITH tot AS (SELECT COUNT(*) AS total FROM orders)
        SELECT check_name, total, violations,
          CAST(violations = 0 AS BIGINT) AS passed FROM (
          SELECT 'custkey_present' AS check_name, total,
            (SELECT COUNT(*) FROM orders WHERE NOT COALESCE(
              o_custkey IS NOT NULL AND o_custkey > 0, FALSE)) AS violations
          FROM tot
          UNION ALL
          SELECT 'price_bounds', total,
            (SELECT COUNT(*) FROM orders WHERE NOT COALESCE(
              o_totalprice > 0 AND o_totalprice < 1000000, FALSE))
          FROM tot
          UNION ALL
          SELECT 'status_domain', total,
            (SELECT COUNT(*) FROM orders WHERE NOT COALESCE(
              o_orderstatus IN ('F', 'O', 'P'), FALSE))
          FROM tot
          UNION ALL
          SELECT 'unique_o_orderkey', total,
            (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
          FROM tot
          UNION ALL
          SELECT 'fk_customer', total,
            (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NULL OR
              NOT EXISTS (SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey))
          FROM tot)
        ORDER BY check_name"""))
  )
}
