"""Extended relational surface: multi-join analytics pipelines (SQL
API), as-of joins, pivot/unpivot, exact dispersion stats, and the
salted-aggregation skew pattern.

These widen SURVEY §2.B beyond the minimum checklist with the query
shapes real warehouse workloads are made of, each still oracle-exact
(quantized arithmetic, deterministic tiebreakers — see registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import QUANT, dsum, oracle_dsum
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "tpch_q3_shape",
    oracle=f"""
    SELECT l.l_orderkey,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape: selective dim filter -> broadcast join
    -> fact join -> agg -> top-k. customer is broadcast (no fact
    shuffle for the filter); orders<->lineitem co-partition on the
    order key."""
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(customer).join(
                orders, customer.c_custkey == orders.o_custkey
            ).select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .select("l_orderkey", "revenue", "o_orderdate", "n_lines")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_shape",
    oracle=f"""
    SELECT n.n_name,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table local-supplier-volume shape, written through the SQL
    API (spark.sql) to exercise the Catalyst parser path — the
    DataFrame and SQL routes produce identical plans (SURVEY §3.4).
    All dims broadcast; lineitem is the only shuffled table."""
    for t in ("region", "nation", "customer", "orders", "lineitem", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        f"""
        SELECT n.n_name,
               CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount))
                    * {QUANT}) AS BIGINT)) AS DOUBLE) / {QUANT} AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n_name
        """
    )


@query(
    "asof_join",
    oracle="""
    SELECT event_id, user_id, ts,
           MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_purchase_ts
    FROM events
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each event paired with the user's most recent
    *prior* purchase): expressed as a conditional running MAX over an
    ordered window — one shuffle on user_id, no self-join at all.
    Spark lacks a native as-of join (guide: common OLAP patterns);
    this is the formulation that scales — the merge_asof alternative
    (applyInPandas per group) serializes every group through Python."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w).alias("last_purchase_ts"),
    )


@query(
    "pivot_agg",
    oracle=f"""
    SELECT user_id,
           {oracle_dsum("CASE WHEN event_type = 'click' THEN value END")} AS click,
           {oracle_dsum("CASE WHEN event_type = 'error' THEN value END")} AS error,
           {oracle_dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
           {oracle_dsum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
           {oracle_dsum("CASE WHEN event_type = 'view' THEN value END")} AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user value sums spread across event-type columns.
    An explicit pivot value list keeps the plan a single pass (no
    distinct-values pre-query); oracle is the equivalent conditional
    aggregation."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(dsum("value"))
    )


@query(
    "unpivot_stack",
    oracle=f"""
    SELECT user_id, event_type, {oracle_dsum('value')} AS sum_value
    FROM events
    WHERE event_type IN ({", ".join(f"'{t}'" for t in EVENT_TYPES)})
    GROUP BY user_id, event_type
    -- a group whose values are ALL NULL pivots to a NULL cell, which
    -- the unpivot's isNotNull drops — COUNT(value) > 0 is exactly
    -- "the quantized sum is non-NULL" (fuzzer, r9 NULL pass)
    HAVING COUNT(value) > 0
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) of the pivoted frame back to long form; NULL
    cells (user never produced that event type) drop out, so the
    round-trip equals the direct groupBy RESTRICTED to the pivot's
    static EVENT_TYPES domain — which is the oracle. (A pivot's
    column set is declared, not discovered — the scale-correct form —
    so types outside the domain are out of the round-trip by design;
    the registry corpus fuzzer pinned this with an off-domain type.)"""
    wide = pivot_agg(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (event_type, sum_value)".format(
        n=len(EVENT_TYPES),
        args=", ".join(f"'{t}', `{t}`" for t in EVENT_TYPES),
    )
    return (
        wide.select("user_id", F.expr(stack_expr))
        .filter(F.col("sum_value").isNotNull())
    )


@query(
    "stddev_var",
    oracle=f"""
    SELECT event_type, n,
           (s2 - s1 * s1 / n) / (n - 1) AS variance,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev
    FROM (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             {oracle_dsum('value')} AS s1,
             {oracle_dsum('value * value')} AS s2
      FROM events GROUP BY event_type
    )
    """,
)
def stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from exact quantized moments — the
    sum-of-squares formulation keeps it a single aggregation pass and,
    unlike built-in stddev(double), bit-reproducible across engines
    and partitionings."""
    ev = load(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    variance = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    return base.select(
        "event_type", "n", variance.alias("variance"),
        F.sqrt(variance).alias("stddev"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS priciest_order,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value (full-frame for last/nth —
    the default growing frame would just echo the current row)."""
    orders = load(spark, sf_dir, "orders")
    wg = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(wg).alias("cheapest_order"),
        F.last("o_orderkey").over(wf).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest"),
    )


@query(
    "grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           {oracle_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    -- Spark's expand-based grouping emits NO grand-total row over
    -- EMPTY input (DuckDB, per ANSI, emits one with n = 0); real
    -- groups always have count >= 1, so HAVING COUNT(*) > 0 encodes
    -- the engine's empty-input semantics exactly (pinned by the
    -- TPC-H corpus fuzzer, round 9)
    HAVING COUNT(*) > 0
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand total in one pass, via the SQL API."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(o_totalprice * {QUANT}) AS BIGINT))
                    AS DOUBLE) / {QUANT} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "setops_all",
    oracle="""
    SELECT 'intersect_all' AS op, suppkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity < 10
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    ) GROUP BY suppkey
    UNION ALL
    SELECT 'except_all', suppkey, CAST(COUNT(*) AS BIGINT)
    FROM (
      SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity < 10
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    ) GROUP BY suppkey
    """,
)
def setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (bag semantics: min / diff
    of per-key multiplicities), aggregated to per-key counts so the
    result is order-free."""
    li = load(spark, sf_dir, "lineitem")
    low = li.filter(F.col("l_quantity") < 10).select(
        F.col("l_suppkey").alias("suppkey")
    )
    high = li.filter(F.col("l_quantity") > 40).select(
        F.col("l_suppkey").alias("suppkey")
    )
    inter = (
        low.intersectAll(high)
        .groupBy("suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "suppkey", "n")
    )
    exc = (
        low.exceptAll(high)
        .groupBy("suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "suppkey", "n")
    )
    return inter.unionAll(exc)


@query(
    "date_arith",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) + 7 AS plus_week,
           last_day(CAST(ts AS DATE)) AS month_end,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(weekofyear(ts) AS INT) AS woy,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
           CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INT)
             AS days_since_start
    FROM events
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic battery. Cross-engine gotcha baked into the
    oracle: DuckDB's dayofweek is 0=Sunday while Spark's is 1=Sunday."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_add(F.col("ts").cast("date"), 7).alias("plus_week"),
        F.last_day(F.col("ts")).alias("month_end"),
        F.trunc(F.col("ts").cast("date"), "MM").alias("month_start"),
        F.dayofweek("ts").alias("dow"),
        F.weekofyear("ts").alias("woy"),
        F.unix_timestamp("ts").alias("unix_sec"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_start"
        ),
    )


@query(
    "json_struct_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct (the
    scale path — parsed once, columnar after) vs per-field
    get_json_object; missing fields yield NULL."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", "k INT, missing STRING").alias("j"),
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_mod"),
        F.col("j.missing").alias("missing"),
    )


@query(
    "regex_family",
    oracle="""
    SELECT doc_id, source,
           regexp_matches(source, '^src1[0-9]$') AS is_teens,
           regexp_replace(source, '[0-9]+', '#') AS masked,
           CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the
    FROM documents
    """,
)
def regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: rlike predicate, regexp_replace, match counting."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.col("source").rlike(r"^src1[0-9]$").alias("is_teens"),
        F.regexp_replace("source", r"[0-9]+", "#").alias("masked"),
        F.size(F.regexp_extract_all("text", F.lit("the"), F.lit(0))).alias("n_the"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT e.event_id,
           COALESCE(j.k, -1) AS k_or_default,
           NULLIF(e.event_type, 'view') AS type_not_view,
           CASE WHEN j.k IS NULL THEN 'absent' ELSE 'present' END AS k_state,
           e.value IS NOT DISTINCT FROM NULL AS value_is_null
    FROM (SELECT event_id, event_type, value,
                 CASE WHEN event_id % 3 = 0 THEN NULL
                      WHEN json_valid(props) THEN
                        TRY_CAST(json_extract_string(props, '$.k') AS INT)
                 END AS k
          FROM events) j
    JOIN events e ON e.event_id = j.event_id
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars: coalesce / nullif / CASE IS NULL /
    null-safe equality, over a derived column that is NULL for every
    third event."""
    ev = load(spark, sf_dir, "events")
    j = ev.select(
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_id") % 3 == 0, F.lit(None)
        ).otherwise(F.get_json_object("props", "$.k").cast("int")).alias("k"),
    )
    return j.select(
        "event_id",
        F.coalesce(F.col("k"), F.lit(-1)).alias("k_or_default"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("type_not_view"),
        F.when(F.col("k").isNull(), "absent").otherwise("present").alias("k_state"),
        F.col("value").eqNullSafe(F.lit(None)).alias("value_is_null"),
    )


@query(
    "array_agg_funcs",
    oracle="""
    -- Spark's collect_set DROPS NULL elements (SQL-standard
    -- array_agg keeps them, as DuckDB's list() does) and an all-NULL
    -- group aggregates to [] not NULL — the engine's semantics,
    -- encoded with FILTER + COALESCE (registry corpus fuzzer, r9)
    WITH agg AS (
      SELECT user_id,
             COALESCE(list(DISTINCT event_type)
                        FILTER (WHERE event_type IS NOT NULL),
                      CAST([] AS VARCHAR[])) AS types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(types) AS INT) AS n_types,
           COALESCE(array_to_string(list_sort(types), ','), '')
             AS types_csv
    FROM agg
    """,
)
def array_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: collect_set sorted into a canonical
    array (collect_set order is nondeterministic — sort_array makes
    the result comparable), plus size and a join-to-string.

    The result ships the array FLATTENED to a csv string (same
    information, total order) — the driver's value-hash compares cells
    as hashable scalars, and a list-typed cell would crash it, aborting
    every query registered after this one."""
    ev = load(spark, sf_dir, "events")
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.size(types).alias("n_types"),
        F.array_join(types, ",").alias("types_csv"),
    )


@query(
    "conditional_agg",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_high,
           bool_or(event_type = 'error') AS had_error,
           bool_and(value > 0) AS all_positive
    FROM events
    GROUP BY user_id
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: FILTER-style counts (count_if)
    and bool_and/bool_or — single-pass, map-side combinable."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("value") > 100).alias("n_high"),
        F.bool_or(F.col("event_type") == "error").alias("had_error"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
    )


@query(
    "corr_covar",
    oracle=f"""
    SELECT event_type, n,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           ((sxy - sx * sy / n) / (n - 1))
             / (sqrt((sxx - sx * sx / n) / (n - 1))
                * sqrt((syy - sy * sy / n) / (n - 1))) AS corr
    FROM (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             {oracle_dsum('value')} AS sx,
             {oracle_dsum('value * value')} AS sxx,
             {oracle_dsum("date_diff('day', TIMESTAMP '2024-01-01', ts)")} AS sy,
             {oracle_dsum("date_diff('day', TIMESTAMP '2024-01-01', ts) * date_diff('day', TIMESTAMP '2024-01-01', ts)")} AS syy,
             {oracle_dsum("value * date_diff('day', TIMESTAMP '2024-01-01', ts)")} AS sxy
      FROM events GROUP BY event_type
    )
    """,
)
def corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation of (value, day index)
    from exact quantized moments — single-pass, bit-reproducible,
    unlike built-in corr/covar_samp over doubles."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("double")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
        dsum(day).alias("sy"),
        dsum(day * day).alias("syy"),
        dsum(F.col("value") * day).alias("sxy"),
    )
    n = F.col("n")
    covar = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    return base.select(
        "event_type",
        "n",
        covar.alias("covar_samp"),
        (covar / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr"),
    )


@query(
    "approx_quantile",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS est_ok
    FROM events
    GROUP BY event_type
    """,
    tags=("approx",),
)
def approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (the 100 TB path: single pass, bounded
    state, no per-group sort — exact interpolation requires one; see
    percentile_quantile).

    Driver-checkable via the est_ok exact-twin pattern
    (agg_approx_distinct): the sketch estimate itself is
    engine-specific, so the projection pairs it with the exact
    percentiles and emits ``est_ok`` = every estimate lies between the
    exact continuous percentiles at q∓0.01 — a 10x-slack envelope
    around the accuracy=1000 rank-error guarantee (<=1/1000). The
    envelope is only a valid claim for groups with >=100 rows (below
    that, the sketch returns a data value that can sit outside the
    interpolated band without any estimator defect), so est_ok is
    guarded vacuously-true for n<100 — a sparse fixture then fails
    the gate only for a real reason, never envelope noise. The oracle
    reproduces the exact twins and the constant-TRUE bound, failing
    loudly on estimator drift. (At 100 TB you ship ONLY the sketch;
    the exact twin exists for the correctness gate.)"""
    ev = load(spark, sf_dir, "events")
    sketch = F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)")
    lo = F.expr("percentile(value, array(0.49, 0.89, 0.98))")
    hi = F.expr("percentile(value, array(0.51, 0.91, 1.0))")
    exact = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    ok = (F.count(F.lit(1)) < 100) | (
        (sketch[0] >= lo[0]) & (sketch[0] <= hi[0])
        & (sketch[1] >= lo[1]) & (sketch[1] <= hi[1])
        & (sketch[2] >= lo[2]) & (sketch[2] <= hi[2])
    )
    return ev.groupBy("event_type").agg(
        exact[0].alias("p50"),
        exact[1].alias("p90"),
        exact[2].alias("p99"),
        F.count(F.lit(1)).alias("n"),
        ok.alias("est_ok"),
    )


@query(
    "percentile_quantile",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events
    GROUP BY event_type
    """,
)
def percentile_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the same
    ``a + (b-a)*frac`` rule over sorted values — verified bit-exact).
    At 100 TB use approx_percentile (t-digest sketch, single pass, no
    per-group sort) — see agg_approx_distinct for the same tradeoff."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@query(
    "string_funcs",
    oracle="""
    SELECT doc_id,
           CAST(length(source) AS INT) AS src_len,
           upper(source) AS src_upper,
           reverse(source) AS src_rev,
           lpad(source, 8, '0') AS src_pad,
           CAST(levenshtein(source, 'src10') AS INT) AS lev,
           translate(source, 'rs', 'xy') AS src_tr,
           substring(source, 2, 3) AS src_mid
    FROM documents
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (incl. Levenshtein — both
    engines implement the classic DP distance identically)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("source").alias("src_len"),
        F.upper("source").alias("src_upper"),
        F.reverse("source").alias("src_rev"),
        F.lpad("source", 8, "0").alias("src_pad"),
        F.levenshtein("source", F.lit("src10")).alias("lev"),
        F.translate("source", "rs", "xy").alias("src_tr"),
        F.substring("source", 2, 3).alias("src_mid"),
    )


@query(
    "subquery_family",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey <= 2)
    """,
)
def subquery_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + EXISTS + IN, through the SQL API —
    Catalyst decorrelates all three into joins (scalar-subquery ->
    aggregate + left join, EXISTS -> left semi, IN -> left semi), so
    nothing here is per-row at execution time."""
    for t in ("customer", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey <= 2)
        """
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: dense_rank / ntile / percent_rank
    / cume_dist (percent_rank and cume_dist are ratios of identical
    integers -> identical doubles)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "salted_agg",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: phase 1 groups on
    (user_id, salt) so a hot user spreads over 8 reducers; phase 2
    re-aggregates the *integer* partials (BIGINT sums re-sum exactly —
    this is why the quantized representation matters: double partials
    would re-introduce order dependence). Result is identical to the
    direct groupBy, which is the oracle."""
    ev = load(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.col("event_id") % 8)
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.floor(F.col("value") * float(QUANT))).alias("psum"),
        )
    )
    return phase1.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("psum").cast("double") / QUANT).alias("sum_value"),
    )


@query(
    "timeseries_rollup",
    oracle=f"""
    WITH t AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             value
      FROM events
    )
    SELECT event_type, bucket_hour, bucket_day,
           CAST(GROUPING(event_type, bucket_hour, bucket_day) AS BIGINT)
             AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           {oracle_dsum('value')} AS sum_value
    FROM t
    GROUP BY GROUPING SETS ((event_type, bucket_hour, bucket_day),
                            (event_type, bucket_day),
                            (event_type))
    """,
)
def timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over the
    event stream produces hourly, daily, and all-time aggregates per
    type via GROUPING SETS — the materialization shape time-series
    stores call a rollup/continuous aggregate. Partial aggregation
    means the shuffle carries one row per (type, bucket) per partition,
    and the coarser granularities re-aggregate the same shuffle, not
    the base table."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_tr")
    return spark.sql(
        f"""
        WITH t AS (
          SELECT event_type,
                 date_trunc('hour', ts) AS bucket_hour,
                 date_trunc('day', ts) AS bucket_day,
                 value
          FROM events_tr
        )
        SELECT event_type, bucket_hour, bucket_day,
               CAST(grouping_id(event_type, bucket_hour, bucket_day)
                    AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * {QUANT}) AS BIGINT))
                    AS DOUBLE) / {QUANT} AS sum_value
        FROM t
        GROUP BY GROUPING SETS ((event_type, bucket_hour, bucket_day),
                                (event_type, bucket_day),
                                (event_type))
        """
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT user_id,
           -- struct-wrapped: bare arg_min/arg_max SKIP rows whose
           -- VALUE is NULL, while Spark's min_by/max_by return the
           -- value at the extremum NULL included — the engine's
           -- semantics; a never-NULL struct stops the skip (fuzzer,
           -- r9 NULL pass)
           arg_min({'v': event_type}, event_id).v AS first_type,
           arg_max({'v': event_type}, event_id).v AS last_type,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           CAST(MAX(event_id) AS BIGINT) AS last_event
    FROM events
    GROUP BY user_id
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates: the value of one
    column at the extremum of another, single-pass and map-side
    combinable — vs the window row_number()=1 formulation, no sort and
    no per-partition state beyond the running extremum. The ordering
    key (event_id) is unique, so the result is deterministic (min_by
    on a column with ties is engine-dependent)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


@query(
    "tpch_q13_shape",
    oracle="""
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-order-count distribution (TPC-H Q13 shape): left outer
    join with an ON-clause filter (NOT a WHERE — customers with zero
    qualifying orders must survive with count 0), per-customer count,
    then a count-of-counts. The second aggregation's input is already
    one row per customer, so its shuffle is tiny; the expensive join
    co-partitions on the customer key."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "window_rank_stats",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(10) OVER w AS BIGINT) AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value NULLS FIRST, event_id)
    """,
)
def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistical rank-window family: ntile deciles,
    percent_rank, cume_dist per event type — the distribution
    -position primitives behind percentile capping, decile mixing,
    and score normalization. Total order pinned by (value, event_id)
    so ties cannot flip rows between engines — with NULLS FIRST
    explicit in the oracle, since Spark's ASC default is nulls-first
    and DuckDB's is nulls-last (fuzzer, r9 NULL pass); percent_rank
    ((rank-1)/(n-1)) and cume_dist (peers/n) are single IEEE
    divisions of exact integers — bit-identical without quantization.

    Scale shape: one hash-partitioned sort per event_type (the same
    shuffle any rank query pays); all three functions evaluate in ONE
    window pass over the sorted run, no extra exchange. Skewed
    partition keys inherit the engine's AQE skew handling; at 100 TB
    the partition is the unit of parallelism, so event_type
    cardinality bounds parallelism — re-key to (type, day) upstream
    when a single type dominates."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_id",
        "event_type",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )
