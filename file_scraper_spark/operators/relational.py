"""Core relational operator surface (SURVEY §2.B).

Each query is a self-contained (spark, sf_dir) -> DataFrame callable
registered with its DuckDB oracle. All are pure built-in DataFrame ops —
no Python UDFs — so Catalyst gets full pushdown/pruning and whole-stage
codegen, and the same plans scale to a real cluster unchanged.

Reference parity notes cite /root/reference file:line (see SURVEY §2.A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

# --------------------------------------------------------------------------
# scan + projection (reference ops A1-A3: listing scan + metadata projection)
# --------------------------------------------------------------------------


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan; Catalyst prunes the parquet read to 5 cols
    (reference analog: metadata projection, src/fs.rs:50-76)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter pushed to the parquet scan (reference analog:
    drop-directories filter, src/fs.rs:55-62)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "path_split",
    oracle="""
    SELECT doc_id, source,
           COALESCE(regexp_extract(source, '^(.*)/[^/]*$', 1), '') AS dir,
           COALESCE(regexp_extract(source, '([^/]*)$', 1), '') AS name,
           'host:' || source AS identifier
    FROM documents
    """,
)
def path_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path/filename split + identifier formatting (reference A7:
    rsplit_once('/') src/s3.rs:104-108, identifier src/fs.rs:43-47).
    Unlike the reference, a key without '/' yields dir='' instead of
    panicking (SURVEY §7 hard-parts list)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.coalesce(F.regexp_extract("source", r"^(.*)/[^/]*$", 1), F.lit("")).alias(
            "dir"
        ),
        F.coalesce(F.regexp_extract("source", r"([^/]*)$", 1), F.lit("")).alias("name"),
        F.concat(F.lit("host:"), F.col("source")).alias("identifier"),
    )


@query(
    "mime_lookup",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def mime_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension lookup join — the scalable form of the
    reference's extension->MIME map (src/fs.rs:56-58): the dim side is
    broadcast so no shuffle touches the fact side."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------


@query(
    "agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_dsum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           {oracle_davg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship hash aggregate (TPC-H Q1 shape): filter -> partial
    map-side agg -> shuffle on 2 low-cardinality keys -> final agg.
    Quantized-bigint sums keep results bit-stable under any partial-agg
    order — and benched faster than plain double sums (functions/exact.py)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-stage distinct+agg
    plan; at 100 TB prefer approx_count_distinct — see
    agg_approx_distinct)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS est_ok
    FROM events
    GROUP BY event_type
    """,
    tags=("approx",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct — the 100 TB scale path (single shuffle-free
    partial aggregate, fixed-size sketch state). Sketch estimates are
    engine-specific, so the driver-checkable projection pairs the
    estimate with its exact twin and emits the bounded-error predicate
    ``est_ok = |est - exact| <= max(2, 4*rsd*exact)`` — the oracle
    reproduces the exact columns and the constant-TRUE bound, which
    fails loudly if the estimator ever drifts outside its guarantee.
    (At 100 TB you ship ONLY the sketch column; the exact twin exists
    for the correctness gate.)

    The sketch and its exact twin are SEPARATE aggregations joined on
    the 5-row group key, deliberately: fused into one .agg, Spark's
    distinct-aggregate rewrite pre-aggregates on (event_type, user_id)
    and the HLL partial buffer — ~1.6k longs at rsd=0.01 — rides on
    EVERY distinct (type, user) pair instead of one per output group
    (millions of 13KB agg-state rows; the 100x probe measured the
    fused form at 57s). Split, the sketch branch aggregates raw rows
    straight to 5 fixed-size buffers and the exact branch carries no
    sketch state: 50.9s -> 2.3s at 100x (same-JVM interleaved A/B,
    min of 2; bit-identical rows). Two scans of one column beat
    gigabytes of shuffled aggregation state at any scale."""
    ev = load(spark, sf_dir, "events")
    exact_df = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    est_df = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.approx_count_distinct("user_id", 0.01).alias("est")
    )
    # null-safe: both sides group by event_type, so a NULL group
    # exists on both or neither; a USING join would drop it while the
    # oracle's GROUP BY keeps it (same edge as hll_sketch_merge)
    joined = exact_df.join(
        F.broadcast(est_df),
        exact_df["event_type"].eqNullSafe(est_df["et"]),
    )
    return joined.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(F.lit(2.0), F.lit(4 * 0.01) * F.col("exact_users"))
        ).alias("est_ok"),
    )


@query(
    "rollup_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {oracle_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- Spark's expand-based grouping emits NO grand-total row over
    -- EMPTY input (DuckDB, per ANSI, emits one with n = 0); real
    -- groups always have count >= 1, so HAVING COUNT(*) > 0 encodes
    -- the engine's empty-input semantics exactly (pinned by the
    -- TPC-H corpus fuzzer, round 9)
    HAVING COUNT(*) > 0
    """,
)
def rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via CUBE + grouping_id (absent from the reference —
    SURVEY §2.A end note — required by the declared surface)."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


# --------------------------------------------------------------------------
# joins & set ops
# --------------------------------------------------------------------------


@query(
    "join_family",
    oracle="""
    SELECT 'inner' AS join_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'left', CAST(COUNT(*) AS BIGINT)
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'semi', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE EXISTS
      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'anti', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inner / left-outer / left-semi / left-anti equi joins in one
    result (reference join coverage is exactly inner A9 + anti A10,
    src/db.rs:101-104 and src/db.rs:52-64). Dim sides are broadcast."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    inner = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("inner").alias("join_type"), "cnt")
    )
    left = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("left").alias("join_type"), "cnt")
    )
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("semi").alias("join_type"), "cnt")
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("anti").alias("join_type"), "cnt")
    )
    return inner.unionAll(left).unionAll(semi).unionAll(anti)


@query(
    "setops",
    oracle="""
    SELECT 'intersect' AS op, custkey FROM
      (SELECT c_custkey AS custkey FROM customer
       INTERSECT
       SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except' AS op, custkey FROM
      (SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey FROM orders)
    """,
)
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics), labeled and unioned."""
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    inter = customer.intersect(orders).select(
        F.lit("intersect").alias("op"), "custkey"
    )
    exc = customer.subtract(orders).select(F.lit("except").alias("op"), "custkey")
    return inter.unionAll(exc)


@query(
    "range_join",
    oracle="""
    SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS pair_cnt
    FROM events a JOIN events b
      ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_type
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join aggregate (count of events within 1 hour
    after each event, grouped by the anchor's type).

    Scale design — this is a *sweep count*, not a pair join: the naive
    interval join materializes ~density^2 candidate pairs (measured:
    10x data -> 33x runtime for the bucketed-equi-join variant; the
    output pair set itself is quadratic in event density). Since the
    query aggregates pair *counts*, each anchor row instead emits two
    signed probes (+1 at ts+1h, -1 at ts) and the answer per type is
    sum(sign * |events with ts' <= probe_t|) — a distributed prefix
    sum: range-repartition on the sort key, per-partition window
    cumsum, plus broadcast per-partition offsets. O(n log n), no pair
    materialization, scales like a sort. (For queries that need the
    actual pairs, the bucketed equi-join remains the right physical
    strategy — see dedup/similarity candidate generation.)
    """
    ev = load(spark, sf_dir, "events")
    events = ev.select(
        F.col("ts").alias("t"),
        F.lit(0).alias("sign"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(0).alias("is_probe"),
    )
    probe_hi = ev.select(
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(1).alias("sign"),
        "event_type",
        F.lit(1).alias("is_probe"),
    )
    probe_lo = ev.select(
        F.col("ts").alias("t"),
        F.lit(-1).alias("sign"),
        "event_type",
        F.lit(1).alias("is_probe"),
    )
    # event rows sort before probes at equal t, so a probe's running
    # count implements `ts' <= t` exactly (strict > on the low bound
    # and inclusive <= on the high bound fall out of the signs)
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    pts = (
        events.unionAll(probe_hi)
        .unionAll(probe_lo)
        .repartitionByRange(n_parts, "t", "is_probe")
        .sortWithinPartitions("t", "is_probe")
        .withColumn("pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("t", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # localCheckpoint: the offsets pass and the final pass must observe
    # the SAME range partitioning (repartitionByRange samples boundaries
    # per execution, so a recompute could place rows differently);
    # checkpoint blocks are released with the DataFrame, unlike cache()
    local = pts.withColumn(
        "cum", F.sum(1 - F.col("is_probe")).over(w)
    ).localCheckpoint()
    # per-partition event totals -> prefix offsets (control-plane only)
    totals = dict(
        local.groupBy("pid")
        .agg(F.sum(1 - F.col("is_probe")).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    # offsets apply via a BROADCAST hash join on pid — O(1) per probe
    # row. (The previous per-row `coalesce(when(pid==k, off)...)` chain
    # was O(n_parts) per row: invisible at local[32]'s 32 partitions,
    # but a thousands-branch expression on a real cluster with
    # thousands of range partitions. The offsets frame is exactly one
    # 12-byte row per partition — broadcast by construction.)
    offsets_df = spark.createDataFrame(offsets, "pid int, off long")
    return (
        local.filter(F.col("is_probe") == 1)
        .join(F.broadcast(offsets_df), "pid", "left")
        .withColumn("total", F.col("cum") + F.coalesce(F.col("off"), F.lit(0)))
        .groupBy("event_type")
        .agg(F.sum(F.col("sign") * F.col("total")).alias("pair_cnt"))
    )


# --------------------------------------------------------------------------
# windows
# --------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER w AS BIGINT) AS rnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window (total order via
    the o_orderkey tiebreaker keeps the result deterministic)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_frame",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value) OVER w AS prev_value,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1000000 AS rolling3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() + a bounded-frame rolling sum per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (
            F.sum(F.floor(F.col("value") * 1e6))
            .over(w.rowsBetween(-2, 0))
            .cast("double")
            / 1_000_000
        ).alias("rolling3"),
    )


@query(
    "topk_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: Spark plans this as TakeOrderedAndProject — per-partition
    heap + driver merge of K rows, no global sort even at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# time / scalar functions
# --------------------------------------------------------------------------


@query(
    "microbatch_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def microbatch_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch analog of the
    reference's chunks_timeout(200, 1s) micro-batcher (src/fs.rs:100);
    in streaming mode the identical groupBy(window(...)) runs under a
    watermark (see streaming/queries.py)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "scalar_datetime_math_json",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS yr,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           floor(value * 100) / 100 AS value_trunc,
           sqrt(abs(value)) AS sqrt_abs,
           value * value AS value_sq,
           CASE WHEN json_valid(props) THEN
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k
    FROM events
    """,
)
def scalar_datetime_math_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/math/JSON scalar functions (absent from the reference
    beyond A6/A7 — SURVEY §2.A end note). floor(x*100)/100 instead of
    round(): double rounding ties differ between engines, truncation
    does not."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("yr"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        (F.floor(F.col("value") * 100) / 100).alias("value_trunc"),
        F.sqrt(F.abs(F.col("value"))).alias("sqrt_abs"),
        (F.col("value") * F.col("value")).alias("value_sq"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "unnest_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    """,
)
def unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array -> rows (reference A11: server-side UNNEST rowification,
    src/db.rs:93-100 — vanishes in a DataFrame engine, so exercised on
    real array data instead)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


# --------------------------------------------------------------------------
# sessionization
# --------------------------------------------------------------------------


@query(
    "sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, CAST(SUM(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           {oracle_dsum('value')} AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: lag + cumulative-sum session ids,
    then per-session aggregates. One shuffle on user_id serves both the
    window and the final groupBy (Spark reuses the partitioning)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("sum_value"),
    )
