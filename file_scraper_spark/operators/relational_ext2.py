"""Relational surface extensions, batch 2 ([EXT]): null-aware anti
join semantics, SCD2 history construction, TPC-H Q18 shape, and
Z-order layout keys.

None of these exist in the reference (SURVEY §2.A: its join coverage
is one equi inner join, src/db.rs:101-104, and one NOT EXISTS
anti-join, src/db.rs:52-64 — both delegated to Postgres). These round
out the join/layout families a warehouse engine needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import QUANT
from file_scraper_spark.operators.scrape import _FIXTURE_CTES, snapshot_pair
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

#: SCD2 snapshot epoch stamps (constant, not now(), for hash stability)
T0 = "2024-01-01 00:00:00"
T1 = "2024-02-01 00:00:00"

Q18_MIN_QTY = 250  # HAVING threshold (~p99 of per-order quantity sums)

ZBITS = 8  # bits per dimension in the Morton code


@query(
    "null_aware_antijoin",
    oracle="""
    SELECT 'not_exists' AS variant, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'not_in_clean', CAST(COUNT(*) AS BIGINT)
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'not_in_null_poisoned', CAST(COUNT(*) AS BIGINT)
    FROM customer c
    WHERE c.c_custkey NOT IN (
      SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_custkey END
      FROM orders)
    """,
    tags=("join", "semantics"),
)
def null_aware_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three faces of "customers with no orders": NOT EXISTS
    (two-valued anti join), NOT IN over a null-free subquery
    (equivalent), and NOT IN over a subquery containing a NULL —
    where SQL's three-valued logic makes the predicate never true, so
    the count is exactly 0. Spark plans the nullable variant as a
    NullAwareAntiJoin (broadcast-only physical operator); both engines
    agree because the semantics are ANSI, not an implementation choice.

    Scale shape: the NOT EXISTS variant is the production form — a
    left-anti hash join, broadcastable when the probe-key set is
    small; null-aware NOT IN forces a broadcast of the whole subquery
    result and is the form to REWRITE AWAY in a 100 TB pipeline
    (exactly why this query exists as a semantics pin)."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT 'not_exists' AS variant, COUNT(*) AS n
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'not_in_clean', COUNT(*)
        FROM customer c
        WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'not_in_null_poisoned', COUNT(*)
        FROM customer c
        WHERE c.c_custkey NOT IN (
          SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL
                      ELSE o_custkey END
          FROM orders)
        """
    )


@query(
    "scd2_history",
    oracle=_FIXTURE_CTES
    + f"""
    , j AS (
      SELECT COALESCE(e.event_id, f.event_id) AS event_id,
             e.value AS e_value, e.ts AS e_ts,
             f.value AS f_value, f.ts AS f_ts,
             e.event_id IS NOT NULL AS in_e,
             f.event_id IS NOT NULL AS in_f
      FROM existing e FULL JOIN found f ON e.event_id = f.event_id
    )
    SELECT event_id, e_value AS value,
           TIMESTAMP '{T0}' AS valid_from,
           TIMESTAMP '{T1}' AS valid_to,
           0 AS is_current
    FROM j
    WHERE in_e AND (NOT in_f OR e_value <> f_value OR e_ts <> f_ts)
    UNION ALL
    SELECT event_id, f_value,
           CASE WHEN in_e AND e_value = f_value AND e_ts = f_ts
                THEN TIMESTAMP '{T0}' ELSE TIMESTAMP '{T1}' END,
           CAST(NULL AS TIMESTAMP),
           1
    FROM j
    WHERE in_f
    """,
    tags=("pipeline", "merge"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn the reference's
    in-place upsert (src/db.rs:92-124 overwrites matched rows) into a
    versioned history — every key carries [valid_from, valid_to)
    intervals and an is_current flag. Changed or vanished rows close
    their old version at the new snapshot's epoch; new or changed
    rows open a current version. This is the lakehouse-standard
    alternative to the reference's destructive update.

    Scale shape: one full outer join on the key (single shuffle,
    co-located when both snapshots are bucketed by key — the same
    layout the merge sink stages), then two narrow projections
    unioned; no second shuffle."""
    existing, found = snapshot_pair(spark, sf_dir)
    e = existing.select(
        "event_id",
        F.col("value").alias("e_value"),
        F.col("ts").alias("e_ts"),
    )
    f = found.select(
        "event_id",
        F.col("value").alias("f_value"),
        F.col("ts").alias("f_ts"),
    )
    j = e.join(f, "event_id", "full")
    in_e = F.col("e_ts").isNotNull()
    in_f = F.col("f_ts").isNotNull()
    changed = (F.col("e_value") != F.col("f_value")) | (
        F.col("e_ts") != F.col("f_ts")
    )
    t0 = F.lit(T0).cast("timestamp")
    t1 = F.lit(T1).cast("timestamp")
    closed = j.filter(in_e & (~in_f | changed)).select(
        "event_id",
        F.col("e_value").alias("value"),
        t0.alias("valid_from"),
        t1.alias("valid_to"),
        F.lit(0).alias("is_current"),
    )
    current = j.filter(in_f).select(
        "event_id",
        F.col("f_value").alias("value"),
        F.when(in_e & ~changed, t0).otherwise(t1).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return closed.unionAll(current)


@query(
    "tpch_q18_shape",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(floor(l_quantity * {QUANT}) AS BIGINT)) AS sq
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(floor(l_quantity * {QUANT}) AS BIGINT))
             > {Q18_MIN_QTY} * {QUANT}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(b.sq AS DOUBLE) / {QUANT} AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY sum_qty DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "agg", "join"),
)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): aggregate the fact table by
    order, keep orders over a quantity threshold (HAVING), then join
    orders and customer for the top 100. The classic
    agg-then-join-then-topk shape.

    Scale shape: the lineitem aggregation is the only big shuffle and
    it is map-side combined down to one row per order; the HAVING
    filter then cuts ~99% of groups BEFORE the joins, so the
    order/customer joins run on a sliver (AQE converts them to
    broadcasts at runtime). The top-k is TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_quantity") * QUANT)).alias("sq"))
        .filter(F.col("sq") > Q18_MIN_QTY * QUANT)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("sq").cast("double") / QUANT).alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(100)
    )


def _morton(x: Column, y: Column) -> Column:
    """Interleave the low ZBITS bits of x (even positions) and y (odd)."""
    z = F.lit(0)
    for i in range(ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    return z


def _oracle_morton(x: str, y: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout",
    oracle=f"""
    WITH m AS (
      SELECT event_id,
             {_oracle_morton("(user_id % 256)",
                             "least(255, CAST(floor(value / 2) AS BIGINT))")}
               AS z
      FROM events
    )
    SELECT CAST(z >> 6 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(z) AS BIGINT) AS z_min,
           CAST(MAX(z) AS BIGINT) AS z_max
    FROM m GROUP BY zbucket
    """,
    tags=("layout",),
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value): bit
    interleaving maps the 2-D domain onto a 1-D curve where range
    splits stay tight in BOTH dimensions — the layout trick behind
    Delta/Iceberg Z-ORDER clustering for multi-dimensional data
    skipping. Pure integer bit arithmetic, whole-stage codegen, no
    UDF.

    Scale shape: at 100 TB the use is `df.repartitionByRange(N,
    zcol).sortWithinPartitions(zcol).write(...)` — every output file
    then covers a small rectangle of (user, value) space, so scans
    filtered on EITHER dimension prune most files via min/max stats.
    This query materializes the bucket profile (count + z extent per
    curve segment) that such a writer would produce; the aggregation
    is one map-side-combined shuffle over ~1k buckets."""
    ev = load(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = F.least(F.lit(255), F.floor(F.col("value") / 2)).cast("long")
    z = _morton(x, y)
    return (
        ev.select(z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), 6).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").cast("long").alias("z_min"),
            F.max("z").cast("long").alias("z_max"),
        )
    )


@query(
    "lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
    tags=("join", "sql"),
)
def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: for every nation, its top-2 customers
    by account balance — the per-row-subquery surface (`JOIN LATERAL
    ... ORDER BY ... LIMIT`). Catalyst DECORRELATES the lateral
    subquery into a ranked window join rather than executing it per
    outer row, so execution is set-oriented.

    Scale shape: after decorrelation this is one shuffle on the
    correlation key with per-partition top-k — per-group heaps, never
    a nested loop over the outer side, which is what makes LATERAL
    viable when the outer table has 10^9 rows."""
    for t in ("customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_custkey, c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )


@query(
    "recursive_cte",
    oracle="""
    WITH RECURSIVE anc(start_id, cur, depth) AS (
      SELECT user_id, user_id, 0
      FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT start_id, cur // 2, depth + 1 FROM anc WHERE cur > 0
    )
    SELECT start_id AS user_id,
           CAST(MAX(depth) AS INT) AS depth_to_root,
           CAST(COUNT(*) AS BIGINT) AS chain_len
    FROM anc GROUP BY start_id
    """,
    tags=("sql", "iterative"),
)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4.x): walk the
    implicit binary-tree hierarchy over user ids (parent = id / 2)
    from every user up to the root, computing chain depth — the
    fixed-point iteration surface that previously required driver-side
    loops (compare dedup_clusters, which iterates min-label
    propagation in Python precisely because recursive SQL was
    unavailable).

    Scale shape: each recursion step is one self-join/projection over
    the frontier; the frontier SHRINKS geometrically here (ids halve),
    so total work is O(n log n) with log n synchronization barriers —
    the same shape a distributed BFS has. Spark materializes each
    step; nothing is per-row recursive.

    Spark guards recursive CTEs with TWO safety caps: a row limit
    (spark.sql.cteRecursionRowLimit, default 1,000,000 — found the
    hard way: the 100x probe fixture has enough distinct users that
    one recursion level exceeds it and the query dies with
    RECURSION_ROW_LIMIT_EXCEEDED) and a level limit
    (spark.sql.cteRecursionLevelLimit, default 100). For THIS query
    the row volume per level is just the distinct-user frontier —
    input-sized, exactly what a cluster handles — while the depth is
    provably <= 63 (ids halve from a 63-bit value). So the row cap is
    lifted (-1) and the LEVEL cap is kept as the real safety net: it
    fires on a genuinely divergent recursion, never on data volume.

    The override is SCOPED, not session-wide (round-8 advisory: a
    permanent -1 disabled the row-cap safety net for every later
    recursive CTE in the shared session). Spark reads the cap at
    EXECUTION time (probed empirically: a plan built under one limit
    fails under a later-restored tiny limit), so a build-scoped
    try/finally alone is not enough — the recursion is executed
    eagerly inside the scope via localCheckpoint (result is one small
    row per distinct user, so materializing it is cheap and the
    returned DataFrame no longer depends on the conf). At a real
    100 TB deployment you would instead set the cap deliberately at
    session level and keep the query fully lazy."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", "-1")
    try:
        df = spark.sql(
            """
            WITH RECURSIVE anc(start_id, cur, depth) AS (
              SELECT user_id, user_id, 0
              FROM (SELECT DISTINCT user_id FROM events)
              UNION ALL
              SELECT start_id, cur div 2, depth + 1 FROM anc WHERE cur > 0
            )
            SELECT start_id AS user_id,
                   CAST(MAX(depth) AS INT) AS depth_to_root,
                   COUNT(*) AS chain_len
            FROM anc GROUP BY start_id
            """
        )
        return df.localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prev)


@query(
    "tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "join"),
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) adapted to the fixture
    schema: orders in a date window having at least one line item
    shipped more than 30 days after the order date, counted per
    priority. The EXISTS decorrelates to a left-semi join.

    Scale shape: the date filter prunes orders BEFORE the semi join
    (pushed to the scan); the semi join shuffles on orderkey and
    short-circuits per match — no duplicate-elimination aggregation
    the way a plain join + distinct would need."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "tpch_q12_shape",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    tags=("tpch", "join"),
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority) on the fixture
    schema: line items shipped within a year, counted per return flag
    split into high- vs low-priority orders — join + conditional
    aggregation.

    Scale shape: the selective shipdate predicate is pushed to the
    lineitem scan; the join shuffles both sides on orderkey (or
    broadcasts the filtered fact slice when small); the aggregation
    is map-side combined to 3 groups."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_shape",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                      * {QUANT}) AS BIGINT) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                      * {QUANT}) AS BIGINT)) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("tpch", "join"),
)
def tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): revenue share of promo parts in
    one month — a fact-dim join feeding a single-row conditional
    ratio. Revenue terms are 1e-6-quantized BIGINTs, so both sums are
    exact and the final ratio is one deterministic double division.

    Scale shape: month filter pushed to the fact scan, part dim
    broadcast, one-row aggregate — the canonical selective
    scan + broadcast + global agg plan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load(spark, sf_dir, "part")
    rev_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * QUANT
    )
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(promo, rev_q).otherwise(0)).cast("double")
                / F.sum(rev_q).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "unnest_outer",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             CASE WHEN vec_id % 9 = 0 THEN []::DOUBLE[]
                  ELSE list_slice(embedding, 1, 3)::DOUBLE[] END AS arr
      FROM embeddings WHERE vec_id < 300
    )
    SELECT vec_id, CAST(pos AS INT) AS pos, val
    FROM (
      SELECT vec_id,
             generate_subscripts(arr, 1) - 1 AS pos,
             CAST(unnest(arr) AS DOUBLE) AS val
      FROM v WHERE len(arr) > 0
      UNION ALL
      SELECT vec_id, NULL, NULL FROM v WHERE len(arr) = 0
    )
    """,
    tags=("generator", "semantics"),
)
def unnest_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (`posexplode_outer`): rows whose array
    is empty survive with NULL position/value instead of vanishing —
    the generator analog of a left join, and the semantics a pipeline
    needs when "document with zero features" must stay visible to
    downstream accounting. DuckDB has no outer unnest, so the oracle
    spells it as unnest-of-nonempty UNION the empty rows.

    Scale shape: generators are pipelined (no shuffle); the outer
    variant adds a constant-width null row per empty array."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    arr = F.when(
        F.col("vec_id") % 9 == 0, F.array().cast("array<double>")
    ).otherwise(
        F.transform(F.slice("embedding", 1, 3), lambda x: x.cast("double"))
    )
    return emb.select(
        "vec_id", F.posexplode_outer(arr).alias("pos", "val")
    )


@query(
    "map_transform_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN ok THEN
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) * 2
           END AS k2,
           CASE WHEN ok THEN
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS tag_val,
           CASE WHEN ok THEN CAST(len(json_keys(props)) AS INT) + 1
           END AS n_after_zip
    FROM (SELECT event_id, props,
                 json_valid(props) AND json_type(props) = 'OBJECT' AS ok
          FROM events WHERE event_id < 2000)
    """,
    tags=("scalar", "map"),
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-HOF family map_funcs leaves out: `transform_values`
    (double every value), `transform_keys` (prefix-tag keys), and
    `map_zip_with` (merge two maps field-wise). Emitted as scalar
    lookups/cardinalities for the hash comparator.

    Scale shape: narrow projection, whole-stage codegen, no
    shuffle."""
    m = F.from_json("props", "map<string,bigint>")
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", m.alias("m"))
    )
    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    tagged = F.transform_keys(F.col("m"), lambda k, _: F.concat(F.lit("k="), k))
    zipped = F.map_zip_with(
        F.col("m"),
        F.create_map(F.lit("extra"), F.col("event_id")),
        lambda _, v1, v2: F.coalesce(v1, v2),
    )
    return ev.select(
        "event_id",
        F.element_at(doubled, F.lit("k")).alias("k2"),
        # look the original value up under its transform_keys-tagged key
        F.element_at(tagged, F.lit("k=k")).alias("tag_val"),
        F.size(F.map_keys(zipped)).alias("n_after_zip"),
    )


@query(
    "tpch_q17_shape",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_quantity * {QUANT}) AS BIGINT))
                  AS DOUBLE) / COUNT(*) AS avg_q
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(floor(l.l_extendedprice * {QUANT}) AS BIGINT))
                AS DOUBLE) / {QUANT} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND floor(l.l_quantity * {QUANT}) < 0.5 * pa.avg_q
    """,
    tags=("tpch", "agg", "join"),
)
def tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): line items of one
    brand whose quantity is below half that part's average quantity —
    the correlated-average-subquery shape, decorrelated into an
    aggregate + self-join. Quantized-integer average (exact sum /
    exact count) keeps the threshold comparison bit-identical.

    Scale shape: the per-part average is a map-side-combined
    aggregation reused via a shuffle join on partkey (both sides
    partition by the same key — co-located under bucketing); the
    brand filter prunes the part dim to a broadcast."""
    li = load(spark, sf_dir, "lineitem")
    qq = F.floor(F.col("l_quantity") * QUANT)
    pa = li.groupBy("l_partkey").agg(
        (F.sum(qq).cast("double") / F.count(F.lit(1))).alias("avg_q")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    joined = (
        li.join(pa.withColumnRenamed("l_partkey", "pk"),
                F.col("l_partkey") == F.col("pk"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(qq < 0.5 * F.col("avg_q"))
    )
    return joined.agg(
        (
            F.sum(F.floor(F.col("l_extendedprice") * QUANT)).cast("double")
            / QUANT
            / 7.0
        ).alias("avg_yearly")
    )


@query(
    "tpch_q22_shape",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * {QUANT}) AS BIGINT))
                  AS DOUBLE) / {QUANT} / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(floor(c.c_acctbal * {QUANT}) AS BIGINT))
                AS DOUBLE) / {QUANT} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): customers with
    above-average balances and NO orders, grouped by country — a
    global scalar subquery (single-row broadcast) feeding an
    anti-join feeding an aggregation. The three-stage shape every
    "compare to the population mean" analysis takes.

    Scale shape: the scalar average is one tiny aggregate broadcast
    into the filter (no shuffle of the big side); the anti join
    shuffles on custkey (broadcastable when the order keys fit); the
    final groupBy is 25 groups, map-side combined."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    bq = F.floor(F.col("c_acctbal") * QUANT)
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bq).cast("double") / QUANT / F.count(F.lit(1))).alias("ab")
        )
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy(
        F.col("c_nationkey").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(bq).cast("double") / QUANT).alias("totacctbal"),
    )


#: zone-map report knobs: virtual shard width (orderkeys per shard,
#: mimicking write-order file boundaries) and the probe predicate
#: (a shipdate range + a quantity floor, conjunctive).
ZM_SHARD = 4096
ZM_DATE_LO = "1995-01-01"
ZM_DATE_HI = "1995-12-31"
ZM_QTY_MIN = 45.0


@query(
    "zonemap_prune_report",
    oracle=f"""
    WITH z AS (
      SELECT l_orderkey // {ZM_SHARD} AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(l_shipdate) AS ship_min, MAX(l_shipdate) AS ship_max,
             MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max
      FROM lineitem
      GROUP BY 1
    )
    SELECT CAST(shard AS BIGINT) AS shard, n_rows,
           ship_min, ship_max, qty_min, qty_max,
           (ship_max < TIMESTAMP '{ZM_DATE_LO} 00:00:00'
             OR ship_min > TIMESTAMP '{ZM_DATE_HI} 00:00:00')
             AS prune_date,
           (qty_max < {ZM_QTY_MIN}) AS prune_qty,
           NOT (ship_max < TIMESTAMP '{ZM_DATE_LO} 00:00:00'
                OR ship_min > TIMESTAMP '{ZM_DATE_HI} 00:00:00'
                OR qty_max < {ZM_QTY_MIN}) AS must_scan
    FROM z
    """,
    tags=("layout",),
)
def zonemap_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) pruning report — the data-
    skipping math every lakehouse scan planner runs, materialized as
    a query: partition the fact table into virtual write-order shards
    (l_orderkey div 4096 — the row-group/file boundary a sequential
    writer produces), compute each shard's min/max zone for the two
    predicate columns, and evaluate which shards a conjunctive
    predicate (shipdate IN 1995 AND quantity >= 45) can skip WITHOUT
    READING THEM. ``prune_date`` / ``prune_qty`` show per-conjunct
    skippability, ``must_scan`` is the scheduler's verdict — and
    because write order correlates with shipdate but not quantity,
    the report exhibits the real-world asymmetry (date zones prune
    well on time-ordered data; quantity zones are useless without
    Z-ORDER — zorder_layout is the fix, and the two operators
    together tell the whole layout story).

    Scale shape: one groupBy over the scan with map-side combine;
    output is shard-count-sized (rows / 4096-ish), predicate
    evaluation is per-shard scalar algebra. This is exactly the
    stats-collection pass a table-format writer (Delta/Iceberg
    add-file stats, parquet row-group footers) amortizes into the
    write; the min/max comparison against the predicate is what
    their scan planners replay per query. Timestamp min/max compare
    bit-exactly between engines (both UTC microseconds; no doubles
    anywhere near the zone bounds)."""
    li = load(spark, sf_dir, "lineitem")
    z = li.groupBy(
        F.expr(f"l_orderkey div {ZM_SHARD}").cast("long").alias("shard")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_shipdate").alias("ship_min"),
        F.max("l_shipdate").alias("ship_max"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
    )
    lo = F.to_timestamp(F.lit(f"{ZM_DATE_LO} 00:00:00"))
    hi = F.to_timestamp(F.lit(f"{ZM_DATE_HI} 00:00:00"))
    prune_date = (F.col("ship_max") < lo) | (F.col("ship_min") > hi)
    prune_qty = F.col("qty_max") < F.lit(ZM_QTY_MIN)
    return z.select(
        "shard",
        "n_rows",
        "ship_min",
        "ship_max",
        "qty_min",
        "qty_max",
        prune_date.alias("prune_date"),
        prune_qty.alias("prune_qty"),
        (~(prune_date | prune_qty)).alias("must_scan"),
    )
