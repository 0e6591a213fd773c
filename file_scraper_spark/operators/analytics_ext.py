"""Analytics surface extensions ([EXT]): median/mode, bitwise and
boolean aggregates, histogram binning, and map-typed scalar functions.

None of these exist in the reference (SURVEY §2.A has no aggregation
at all); they round out the aggregate-function family next to
`agg_groupby` / `stddev_var` / `percentile_quantile` / `corr_covar`.
All oracle-checked with integer-exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import QUANT, dsum, oracle_dsum
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

HIST_WIDTH = 25_000.0  # o_totalprice bin width
HIST_BINS = 20


@query(
    "agg_median_mode",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * {QUANT}) AS BIGINT) AS qty_q
      FROM lineitem
    ), med AS (
      SELECT l_returnflag, median(qty_q) / {QUANT} AS median_qty
      FROM q GROUP BY l_returnflag
    ), cnt AS (
      -- mode over NON-NULL values only (median already ignores NULLs
      -- natively in both engines): without the filter the NULL group
      -- joins the ranking and the engines' opposite NULL placement in
      -- the qty_q tiebreak picks different modes (fuzzer, r9)
      SELECT l_returnflag, qty_q, COUNT(*) AS n,
             row_number() OVER (
               PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, qty_q
             ) AS rn
      FROM q WHERE qty_q IS NOT NULL GROUP BY l_returnflag, qty_q
    )
    SELECT m.l_returnflag, m.median_qty,
           c.qty_q / {QUANT}.0 AS mode_qty,
           CAST(c.n AS BIGINT) AS mode_n
    FROM med m JOIN cnt c
      ON c.l_returnflag = m.l_returnflag AND c.rn = 1
    """,
    tags=("agg",),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and mode per group. Median uses the built-in exact
    `median` over 1e-6-quantized BIGINTs: midpoint interpolation of
    integers is exact in double, so Spark's and DuckDB's differing
    interpolation formulas (`lo + (hi-lo)*f` vs `(lo+hi)/2`) cannot
    diverge. Mode is NOT the built-in `mode()` — both engines break
    frequency ties arbitrarily — but the deterministic formulation:
    highest count, then smallest value (count + row_number).

    Scale shape: exact median requires a sort of each group (Spark
    runs `percentile` as a single-pass aggregation buffering the
    group's values); for 100 TB groups the `approx_quantile`
    t-digest query is the scale path. Mode's two hash aggregations
    shuffle once on (flag, value) then once on flag — both map-side
    combined."""
    q = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * QUANT).alias("qty_q"),
    )
    med = q.groupBy("l_returnflag").agg(
        (F.median("qty_q") / QUANT).alias("median_qty")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("qty_q")
    )
    cnt = (
        q.filter(F.col("qty_q").isNotNull())
        .groupBy("l_returnflag", "qty_q")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return med.join(cnt, "l_returnflag").select(
        "l_returnflag",
        "median_qty",
        (F.col("qty_q") / F.lit(float(QUANT))).alias("mode_qty"),
        F.col("n").alias("mode_n"),
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT user_id,
           CAST(bit_and(event_id) AS BIGINT) AS band,
           CAST(bit_or(event_id) AS BIGINT) AS bor,
           CAST(bit_xor(event_id) AS BIGINT) AS bxor,
           CAST(bool_and(value > 100.0) AS INT) AS all_gt,
           CAST(bool_or(value > 100.0) AS INT) AS any_gt
    FROM events
    GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (AND/OR/XOR) and boolean (every/any) aggregates per
    user. All four are associative-commutative, so partial aggregation
    is exact under any combine order; booleans are surfaced as INT so
    the cross-engine hash sees identical scalars.

    Scale shape: single map-side-combined hash aggregation — the
    shuffle carries one 5-field row per (user, partition)."""
    gt = (F.col("value") > 100.0).cast("boolean")
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.bit_and("event_id").alias("band"),
            F.bit_or("event_id").alias("bor"),
            F.bit_xor("event_id").alias("bxor"),
            F.bool_and(gt).cast("int").alias("all_gt"),
            F.bool_or(gt).cast("int").alias("any_gt"),
        )
    )


@query(
    "histogram_bucket",
    oracle=f"""
    SELECT CAST(least({HIST_BINS - 1},
                      floor(o_totalprice / {HIST_WIDTH!r})) AS INT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * {QUANT}) AS BIGINT))
                AS DOUBLE) / {QUANT} AS sum_price
    FROM orders
    GROUP BY bin
    """,
    tags=("agg",),
)
def histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: `width_bucket`-style
    binning expressed as `least(floor(x / width), n-1)` — float
    division plus floor is deterministic IEEE arithmetic in both
    engines, unlike the engines' own `width_bucket` boundary
    conventions.

    Scale shape: the canonical map-side-combine aggregation — 20
    output rows regardless of input size, so the shuffle after
    partial aggregation is 20 rows per partition. This is the
    building block for distribution profiling of any numeric feature
    at 100 TB."""
    bin_col = F.least(
        F.lit(HIST_BINS - 1), F.floor(F.col("o_totalprice") / HIST_WIDTH)
    ).cast("int")
    return (
        load(spark, sf_dir, "orders")
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("o_totalprice") * QUANT)).cast("double")
                / QUANT
            ).alias("sum_price"),
        )
    )


@query(
    "map_funcs",
    oracle="""
    WITH p AS (
      SELECT event_id, props,
             json_valid(props) AND json_type(props) = 'OBJECT' AS ok,
             TRY_CAST(TRY_CAST(props AS JSON) AS MAP(VARCHAR, BIGINT))
               AS m
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           CASE WHEN ok THEN
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k_val,
           CASE WHEN ok THEN CAST(len(json_keys(props)) AS INT)
           END AS n_keys,
           CASE WHEN ok THEN CAST(event_id AS BIGINT) END AS eid_val,
           CASE WHEN ok THEN
             CAST(len(list_filter(map_values(m), v -> v > 50)) AS INT)
           END AS n_big
    FROM p
    """,
    tags=("scalar", "map"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: `from_json` into `map<string,bigint>`,
    then `element_at`, `map_keys`/`size`, `map_concat` with a
    constructed `create_map`, and `map_filter` — the full map function
    family, exercised JVM-side (no Python UDF). The driver comparator
    hashes scalars only, so the query emits lookups and cardinalities
    rather than raw maps.

    Scale shape: pure narrow projection — no shuffle, whole-stage
    codegen over the JSON parse and map ops."""
    m = F.from_json("props", "map<string,bigint>")
    withm = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", m.alias("m"))
    )
    big = F.map_filter(F.col("m"), lambda _, v: v > 50)
    return withm.select(
        "event_id",
        F.element_at("m", F.lit("k")).alias("k_val"),
        F.size(F.map_keys("m")).alias("n_keys"),
        F.element_at(
            F.map_concat(
                "m", F.create_map(F.lit("eid"), F.col("event_id"))
            ),
            F.lit("eid"),
        ).alias("eid_val"),
        F.size(big).alias("n_big"),
    )


@query(
    "variant_shred",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
           json_extract_string(props, '$.k') AS k_str,
           'OBJECT<k: BIGINT>' AS vschema,
           CAST(json_extract(nested, '$.a[1]') AS BIGINT) AS a1,
           CAST(json_extract(nested, '$.b.c') AS BIGINT) AS bc
    FROM (
      SELECT event_id, props,
             '{"a":[' || (event_id % 10) || ',' || (event_id % 10) * 2
               || '],"b":{"c":' || user_id || '}}' AS nested
      FROM events
      WHERE event_id < 2000
    )
    """,
    tags=("scalar", "variant"),
)
def variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): `parse_json` into an
    open-schema variant, typed extraction with `variant_get` (scalar,
    array index, nested object paths), and runtime schema discovery
    with `schema_of_variant`. Variant is the modern engine answer to
    heterogeneous JSON at scale — binary-encoded, shreddable, no
    schema declaration up front (vs `from_json`, which needs one).
    The DuckDB twin uses its JSON type: identical extraction
    semantics, different encoding.

    Scale shape: pure per-row projection, one scan, no shuffle; the
    variant binary encoding parses each document once and all
    extractions walk the binary, not the text."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    nested_json = F.concat(
        F.lit('{"a":['),
        (F.col("event_id") % 10).cast("string"),
        F.lit(","),
        ((F.col("event_id") % 10) * 2).cast("string"),
        F.lit('],"b":{"c":'),
        F.col("user_id").cast("string"),
        F.lit("}}"),
    )
    v = F.parse_json("props")
    nv = F.parse_json(nested_json)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_big"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.schema_of_variant(v).alias("vschema"),
        F.variant_get(nv, "$.a[1]", "bigint").alias("a1"),
        F.variant_get(nv, "$.b.c", "bigint").alias("bc"),
    )


_DAY = "date_diff('day', TIMESTAMP '2024-01-01', ts)"


@query(
    "agg_regression",
    oracle=f"""
    SELECT event_type, n,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
           sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx / n
             AS intercept,
           ((sxy - sx * sy / n) * (sxy - sx * sy / n))
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
    FROM (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             {oracle_dsum('value')} AS sx,
             {oracle_dsum('value * value')} AS sxx,
             {oracle_dsum(_DAY)} AS sy,
             {oracle_dsum(f'{_DAY} * {_DAY}')} AS syy,
             {oracle_dsum(f'value * {_DAY}')} AS sxy
      FROM events GROUP BY event_type
    )
    """,
    tags=("agg",),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (the regr_slope / regr_intercept /
    regr_r2 family) of value against day index, computed from exact
    quantized integer moments instead of the built-ins — the built-in
    regr_* aggregate double buffers whose combine order varies per
    run, so their last ulp is not reproducible; this formulation is
    bit-stable across runs, partitionings, AND engines (the final
    double arithmetic has an identical expression tree on both sides).

    Scale shape: one map-side-combined hash aggregation carrying five
    BIGINT moments — the single-pass parallel form of least squares;
    at 100 TB this is a one-shuffle query like any other sum."""
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
    sx, sxx, sy, syy, sxy = (F.col(c) for c in ("sx", "sxx", "sy", "syy", "sxy"))
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    return base.select(
        "event_type",
        "n",
        slope.alias("slope"),
        (sy / n - slope * sx / n).alias("intercept"),
        (
            ((sxy - sx * sy / n) * (sxy - sx * sy / n))
            / ((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("r2"),
    )


@query(
    "bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT user_id % 97) AS BIGINT) AS n_cohorts
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "distinct"),
)
def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count): each partition builds a fixed-width bitmap per
    bucket, bitmaps OR together associatively, and the final
    popcount is the exact distinct count. Same answer as
    COUNT(DISTINCT) — the oracle — but the shuffle carries bitmaps,
    not values.

    Scale shape: COUNT(DISTINCT) expands to a two-phase aggregation
    whose first shuffle carries EVERY distinct (group, value) pair;
    the bitmap form shuffles a constant-size bitmap per (group,
    bucket) regardless of row count — the exact-distinct analog of
    the HLL sketch, and the right plan when values are dense
    integers (user ids). Fully re-aggregatable: bitmaps OR across
    days/partitions without recounting."""
    ev = load(spark, sf_dir, "events")
    users = (
        ev.select("event_type", F.col("user_id").alias("v"))
        .groupBy("event_type", F.bitmap_bucket_number(F.col("v")).alias("bkt"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("v"))).alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
    )
    cohorts = (
        ev.select(F.col("event_type").alias("et"), (F.col("user_id") % 97).alias("v"))
        .groupBy("et", F.bitmap_bucket_number(F.col("v")).alias("bkt"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("v"))).alias("bm"))
        .groupBy("et")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_cohorts"))
    )
    # null-safe: the oracle is ONE GROUP BY, so a NULL event_type
    # group must survive the twin-branch join (same edge as
    # agg_approx_distinct / hll_sketch_merge)
    return users.join(
        cohorts, users["event_type"].eqNullSafe(cohorts["et"])
    ).select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_cohorts").cast("long").alias("n_cohorts"),
    )


@query(
    "scalar_try_funcs",
    oracle="""
    SELECT event_id,
           value / nullif(CAST(event_id % 5 AS DOUBLE), 0.0) AS safe_div,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'oops'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT)
             AS parsed,
           CASE WHEN event_id % 2 = 0
                THEN 9223372036854775807 ELSE event_id END AS big_or_id
    FROM events
    WHERE event_id < 3000
    """,
    tags=("scalar", "semantics"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (`try_divide`, `try_cast`, `try_add`):
    malformed input and overflow produce NULL instead of failing the
    job — the semantics a 100 TB pipeline needs when one bad row in a
    trillion must not kill a 6-hour job. ANSI mode stays ON for
    everything else (silent-corruption protection); the try_* forms
    are targeted opt-outs. try_add here takes the no-overflow branch
    so both engines agree exactly; the overflowING case is pinned in
    unit tests instead (DuckDB promotes to HUGEINT rather than
    NULLing, so it cannot be an oracle row)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        F.try_divide("value", (F.col("event_id") % 5).cast("double")).alias(
            "safe_div"
        ),
        F.try_to_number(
            F.when(F.col("event_id") % 3 == 0, "oops").otherwise(
                F.col("event_id").cast("string")
            ),
            F.lit("999999999999"),
        )
        .cast("long")
        .alias("parsed"),
        F.try_add(
            F.when(F.col("event_id") % 2 == 0, F.lit(9223372036854775807))
            .otherwise(F.col("event_id"))
            .cast("long"),
            F.lit(0).cast("long"),
        ).alias("big_or_id"),
    )


@query(
    "hll_sketch_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "approx", "sketch"),
)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches): per-(type, day) sketches
    built with hll_sketch_agg, then re-aggregated to per-type counts
    with hll_union_agg WITHOUT touching the raw data again — the
    re-aggregatability that makes sketch columns materializable in a
    daily rollup table at 100 TB (approx_count_distinct alone cannot
    be rolled up later). Sketch binaries are engine-specific, so the
    driver-checkable projection joins the merged-sketch estimate to
    its exact twin and ships the HLL error-bound predicate
    ``est_ok = |est - exact| <= max(1, 0.05*exact)`` (<5% at lgK=12);
    the oracle reproduces the exact column and the constant-TRUE bound.
    (In the daily-rollup deployment only the sketch column ships; the
    exact twin exists for the correctness gate.)"""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    # null-safe join: both sides group by event_type, so a NULL group
    # exists on both or neither — a plain inner equi-join would drop
    # it while the oracle's GROUP BY keeps it
    return merged.join(
        exact, merged["event_type"].eqNullSafe(exact["event_type"])
    ).select(
        merged["event_type"].alias("event_type"),
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.lit(0.05) * F.col("exact_users"))
        ).alias("est_ok"),
    )


@query(
    "collation_compare",
    oracle="""
    SELECT lower(mixed) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_case_variants
    FROM (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS mixed
      FROM customer
    )
    GROUP BY lower(mixed)
    """,
    tags=("scalar", "semantics"),
)
def collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): the same
    market segment rendered in mixed case groups as ONE key under the
    UTF8_LCASE collation while binary COUNT(DISTINCT) still sees the
    case variants. Collations push case/accent policy into the
    engine's comparators — grouping, joins and sorts get
    locale-correct semantics without wrapping every column in
    lower() (which would defeat statistics and pushdown). The group
    label ships as lower(key): the collated group's representative
    string is whichever variant a partition saw first, so it is
    normalized for the cross-engine hash.

    Scale shape: identical to any hash aggregation — the collation
    affects only the key comparator, not the plan."""
    cust = load(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    return (
        cust.select(mixed.alias("mixed"))
        .groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.collate(F.col("mixed"), "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            F.lower(F.col("k")).alias("segment"), "n", "n_case_variants"
        )
    )


@query(
    "funnel_analysis",
    oracle="""
    WITH tv AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), tc AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN tv ON tv.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > tv.t0
      GROUP BY e.user_id
    ), tp AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN tc ON tc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > tc.t1
      GROUP BY e.user_id
    ), counts AS (
      SELECT 1 AS stage, 'view' AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM tv
      UNION ALL
      SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM tc
      UNION ALL
      SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM tp
    )
    SELECT CAST(stage AS BIGINT) AS stage, event_type, n_users,
           CAST(n_users AS DOUBLE)
             / NULLIF((SELECT MAX(n_users) FROM counts WHERE stage = 1), 0)
             AS conv_rate
    FROM counts ORDER BY stage
    """,
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view -> click -> purchase): each
    stage's earliest qualifying event must happen STRICTLY AFTER the
    user's previous stage — the sequential-pattern analytics an event
    engine must express, here as three cascaded min-aggregate
    semi-joins instead of a per-user sort. Each stage is one selective
    filter + one co-keyed join + one map-side-combined min: at 100 TB
    every join shuffles on user_id and AQE coalesces the tiny stage
    frames to broadcasts. conv_rate is one double division of exact
    integers."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    counts = (
        tv.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).cast("long").alias("stage"), F.lit("view").alias("event_type"), "n_users")
        .unionAll(
            tc.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).cast("long").alias("stage"),
                F.lit("click").alias("event_type"),
                "n_users",
            )
        )
        .unionAll(
            tp.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).cast("long").alias("stage"),
                F.lit("purchase").alias("event_type"),
                "n_users",
            )
        )
    )
    base = counts.filter(F.col("stage") == 1).select(
        F.col("n_users").alias("base_n")
    )
    return (
        counts.join(F.broadcast(base))
        .select(
            "stage",
            "event_type",
            "n_users",
            # NULLIF-guarded exactly like the oracle: an empty stage-1
            # funnel yields NULL in BOTH engines (Spark non-ANSI double
            # division would give NULL but DuckDB gives NaN — ADVICE r3)
            (
                F.col("n_users").cast("double")
                / F.nullif(F.col("base_n"), F.lit(0))
            ).alias("conv_rate"),
        )
        .orderBy("stage")
    )


@query(
    "retention_cohort",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, CAST(e.ts AS DATE))
                AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN cohort c ON c.user_id = e.user_id
    GROUP BY c.cohort_day,
             date_diff('day', c.cohort_day, CAST(e.ts AS DATE))
    ORDER BY cohort_day, day_offset
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users grouped by first-activity day,
    distinct-active counts per (cohort, day offset) — the standard
    cohort-retention triangle. One min-aggregate for cohorts (tiny:
    one row per user), broadcast back onto events, then a
    count-distinct keyed by (cohort_day, offset). The datediff is
    whole-day integer arithmetic on UTC dates, identical in both
    engines."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")
MAD_K = 1.5  # robust-outlier threshold: |dev| > MAD_K * MAD


@query(
    "profile_table",
    oracle="""
    WITH long AS (
      SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS val
      FROM documents
      UNION ALL SELECT 'text', text FROM documents
      UNION ALL SELECT 'lang', lang FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
      FROM documents
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(val) AS BIGINT) AS n_filled,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val,
           CAST(SUM(length(val)) AS BIGINT) AS sum_len
    FROM long
    GROUP BY col_name
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile — the pre-ingest audit pass a pipeline
    runs before committing a new shard (null rates, exact distinct
    cardinality, lexicographic min/max of the string rendering, total
    character volume), one output row per column.

    Spark-first shape: `stack` unpivots each record into (col_name,
    val) rows — a Generate, no shuffle of its own — and ONE
    aggregation produces every statistic. count/min/max/sum combine
    map-side; the exact distinct rewrites to a two-phase aggregate
    keyed on (col_name, val), so cardinality work distributes over
    the value space rather than funneling each column's rows through
    one reducer. At 100 TB swap count_distinct for
    approx_count_distinct (as a SEPARATE aggregation — never fused
    with exact distincts, see agg_approx_distinct) and keep the rest.
    Strings compare/measure identically cross-engine: binary
    collation, codepoint length, and CAST(BIGINT AS STRING) renders
    the same digits."""
    docs = load(spark, sf_dir, "documents")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in PROFILE_COLS
    )
    long = docs.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args})"
            " AS (col_name, val)"
        )
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_filled"),
        F.count_distinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.length("val")).alias("sum_len"),
    )


@query(
    "anomaly_mad",
    oracle=f"""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(floor(value * {QUANT}) AS BIGINT) AS qv, value
      FROM events
    ), med AS (
      SELECT event_type, median(qv) AS med_q
      FROM q GROUP BY event_type
    ), dev AS (
      SELECT q.event_id, q.event_type, q.value, q.qv, med.med_q,
             abs(q.qv - med.med_q) AS dev_q
      FROM q JOIN med
        ON q.event_type IS NOT DISTINCT FROM med.event_type
    ), mad AS (
      SELECT event_type, median(dev_q) AS mad_q
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           d.med_q / {QUANT} AS med,
           m.mad_q / {QUANT} AS mad,
           d.dev_q / {QUANT} AS dev
    FROM dev d JOIN mad m
      ON d.event_type IS NOT DISTINCT FROM m.event_type
    WHERE d.dev_q > {MAD_K} * m.mad_q
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation — the
    data-cleaning gate that survives the contamination it hunts
    (mean/stddev z-scores move with the outliers; medians don't).
    Flags every event whose |value - median| exceeds MAD_K * MAD of
    its event_type.

    Two tiny aggregations (one row per type each) broadcast back onto
    the full stream, so the event table is rescanned per stage (four
    column-pruned linear scans in the physical plan — broadcast
    branches don't dedupe cross-branch) but NEVER shuffled on a hot
    key: a skewed event_type costs nothing because only the per-type
    medians move. Exactness: values quantize to BIGINT,
    median midpoints of (half-)integers are exact in double under
    both engines' interpolation formulas (agg_median_mode's argument,
    applied twice), and the MAD_K multiple of a quarter-integer stays
    exact — the strict > comparison is deterministic cross-engine.
    NULL values drop out of both medians natively and NULL-valued
    rows never flag (3VL comparison); NULL event_type groups are
    preserved via null-safe joins (eqNullSafe — r8 registry-wide
    audit)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    q = ev.withColumn("qv", F.floor(F.col("value") * float(QUANT)))
    med = q.groupBy("event_type").agg(F.median("qv").alias("med_q"))
    dev = q.join(
        F.broadcast(med.withColumnRenamed("event_type", "met")),
        q["event_type"].eqNullSafe(F.col("met")),
    ).withColumn("dev_q", F.abs(F.col("qv") - F.col("med_q")))
    mad = dev.groupBy("met").agg(F.median("dev_q").alias("mad_q"))
    return (
        dev.join(
            F.broadcast(mad.withColumnRenamed("met", "mat")),
            dev["met"].eqNullSafe(F.col("mat")),
        )
        .filter(F.col("dev_q") > MAD_K * F.col("mad_q"))
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("med_q") / QUANT).alias("med"),
            (F.col("mad_q") / QUANT).alias("mad"),
            (F.col("dev_q") / QUANT).alias("dev"),
        )
    )


#: winsorization percentile (clip below p5 / above p95)
WINSOR_PCT = 5


@query(
    "winsorize_stats",
    oracle=f"""
    WITH q AS (
      SELECT event_id, event_type,
             CAST(floor(value * {QUANT}) AS BIGINT) AS qv
      FROM events WHERE value IS NOT NULL
    ), nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM q GROUP BY event_type
    ), r AS (
      SELECT q.event_type, q.qv,
             row_number() OVER (
               PARTITION BY event_type ORDER BY qv, event_id) AS rn
      FROM q
    ), b AS (
      SELECT r.event_type,
             MAX(CASE WHEN rn = ({WINSOR_PCT} * nn.n + 99) // 100
                 THEN qv END) AS lo_q,
             MAX(CASE WHEN rn = ((100 - {WINSOR_PCT}) * nn.n + 99)
                 // 100 THEN qv END) AS hi_q
      FROM r JOIN nn
        ON r.event_type IS NOT DISTINCT FROM nn.event_type
      GROUP BY r.event_type
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN qv < lo_q THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN qv > hi_q THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_hi,
           lo_q / CAST({QUANT} AS DOUBLE) AS p_lo,
           hi_q / CAST({QUANT} AS DOUBLE) AS p_hi,
           CAST(SUM(LEAST(GREATEST(qv, lo_q), hi_q)) AS DOUBLE)
             / COUNT(*) / {QUANT} AS winsorized_mean
    FROM r JOIN b
      ON r.event_type IS NOT DISTINCT FROM b.event_type
    GROUP BY r.event_type, lo_q, hi_q
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean per event_type — clip values below the
    exact p5 / above the exact p95, then average: the standard
    heavy-tail-resistant metric next to anomaly_mad's outlier LISTING
    (winsorize keeps every row, bounded; MAD flags rows).

    Percentiles are EXACT discrete ranks, all integer arithmetic:
    rank ceil(p*n) computed as (p*n + 99) div 100 on BIGINTs — no
    interpolation, so no cross-engine float formula to match (the
    cont-percentile (hi-lo)*frac product rounds differently per
    association and is deliberately avoided). Tie-broken rank order
    (qv, event_id) makes the chosen boundary row unique; the clip and
    the quantized sum are then order-free.

    Scale shape: one sort per type partition for the ranks (inherent
    to exact percentiles), one small bounds frame (2 values per type)
    joined back, everything else map-side. At 100 TB swap the rank
    pass for approx_percentile(value, [0.05, 0.95]) — the clip and
    mean stages are unchanged, which is the point of staging bounds
    as their own frame."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * float(QUANT)).alias("qv"),
    )
    nn = q.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("qv", "event_id")
    r = q.select("event_type", "qv", F.row_number().over(w).alias("rn"))
    bounds = (
        r.join(
            F.broadcast(nn.withColumnRenamed("event_type", "nt")),
            r["event_type"].eqNullSafe(F.col("nt")),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn")
                    == F.expr(f"({WINSOR_PCT} * n + 99) div 100"),
                    F.col("qv"),
                )
            ).alias("lo_q"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.expr(
                        f"(({100 - WINSOR_PCT}) * n + 99) div 100"
                    ),
                    F.col("qv"),
                )
            ).alias("hi_q"),
        )
    )
    clipped = r.join(
        F.broadcast(bounds.withColumnRenamed("event_type", "bt")),
        r["event_type"].eqNullSafe(F.col("bt")),
    )
    return (
        clipped.groupBy("event_type", "lo_q", "hi_q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("qv") < F.col("lo_q"), 1).otherwise(0)
            ).alias("n_clip_lo"),
            F.sum(
                F.when(F.col("qv") > F.col("hi_q"), 1).otherwise(0)
            ).alias("n_clip_hi"),
            (
                F.sum(
                    F.least(
                        F.greatest(F.col("qv"), F.col("lo_q")),
                        F.col("hi_q"),
                    )
                ).cast("double")
                / F.count(F.lit(1))
                / QUANT
            ).alias("winsorized_mean"),
        )
        .select(
            "event_type",
            "n",
            "n_clip_lo",
            "n_clip_hi",
            (F.col("lo_q") / float(QUANT)).alias("p_lo"),
            (F.col("hi_q") / float(QUANT)).alias("p_hi"),
            "winsorized_mean",
        )
    )
