"""Additional TPC-H-shaped relational coverage ([EXT], SURVEY §2.B
"beyond the reference" analytics surface): correlated scalar
subqueries, disjunctive predicate pushdown, exclusion subqueries,
multi-nation join graphs — the remaining classic OLAP shapes not yet
in relational_ext/relational_ext2.

Determinism: every revenue sum is the quantized BIGINT fold
(functions/exact.dsum — see registry.py rules); doubles only appear
as exact per-row IEEE results (division, min) that both engines
compute bit-identically; every ORDER BY/LIMIT carries a unique
tiebreaker.

Scale notes: dims (part, supplier, nation, customer at these shapes'
filters) broadcast; lineitem is the only shuffled table in each plan.
The derived partsupp (distinct (l_partkey, l_suppkey)) shuffles once
and is reused within a plan; at 100 TB it would be a maintained
bucketed table instead of a per-query derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import QUANT, dsum, oracle_dsum
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load


@query(
    "tpch_q2_shape",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT partkey, MIN(cost) AS min_cost FROM ps GROUP BY partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, ps.cost
    FROM part p
    JOIN ps ON ps.partkey = p.p_partkey
    JOIN best b ON b.partkey = p.p_partkey AND ps.cost = b.min_cost
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15
    ORDER BY p.p_partkey, s.s_suppkey
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost-supplier shape (TPC-H Q2): a correlated scalar
    subquery — for each part, the supplier(s) achieving the minimum
    unit cost — decorrelated the way Catalyst does it: aggregate the
    derived partsupp twice (per-(part,supplier) cost, then per-part
    min) and equi-join on equality with the min. Unit cost is one
    IEEE division + MIN (no accumulation), so the double compares
    bit-identically across engines. partsupp is derived from lineitem
    (the fixture has no partsupp table); ties keep all witnesses, so
    no arbitrary-row nondeterminism."""
    li = load(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    best = ps.groupBy("partkey").agg(F.min("cost").alias("min_cost"))
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        ps.join(best, ["partkey"])
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "cost")
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "tpch_q7_shape",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1999-12-31'
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping shape (TPC-H Q7): the same dim (nation) joined
    twice under different roles with a symmetric cross-nation
    disjunction, plus a year extraction group key. Both nation copies
    broadcast; the disjunctive filter runs after both joins (it spans
    them), but each branch's nation equality still prunes via the
    broadcast hash lookups."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1999-12-31")
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (
        F.col("cust_nation") == "NATION_7"
    ) | (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item-losses shape (TPC-H Q10): selective fact filter
    (returnflag, one order year) -> join up the customer/nation dims
    -> top 20 by lost revenue. The returnflag + date predicates reach
    the parquet scans (PushedFilters); TakeOrderedAndProject caps the
    result without a global sort."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q15_shape",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(floor((l_extendedprice * (1 - l_discount))
                 * {QUANT}) AS BIGINT)) AS rev_q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev_q AS DOUBLE) / {QUANT} AS total_revenue
    FROM srev
    JOIN supplier s ON s.s_suppkey = srev.suppkey
    WHERE rev_q = (SELECT MAX(rev_q) FROM srev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier shape (TPC-H Q15): an aggregate reused by both the
    main query and a scalar MAX subquery over itself. The revenue
    ranking compares QUANTIZED BIGINTs, not doubles, so the max-
    equality join cannot be perturbed by summation order in either
    engine; ties keep all witnesses. Spark reuses the aggregated frame
    for both sides (Catalyst reuses the exchange); the scalar max is a
    broadcast one-row join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    srev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.floor(rev * QUANT).cast("long")).alias("rev_q")
    )
    mx = srev.agg(F.max("rev_q").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        srev.join(F.broadcast(mx), F.col("rev_q") == F.col("mx"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_q").cast("double") / QUANT).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_shape",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem
    ), excluded AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count-per-part-class shape (TPC-H Q16): distinct
    supplier counting with an exclusion (NOT IN) subquery — expressed
    as a broadcast left-anti join, the scale-safe NOT IN for non-null
    keys (s_acctbal < 0 stands in for the spec's complaints-comment
    filter; the fixture has no comment column). partsupp is the
    distinct (part, supplier) projection of lineitem — one shuffle,
    then the count-distinct reshuffles by part class."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        ps.join(F.broadcast(excluded), "suppkey", "left_anti")
        .join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q19_shape",
    oracle=f"""
    SELECT {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate shape (TPC-H Q19): an OR of three
    conjunctive branches spanning both join sides. Catalyst extracts
    the common join key and pushes the per-table residuals of the
    disjunction down to each scan (p_brand/p_size union-of-ranges to
    part, l_quantity range union to lineitem) before evaluating the
    full OR post-join — the classic test that a planner does not fall
    back to a cross-ish join under ORs. Single global aggregate row
    (count kept alongside so the result is self-evidently non-empty)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(branch).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@query(
    "tpch_q6_shape",
    oracle=f"""
    SELECT {oracle_dsum('l_extendedprice * l_discount')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change shape (TPC-H Q6): the purest
    scan-filter-aggregate — no join at all. Every predicate (date
    range, discount band, quantity cap) must reach the parquet scan
    as a pushed filter; at 100 TB this query is bounded purely by
    scan bandwidth x selectivity, which is why it is the canonical
    pushdown sanity check."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q8_shape",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sn.n_name AS supp_nation,
             CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount))
                 * {QUANT}) AS BIGINT)) AS BIGINT) AS vol_q
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
      GROUP BY year(o.o_orderdate), sn.n_name
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol_q
                    ELSE 0 END) AS DOUBLE)
             / CAST(SUM(vol_q) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National-market-share shape (TPC-H Q8): an 8-table join with
    nation in two roles, then a ratio of conditional sums per year.
    The share divides two QUANTIZED BIGINT sums (one double division
    at the end — identical IEEE both engines), never double
    aggregates. Customer-side region filter prunes via broadcast
    chain; lineitem is the only big shuffle."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_q = F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * QUANT
    ).cast("long")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"), "supp_nation"
        )
        .agg(F.sum(rev_q).alias("vol_q"))
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol_q")).otherwise(
            F.lit(0)
        )
    ).cast("double") / F.sum("vol_q").cast("double")
    return (
        vol.groupBy("o_year")
        .agg(share.alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q9_shape",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                 - ps.supplycost * l.l_quantity) * {QUANT}) AS BIGINT))
                AS DOUBLE) / {QUANT} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN ps ON ps.partkey = l.l_partkey AND ps.suppkey = l.l_suppkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type-profit shape (TPC-H Q9): profit = revenue minus
    cost where cost joins back a DERIVED per-(part,supplier) unit
    cost (the fixture has no partsupp — same derivation as Q2),
    making lineitem join an aggregate OF ITSELF plus four dims. The
    profit addend quantizes the two-term double expression once
    (floor-exact both engines); the LIKE filter prunes part before
    broadcast."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit_q = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("supplycost") * F.col("l_quantity")
        )
        * QUANT
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            ps,
            (li.l_partkey == ps.partkey) & (li.l_suppkey == ps.suppkey),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_q).cast("double") / QUANT).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_shape",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(COUNT(*) AS BIGINT) AS availqty,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), scoped AS (
      SELECT ps.partkey,
             CAST(SUM(CAST(floor(ps.supplycost * ps.availqty * {QUANT})
                 AS BIGINT)) AS BIGINT) AS value_q
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_2'
      GROUP BY ps.partkey
    ), total AS (
      SELECT SUM(value_q) AS tot FROM scoped
    )
    SELECT partkey, CAST(value_q AS DOUBLE) / {QUANT} AS value
    FROM scoped, total
    WHERE value_q > 0.01 * tot
    ORDER BY value_q DESC, partkey
    """,
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape (TPC-H Q11): per-part inventory value
    within one nation, kept when above a FRACTION OF THE GLOBAL TOTAL
    — a scalar subquery over the same aggregate (broadcast one-row
    join, like Q15). Inventory derives from lineitem (availqty =
    line count, cost = min unit price) since the fixture has no
    partsupp; the fraction threshold compares quantized BIGINTs
    against 0.01 * total in double — one multiplication, identical
    IEEE both engines."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(
        F.count(F.lit(1)).alias("availqty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"),
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    value_q = F.floor(
        F.col("supplycost") * F.col("availqty") * QUANT
    ).cast("long")
    scoped = (
        ps.join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("partkey")
        .agg(F.sum(value_q).alias("value_q"))
    )
    total = scoped.agg(F.sum("value_q").alias("tot"))
    return (
        scoped.join(F.broadcast(total))
        .filter(F.col("value_q") > 0.01 * F.col("tot"))
        .select(
            "partkey", (F.col("value_q").cast("double") / QUANT).alias("value")
        )
        .orderBy(F.desc("value_q"), "partkey")
    )


@query(
    "tpch_q20_shape",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(floor(l_quantity * {QUANT}) AS BIGINT))
                  AS BIGINT) AS availq
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 0
      AND s.s_suppkey IN (
        SELECT ps.suppkey FROM ps
        WHERE ps.partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.availq > 2 * (
            SELECT SUM(CAST(floor(l.l_quantity * {QUANT}) AS BIGINT))
            FROM lineitem l
            WHERE l.l_partkey = ps.partkey AND l.l_suppkey = ps.suppkey
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01'))
    ORDER BY s.s_name
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential-part-promotion shape (TPC-H Q20): the registry's
    deepest subquery nesting — an IN over a derived inventory table,
    itself filtered by a second IN (name-pattern parts) AND a
    CORRELATED scalar aggregate (that pair's quantity shipped inside
    a date window). Fixture-adapted (no partsupp table, mirroring
    q2/q11): availqty := the pair's lifetime quantized quantity sum,
    and the Q20 predicate becomes "lifetime > 2x the window sum" —
    pairs with NO window shipments are excluded by SQL NULL semantics
    (SUM over empty -> NULL -> comparison never true), which the
    decorrelated form reproduces with an INNER join on the window
    aggregate. All comparisons are BIGINT-vs-BIGINT (quantized), so
    both engines agree bit-exactly.

    Decorrelation (what Catalyst does to the correlated form, written
    explicitly): both aggregates group on the SAME key (partkey,
    suppkey), so they shuffle once each and join co-partitioned; the
    part-name IN is a broadcast semi join; the final supplier IN is a
    semi join onto a 100-row dim joined to a broadcast nation.

    Scale shape: lineitem is scanned twice (lifetime agg, window agg)
    — at 100 TB the window scan's shipdate filter prunes partitions
    (PushedFilters on the parquet scan); both aggs are map-side
    combined; nothing driver-side."""
    li = load(spark, sf_dir, "lineitem")
    qq = F.floor(F.col("l_quantity") * QUANT).cast("long")
    lifetime = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.sum(qq).alias("availq"))
    window = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(qq).alias("winq"))
    )
    red_parts = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    qualifying = (
        lifetime.join(window, ["partkey", "suppkey"])
        .filter(F.col("availq") > 2 * F.col("winq"))
        .join(
            F.broadcast(red_parts),
            F.col("partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("suppkey")
    )
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        supp.join(
            qualifying, supp.s_suppkey == qualifying.suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_shape",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_regionkey = 0
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting shape (TPC-H Q21): the
    hardest classic subquery shape — an EXISTS and a NOT EXISTS, both
    correlated self-joins on the fact table with a NON-equi
    correlation term (l2.l_suppkey <> l1.l_suppkey). Fixture-adapted
    "late" predicate: shipped more than 60 days after the order date
    (the fixture has no receipt/commit dates); the predicate is
    constant within an order, so the original Q21 semantics carry
    over exactly.

    The oracle keeps the literal double-EXISTS form; the Spark plan
    uses the standard aggregate decorrelation instead of two
    correlated anti/semi joins: per (orderkey, suppkey) compute "any
    late line" (first shuffle, map-side combined), then per orderkey
    count suppliers and late-suppliers (second, smaller shuffle).
    Then for a late line l1: EXISTS-other-supplier == (n_supp >= 2)
    and NOT-EXISTS-other-LATE-supplier == (n_late_supp == 1) (l1's
    own supplier is late, so it is the set's only member). This turns
    two O(|lineitem|) correlated probes into two shrinking
    aggregations plus one equi join on orderkey — the form that
    co-partitions with the l1 join at 100 TB (and the reason Q21 is
    the poster child for decorrelation in every OLAP paper).

    Scale shape (r13 optimization): the order-status filter commutes
    with every correlated predicate (status is constant within an
    order and l1 requires 'F', so non-F orders contribute nothing to
    any consulted count — per-orderkey groups are unchanged by
    dropping other orders), so orders is filtered to 'F' BEFORE the
    lineitem⋈orders join: the fact-side join, both aggregations and
    the l1 re-filter all run on the F fraction (~49% on TPC-H data)
    of the corpus. The two-pass shape itself is KEPT: a single-pass
    rewrite that carried n_late through the (orderkey, suppkey)
    aggregate and summed it over qualifying groups — avoiding the
    second line-granularity pass entirely — was A/B-measured same-JVM
    interleaved at 100x and LOST 2x (min-of-2 6.4s vs 12.8s, both
    pairs agree; superseded arm + numbers in OPTIMIZATION_r13.md):
    AQE reuses the one lo exchange across per_os and the l1 branch,
    so the 'extra' pass is nearly free, while the single-pass form
    pays an extra corpus-sized aggregate exchange plus wider
    aggregation state. Both aggregations and the l1 join shuffle on
    orderkey (one exchange reused by AQE); supplier and nation are
    broadcast dims; no correlated re-scan of lineitem per row."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    lo = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("any_late")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
    )
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    l1 = (
        lo.filter(late)
        .join(
            per_order.withColumnRenamed("l_orderkey", "pk"),
            F.col("l_orderkey") == F.col("pk"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


#: fixed event-sequence pattern (adjacent in each user's timeline)
PATTERN = ("view", "click", "purchase")


@query(
    "event_pattern_match",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lag(event_type, 2) OVER w AS e2,
             lag(event_type, 1) OVER w AS e1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), hits AS (
      SELECT user_id, ts
      FROM seq
      WHERE e2 = '{PATTERN[0]}' AND e1 = '{PATTERN[1]}'
        AND event_type = '{PATTERN[2]}'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MIN(ts) AS first_match_ts
    FROM hits
    GROUP BY user_id
    """,
    tags=("events",),
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern detection — MATCH_RECOGNIZE's core for
    a fixed pattern: find every user whose timeline contains
    view -> click -> purchase as ADJACENT events (the strict-
    contiguity conversion funnel; funnel_analysis answers the
    eventually-ordered version, this answers the consecutive one —
    both are standard product questions with different answers).
    Emits per-user match count and first completion time.

    Plan: the pattern window is two lag() columns over (PARTITION BY
    user_id ORDER BY ts, event_id) — per-user state only, the
    partition key is the natural shard, no global window anywhere;
    then a filter and one groupBy(user_id) with map-side combine.
    This lag-k formulation covers any fixed-length strict pattern at
    the cost of k-1 lag columns and ZERO joins/explodes — the same
    evaluation strategy Flink CEP compiles simple patterns to
    (NFA state collapses to a lookbehind when the pattern has no
    quantifiers). Kleene-star patterns need stateful iteration
    (applyInPandasWithState — see streaming/queries.py); strict
    fixed patterns should never pay that price."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type", 2).over(w).alias("e2"),
        F.lag("event_type", 1).over(w).alias("e1"),
    )
    hits = seq.filter(
        (F.col("e2") == PATTERN[0])
        & (F.col("e1") == PATTERN[1])
        & (F.col("event_type") == PATTERN[2])
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )
