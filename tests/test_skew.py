"""AQE skew-join mitigation: a hot key must get its partition split
at runtime (SortMergeJoin(skew=true)) instead of one straggler task.

Needs its own SparkSession: the mitigation thresholds are sized down
so local-scale data qualifies as 'skewed'.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_scraper_spark.session import get_spark


@pytest.fixture(scope="module")
def skew_spark():
    s = get_spark(
        "skew-test",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    yield s
    # leave the session for other module-scoped users (same JVM conf)


def _skewed_join(spark):
    left = spark.range(0, 200000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left.join(right, "k").select((F.col("v") + F.col("w")).alias("x"))


def test_aqe_splits_skewed_partition(skew_spark):
    j = _skewed_join(skew_spark)
    j.collect()  # the adaptive plan exists only after execution
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan
    assert "skewed" in plan  # AQEShuffleRead coalesced and skewed


def test_skew_mitigation_blocked_by_downstream_partitioning(skew_spark):
    """Documented Spark constraint: OptimizeSkewedJoin cannot fire when
    the join output must stay hash-partitioned for a downstream
    aggregation on the same key (splitting would break the partition
    guarantee) — which is exactly when manual salting (see salted_agg)
    is still required at scale."""
    j = (
        _skewed_join.__wrapped__(skew_spark)
        if hasattr(_skewed_join, "__wrapped__")
        else _skewed_join(skew_spark)
    )
    agg = j.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    # x is derived, so this particular agg repartitions anyway; the
    # canonical blocked case is grouping by the join key itself:
    left = skew_spark.range(0, 200000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = skew_spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    g = left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    g.collect()
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan  # mitigation correctly NOT applied


def test_interval_join_hot_grid_cell_skew_split(skew_spark):
    """interval_join's grid-cell equi-join under a HOT CELL (one hour
    where a large fraction of all intervals overlap — a thundering-
    herd burst): AQE must split the skewed (day, cell) partition at
    runtime. This works for interval_join BY CONSTRUCTION: its final
    rollup groups by event_type, not by the (day, cell) join key, so
    the join output's partitioning is not reused downstream and
    OptimizeSkewedJoin is free to fire (contrast
    test_skew_mitigation_blocked_by_downstream_partitioning). The
    exactly-once first-cell attribution is partition-local arithmetic
    (both sides of a pair carry their full interval bounds on every
    cell row), so a runtime split cannot double-count — asserted via
    the exact aggregate below, same synthetic shape as the operator
    (operators/timeseries.py interval_join)."""
    spark = skew_spark
    hot = F.lit("2024-01-01 07:00:00").cast("timestamp")
    # 900k user-intervals inside ONE hour cell + 100k spread over 100
    # other hourly cells: one grid cell carries 90% of the join input
    # (sized so the hot partition's COMPRESSED shuffle bytes clear the
    # skew threshold — the constant-heavy rows compress ~20x).
    a = spark.range(0, 1_000_000).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 10 != 0, hot)
        .otherwise(
            hot + F.make_interval(hours=(F.col("id") % 100) + 1)
        )
        .alias("a_start"),
    ).select(
        "user_id",
        F.date_trunc("day", "a_start").alias("day"),
        "a_start",
        (F.col("a_start") + F.expr("INTERVAL 30 MINUTES")).alias("a_end"),
    )
    # burst windows: one per hour cell of the day(s), tiny side —
    # broadcast is disabled in this fixture so the equi-join shuffles
    b = spark.range(0, 128).select(
        F.concat(F.lit("t"), F.col("id") % 4).alias("event_type"),
        (hot + F.make_interval(hours=F.col("id") - 7)).alias("b_start"),
    ).select(
        "event_type",
        F.date_trunc("day", "b_start").alias("bday"),
        "b_start",
        (F.col("b_start") + F.expr("INTERVAL 59 MINUTES")).alias("b_end"),
    )

    def cells(df, start, end, out):
        return df.withColumn(
            out,
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col(start)),
                    F.date_trunc("hour", F.col(end)),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )

    ac = cells(a, "a_start", "a_end", "cell")
    bc = cells(b, "b_start", "b_end", "cell")
    j = ac.join(bc, (ac["day"] == bc["bday"]) & (ac["cell"] == bc["cell"]))
    first_cell = F.date_trunc("hour", F.greatest("a_start", "b_start"))
    agg = (
        j.filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            & (ac["cell"] == first_cell)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    rows = {r["event_type"]: r["n_pairs"] for r in agg.collect()}
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan
    # exactly-once under the split: every interval overlaps exactly
    # the one burst window covering its start hour, for each of the 4
    # event types that repeat per hour in b (128 windows / 4 types /
    # 24h ≈ hours 0..31 minus the 7 negative ones — every a-hour cell
    # 0..100+7 below 25 is covered; the hot hour is, by construction)
    assert sum(rows.values()) > 0
    total_expected = 0
    # brute-force oracle on the same inputs, no grid: exact pair count
    brute = (
        a.join(b, a["day"] == b["bday"])
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .count()
    )
    total_expected = brute
    assert sum(rows.values()) == total_expected
