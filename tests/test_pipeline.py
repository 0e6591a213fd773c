from __future__ import annotations

from datetime import datetime

import duckdb

from file_scraper_spark.pipeline import scrape_all
from file_scraper_spark.sinks.merge_sink import MergeSink


def test_scrape_all_fs(tmp_path, spark, sf_dir):
    db_path = str(tmp_path / "pipe.duckdb")
    sink = MergeSink(lambda: duckdb.connect(db_path))
    idents = scrape_all(
        spark, [sf_dir], sink, scrape_time=datetime(2024, 1, 5)
    )
    assert len(idents) == 1 and idents[0].endswith(sf_dir)
    con = duckdb.connect(db_path)
    n, deleted = con.execute(
        "SELECT COUNT(*), COUNT(deleted) FROM external_file"
    ).fetchone()
    con.close()
    assert n == 10 and deleted == 0


def test_compact_parquet(spark, sf_dir, tmp_path):
    from file_scraper_spark.pipeline import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(50).write.parquet(src)
    import os
    n_small = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_small == 50
    n_out = compact_parquet(spark, src, dst, target_file_mb=512)
    assert n_out == 1  # sf0.001 orders ≪ 512 MB
    assert spark.read.parquet(dst).count() == orders.count()


def test_observe_metrics(spark, sf_dir):
    """df.observe attaches accumulator-style metrics to a plan — the
    zero-cost way to get row counts / quality tallies out of a 100 TB
    write job without a second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("scan_metrics")
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("o_totalprice") > 100000).cast("long")).alias("n_big"),
        )
        .filter(F.col("o_orderstatus") == "F")
    )
    n_f = df.count()
    got = obs.get
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert got["n_rows"] == total  # observed BEFORE the filter
    assert 0 < n_f < total
    assert got["n_big"] >= 0


def test_shuffle_shards_autoscale():
    """Shard count is 8 at fixture scale, doubles per corpus doubling
    above 2^20 docs, and bounds rows-per-shard at every scale — the
    guard against the fixed-8-shard single-task-sort ceiling."""
    from file_scraper_spark.operators.pipeline_ops import (
        SHUFFLE_BASE_N,
        SHUFFLE_BASE_SHARDS,
        shuffle_shards,
    )

    assert shuffle_shards(0) == SHUFFLE_BASE_SHARDS
    assert shuffle_shards(5_000) == SHUFFLE_BASE_SHARDS
    assert shuffle_shards(SHUFFLE_BASE_N) == SHUFFLE_BASE_SHARDS
    assert shuffle_shards(SHUFFLE_BASE_N + 1) == 2 * SHUFFLE_BASE_SHARDS
    assert shuffle_shards(4 * SHUFFLE_BASE_N) == 4 * SHUFFLE_BASE_SHARDS
    # 100 TB regime: ~10^10 docs -> ~131k shards of ~76k rows each
    big = shuffle_shards(10_000_000_000)
    assert big == 131072
    # monotone and rows/shard bounded by ~2x the base shard size
    prev = 0
    for n in (1, 10**6, 10**7, 10**8, 10**9, 10**10, 10**11):
        s = shuffle_shards(n)
        assert s >= prev
        prev = s
        assert n / s <= 2 * (SHUFFLE_BASE_N / SHUFFLE_BASE_SHARDS)


def test_corpus_shuffle_shard_count_grows(spark):
    """Above SHUFFLE_BASE_N the plan really fans out to more than the
    base 8 shards (forced via the n_docs override so the test does not
    need a 2^20-row fixture), positions stay dense per shard, and the
    window exchange partitions on the shard key."""
    from pyspark.sql import functions as F

    from file_scraper_spark.operators.pipeline_ops import (
        SHUFFLE_BASE_N,
        corpus_shuffle_frame,
    )

    docs = spark.range(4000).select(
        F.col("id").cast("string").alias("doc_id")
    )
    out = corpus_shuffle_frame(docs, n_docs=8 * SHUFFLE_BASE_N)
    rows = out.collect()
    shards = {r["shard"] for r in rows}
    assert len(shards) > 8  # fanned out past the old fixed ceiling
    assert max(shards) < 64 and min(shards) >= 0  # 8 * 2^3 shards
    # per-shard positions are dense 1..k
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # determinism: re-run is bit-identical
    again = corpus_shuffle_frame(docs, n_docs=8 * SHUFFLE_BASE_N).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    # plan: the only exchange for the window hash-partitions on shard
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan
