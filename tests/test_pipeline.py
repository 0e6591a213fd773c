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
