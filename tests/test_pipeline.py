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
