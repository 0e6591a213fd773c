"""Source dispatch (reference A14, src/worker.rs + src/main.rs:72-81):
try the S3 interpretation of the path first, fall back to filesystem.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from file_scraper_spark.sources.url import (
    default_fs_identifier,
    parse_s3_url,
)


@dataclass(frozen=True)
class Source:
    kind: str  # 's3' | 'fs'
    identifier: str
    scrape: Callable[[SparkSession], DataFrame]


def source_for_path(
    path: str,
    identifier: str | None = None,
    created_from_stat: bool = True,
) -> Source:
    """Scheme-sniff a CLI path into a Source (s3 first, fs fallback).

    ``created_from_stat`` applies only to fs sources (S3 has no create
    time — src/s3.rs:123): False skips the per-file stat enrichment
    and leaves `created` NULL (see sources/fs.py)."""
    loc = parse_s3_url(path)
    if loc is not None:
        from file_scraper_spark.sources.s3 import scrape_s3  # noqa: PLC0415

        ident = identifier or loc.url
        return Source(
            kind="s3",
            identifier=ident,
            scrape=lambda spark: scrape_s3(spark, loc, ident),
        )
    from file_scraper_spark.sources.fs import scrape_fs  # noqa: PLC0415

    ident = identifier or default_fs_identifier(path)
    return Source(
        kind="fs",
        identifier=ident,
        scrape=lambda spark: scrape_fs(
            spark, path, ident, created_from_stat=created_from_stat
        ),
    )
