"""Incremental (streaming) scrape — the reference's micro-batched walk
(A5) mapped onto Structured Streaming.

``scrape_stream`` reads the directory tree as a file stream, projects
FileInfo rows per micro-batch, and folds every batch into ONE open
sink transaction via foreachBatch; after the stream drains, the
soft-delete anti-join runs and the transaction commits — the same
one-visible-snapshot guarantee as the batch path (A15), with batches
flowing through incrementally like the reference's chunks_timeout
pipeline (src/fs.rs:98-117).

foreachBatch executes on the driver, so all batches share the sink
connection; per-batch row extraction streams partition-at-a-time
(toLocalIterator) to keep driver memory bounded.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.sinks.merge_sink import FILE_COLUMNS, MergeSink
from file_scraper_spark.sources.fs import project_listing
from file_scraper_spark.sources.url import default_fs_identifier


def scrape_stream(
    spark: SparkSession,
    root: str,
    sink: MergeSink,
    identifier: str | None = None,
    scrape_time: datetime | None = None,
    max_files_per_trigger: int = 200,
) -> str:
    """One streaming scrape of ``root``; returns the identifier.

    ``max_files_per_trigger`` plays the reference's batch-size knob
    (200 entries, src/fs.rs:100).
    """
    identifier = identifier or default_fs_identifier(root)
    scrape_time = scrape_time or datetime.now(timezone.utc).replace(tzinfo=None)
    sink.ensure_target()

    try:
        listed = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(root)
            .select("path", "modificationTime", "length")  # content pruned
        )
    except Exception as e:
        from file_scraper_spark.sources.s3 import (  # noqa: PLC0415
            raise_translated_s3a_error,
        )

        raise_translated_s3a_error(e)
    found = project_listing(listed, spark, identifier)
    _fold_stream_into_sink(
        found, sink, identifier, scrape_time, available_now=True
    )
    return identifier


def _fold_stream_into_sink(
    found: DataFrame,
    sink: MergeSink,
    identifier: str,
    scrape_time: datetime,
    available_now: bool,
) -> None:
    """Fold every micro-batch of ``found`` (FileInfo rows) into ONE
    open sink transaction; commit only after the stream drains, abort
    on any failure — the one-visible-snapshot guarantee (A15) shared
    by every streaming scrape source.

    ``available_now=True`` uses trigger(availableNow) (file sources);
    ``False`` drives with processAllAvailable + stop — the pattern
    the Python DataSource stream reader needs (its mtime-watermark
    source is unbounded, so availableNow semantics don't apply)."""
    session = sink.open_scrape(identifier, scrape_time)

    def merge_batch(batch_df: DataFrame, _epoch: int) -> None:
        session.add_rows(
            tuple(r) for r in batch_df.select(*FILE_COLUMNS).toLocalIterator()
        )

    writer = found.writeStream.foreachBatch(merge_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    try:
        if available_now:
            q.awaitTermination()
        else:
            q.processAllAvailable()
            q.stop()
        session.finalize()
    except Exception:
        q.stop()
        session.abort()
        raise
    finally:
        session.con.close()


def scrape_stream_pylisting(
    spark: SparkSession,
    root: str,
    sink: MergeSink,
    identifier: str | None = None,
    scrape_time: datetime | None = None,
    pattern: str = "*",
) -> str:
    """Streaming scrape through the Python DataSource listing
    (sources/pyds.py: executor-side recursive walk + stat, the
    reference walk as a first-class source) instead of the JVM
    binaryFile stream — same FileInfo projection, same one-
    transaction merge semantics as ``scrape_stream``.

    The pyds row schema has no created/mime columns; mime joins from
    the broadcast extension table (with_mime_type) and created stays
    NULL (callers wanting it layer ``sources.fs.enrich_created``)."""
    from file_scraper_spark.sources import pyds  # noqa: PLC0415
    from file_scraper_spark.sources.mime import with_mime_type  # noqa: PLC0415

    identifier = identifier or default_fs_identifier(root)
    scrape_time = scrape_time or datetime.now(timezone.utc).replace(tzinfo=None)
    sink.ensure_target()

    pyds.register_stream(spark)
    listed = (
        spark.readStream.format("pylisting_stream")
        .option("path", root)
        .option("pattern", pattern)
        .load()
    )
    found = with_mime_type(
        listed.select(
            F.lit(identifier).alias("external_source"),
            "path",
            "filename",
            F.lit(None).cast("timestamp").alias("created"),
            "modified",
            F.col("size").cast("long").alias("size"),
        ),
        spark,
    ).select(*FILE_COLUMNS)
    _fold_stream_into_sink(
        found, sink, identifier, scrape_time, available_now=False
    )
    return identifier
