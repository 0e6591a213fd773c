"""CLI entry point — UX parity with the reference binary.

Reference (src/main.rs:18-32): ``file-scraper PATH... [--identifier X]
[--verbose]`` with the sink from ``$DATABASE_URL``. Here:

    python -m file_scraper_spark PATH... [--identifier X] [--verbose]
        [--database URL|FILE.duckdb] [--streaming] [--master local[N]]

Database resolution order: --database, then $DATABASE_URL, then an
in-repo default duckdb file. postgresql:// URLs use psycopg if
installed (not in this container — clearly reported); anything else is
treated as a DuckDB path. One scrape transaction per path (A15);
failures abort the run with a nonzero exit (src/main.rs:61-65).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timezone


def make_connect(database: str) -> tuple:
    """(connection factory, DB-API paramstyle) for the sink.

    postgresql:// prefers psycopg; falls back to the driverless psql
    pipe shim (sinks/psql_shim.py) when only client binaries exist.
    """
    if database.startswith(("postgres://", "postgresql://")):
        try:
            import psycopg  # noqa: PLC0415

            return (lambda: psycopg.connect(database)), "format"
        except ImportError:
            from file_scraper_spark.sinks.psql_shim import (  # noqa: PLC0415
                PsqlConnection,
                psql_available,
            )

            if psql_available():
                return (lambda: PsqlConnection(database)), "format"
            raise SystemExit(
                "postgresql:// sink requires psycopg or the psql client, "
                "neither of which is available; use a .duckdb path"
            ) from None
    import duckdb  # noqa: PLC0415

    return (lambda: duckdb.connect(database)), "qmark"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="file_scraper_spark",
        description="Scrape file metadata from fs/S3 trees into a DB "
        "snapshot table (Spark-native).",
    )
    p.add_argument("paths", nargs="+", help="directories or s3:// URLs")
    p.add_argument(
        "--identifier",
        help="external_source identifier (default: host:path / s3 URL)",
    )
    p.add_argument(
        "--database",
        default=os.environ.get("DATABASE_URL", "file_scraper.duckdb"),
        help="DB: .duckdb path or postgresql:// URL "
        "(default: $DATABASE_URL or ./file_scraper.duckdb)",
    )
    p.add_argument(
        "--streaming",
        action="store_true",
        help="incremental micro-batched scrape (Structured Streaming)",
    )
    p.add_argument("--batch-size", type=int, default=200,
                   help="files per micro-batch in --streaming mode")
    p.add_argument("--master", default=None, help="Spark master override")
    p.add_argument(
        "--no-created-stat",
        action="store_true",
        help="skip the per-file stat that fills `created` on fs "
        "sources (halves metadata I/O; created stays NULL)",
    )
    p.add_argument("--verbose", "-v", action="store_true")
    args = p.parse_args(argv)

    # Production/batch entry point: pin the data-dependent plan
    # adaptations OFF so every plan built under the CLI is
    # data-independent — exact-dup collapse runs unconditionally (the
    # correct default on web corpora, 30-50% exact dups) and no eager
    # probe job fires during plan construction. The query registry
    # keeps "auto" (per-fixture adaptive). setdefault, so an operator
    # can still override explicitly via the environment.
    os.environ.setdefault("FSS_EXACT_COLLAPSE", "always")

    from file_scraper_spark.session import get_spark
    from file_scraper_spark.sinks.merge_sink import MergeSink

    spark = get_spark("file_scraper_spark", master=args.master)
    if args.verbose:
        spark.sparkContext.setLogLevel("INFO")
    connect, paramstyle = make_connect(args.database)
    sink = MergeSink(connect, paramstyle=paramstyle)
    scrape_time = datetime.now(timezone.utc).replace(tzinfo=None)

    try:
        if args.streaming:
            from file_scraper_spark.sources.url import parse_s3_url
            from file_scraper_spark.streaming.scrape_stream import scrape_stream

            for path in args.paths:
                # same scheme dispatch as batch mode (A14): s3 URLs
                # stream through the s3a filesystem with the s3-style
                # default identifier
                loc = parse_s3_url(path)
                if loc is not None:
                    root = f"s3a://{loc.bucket}/{loc.path}".rstrip("/")
                    ident_default = loc.url
                else:
                    root, ident_default = path, None
                ident = scrape_stream(
                    spark, root, sink,
                    identifier=args.identifier or ident_default,
                    scrape_time=scrape_time,
                    max_files_per_trigger=args.batch_size,
                )
                print(f"scraped (streaming) {path} as {ident!r}")
        else:
            from file_scraper_spark.pipeline import scrape_all

            idents = scrape_all(
                spark, args.paths, sink,
                identifier=args.identifier, scrape_time=scrape_time,
                created_from_stat=not args.no_created_stat,
            )
            for path, ident in zip(args.paths, idents):
                print(f"scraped {path} as {ident!r}")
    except Exception as e:  # fail-fast, nonzero exit (src/main.rs:61-65)
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
