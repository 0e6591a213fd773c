"""Merge-sink semantics against REAL Postgres (the reference's actual
target database) — same scenario matrix as the DuckDB suite, through
the psql-pipe harness. Skipped when Postgres binaries are absent."""

from __future__ import annotations

from datetime import datetime

import pytest

from file_scraper_spark.sinks.merge_sink import MergeSink
from tests.pg_harness import PgCluster, PsqlConnection, pg_available

pytestmark = pytest.mark.skipif(
    not pg_available, reason="postgres binaries not available"
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
T1 = datetime(2024, 1, 2, 12, 0, 0)
T2 = datetime(2024, 1, 3, 12, 0, 0)
SRC = "host:/data"


def row(path="d", filename="f.txt", mime="text/plain", created=T0,
        modified=T0, size=10):
    return (SRC, path, filename, mime, created, modified, size)


@pytest.fixture(scope="module")
def cluster():
    import shutil
    import tempfile
    from pathlib import Path

    # under /tmp directly: pytest's tmp dirs sit below a 0700 root dir
    # the postgres user cannot traverse
    base = Path(tempfile.mkdtemp(prefix="pgfss_", dir="/tmp"))
    c = PgCluster(base)
    c.start()
    yield c
    c.stop()
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture()
def db(cluster):
    sink = MergeSink(cluster.connect, paramstyle="format")
    admin = cluster.connect()
    admin.execute("DROP TABLE IF EXISTS external_file")
    admin.execute("DROP SEQUENCE IF EXISTS external_file_seq")
    admin.commit()
    admin.close()
    sink.ensure_target()
    return sink, cluster


def fetch(cluster):
    con = cluster.connect()
    try:
        con.execute(
            "SELECT path, filename, mime_type, size::text, "
            "deleted::text FROM external_file ORDER BY path, filename"
        )
        return con.fetchall()
    finally:
        con.close()


def test_insert_update_noop_delete_pg(db):
    sink, cluster = db
    sink.sync_rows([row(filename="a.txt"), row(filename="b.txt")], SRC, T1)
    assert len(fetch(cluster)) == 2
    sink.sync_rows(
        [row(filename="a.txt", modified=T1, size=11), row(filename="c.txt")],
        SRC, T2,
    )
    rows = {r[1]: r for r in fetch(cluster)}
    assert rows["a.txt"][3] == "11" and rows["a.txt"][4] is None
    assert rows["b.txt"][4] is not None  # soft-deleted
    assert rows["c.txt"][4] is None  # inserted


def test_noop_preserves_manual_mime_pg(db):
    sink, cluster = db
    sink.sync_rows([row(mime="application/octet-stream")], SRC, T1)
    con = cluster.connect()
    con.execute("UPDATE external_file SET mime_type = 'text/x-corrected'")
    con.commit()
    con.close()
    sink.sync_rows([row(mime="application/octet-stream")], SRC, T2)
    assert fetch(cluster)[0][2] == "text/x-corrected"
    sink.sync_rows([row(mime="application/octet-stream", size=99)], SRC, T2)
    assert fetch(cluster)[0][2] == "application/octet-stream"


def test_three_valued_null_predicate_pg(db):
    """The exact NULL cases the hypothesis model pinned on DuckDB must
    hold identically on real Postgres: size value<->NULL transitions
    with the rest equal do NOT fire the update."""
    sink, cluster = db
    sink.sync_rows([row(created=None, size=1)], SRC, T1)
    sink.sync_rows([row(created=None, size=None, mime="wrong/guess")], SRC, T2)
    r = fetch(cluster)[0]
    assert r[3] == "1" and r[2] == "text/plain"  # no update fired
    sink.sync_rows([row(created=None, size=7)], SRC, T2)  # 1 -> 7 DOES fire
    assert fetch(cluster)[0][3] == "7"


def test_deleted_restamped_pg(db):
    sink, cluster = db
    sink.sync_rows([row(filename="gone.txt")], SRC, T0)
    sink.sync_rows([], SRC, T1)
    first = fetch(cluster)[0][4]
    sink.sync_rows([], SRC, T2)
    second = fetch(cluster)[0][4]
    assert first is not None and second is not None and first != second


def test_cli_scrape_into_postgres(db, tmp_path):
    """Full reference parity: the CLI scrapes a filesystem tree into a
    real Postgres database addressed by a postgresql:// URL (psycopg
    absent -> the driverless psql fallback engages)."""
    import subprocess
    import sys

    sink, cluster = db
    tree = tmp_path / "t"
    tree.mkdir()
    (tree / "a.csv").write_text("1,2\n")
    (tree / "b.bin").write_text("x")
    r = subprocess.run(
        [sys.executable, "-m", "file_scraper_spark", str(tree),
         "--database", cluster.dsn],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    rows = {x[1]: x for x in fetch(cluster)}
    assert rows["a.csv"][2] == "text/csv"
    assert rows["b.bin"][2] is None  # unknown extension -> NULL mime
    # delete a file, re-scrape through the CLI -> soft delete lands
    (tree / "b.bin").unlink()
    r = subprocess.run(
        [sys.executable, "-m", "file_scraper_spark", str(tree),
         "--database", cluster.dsn],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert r.returncode == 0
    rows = {x[1]: x for x in fetch(cluster)}
    assert rows["b.bin"][4] is not None and rows["a.csv"][4] is None


def test_rollback_on_failure_pg(db):
    sink, cluster = db
    sink.sync_rows([row(filename="a.txt")], SRC, T0)

    def bad_rows():
        yield row(filename="b.txt")
        raise RuntimeError("source died")

    with pytest.raises(RuntimeError):
        sink.sync_rows(bad_rows(), SRC, T1)
    rows = fetch(cluster)
    assert [r[1] for r in rows] == ["a.txt"]
    assert rows[0][4] is None
