"""CLI regression tests (subprocess — the real user surface)."""

from __future__ import annotations

import subprocess
import sys


def run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "file_scraper_spark", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


def test_cli_no_args_usage():
    r = run_cli()
    assert r.returncode == 2
    assert "usage:" in r.stderr


def test_cli_scrape_and_rescrape(tmp_path):
    tree = tmp_path / "t"
    tree.mkdir()
    (tree / "a.txt").write_text("x")
    db = str(tmp_path / "c.duckdb")
    r = run_cli(str(tree), "--database", db)
    assert r.returncode == 0 and "scraped" in r.stdout
    (tree / "a.txt").unlink()
    r = run_cli(str(tree), "--database", db)
    assert r.returncode == 0
    import duckdb

    con = duckdb.connect(db)
    deleted = con.execute(
        "SELECT deleted IS NOT NULL FROM external_file"
    ).fetchone()[0]
    con.close()
    assert deleted


def test_cli_missing_path_exit_code(tmp_path):
    r = run_cli("/nonexistent-dir-xyz", "--database", str(tmp_path / "d.duckdb"))
    assert r.returncode == 1
    assert "error:" in r.stderr


def test_cli_created_stat_toggle(tmp_path):
    """Default run records a stat-derived created; --no-created-stat
    leaves it NULL (the cheap listing-only mode)."""
    import duckdb

    tree = tmp_path / "t2"
    tree.mkdir()
    (tree / "a.txt").write_text("x")

    db1 = str(tmp_path / "with.duckdb")
    assert run_cli(str(tree), "--database", db1).returncode == 0
    con = duckdb.connect(db1)
    assert con.execute(
        "SELECT created IS NOT NULL FROM external_file"
    ).fetchone()[0]
    con.close()

    db2 = str(tmp_path / "without.duckdb")
    assert (
        run_cli(str(tree), "--database", db2, "--no-created-stat").returncode
        == 0
    )
    con = duckdb.connect(db2)
    assert con.execute(
        "SELECT created IS NULL FROM external_file"
    ).fetchone()[0]
    con.close()
