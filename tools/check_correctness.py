"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark at the given sf_dir, runs its
DuckDB oracle on the same parquet, and compares:
  - row count
  - schema (sorted column names + normalized dtypes)
  - order-insensitive value hash (rows canonicalized, sorted, hashed)

Stricter than any plausible driver: values are compared *bit-exactly*
(doubles via repr, timestamps via ISO string). If this passes, any
reasonable tolerance-based driver comparison also passes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from file_scraper_spark import registry
from file_scraper_spark.session import get_spark
from file_scraper_spark.tables import ORACLE_SF_DIR, TABLE_NAMES, table_path

#: Queries whose STATIC oracle bakes the 8-bit LSH band family that
#: the Spark side auto-scales away above DEDUP_BASE_N vectors
#: (operators/similarity.dedup_band_bits). Comparing them against a
#: bigger fixture would hash-mismatch BY DESIGN; fail loudly with the
#: real reason instead.
_STATIC_BAND_QUERIES = ("dedup_embedding", "knn_join")


def _guard_static_band_oracle(spark, sf_dir: str, name: str) -> None:
    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        DEDUP_BASE_N,
    )
    from file_scraper_spark.tables import load  # noqa: PLC0415

    # the widest corpus either query derives (dedup_embedding mirrors
    # ~5% of vectors: emb.count() * 21 // 20)
    n = load(spark, sf_dir, "embeddings").count() * 21 // 20
    if n > DEDUP_BASE_N:
        raise AssertionError(
            f"{name}: fixture corpus ~{n} vectors exceeds DEDUP_BASE_N="
            f"{DEDUP_BASE_N}; the Spark plan auto-scales its LSH band "
            "bits there, so the pinned 8-bit oracle no longer describes "
            "it — any hash mismatch would be this, not a logic bug. "
            "Gate this query at a fixture <= DEDUP_BASE_N vectors."
        )


def _canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def duckdb_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ORACLE_SF_DIR
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    registry._ensure_loaded()
    failures = []
    attempted = 0
    for name, spec in sorted(registry.REGISTRY.items()):
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            if name in _STATIC_BAND_QUERIES:
                _guard_static_band_oracle(spark, sf_dir, name)
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(
                f"ok   {name}: rows-only, {len(s_rows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            # A few oracles (scrape_fs, python_datasource,
            # pylisting_stream) glob() the fixture directory by literal
            # path, derived from tables.ORACLE_SF_DIR (driver oracles
            # cannot receive sf_dir). Locally, retarget the same
            # constant at the directory under test so a run against
            # another fixture compares the right tree.
            osql = spec.oracle.replace(ORACLE_SF_DIR, sf_dir)
            d_cols, d_rows = duckdb_run(sf_dir, osql)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            ok = False
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            ok = False
        if ok:
            sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if sh != dh:
                ok = False
                print(f"FAIL {name}: value hash spark={sh} duckdb={dh}")
                sc = canonical_rows(s_cols, s_rows)
                dc = canonical_rows(d_cols, d_rows)
                shown = 0
                for a, b in zip(sc, dc):
                    if a != b and shown < 3:
                        print(f"  spark : {a[:200]}")
                        print(f"  duckdb: {b[:200]}")
                        shown += 1
        if ok:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time() - t0:.1f}s)")
        else:
            failures.append(name)
    print(
        f"\n{attempted - len(failures)}/{attempted} pass"
        + (f"; FAILURES: {sorted(failures)}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
