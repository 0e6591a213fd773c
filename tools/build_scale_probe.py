"""Build the Nx scale probe: replicate an sf fixture dir N times with
disjoint key ranges, so the headline bench can be re-run at 10x (or
100x) data to check every operator stays sublinear (NOTES.md §"10x
scale probe").

Replication rules (keep joins meaningful, avoid fake quadratic blowup):
- fact keys get a per-copy offset (disjoint ranges; the offset is a
  round power of ten above the observed max key);
- dims (region/nation/supplier/part) stay single-copy so foreign keys
  into them remain valid;
- documents.text gets a per-copy suffix on EVERY word — a mere prefix
  token leaves the shingle sets ~95% overlapping, planting an
  artificial N-clique of near-dups per doc, and candidate generation
  would measure that N^2 blowup instead of corpus growth;
- embeddings rotate by 7*i+3 positions per copy — norm-preserving but
  direction-decorrelating for random vectors, so ANN/near-dup load
  scales with corpus size instead of planting N-cliques.

Usage: python tools/build_scale_probe.py [src_sf_dir] [dest_dir] [N]
Defaults: /root/testdata/sf0.1 /tmp/sfX 10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

DIMS = ("region", "nation", "supplier", "part")


def _offset(con: duckdb.DuckDBPyConnection, src: str, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT MAX({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    off = 10
    while off <= mx:
        off *= 10
    return off


def build(src: str, dest: str, n: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # stream the COPY instead of buffering the whole replicated result
    # (1000x lineitem = 600M rows; order-preserving COPY held ~70 GB
    # before writing a byte — row order is semantically irrelevant to
    # every fixture consumer)
    con.execute("SET preserve_insertion_order = false")

    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dest}/{t}.parquet")

    k_order = _offset(con, src, "orders", "o_orderkey")
    k_cust = _offset(con, src, "customer", "c_custkey")
    k_event = _offset(con, src, "events", "event_id")
    k_user = _offset(con, src, "events", "user_id")
    k_doc = _offset(con, src, "documents", "doc_id")
    k_vec = _offset(con, src, "embeddings", "vec_id")

    copies = {
        "lineitem": f"""
            SELECT l_orderkey + i * {k_order} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'),
                 range(0, {n}) t(i)""",
        "orders": f"""
            SELECT o_orderkey + i * {k_order} AS o_orderkey,
                   o_custkey + i * {k_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{src}/orders.parquet'),
                 range(0, {n}) t(i)""",
        "customer": f"""
            SELECT c_custkey + i * {k_cust} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{src}/customer.parquet'),
                 range(0, {n}) t(i)""",
        "events": f"""
            SELECT event_id + i * {k_event} AS event_id, ts,
                   user_id + i * {k_user} AS user_id,
                   event_type, value, props
            FROM read_parquet('{src}/events.parquet'),
                 range(0, {n}) t(i)""",
        "documents": f"""
            SELECT doc_id + i * {k_doc} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                          list_transform(string_split(text, ' '),
                            w -> w || 'x' || i), ' ')
                   END AS text,
                   lang, source,
                   CASE WHEN i = 0 THEN n_chars ELSE len(
                     array_to_string(
                       list_transform(string_split(text, ' '),
                         w -> w || 'x' || i), ' '))
                   END AS n_chars
            FROM read_parquet('{src}/documents.parquet'),
                 range(0, {n}) t(i)""",
        "embeddings": f"""
            SELECT vec_id + i * {k_vec} AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                     list_concat(
                       embedding[(((7 * i + 3) % 60) + 2):],
                       embedding[1:(((7 * i + 3) % 60) + 1)])
                   END AS embedding,
                   label
            FROM read_parquet('{src}/embeddings.parquet'),
                 range(0, {n}) t(i)""",
    }
    for t, sql in copies.items():
        out = f"{dest}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        rows = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {rows} rows")
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfX"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dest, n)
