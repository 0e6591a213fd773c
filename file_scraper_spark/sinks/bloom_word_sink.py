"""Keyed OR-merge upsert sink for the streaming bloom bitmap.

band_index_sink's sibling for the bloom ingest gate
(operators/dedup.py::corpus_bloom_index family): the maintained bitmap
is one row per 62-bit word, and a micro-batch's contribution merges
with ``bits = bits | EXCLUDED.bits``. Bitwise OR is commutative,
associative AND idempotent — the same algebra that makes the band
index's LEAST/GREATEST merge correct under every streaming delivery
quirk at once: batch replays after failure (at-least-once
foreachBatch), cross-batch accumulation, and arrival-order
permutation. A Bloom bitmap is a union of per-key bitmaps, so the
merged table equals the batch-built bitmap bit-for-bit regardless of
how the stream was split (oracle-checked via bloom_index_merge's SQL).

Ingest paths mirror band_index_sink / merge_sink:

- ``upsert_parquet``: executors stage the micro-batch to parquet in
  parallel, ONE transaction ingests it server-side (DuckDB
  read_parquet; Postgres would COPY from the staged files);
- ``upsert_rows``: driver-batched executemany for DB-API targets
  without parquet ingest (the psql-pipe shim path).

The SQL is dialect-neutral: ON CONFLICT DO UPDATE and the bigint ``|``
operator run identically on DuckDB and Postgres, and the in-statement
``bit_or`` aggregate (both engines ship it) collapses any duplicate
words a replayed staging dir might carry before the single upsert.

Reference parity note: the reference's sink is the snapshot merge
(/root/reference/src/db.rs:92-124, ported in merge_sink.py); a bloom
bitmap is [EXT] surface reusing its transactional pattern.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

TARGET_DDL = """
CREATE TABLE IF NOT EXISTS bloom_words (
    word BIGINT NOT NULL,
    bits BIGINT NOT NULL,
    PRIMARY KEY (word)
);
"""

_UPSERT_FROM = """
INSERT INTO bloom_words (word, bits)
SELECT word, bit_or(bits) FROM {src}
GROUP BY word
ON CONFLICT (word) DO UPDATE
SET bits = bloom_words.bits | EXCLUDED.bits
"""

UPSERT_ROW_SQL = """
INSERT INTO bloom_words (word, bits)
VALUES (?, ?)
ON CONFLICT (word) DO UPDATE
SET bits = bloom_words.bits | EXCLUDED.bits
"""


class BloomWordSink:
    """Dialect-neutral OR-merge upsert target for bloom bitmap words.

    ``connect`` returns a DB-API connection (duckdb / psycopg / the
    psql shim). One micro-batch == one transaction.
    """

    def __init__(
        self,
        connect: Callable[[], Any],
        paramstyle: str = "qmark",
        batch_size: int = 1000,
    ):
        self._connect = connect
        self.paramstyle = paramstyle
        self.batch_size = batch_size

    def _sql(self, sql: str) -> str:
        return sql.replace("?", "%s") if self.paramstyle == "format" else sql

    def ensure_target(self) -> None:
        con = self._connect()
        try:
            con.execute(TARGET_DDL)
            con.commit()
        finally:
            con.close()

    def upsert_parquet(self, staging_dir: str) -> None:
        """Ingest a parquet-staged micro-batch in one transaction
        (DuckDB read_parquet; the executor-parallel path)."""
        con = self._connect()
        try:
            con.execute("BEGIN")
            con.execute(
                _UPSERT_FROM.format(
                    src="read_parquet('{}/*.parquet')".format(
                        staging_dir.replace("'", "''")
                    )
                )
            )
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    def upsert_rows(self, rows: Iterable[tuple]) -> None:
        """Driver-batched upsert (DB-API targets without parquet
        ingest; bounded memory via executemany chunks). Rows within a
        chunk are pre-merged per word — ON CONFLICT targets raise on
        two conflicting rows in one statement."""
        con = self._connect()
        sql = self._sql(UPSERT_ROW_SQL)
        try:
            con.execute("BEGIN")
            acc: dict[int, int] = {}
            for word, bits in rows:
                acc[word] = acc.get(word, 0) | bits
                if len(acc) >= self.batch_size:
                    con.executemany(sql, list(acc.items()))
                    acc = {}
            if acc:
                con.executemany(sql, list(acc.items()))
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    def word_rows(self) -> list[tuple]:
        """(word, bits) — the whole bitmap; <= m/62 rows by
        construction, the one relation small enough to list."""
        con = self._connect()
        try:
            rows = con.execute(
                "SELECT word, bits FROM bloom_words ORDER BY word"
            ).fetchall()
            # int() normalizes text-protocol targets (the psql shim
            # returns every column as a string)
            return [tuple(int(c) for c in r) for r in rows]
        finally:
            con.close()

    def export_words_parquet(self, path: str) -> bool:
        """COPY the bitmap to parquet so Spark reads it scan-parallel
        (DuckDB path); False when the target has no COPY TO PARQUET
        (caller falls back to word_rows)."""
        con = self._connect()
        try:
            con.execute(
                "COPY (SELECT word, bits FROM bloom_words) "
                "TO '{}' (FORMAT PARQUET)".format(path.replace("'", "''"))
            )
            return True
        except Exception:
            return False
        finally:
            con.close()
