"""Superseded implementations kept ONE round as bench A/B baselines.

This box's ambient swing is ~2x run-to-run (NOTES.md), so a
cross-round comparison of single-window absolutes can manufacture a
regression (it did, in round 6). Every real optimization in this repo
was therefore proven with SAME-JVM interleaved A/B — and this module
makes that methodology native to the bench artifact: when a round
rewrites a query, the superseded form lives here for one round, the
bench runs old/new alternately in one JVM and records min-of-reps
PAIRS in BENCH_r{N}.json (the ``ab`` section), and the next round
deletes the entry.

These baselines are BENCH-ONLY: not registered, not oracle-checked,
never imported by operators. Each must return the same result set as
the current registered query (so the A/B is apples-to-apples); the
bench asserts nothing about results — the correctness gate already
covers the live form and the pair equality was checked when the
rewrite landed.

Round 9 entry (the round's one rewrite; round-8 entries deleted per
the one-round contract — their numbers are preserved in BENCH_r08 /
BENCH_LOCAL_r8.json and NOTES.md):

- ``dedup_editdistance``: the pre-rewrite form computed the DP with
  the JVM ``levenshtein()`` expression; the live form runs the Myers
  bit-parallel kernel (O(ceil(m/64)*n) words vs O(m*n) cells) in an
  Arrow-batched pandas UDF. Landing A/B at the 100x fixture,
  same-JVM interleaved min-of-2: JVM DP 64.6s vs Myers 22.2s
  (ratio 0.34), output bit-identical at sf0.01 (135 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from file_scraper_spark.operators import dedup


def _old_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup._editdistance_pairs(
        spark, sf_dir, block_mod=None, myers=False
    )


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "dedup_editdistance": _old_dedup_editdistance,
}
