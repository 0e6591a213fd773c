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

Round 12 entries (round-11's three arms — the pre-PPJoin jaccard
triangle, the block-task similarity_pairs, the unbalanced
dedup_exact_substring — deleted per the one-round contract along with
dedup._jaccard_pairs_triangle and the ``NEAR_DUP_BALANCE=False``
escape hatch; their numbers live in BENCH_r11 / BENCH_LOCAL_r11.json
and NOTES.md):

- ``dedup_clusters``: the pre-rewrite propagation loop ran plain
  min-label propagation (one join+groupBy per round, rounds bounded
  by component DIAMETER) and rebuilt the shared jaccard edge list
  from scratch on every cold consumer; the live form runs
  two-phase star contraction (large-star/small-star, O(log n)
  rounds) over an edge list the trio shares via the disk spill tier.
  The baseline here pins ONLY the propagation-loop change: both arms
  read the same memoized edge list inside one JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from file_scraper_spark.operators import dedup


def _old_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = dedup.jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return dedup._propagate_clusters_minlabel(spark, sf_dir, edges)


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "dedup_clusters": _old_dedup_clusters,
}
