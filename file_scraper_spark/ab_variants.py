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

Round 10 entries (round-9's dedup_editdistance entry deleted per the
one-round contract — its numbers live in BENCH_r09 /
BENCH_LOCAL_r9.json and NOTES.md):

- ``dedup_containment`` / ``dedup_containment_sampled``: the
  pre-rewrite form expanded the FULL capped posting-list upper
  triangle and aggregated co-occurrence counts per pair; the live
  form is the pigeonhole prefix-filtered inverted index (index each
  doc's rarest ~(1-t) shingles, probe with all, verify candidates
  with one array_intersect) — lossless at t = 0.9 by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from file_scraper_spark.operators import dedup


def _old_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup._containment_pairs_triangle(spark, sf_dir, sample_mod=None)


def _old_dedup_containment_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return dedup._containment_pairs_triangle(
        spark, sf_dir, sample_mod=dedup.SHINGLE_SAMPLE_MOD
    )


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "dedup_containment": _old_dedup_containment,
    "dedup_containment_sampled": _old_dedup_containment_sampled,
}
