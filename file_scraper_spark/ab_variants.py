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

Round 12 also carries three DRIFT ANCHORS (agg_groupby, join_family,
window_rank — VERDICT r11 task #4): the sf0.1 single-window headline
drifted UP three rounds running (r9 15.44 → r10 18.20 → r11 20.41),
each step inside the documented ~2x ambient swing but now trend-shaped.
These arms execute the UNTOUCHED r11 tree's registered form of each
query (loaded from a `git archive bd92284` snapshot via an isolated
sys.modules swap — relational.py is byte-identical between the trees,
verified by `git diff bd92284..HEAD`), interleaved same-JVM against
the r12 tree. Expected ratio ~1.0: that CONFIRMS the drift is ambient
box noise, any other ratio localizes a real regression to tree code
rather than load. Skipped silently when the snapshot dir is absent
(another machine / cleaned tmp).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from file_scraper_spark.operators import dedup

#: `git archive bd92284 | tar -x -C /tmp/r11tree` (round-11 tip)
R11_TREE = "/tmp/r11tree"


def _old_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = dedup.jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return dedup._propagate_clusters_minlabel(spark, sf_dir, edges)


#: the r11 snapshot's registry, imported ONCE on first use via an
#: isolated sys.modules swap. The swap is only needed during IMPORT
#: (so the snapshot's intra-package imports resolve to snapshot
#: modules, not the live tree's cached ones); the captured query
#: functions keep their own module globals afterwards, so calling
#: them needs no further swapping. Caching matters for measurement
#: honesty: a per-call import of the whole 183-query package inside
#: the timed region biased the first drift capture to 0.78-0.87x on
#: BYTE-IDENTICAL code — pure import cost, not execution.
_R11_REGISTRY: dict = {}


def _r11_registry() -> dict:
    if _R11_REGISTRY:
        return _R11_REGISTRY
    import importlib  # noqa: PLC0415
    import sys  # noqa: PLC0415

    saved = {
        k: v
        for k, v in sys.modules.items()
        if k.startswith("file_scraper_spark")
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, R11_TREE)
    try:
        reg = importlib.import_module("file_scraper_spark.registry")
        reg._ensure_loaded()
        _R11_REGISTRY.update(reg.REGISTRY)
    finally:
        sys.path.remove(R11_TREE)
        for k in list(sys.modules):
            if k.startswith("file_scraper_spark"):
                del sys.modules[k]
        sys.modules.update(saved)
    return _R11_REGISTRY


def _r11_tree_fn(name: str):
    """Callable running ``name``'s REGISTERED r11-tree implementation
    (plan building only — these three queries are pure JVM plans, no
    pandas_udf closures pinning Python modules)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _r11_registry()[name].fn(spark, sf_dir)

    return run


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "dedup_clusters": _old_dedup_clusters,
}

if os.path.isdir(R11_TREE):
    for _n in ("agg_groupby", "join_family", "window_rank"):
        AB_BASELINES[_n] = _r11_tree_fn(_n)
