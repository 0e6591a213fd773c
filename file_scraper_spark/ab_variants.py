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

Round 11 entries (round-10's containment entries deleted per the
one-round contract — their numbers live in BENCH_r10 /
BENCH_LOCAL_r10.json and NOTES.md; the round-9 JVM-levenshtein arm
retired the same way, numbers in BENCH_r09):

- ``dedup_ngram_jaccard``: the pre-rewrite form expanded the FULL
  capped posting-list upper triangle, aggregated co-occurrence
  counts per pair, and joined per-doc counts twice for the quotient;
  the live form is the symmetric PPJoin prefix filter (index each
  doc's rarest floor(n/2)+1 shingles in one global df-ascending
  canonical order, prune candidates by size/count/position, verify
  survivors with one array_intersect) — lossless at t = 1/2 by the
  prefix theorem.
- ``similarity_pairs``: the pre-rewrite form ran ONE applyInPandas
  task per label block (10 tasks total on this corpus — a
  parallelism wall at 32 cores, O(b^2 d) per task at any scale); the
  live form triangle-partitions each block into PAIR_STRIPS strips
  and computes pairs in K(K+1)/2 tasks per label.
- ``dedup_exact_substring`` (representative of the whole
  near_dup_corpus family): the pre-rewrite form ran the heavy
  shingle/minhash projections directly on the raw parquet splits
  (byte-sized and skewed — 15 of 32 cores busy at 100x); the live
  form round-robin-balances the derived corpus first
  (NEAR_DUP_BALANCE). Same-JVM at 100x: 0.33x here, 0.62x
  ngram_jaccard, 0.67x minhash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.operators import dedup, similarity
from file_scraper_spark.tables import load


def _old_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup._jaccard_pairs_triangle(spark, sf_dir)


def _old_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * similarity.PAIR_QUANT
            ).cast("long"),
        ).alias("qe"),
    )

    def block_pairs(pdf):
        return similarity._gram_pairs(pdf, similarity.PAIR_THRESHOLD)

    return q.groupBy("label").applyInPandas(
        block_pairs, "vec_a long, vec_b long, cosine double"
    )


def _old_dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the balance flag is consulted at PLAN BUILD time, so flipping it
    # around the build yields the genuine unbalanced plan
    prev = dedup.NEAR_DUP_BALANCE
    dedup.NEAR_DUP_BALANCE = False
    try:
        return dedup.dedup_exact_substring(spark, sf_dir)
    finally:
        dedup.NEAR_DUP_BALANCE = prev


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "dedup_ngram_jaccard": _old_dedup_ngram_jaccard,
    "similarity_pairs": _old_similarity_pairs,
    "dedup_exact_substring": _old_dedup_exact_substring,
}
