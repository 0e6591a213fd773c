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

Round 8 entries (rewrites this round):

- ``text_heavy_hitters``: the pre-rewrite exact twin ranked the FULL
  vocabulary through an unpartitioned row_number window (single
  partition); the live form takes top-20 via TakeOrderedAndProject
  + a broadcast peer-count rank (text.py).
- ``dedup_editdistance``: the pre-rewrite candidate stage had no
  length-gap prune, so every same-block pair paid both text rejoins
  and the DP; the live form drops |len gap| > threshold pairs at the
  bare-id candidate stage (2x at the 100x probe, lossless).

- ``embedding_quantize``: the pre-rewrite single-expression form let
  Catalyst inline array_min/array_max INTO the per-element code
  lambda (O(d^2) per row — 99.4s at 100x, the engine's slowest op);
  the live form stages lo/hi and codes as their own projections so
  every array pass is O(d) (1.5s at 100x, bit-identical).
- ``agg_approx_distinct``: the pre-rewrite fused .agg made the HLL
  partial buffer (~1.6k longs at rsd=0.01) ride the per-(type, user)
  distinct pre-aggregation (50.9s at 100x); the live form computes
  the sketch and its exact twin as separate aggregations joined on
  the 5-row key (2.3s at 100x, bit-identical).

(The round's other perf changes — the jaccard edge-list session memo
and the minhash sigs checkpoint->cache move — are cross-QUERY effects
a single-query A/B cannot express; their numbers live in NOTES.md.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.operators import dedup
from file_scraper_spark.tables import load


def _old_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    sk = (
        toks.select(F.expr("approx_top_k(tok, 100, 4096)").alias("top"))
        .select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("tok"),
            F.col("e.count").alias("est_count"),
        )
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "tok", "cnt", F.row_number().over(w).cast("long").alias("rnk")
        )
        .filter(F.col("rnk") <= 20)
    )
    return (
        exact.join(sk, "tok", "left")
        .select(
            "tok",
            "cnt",
            "rnk",
            (
                F.col("est_count").isNotNull()
                & (F.col("est_count") == F.col("cnt"))
            ).alias("sk_ok"),
        )
        .orderBy("rnk")
    )


def _old_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    corpus = dedup.near_dup_corpus(docs)
    texts = corpus.select("doc_id", F.array_join("words", " ").alias("text"))
    band = F.length(F.bin(F.greatest(F.length("text"), F.lit(1))))
    blocked = texts.select(
        "doc_id",
        "text",
        F.substring("text", 1, dedup.EDIT_PREFIX).alias("blk"),
        band.alias("band"),
    )
    keyed = blocked.select(
        "doc_id",
        "blk",
        F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("jb"),
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), "blk", "jb")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "blk", "jb")
    ids = (
        a.join(b, ["blk", "jb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand = ids.join(
        texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
        "doc_a",
    ).join(
        texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
        "doc_b",
    )
    max_len = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    dist = F.levenshtein("ta", "tb").cast("long")
    return cand.select(
        "doc_a",
        "doc_b",
        dist.alias("dist"),
        max_len.alias("max_len"),
    ).filter(F.col("dist") <= dedup.EDIT_REL_DIST * F.col("max_len"))


def _old_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    lo, hi = F.array_min(v), F.array_max(v)
    codes = F.transform(v, lambda x: F.floor((x - lo) / (hi - lo) * 255))
    return emb.select(
        "vec_id",
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("code_sum"),
        F.array_min(codes).alias("code_min"),
        F.array_max(codes).alias("code_max"),
    )


def _old_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    est = F.approx_count_distinct("user_id", 0.01)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(est - exact)
            <= F.greatest(F.lit(2.0), F.lit(4 * 0.01) * exact)
        ).alias("est_ok"),
    )


#: query name -> superseded callable. Empty the round after the
#: rewrite ships (the bench emits no ``ab`` section then).
AB_BASELINES = {
    "text_heavy_hitters": _old_text_heavy_hitters,
    "dedup_editdistance": _old_dedup_editdistance,
    "embedding_quantize": _old_embedding_quantize,
    "agg_approx_distinct": _old_agg_approx_distinct,
}
