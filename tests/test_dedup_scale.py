"""Scale-probe tests for the dedup blocking schemes: planted hot keys
must NOT blow up candidate generation (VERDICT r2 #1/#3).

Both tests build a crafted `documents.parquet` in a tmp dir and run
the registered queries against it — the same path the driver uses —
plus direct assertions on the blocking helpers' candidate bounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_scraper_spark import registry
from file_scraper_spark.operators.dedup import (
    EDIT_PREFIX,
    SHINGLE_DF_CAP,
    cap_hot_shingles,
    near_dup_corpus,
    shingles,
)

registry._ensure_loaded()
R = registry.REGISTRY


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def boilerplate_dir(spark, tmp_path_factory):
    """300 docs, every one opening with the same 5-word boilerplate
    ("all rights reserved by corp") -> 3 shingles with df=360 (incl.
    perturbed copies), far above SHINGLE_DF_CAP; the rest of each doc
    is unique words."""
    rows = [
        (
            i,
            "all rights reserved by corp "
            + " ".join(f"w{i}x{j}" for j in range(20)),
        )
        for i in range(300)
    ]
    return _write_docs(spark, tmp_path_factory.mktemp("boiler"), rows)


def test_hot_shingle_cap_bounds_candidates(spark, boilerplate_dir):
    """The capped inverted index must emit no df>CAP key, and the
    candidate self-join must stay near-linear in n (the uncapped index
    would emit >= C(360,2) ~ 64k pairs from the boilerplate shingle
    alone)."""
    docs = spark.read.parquet(f"{boilerplate_dir}/documents.parquet")
    sh = cap_hot_shingles(shingles(near_dup_corpus(docs)))
    max_df = (
        sh.groupBy("shingle").count().agg(F.max("count").alias("m")).first().m
    )
    assert max_df <= SHINGLE_DF_CAP
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    n_cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    # only planted (original, perturbed) pairs + boundary-shingle noise
    assert n_cand < 3 * 360, f"candidate blowup: {n_cand}"


def test_hot_shingle_cap_keeps_planted_recall(spark, boilerplate_dir):
    """Dropping boilerplate shingles must not lose the planted
    near-dups (their signal lives in the rare shingles)."""
    got = {
        (r.doc_a, r.doc_b)
        for r in R["dedup_ngram_jaccard"].fn(spark, boilerplate_dir).collect()
    }
    planted = {(-(i + 1), i) for i in range(0, 300, 5)}
    assert planted <= got, f"missing {sorted(planted - got)[:5]}"
    # and no boilerplate-only pair sneaks past the Jaccard threshold
    assert got == planted


@pytest.fixture(scope="module")
def template_dir(spark, tmp_path_factory):
    """Templated corpus for the edit-distance block: 240 docs sharing
    one 16+ char prefix, lengths geometrically spread over ~[2^6, 2^12]
    chars — a prefix-only block would be a single 240-doc bucket."""
    rows = []
    for i in range(240):
        n_words = 8 * (2 ** (i % 7))  # 8..512 words -> 64..4100 chars
        rows.append(
            (i, "TEMPLATE HEADER COMMON " + " ".join(f"t{i}u{j}" for j in range(n_words)))
        )
    return _write_docs(spark, tmp_path_factory.mktemp("tmpl"), rows)


def test_editdistance_composite_block_bounds_buckets(spark, template_dir):
    """Replicates the query's composite key on the crafted corpus and
    asserts the mega-bucket is split: max (prefix, band) bucket is a
    fraction of n, so the within-bucket DP stage is bounded."""
    docs = spark.read.parquet(f"{template_dir}/documents.parquet")
    corpus = near_dup_corpus(docs)
    texts = corpus.select("doc_id", F.array_join("words", " ").alias("text"))
    keyed = texts.select(
        F.substring("text", 1, EDIT_PREFIX).alias("blk"),
        F.length(F.bin(F.greatest(F.length("text"), F.lit(1)))).alias("band"),
    )
    n = keyed.count()
    max_bucket = (
        keyed.groupBy("blk", "band").count().agg(F.max("count").alias("m")).first().m
    )
    assert max_bucket <= n / 4, f"bucket {max_bucket} of {n} not split"


def test_editdistance_recall_across_band_boundary(spark, tmp_path_factory):
    """The dual-emission band join must keep near-dup pairs whose
    lengths straddle a power-of-2 boundary (the failure mode of
    exact-band matching): planted 80%-truncations of docs sized just
    above a boundary land one band below their original."""
    # 40 words of 12+1 chars ~ 520 chars -> band 10; 80% ~ 416 -> band 9
    rows = [
        (i, " ".join(f"word{i:04d}n{j:04d}" for j in range(40)))
        for i in range(0, 50, 5)  # all ids %5==0 -> every doc perturbed
    ]
    d = _write_docs(spark, tmp_path_factory.mktemp("band"), rows)
    got = {
        (r.doc_a, r.doc_b)
        for r in R["dedup_editdistance"].fn(spark, d).collect()
    }
    planted = {(-(i + 1), i) for i in range(0, 50, 5)}
    assert planted <= got, f"band boundary dropped {sorted(planted - got)[:5]}"
