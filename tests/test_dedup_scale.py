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
    exact_collapse,
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


def test_jaccard_posting_list_matches_bruteforce(spark, tmp_path_factory):
    """Third-implementation differential for the posting-list rewrite:
    a pure-Python brute force over the same derived corpus (distinct
    3-gram shingle sets, df<=CAP frequency cap, exact set Jaccard)
    must produce EXACTLY the registered query's pair set on a seeded
    random corpus crafted to hit the edges — docs shorter than 3 words
    (no shingles), identical docs, shared-vocab near-dups, and a
    boilerplate opener whose shingles straddle the df cap."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(120):
        if i % 17 == 0:
            text = " ".join(rng.choices(vocab, k=rng.randint(0, 2)))  # short
        else:
            # universal boilerplate opener: its shingle lands at df
            # ~113+perturbed > SHINGLE_DF_CAP=100, exercising the cap
            words = ["common", "opening", "line"]
            words += rng.choices(vocab, k=rng.randint(8, 25))
            text = " ".join(words)
        rows.append((i, text))
    d = _write_docs(spark, tmp_path_factory.mktemp("brute"), rows)

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in R["dedup_ngram_jaccard"].fn(spark, d).collect()
    }

    # brute force, independently from first principles
    def doc_words(text):
        return text.split(" ") if text else []

    corpus = {}
    for i, text in rows:
        w = doc_words(text)
        corpus[i] = w
        if i % 5 == 0:
            corpus[-(i + 1)] = w[: int(len(w) * 0.8)]
    sets = {
        i: {
            " ".join(w[j : j + 3])
            for j in range(len(w) - 2)
        }
        for i, w in corpus.items()
    }
    df = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    capped = {
        i: {sh for sh in s if df[sh] <= SHINGLE_DF_CAP}
        for i, s in sets.items()
    }
    expect = {}
    ids = sorted(capped)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(capped[a] & capped[b])
            union = len(capped[a] | capped[b])
            if union and inter / union >= 0.5:
                expect[(a, b)] = inter / union
    assert set(got) == set(expect), (
        f"extra={sorted(set(got) - set(expect))[:5]} "
        f"missing={sorted(set(expect) - set(got))[:5]}"
    )
    for p, j in expect.items():
        assert abs(got[p] - j) < 1e-12, (p, got[p], j)


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


@pytest.fixture(scope="module")
def identical_dir(spark, tmp_path_factory):
    """Degenerate corpus: 1000 byte-identical docs (the hot-band-bucket
    hazard — uncapped, every LSH band would bucket all 1000 together
    and the banded self-join would push 8 x C(1000,2) ~ 4M candidate
    rows through the distinct) plus 5 unique docs. near_dup_corpus
    additionally perturbs every id%5==0 doc, and all 200 perturbed
    copies of the identical docs are themselves identical."""
    same = " ".join(f"dup{j}" for j in range(30))
    rows = [(i, same) for i in range(1000)]
    rows += [
        (1001 + 5 * i, " ".join(f"u{i}q{j}" for j in range(30)))
        for i in range(5)
    ]
    return _write_docs(spark, tmp_path_factory.mktemp("ident"), rows)


def test_exact_collapse_skips_dup_free_corpus(spark, tmp_path_factory):
    """On a corpus with no exact duplicates the ids-only check must
    SKIP the collapse (members is None, reps is the input frame) —
    the content shuffle would be pure overhead there (100x probe:
    ~+40% on dedup_minhash)."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(50)
    ]
    d = _write_docs(spark, tmp_path_factory.mktemp("nodups"), rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    corpus = near_dup_corpus(docs)
    reps, members = exact_collapse(corpus)
    assert members is None
    assert reps is corpus


def test_exact_collapse_bounds_band_buckets(spark, identical_dir):
    """The sketch pipeline must only ever see one doc per distinct
    content: reps is ~a dozen docs, so no band bucket can exceed that
    regardless of how many exact copies exist."""
    docs = spark.read.parquet(f"{identical_dir}/documents.parquet")
    corpus = near_dup_corpus(docs)
    reps, members = exact_collapse(corpus)
    n_reps = reps.count()
    n_docs = corpus.count()
    assert n_docs == 1005 + 200  # ids 0,5,..,995 get perturbed copies
    # groups: identical-full (1000 members), identical-trunc (200),
    # 5 singleton uniques (ids 1001+5i are never %5==0) -> 7 reps
    assert n_reps <= 8, f"collapse failed: {n_reps} reps of {n_docs}"
    assert members.count() == n_docs


def test_minhash_identical_corpus_exact_output(spark, identical_dir):
    """dedup_minhash on the degenerate corpus must emit EXACTLY the
    uncapped algorithm's pairs: every intra-group pair at est 1.0 and
    every (original, truncated) cross pair — while the band join only
    processed the handful of reps."""
    df = registry.REGISTRY["dedup_minhash"].fn(spark, identical_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("est_jaccard") == 1.0).alias("n_ident"),
        F.min("est_jaccard").alias("min_est"),
    ).first()
    n_full, n_trunc = 1000, 200
    want_ident = n_full * (n_full - 1) // 2 + n_trunc * (n_trunc - 1) // 2
    assert agg.n_ident == want_ident
    # the full-vs-trunc cross pairs (true J ~ 0.79) all collide in the
    # band join and clear the 0.4 estimate: 1000 x 200 of them
    assert agg.n == want_ident + n_full * n_trunc
    assert agg.min_est >= 0.4
    # planted recall: every perturbed doc pairs with its original
    planted = df.filter(
        (F.col("doc_a") == -(F.col("doc_b") + 1))
        & (F.col("doc_b") % 5 == 0)
    ).count()
    assert planted == 200


def test_simhash_identical_corpus_intra_pairs(spark, identical_dir):
    """dedup_simhash: same collapse guard; identical docs must all
    pair at hamming 0."""
    df = registry.REGISTRY["dedup_simhash"].fn(spark, identical_dir)
    n_zero = df.filter(F.col("hamming") == 0).count()
    want_ident = 1000 * 999 // 2 + 200 * 199 // 2
    # >=: distinct contents may legitimately also collide at hamming 0
    assert n_zero >= want_ident


def _edit_pairs_python(texts: dict[int, str], prefix_only: bool):
    """Reference implementation of the edit-distance near-dup query in
    plain Python: prefix-16 blocking (optionally + the power-of-2
    length band with |delta|<=1 matching), exact Levenshtein,
    dist <= 0.25*max_len."""
    import itertools

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(texts.items()), 2):
        if ta[:16] != tb[:16]:
            continue
        if not prefix_only:
            band_a = max(len(ta), 1).bit_length()
            band_b = max(len(tb), 1).bit_length()
            if abs(band_a - band_b) > 1:
                continue
        m = max(len(ta), len(tb))
        if lev(ta, tb) <= 0.25 * m:
            out.add((ia, ib))
    return out


def test_composite_block_equals_prefix_only_property():
    """Property behind the blocking proof: because a surviving pair
    needs dist <= 25% of the longer text, its length ratio is < 2, so
    the power-of-2 band constraint (|delta band| <= 1) can never drop
    a pair the prefix-only block would keep — for ANY corpus. Checked
    on randomized corpora biased toward shared prefixes and varied
    lengths (pure Python mirror of both engines' pipeline; the Spark
    side equals the oracle by the 136-query gate)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=60).map(" ".join)
    # force prefix collisions: half the docs share a fixed opening
    shared = st.booleans()

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(doc, shared), min_size=2, max_size=12))
    def run(items):
        texts = {
            i: ("SHARED PREFIX XX " + t if s else t)
            for i, (t, s) in enumerate(items)
        }
        assert _edit_pairs_python(texts, prefix_only=False) == _edit_pairs_python(
            texts, prefix_only=True
        )

    run()


# ---- ANN recall at probe scale (VERDICT r6 #7) ----------------------
#
# dedup_band_bits grows bits per band as the corpus doubles, which
# SHRINKS per-band recall; dedup_bands compensates with more bands.
# Two pins keep that trade honest: the analytic model must hold the
# floor at every scale up to the 100 TB regime, and the measured
# planted-pair recall on a real above-base corpus (9-bit bands, 5
# bands — the first auto-scaled step) must match the model.


def test_dedup_bands_holds_recall_floor_analytically():
    """For every corpus size from fixture scale to 10^10 vectors, the
    (auto-bits, auto-bands) family keeps analytic recall at the
    reference pair strength >= the floor — and stays the pinned 4x8
    family wherever the static oracle applies (<= DEDUP_BASE_N)."""
    from file_scraper_spark.operators.similarity import (
        DEDUP_BANDS,
        DEDUP_BASE_N,
        DEDUP_RECALL_TARGET,
        DEDUP_REF_COS,
        dedup_band_bits,
        dedup_bands,
        sign_lsh_recall,
    )

    n = 1000
    while n <= 10**10:
        bits = dedup_band_bits(n)
        bands = dedup_bands(bits)
        r = sign_lsh_recall(DEDUP_REF_COS, bits, bands)
        assert r >= DEDUP_RECALL_TARGET, (n, bits, bands, r)
        if n <= DEDUP_BASE_N:
            assert (bits, bands) == (8, DEDUP_BANDS), n
        n *= 4
    # sanity on the 100 TB point specifically: still a bounded family
    assert dedup_bands(dedup_band_bits(10**10)) <= 32


@pytest.fixture(scope="module")
def big_embeddings_dir(spark, tmp_path_factory):
    """48k random 64-dim vectors — past DEDUP_BASE_N (with the +5%
    planted copies), so dedup_embedding auto-scales to 9-bit bands and
    the compensator's 5 bands. Deterministic (seeded) and written as
    the same embeddings.parquet layout the fixtures use."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 48_000
    V = rng.standard_normal((n, 64)).astype("float32")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(V)}
    )
    d = str(tmp_path_factory.mktemp("bigemb"))
    spark.createDataFrame(pdf).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    ).coalesce(4).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_embedding_dedup_recall_at_autoscaled_bands(spark, big_embeddings_dir):
    """Measured planted-pair recall on the first auto-scaled step
    (9 bits, 5 bands) must stay >= 0.9 — the empirical check that
    dedup_bands' analytic compensation (predicting ~0.96 here) holds
    on real data, not just in the formula. Every emitted pair must
    still verify above the cosine threshold (precision stays exact
    by construction — candidates are verified with exact cosine)."""
    from file_scraper_spark.operators.similarity import (
        dedup_band_bits,
        dedup_bands,
    )

    assert dedup_band_bits(48_000 * 21 // 20) == 9  # past the base step
    assert dedup_bands(9) == 5

    rows = R["dedup_embedding"].fn(spark, big_embeddings_dir).collect()
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in rows}
    assert all(c >= 0.9 for c in pairs.values())
    found = sum(1 for (a, b) in pairs if a == -(b + 1))
    n_planted = 48_000 // 20
    recall = found / n_planted
    assert recall >= 0.9, f"planted recall {recall} at 9-bit/5-band scale"


def test_band_candidates_matches_join_form(spark):
    """Differential for the posting-list band-candidate stage shared
    by minhash (and available to any banded LSH): on a crafted band
    frame covering the edges — singleton buckets (no pairs), an
    occupancy-5 bucket (full upper triangle), the same pair colliding
    in two bands (must dedupe), and unsorted arrival order — the
    output must equal both the old two-sided self-join and a
    first-principles brute force. The plan must contain NO join:
    the rewrite's entire point is one grouping exchange instead of
    shuffling the band frame twice."""
    from file_scraper_spark.operators.dedup import band_candidates

    rows = [
        # (doc_id, band, band_key): bucket (0, 10) has 5 members,
        # delivered out of order; (1, 20) repeats a (3, 7) pairing
        # that bucket (0, 10) already implies; (0, 99)/(1, 99) are
        # singletons.
        (7, 0, 10), (3, 0, 10), (11, 0, 10), (5, 0, 10), (2, 0, 10),
        (3, 1, 20), (7, 1, 20),
        (42, 0, 99), (42, 1, 99),
    ]
    bands = spark.createDataFrame(
        rows, "doc_id long, band int, band_key long"
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in band_candidates(bands, "band", "band_key").collect()
    }

    # brute force
    from collections import defaultdict
    from itertools import combinations

    buckets = defaultdict(list)
    for doc, band, key in rows:
        buckets[(band, key)].append(doc)
    expect = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            expect.add((a, b))
    assert got == expect

    # old join form
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    join_form = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    assert got == join_form

    plan = band_candidates(bands, "band", "band_key")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


def test_editdistance_sampled_is_exact_subset(spark, sf_dir):
    """dedup_editdistance_sampled must emit a TRUE SUBSET of the full
    run's pairs (same exact distances — the md5 block rule only skips
    blocks, never perturbs a computed pair), at roughly the 1/mod
    coverage the docstring claims (dual emission gives same-band
    pairs two chances, so expected coverage sits between 1/mod and
    1-(1-1/mod)^2)."""
    from file_scraper_spark.operators.dedup import (
        EDIT_BLOCK_SAMPLE_MOD,
        dedup_editdistance,
        dedup_editdistance_sampled,
    )

    full = dedup_editdistance(spark, sf_dir).collect()
    samp = dedup_editdistance_sampled(spark, sf_dir).collect()
    full_set = {(r.doc_a, r.doc_b, r.dist, r.max_len) for r in full}
    samp_set = {(r.doc_a, r.doc_b, r.dist, r.max_len) for r in samp}
    assert samp_set <= full_set, "sampled emitted a pair the full run lacks"
    lo = 1.0 / EDIT_BLOCK_SAMPLE_MOD
    hi = 1.0 - (1.0 - lo) ** 2
    cov = len(samp_set) / max(len(full_set), 1)
    # generous slack: block membership is correlated within buckets
    assert lo / 3 <= cov <= min(3 * hi, 1.0), (
        f"coverage {cov:.2f} far outside [{lo:.2f}, {hi:.2f}]"
    )
