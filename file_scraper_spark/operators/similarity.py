"""Embedding similarity search ([EXT], SURVEY §2.B).

The embedding column is ``array<float>`` (dim 64). All dot products
run as JVM higher-order functions (``zip_with`` + ``aggregate``) —
per-row, no shuffle, whole-stage codegen — with addends cast to
DECIMAL(38,12) so the fold is exact and order-independent, which makes
exact-cosine results bit-identical to the DuckDB oracle (see
registry.py determinism rules).

Scale paths:
- ``similarity_topk``: brute-force scan vs one query vector — the
  correct baseline at any scale (embarrassingly parallel scan +
  TakeOrderedAndProject top-k; no shuffle of the corpus).
- ``similarity_pairs``: blocked pair generation (here: the label
  column as the block key) + exact verify — the all-pairs analog.
- ``similarity_ann_lsh``: random-hyperplane sign-LSH bucketing — the
  sublinear candidate-generation path for 100 TB corpora; buckets
  shuffle on a 16-bit key, candidates verified with exact cosine.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

DIM = 64
N_PLANES = 16
QUERY_VEC_ID = 0
PAIR_THRESHOLD = 0.25  # ~p99 of within-label cosine in the fixture
DEDUP_BANDS = 4  # LSH bands for dedup_embedding
DEDUP_BAND_BITS = 8  # sign bits per band
DEDUP_PLANES = DEDUP_BANDS * DEDUP_BAND_BITS
DEDUP_COS = 0.9  # near-dup cosine threshold


QUANT = 1_000_000_000  # 1e-9 quantization for exact integer vector math


def _dec_fold(products: Column) -> Column:
    """Exact sum of an array<double>, bit-identical across engines.

    Each addend is quantized with ``floor(x * 1e9)`` — floor of a
    double is exact (no rounding-mode ties, unlike double->decimal
    casts where a float32 that happens to be an odd multiple of 2^-s
    rounds HALF_UP in Spark but half-even in DuckDB) — and summed as
    BIGINT (exact, associative, so Spark's partial-aggregation order
    cannot perturb it). |addend| <= ~1e9 and arrays are short, so the
    sum is far from overflow. The 1e-9 quantization defines the
    operator's semantics; both engines compute the identical value.
    """
    return (
        F.aggregate(
            products,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(float(QUANT))),
        ).cast("double")
        / QUANT
    )


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two float-array columns (double result)."""
    return _dec_fold(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        _dec_fold(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID) -> Column:
    """The query vector as a literal array column (a scan parameter,
    like a CLI argument — 64 floats, not a driver-side data loop)."""
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return F.array(*[F.lit(float(v)) for v in row[0]])


# DuckDB twin of the quantized fold over unnested vector elements.
def _oracle_dec_sum(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {QUANT}) AS BIGINT)) AS DOUBLE)"
        f" / {QUANT}"
    )


@query(
    "similarity_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ), qn AS (
      SELECT sqrt({_oracle_dec_sum('CAST(x AS DOUBLE) * CAST(x AS DOUBLE)')}) AS qnorm
      FROM (SELECT unnest(qe) AS x FROM q)
    ), flat AS (
      SELECT vec_id, unnest(embedding) AS ev, unnest(qe) AS qv
      FROM embeddings, q
    ), dots AS (
      SELECT vec_id,
             {_oracle_dec_sum('CAST(ev AS DOUBLE) * CAST(qv AS DOUBLE)')} AS dp,
             sqrt({_oracle_dec_sum('CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)')}) AS nrm
      FROM flat GROUP BY vec_id
    )
    SELECT vec_id, dp / (nrm * qn.qnorm) AS cosine
    FROM dots, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 query vector.
    Plan: one scan, per-row JVM fold, TakeOrderedAndProject(10) — no
    shuffle of the corpus at any scale."""
    emb = load(spark, sf_dir, "embeddings")
    q = query_vector(spark, sf_dir)
    return (
        emb.select("vec_id", cosine(F.col("embedding"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "similarity_pairs",
    oracle=f"""
    WITH flat AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             unnest(a.embedding) AS av, unnest(b.embedding) AS bv
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ), dots AS (
      SELECT vec_a, vec_b,
             {_oracle_dec_sum('CAST(av AS DOUBLE) * CAST(bv AS DOUBLE)')} AS dp,
             sqrt({_oracle_dec_sum('CAST(av AS DOUBLE) * CAST(av AS DOUBLE)')}) AS na,
             sqrt({_oracle_dec_sum('CAST(bv AS DOUBLE) * CAST(bv AS DOUBLE)')}) AS nb
      FROM flat GROUP BY vec_a, vec_b
    )
    SELECT vec_a, vec_b, dp / (na * nb) AS cosine
    FROM dots
    WHERE dp / (na * nb) >= {PAIR_THRESHOLD}
    """,
)
def similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: blocked candidate generation (label as
    block key — an equi-join, never a cross join) + exact cosine
    verify above the threshold."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b", cosine(F.col("ea"), F.col("eb")).alias("cosine")
        )
        .filter(F.col("cosine") >= PAIR_THRESHOLD)
    )


@query(
    "embedding_centroids",
    oracle=f"""
    SELECT label, pos,
           {_oracle_dec_sum('v')} / COUNT(*) AS centroid
    FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension) — the
    aggregation shape used for IVF coarse quantizers. posexplode +
    groupBy: partial aggregation makes the shuffle labels x dims."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    return flat.groupBy("label", "pos").agg(
        (
            (F.sum(F.floor(F.col("v") * float(QUANT))).cast("double") / QUANT)
            / F.count("v")
        ).alias("centroid")
    )


@query(
    "embedding_quantize",
    oracle="""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), stats AS (
      SELECT vec_id, MIN(v) AS lo, MAX(v) AS hi FROM flat GROUP BY vec_id
    ), codes AS (
      SELECT f.vec_id,
             CAST(floor((f.v - s.lo) / (s.hi - s.lo) * 255) AS BIGINT)
               AS code
      FROM flat f JOIN stats s ON f.vec_id = s.vec_id
    )
    SELECT vec_id,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           CAST(MIN(code) AS BIGINT) AS code_min,
           CAST(MAX(code) AS BIGINT) AS code_max
    FROM codes GROUP BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-vector min/max) uint8 quantization — the 4x storage
    compression step before ANN indexing at corpus scale. Codes are
    floor((v-lo)/(hi-lo)*255): pure per-row double arithmetic + floor,
    so engine-identical; summarized per vector for a compact oracle
    result. All higher-order functions, no explode, no shuffle."""
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


def _dedup_plane(p: int) -> list[float]:
    """Hyperplane for the dedup LSH bands: component d is 40 bits of
    md5(f"{p}:{d}") mapped into [-1, 1). Unlike ``_plane`` (crc32),
    this derivation exists because DuckDB computes the identical md5 —
    the oracle re-derives the very same planes in SQL instead of
    receiving thousands of inlined literals."""
    out = []
    for d in range(DIM):
        h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:10], 16)
        out.append(h / 2.0**39 - 1.0)
    return out


@query(
    "dedup_embedding",
    oracle=f"""
    WITH planes AS (
      SELECT CAST(p AS INT) AS p, CAST(d AS INT) AS pos,
             CAST(('0x' || substring(
                 md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
                 1, 10)) AS BIGINT) / {float(2.0**39)!r} - 1.0 AS w
      FROM range(0, {DEDUP_PLANES}) t(p), range(0, {DIM}) u(d)
    ), base AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), corpus AS (
      SELECT vec_id, pos, v FROM base
      UNION ALL
      SELECT -(vec_id + 1), pos,
             CASE WHEN pos < {DIM - 4} THEN v ELSE 0.0 END
      FROM base WHERE vec_id % 20 = 0
    ), proj AS (
      SELECT c.vec_id, pl.p,
             {_oracle_dec_sum('c.v * pl.w')} AS s
      FROM corpus c JOIN planes pl ON pl.pos = c.pos
      GROUP BY c.vec_id, pl.p
    ), buckets AS (
      SELECT vec_id, p // {DEDUP_BAND_BITS} AS band,
             CAST(SUM(CASE WHEN s > 0
                      THEN (1 << (p % {DEDUP_BAND_BITS}))
                      ELSE 0 END) AS BIGINT) AS band_val
      FROM proj GROUP BY vec_id, p // {DEDUP_BAND_BITS}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
    ), flat AS (
      SELECT c.vec_a, c.vec_b, ca.v AS av, cb.v AS bv
      FROM cand c
      JOIN corpus ca ON ca.vec_id = c.vec_a
      JOIN corpus cb ON cb.vec_id = c.vec_b AND cb.pos = ca.pos
    ), dots AS (
      SELECT vec_a, vec_b,
             {_oracle_dec_sum('av * bv')} AS dp,
             sqrt({_oracle_dec_sum('av * av')}) AS na,
             sqrt({_oracle_dec_sum('bv * bv')}) AS nb
      FROM flat GROUP BY vec_a, vec_b
    )
    SELECT vec_a, vec_b, dp / (na * nb) AS cosine
    FROM dots WHERE dp / (na * nb) >= {DEDUP_COS}
    """,
    tags=("near-dup", "embedding"),
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection — the vector-space member
    of the dedup family. Blocking key is an 8-bit sign-LSH bucket
    (md5-derived hyperplanes, quantized projections), NOT the
    ground-truth label: candidates are bucket collisions only, then
    exact cosine >= 0.9 verifies. The fixture has no near-identical
    vectors, so the corpus plants deterministic near-dups (every 20th
    vector re-appears as the negative-mirror id with its last 4 dims
    zeroed — direction almost preserved, cosine ~0.97).

    Scale shape: banded LSH — 4 bands of 8 sign bits; a pair is a
    candidate if ANY band fully agrees, which lifts planted-pair
    recall from ~0.5 (one 8-bit block: each ~14-degree pair has a
    ~8% chance per plane of splitting) to ~0.95. Bucketing is one
    scan (32 JVM folds per row); the candidate join shuffles on
    (band, band_val); pairs are DISTINCT'ed as bare ids before
    verification, which re-joins vectors and norms and spends ONE dot
    fold per pair (norms precomputed per vector). Per-band bucket
    space must still grow with the corpus — size DEDUP_BAND_BITS ~
    log2(n) + c at production scale. Fully oracle-checked —
    projections, band buckets and cosines are all quantized integer
    arithmetic, and even the hyperplanes are re-derived inside DuckDB
    from the same md5."""
    emb = load(spark, sf_dir, "embeddings")
    vals = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", vals.alias("v"))
    pert = base.filter(F.col("vec_id") % 20 == 0).select(
        (-(F.col("vec_id") + 1)).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: F.when(i < DIM - 4, x).otherwise(F.lit(0.0)),
        ).alias("v"),
    )
    corpus = base.unionAll(pert)

    def band_vals(vec: Column) -> Column:
        """array of DEDUP_BANDS band values (8 sign bits each)."""
        signs = [
            F.when(
                _dec_fold(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(w) for w in _dedup_plane(p)]),
                        lambda x, w: x * w,
                    )
                )
                > 0,
                F.lit(1 << (p % DEDUP_BAND_BITS)),
            ).otherwise(F.lit(0))
            for p in range(DEDUP_PLANES)
        ]
        bands = []
        for b in range(DEDUP_BANDS):
            v = signs[b * DEDUP_BAND_BITS]
            for s in signs[b * DEDUP_BAND_BITS + 1 : (b + 1) * DEDUP_BAND_BITS]:
                v = v + s
            bands.append(v.cast("long"))
        return F.array(*bands)

    # cache(): the self-join would otherwise evaluate the 32
    # projection folds TWICE per vector (once per side), and the
    # banded frame is tiny (4 rows of 3 ints per vector).
    banded = corpus.select(
        "vec_id",
        F.posexplode(band_vals(F.col("v"))).alias("band", "band_val"),
    ).cache()
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    # Norms are precomputed per VECTOR, not per PAIR: bucket density
    # makes candidate pairs superlinear in corpus size, so the
    # per-pair work must be the single dot fold. Same quantized
    # values as the oracle's per-pair norms — identical fold inputs.
    withnorm = corpus.select(
        "vec_id", "v", norm(F.col("v")).alias("nrm")
    ).cache()
    a = withnorm.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = withnorm.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= DEDUP_COS)
    )


def _plane(seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is a
    zlib.crc32-seeded value in [-1, 1) — stable across runs/machines
    (no RNG state, no numpy version dependence)."""
    out = []
    for d in range(DIM):
        h = zlib.crc32(struct.pack("<II", seed, d))
        out.append((h / 2**31) - 1.0)
    return out


@query("similarity_ann_ivf", tags=("ann", "ivf"))
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization: the per-label
    centroids act as the coarse codebook; every vector is assigned to
    its nearest centroid cell; the query probes its 3 nearest cells and
    re-ranks candidates with exact cosine. Rows-only (recall vs the
    exact top-k asserted in tests).

    Scale shape: centroid table is tiny (cells x dims) and broadcast;
    assignment is one scan; a probe touches nprobe/ncells of the
    corpus — the standard sublinear trade."""
    emb = load(spark, sf_dir, "embeddings")
    cents = embedding_centroids(spark, sf_dir).collect()  # tiny codebook
    by_label: dict[int, list[float]] = {}
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * DIM)[r["pos"]] = r["centroid"]
    labels = sorted(by_label)

    def cell_of(vec: Column) -> Column:
        # nearest centroid by dot-product distance argmax (centroids
        # are near-normalized here; ties broken by lowest label)
        dots = [
            dot(vec, F.array(*[F.lit(v) for v in by_label[lab]]))
            for lab in labels
        ]
        best = F.greatest(*dots)
        out = F.lit(labels[-1])
        for lab, d in zip(reversed(labels), reversed(dots)):
            out = F.when(d >= best, F.lit(lab)).otherwise(out)
        return out

    assigned = emb.select("vec_id", "embedding", cell_of(F.col("embedding")).alias("cell"))
    # one driver-side fetch serves both the literal query column and
    # the codebook probe selection
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    )
    qv = [float(x) for x in qrow[0]]
    q_vec = F.array(*[F.lit(v) for v in qv])

    def pydot(a, b):
        return sum(x * y for x, y in zip(a, b))

    probe = sorted(
        labels, key=lambda lab: -pydot(qv, by_label[lab])
    )[:3]
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select("vec_id", cosine(F.col("embedding"), q_vec).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query("similarity_ann_lsh", tags=("ann", "lsh"))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane sign-LSH (rows-only; the scale path).
    16 sign bits -> 16-bit bucket; query probes its own bucket and all
    Hamming<=1 neighbors; candidates re-ranked by exact cosine.
    Recall vs the exact top-10 is asserted structurally in tests."""
    emb = load(spark, sf_dir, "embeddings")
    planes = [_plane(p) for p in range(N_PLANES)]

    def bucket_of(vec: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(v) for v in planes[p]]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(N_PLANES)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    bucketed = emb.select("vec_id", "embedding", bucket_of(F.col("embedding")).alias("bucket"))
    q_row = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    q_bucket = q_row["bucket"]
    probe = [q_bucket] + [q_bucket ^ (1 << p) for p in range(N_PLANES)]
    q = query_vector(spark, sf_dir)
    return (
        bucketed.filter(F.col("bucket").isin(probe))
        .select("vec_id", cosine(F.col("embedding"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
