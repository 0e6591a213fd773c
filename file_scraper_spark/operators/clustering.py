"""Embedding clustering: Lloyd's k-means and product quantization.

Why this engine needs them: semantic corpus curation at 100 TB runs on
cluster structure — SemDeDup prunes within k-means cells, DSIR and
cluster-balanced sampling weight by cell occupancy, and every
billion-vector ANN index (IVF, IVFPQ) is a trained coarse quantizer
plus a product-quantized residual store.  ``similarity_ann_ivf``
(operators/similarity.py) consumes a per-label centroid table as its
coarse codebook; this module supplies the TRAINED alternative
(``kmeans_lloyd``) and the compressed storage layer (``embedding_pq``).

Third iterative-algorithm class after star-contraction connected
components (operators/dedup.py) and damped PageRank
(operators/graph.py).  Same fixed-point discipline as both: every
quantity a BIGINT (components quantized at ``KM_Q``), distances exact
integer sums of squares, division spelled ``div`` / ``//`` (truncating
integer division — engine-identical in Spark and DuckDB, including on
negative sums, unlike round() or double folds), ties broken by the
smaller cluster id — so the K-round unrolled DuckDB oracle replays the
EXACT computation and the driver's value-hash gate is meaningful.

Execution choice — Arrow numpy kernels, found the hard way: the first
cut spelled distances as zip_with+aggregate folds (higher-order
functions are CodegenFallback: interpreted per element, ~4 ms/row =
an 800 s encode at 100x), the second unrolled them into flat scalar
(a-b)*(a-b) chains, which Janino then FAILED to compile (128 chains x
8 terms in one projection blew the generated-method limits) — falling
back to interpreted eval of the same giant tree.  Dense vector
arithmetic belongs in the same lane as the LSH band signatures and the
Gramian (operators/similarity.py): vectorized int64 numpy inside
Arrow-batched mapInPandas.  Exactness is unaffected — numpy int64
subtract/multiply/sum are the same integers Catalyst or DuckDB would
produce, and np.argmin's first-occurrence tie rule IS the (dist, k)
order — and the kernels run ~100x faster than either expression form
(NOTES.md has the A/B).

Scale shape (the MLlib-KMeans / FAISS-IVFPQ production loop):
centroids are a k*d-cell control-plane frame (8*64 = 512 BIGINTs
here, <= a few MB for any real k*d) collected to the driver once per
round and shipped back inside the kernel closure, so ASSIGNMENT is a
pure per-batch map over one scan — no join, no shuffle.  The centroid
UPDATE is pre-aggregated INSIDE the kernel (each Arrow batch emits at
most k*d partial-sum rows), so the one exchange per round carries
~k*d rows per batch regardless of corpus size.  Per-round cost at
100 TB = one corpus scan + one k*d-row shuffle, the optimum for exact
Lloyd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

#: fixed-point scale for embedding components. |v| < 1 in the fixture
#: corpus (TESTDATA.md), but the arithmetic is sized for |v| <= 8:
#: q <= 8e5, per-dim squared diff <= 2.56e12, per-vector distance
#: <= 1.64e14, so a cluster's inertia stays under 2^63 up to ~56M
#: members. Raising KM_Q to 1e6 would cut that headroom to ~560k
#: members; this is the documented ceiling.
KM_Q = 10**5

KM_K = 8  #: cluster count; seeds = vec_id 0..KM_K-1 (deterministic).
KM_ROUNDS = 3  #: fixed Lloyd rounds — part of the query definition.

PQ_M = 8  #: product-quantization subspaces (64 dims -> 8 x 8).
PQ_SUBD = 8  #: dims per subspace.
PQ_K = 16  #: codewords per subspace; seeded from vec_id 0..15.


def _quantize_np(vecs):
    """float32 vectors -> int64 grid, floor(v * KM_Q): float->double
    widening is exact and double multiply + floor are the same IEEE
    ops in every engine (the QUANT rule of operators/similarity.py),
    so the grid is identical in numpy, Catalyst, and DuckDB."""
    import numpy as np  # noqa: PLC0415

    return np.floor(
        np.array(list(vecs), dtype=np.float64) * float(KM_Q)
    ).astype(np.int64)


_FLAT_SQL = f"""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {KM_Q}) AS BIGINT) AS q
    FROM embeddings
"""


def _kmeans_rounds_sql() -> tuple[str, str]:
    """The unrolled Lloyd rounds as a WITH-body fragment (shared by
    the kmeans and trained-IVF oracles): returns (rounds_sql,
    final_centroid_cte_name). Assignment is a join + ROW_NUMBER
    argmin over (dist, k); update is SUM // COUNT with a
    keep-previous LEFT JOIN for emptied clusters — the same integer
    ops the numpy kernel runs, in relational form."""
    steps = []
    prev = "c0"
    for r in range(1, KM_ROUNDS + 1):
        steps.append(
            f"""d{r} AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN {prev} c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), a{r} AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM d{r}
      ) WHERE rn = 1
    ), u{r} AS (
      SELECT a.k, f.pos, SUM(f.q) // COUNT(*) AS c
      FROM a{r} a JOIN flat f ON f.vec_id = a.vec_id
      GROUP BY a.k, f.pos
    ), c{r} AS (
      SELECT p.k, p.pos, COALESCE(n.c, p.c) AS c
      FROM {prev} p LEFT JOIN u{r} n ON n.k = p.k AND n.pos = p.pos
    )"""
        )
        prev = f"c{r}"
    return ",\n    ".join(steps), prev


def _kmeans_oracle() -> str:
    """KM_ROUNDS-round unrolled DuckDB twin of kmeans_lloyd."""
    rounds, prev = _kmeans_rounds_sql()
    return f"""
    WITH flat AS (
      {_FLAT_SQL}
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS k, pos, q AS c
      FROM flat WHERE vec_id < {KM_K}
    ),
    {rounds},
    dF AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN {prev} c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), aF AS (
      SELECT vec_id, k, dist FROM (
        SELECT vec_id, k, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM dF
      ) WHERE rn = 1
    ), l1 AS (
      SELECT k, SUM(ABS(c)) AS centroid_l1 FROM {prev} GROUP BY k
    )
    SELECT a.k AS cluster,
           COUNT(*) AS size,
           CAST(SUM(a.dist) AS BIGINT) AS inertia_q,
           CAST(MIN(l1.centroid_l1) AS BIGINT) AS centroid_l1
    FROM aF a JOIN l1 ON l1.k = a.k
    GROUP BY a.k
    ORDER BY cluster
    """


def _update_kernel(cents: list[list[int]]):
    """Arrow-batched assignment + IN-KERNEL partial centroid sums:
    each batch emits <= k*d rows (k, pos, s=sum of members' q at pos,
    n=member count) — the map-side combine of the Lloyd update, done
    in numpy so the exchange never sees vector-sized data."""

    def fn(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cents, dtype=np.int64)  # (k, d)
        for pdf in batches:
            if not len(pdf):
                continue  # empty Arrow batch: _quantize_np returns 1-D
            Q = _quantize_np(pdf["embedding"].tolist())  # (n, d)
            diff = Q[:, None, :] - C[None, :, :]
            dist = (diff * diff).sum(axis=2)  # (n, k) int64, exact
            a = dist.argmin(axis=1)  # ties -> first index = min k
            ks, ps, ss, ns = [], [], [], []
            for k in range(len(C)):
                member = Q[a == k]
                if len(member) == 0:
                    continue
                ks.append(np.full(C.shape[1], k, dtype=np.int32))
                ps.append(np.arange(C.shape[1], dtype=np.int32))
                ss.append(member.sum(axis=0))
                ns.append(
                    np.full(C.shape[1], len(member), dtype=np.int64)
                )
            if not ks:
                continue
            yield pd.DataFrame(
                {
                    "k": np.concatenate(ks),
                    "pos": np.concatenate(ps),
                    "s": np.concatenate(ss),
                    "n": np.concatenate(ns),
                }
            )

    return fn


def _stats_kernel(cents: list[list[int]]):
    """Final-pass kernel: per batch, per-cluster (size, inertia)
    partials — k rows per batch."""

    def fn(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cents, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue  # empty Arrow batch: _quantize_np returns 1-D
            Q = _quantize_np(pdf["embedding"].tolist())
            diff = Q[:, None, :] - C[None, :, :]
            dist = (diff * diff).sum(axis=2)
            a = dist.argmin(axis=1)
            best = dist[np.arange(len(Q)), a]
            ks = np.unique(a)
            yield pd.DataFrame(
                {
                    "cluster": ks.astype(np.int32),
                    "n": [int((a == k).sum()) for k in ks],
                    "inertia": [int(best[a == k].sum()) for k in ks],
                }
            )

    return fn


def lloyd_train(src: DataFrame) -> list[list[int]]:
    """The Lloyd training loop (shared by kmeans_lloyd and the
    trained-IVF serving path): K rounds of kernel assignment +
    in-kernel partial centroid sums over the (vec_id, embedding)
    frame, centroids held driver-side between rounds. Returns the
    trained centroid grids (K x d ints on the KM_Q grid)."""
    seed = sorted(
        src.where(F.col("vec_id") < KM_K).collect(),
        key=lambda r: r["vec_id"],
    )
    cents: list[list[int]] = [
        [int(x) for x in row]
        for row in _quantize_np([r["embedding"] for r in seed])
    ]
    for _ in range(KM_ROUNDS):
        cells = (
            src.mapInPandas(
                _update_kernel(cents), "k int, pos int, s long, n long"
            )
            .groupBy("k", "pos")
            .agg(F.expr("sum(s) div sum(n)").alias("c"))
            .collect()
        )
        new = {(r["k"], r["pos"]): r["c"] for r in cells}
        cents = [
            [int(new.get((k, p), ck[p])) for p in range(len(ck))]
            for k, ck in enumerate(cents)
        ]
    return cents


@query("kmeans_lloyd", oracle=_kmeans_oracle(), tags=("clustering",))
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lloyd's k-means (K=8, 3 fixed rounds, integer
    fixed-point) over the embeddings table; returns per-cluster size,
    inertia, and a centroid checksum.  The trainer for every
    cluster-structured curation op this engine ships: SemDeDup cells
    (dedup_semdedup), IVF coarse codebooks (similarity_ann_ivf),
    cluster-balanced sampling.

    Per round: centroids live driver-side (k*d = 512 BIGINTs — the
    same control-plane legitimacy class as the IVF codebook collect,
    similarity.py:788) and ship to executors in the kernel closure,
    so assignment is a shuffle-free Arrow-batched map; the update's
    map-side combine happens INSIDE the kernel (<= k*d partial rows
    per batch), leaving one k*d-row exchange per round.  Emptied
    clusters keep their previous centroid (COALESCE in the oracle,
    dict merge here) so both engines always carry exactly K
    centroids.  The scan frame is localCheckpointed once so the K+1
    passes re-read a materialized columnar block, not the parquet
    (swap for a cluster checkpoint / cache at real scale).

    Seeds are the first K vec_ids — deterministic by definition, so
    the unrolled oracle starts from the same grid points.  (k-means++
    would sample; a fixed-seed variant of it belongs to the same
    control-plane pattern if ever needed.)
    """
    emb = load(spark, sf_dir, "embeddings")
    src = emb.select("vec_id", "embedding").localCheckpoint()
    cents = lloyd_train(src)

    if not cents:
        # empty corpus: no seeds, no clusters — the oracle's joins
        # over the empty centroid CTE emit nothing
        return spark.createDataFrame(
            [],
            schema="cluster int, size long, inertia_q long, "
            "centroid_l1 long",
        )
    # range over the ACTUAL centroid count, not KM_K: a corpus with
    # fewer than KM_K vectors trains a partial codebook (the oracle's
    # c0 CTE has the same semantics)
    l1 = {k: sum(abs(v) for v in ck) for k, ck in enumerate(cents)}
    l1_map = F.create_map(
        *[F.lit(x) for k in range(len(cents)) for x in (k, l1[k])]
    )
    return (
        src.mapInPandas(
            _stats_kernel(cents), "cluster int, n long, inertia long"
        )
        .groupBy("cluster")
        .agg(
            F.sum("n").alias("size"),
            F.sum("inertia").cast("long").alias("inertia_q"),
        )
        .withColumn("centroid_l1", l1_map[F.col("cluster")].cast("long"))
        # no orderBy: K rows, order-insensitive gate — keeps the final
        # plan's only exchange the groupBy hash partitioning.
    )


def _pq_oracle() -> str:
    return f"""
    WITH flat AS (
      {_FLAT_SQL}
    ), sub AS (
      SELECT vec_id, pos // {PQ_SUBD} AS m, pos % {PQ_SUBD} AS j, q
      FROM flat
    ), cb AS (
      SELECT CAST(vec_id AS INT) AS code, m, j, q AS c
      FROM sub WHERE vec_id < {PQ_K}
    ), d AS (
      SELECT s.vec_id, s.m, cb.code,
             SUM((s.q - cb.c) * (s.q - cb.c)) AS dist
      FROM sub s JOIN cb ON cb.m = s.m AND cb.j = s.j
      GROUP BY s.vec_id, s.m, cb.code
    ), a AS (
      SELECT vec_id, m, code, dist FROM (
        SELECT vec_id, m, code, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM d
      ) WHERE rn = 1
    )
    SELECT vec_id,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           CAST(SUM(code * (1 << (4 * CAST(m AS BIGINT)))) AS BIGINT)
             AS code_word,
           CAST(SUM(dist) AS BIGINT) AS recon_err_q
    FROM a
    GROUP BY vec_id
    """


@query("embedding_pq", oracle=_pq_oracle(), tags=("clustering",))
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: encode each 64-dim vector as 8 4-bit
    codes (8 dims/subspace, 16 codewords), packed into one BIGINT
    ``code_word`` — 256-byte float vectors become 4 bytes, the
    compression layer under IVFPQ ANN serving.  Emits per vector the
    packed word, a code checksum, and the exact integer reconstruction
    error (the PQ distortion the index tuner watches).

    Codebooks here are SEEDED (subvectors of the first 16 vectors):
    the training step for production codebooks is kmeans_lloyd run per
    subspace — same loop, 8 instances — and keeping this query
    closed-form keeps its oracle exact.  Encoding is the part that
    runs over the full 100 TB corpus, and it is ONE shuffle-free scan:
    the 8*16 codewords ship in the kernel closure (control-plane,
    1024 BIGINTs), and each Arrow batch is encoded by a vectorized
    int64 distance pass per subspace (looped over subspaces so the
    (batch x codes x dims) intermediate stays ~10 MB).  Zero joins,
    zero exchanges, one MapInPandas over one parquet scan (pinned in
    tests/test_plans.py).
    """
    emb = load(spark, sf_dir, "embeddings")

    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cb = _quantize_np([r["embedding"] for r in seed])  # (PQ_K, 64)
    cb_list = [[int(x) for x in row] for row in cb]

    def encode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        # -1, not PQ_K: a corpus smaller than the seed count yields
        # a partial codebook (the oracle's cb_* CTE has the same
        # semantics — codes 0..n_seeds-1)
        CB = np.array(cb_list, dtype=np.int64).reshape(
            -1, PQ_M, PQ_SUBD
        )
        for pdf in batches:
            Q = _quantize_np(pdf["embedding"].tolist()).reshape(
                -1, PQ_M, PQ_SUBD
            )
            n = Q.shape[0]
            code_sum = np.zeros(n, dtype=np.int64)
            code_word = np.zeros(n, dtype=np.int64)
            err = np.zeros(n, dtype=np.int64)
            for m in range(PQ_M):
                diff = Q[:, None, m, :] - CB[None, :, m, :]
                dist = (diff * diff).sum(axis=2)  # (n, PQ_K)
                c = dist.argmin(axis=1)  # ties -> smallest code
                code_sum += c
                code_word += c.astype(np.int64) << (4 * m)
                err += dist[np.arange(n), c]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "code_sum": code_sum,
                    "code_word": code_word,
                    "recon_err_q": err,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        encode,
        "vec_id long, code_sum long, code_word long, recon_err_q long",
    )


#: rotated-PQ report: dedicated coarse quantizer (the Hadamard gain
#: multiplies values by up to d=64, so the KM_Q=1e5 grid would push
#: the summed squared distortion past int64 at 1000x — floor(v*4096)
#: keeps exact headroom: |q| <= ~2.2e3, |y| <= 1.4e5, total per
#: (variant, subspace) <= ~1.2e18 at 1000x corpus scale)
ROT_Q = 4096
ROT_D = PQ_M * PQ_SUBD  #: 64 — a power of two, Sylvester-Hadamard-sized


def _rot_dsign() -> list[int]:
    """Deterministic +-1 diagonal from md5 parity of the dimension
    index — portable across Python and DuckDB (both hash the ASCII
    decimal string)."""
    import hashlib  # noqa: PLC0415

    return [
        1
        if int(hashlib.md5(str(j).encode()).hexdigest()[:2], 16) % 2 == 0
        else -1
        for j in range(ROT_D)
    ]


def _rot_hadamard():
    """The 64-point Sylvester-Hadamard as exact +-1 int64 entries:
    H[i, j] = (-1)^popcount(i & j). Symmetric; (HD)(HD)^T = 64 I."""
    import numpy as np  # noqa: PLC0415

    return np.array(
        [
            [
                -1 if bin(i & j).count("1") % 2 else 1
                for j in range(ROT_D)
            ]
            for i in range(ROT_D)
        ],
        dtype=np.int64,
    )


def _pq_rot_chain() -> str:
    """Shared oracle derivation: quantized corpus, signed-Hadamard
    rotation, and per-variant PQ code assignment (a_p / a_r carry
    the winning code) — consumed by embedding_pq_rotated's distortion
    report AND embedding_pq_adc_recall's ADC ranking (anti-drift)."""
    chains = []
    for tag, src in (("p", "rflat"), ("r", "rotf")):
        chains.append(f"""
    , sub_{tag} AS (
      SELECT vec_id, pos // {PQ_SUBD} AS m, pos % {PQ_SUBD} AS j, q
      FROM {src}
    ), cb_{tag} AS (
      SELECT CAST(vec_id AS INT) AS code, m, j, q AS c
      FROM sub_{tag} WHERE vec_id < {PQ_K}
    ), d_{tag} AS (
      SELECT s.vec_id, s.m, cb.code,
             CAST(SUM((s.q - cb.c) * (s.q - cb.c)) AS BIGINT) AS dist
      FROM sub_{tag} s JOIN cb_{tag} cb ON cb.m = s.m AND cb.j = s.j
      GROUP BY s.vec_id, s.m, cb.code
    ), a_{tag} AS (
      SELECT vec_id, m, code, dist FROM (
        SELECT vec_id, m, code, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM d_{tag}
      ) WHERE rn = 1
    )""")
    return (
        f"""
    WITH rflat AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {ROT_Q})
                  AS BIGINT) AS q
      FROM embeddings
    ), dims AS (
      SELECT CAST(unnest(range(0, {ROT_D})) AS INT) AS i
    ), dsign AS (
      SELECT i AS j,
             CASE WHEN CAST(('0x' || substring(
                      md5(CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS ds
      FROM dims
    ), rotf AS (
      SELECT f.vec_id, d.i AS pos,
             CAST(SUM(f.q * s.ds
                  * (CASE WHEN bit_count(CAST(d.i & f.pos AS BIGINT))
                          % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS q
      FROM rflat f JOIN dsign s ON s.j = f.pos CROSS JOIN dims d
      GROUP BY f.vec_id, d.i
    )"""
        + "".join(chains)
    )


def _pq_rot_oracle() -> str:
    reps = []
    for tag in ("p", "r"):
        reps.append(f"""
    , rep_{tag} AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(dist) AS BIGINT) AS distortion
      FROM a_{tag} GROUP BY m
    )""")
    return (
        _pq_rot_chain()
        + "".join(reps)
        + f"""
    SELECT 'plain' AS variant, CAST(m AS BIGINT) AS m, n_vectors,
           CAST(distortion * {ROT_D} AS BIGINT) AS distortion_q
    FROM rep_p
    UNION ALL
    SELECT 'rotated', CAST(m AS BIGINT), n_vectors,
           CAST(distortion AS BIGINT)
    FROM rep_r
    """
    )


@query(
    "embedding_pq_rotated",
    oracle=_pq_rot_oracle(),
    tags=("clustering", "embedding"),
)
def embedding_pq_rotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotated product quantization — the OPQ/ITQ family member
    between embedding_pq and embedding_pq_residual: pre-multiply every
    vector by a SIGNED FAST-HADAMARD rotation (y = H D x, D a
    deterministic +-1 diagonal from md5 parity, H the 64-point
    Sylvester-Hadamard) before PQ-encoding, so correlated energy that
    concentrates in a few dimensions spreads across all 8 subspaces —
    the cheap structured stand-in for OPQ's learned rotation that
    billion-vector stacks actually deploy (a dense learned rotation is
    a d x d matmul per vector; H D is sign flips + butterflies).
    Emits the instrument an index tuner reads: per (variant, subspace)
    exact integer PQ distortion under the same seeded codebooks —
    'plain' rows are scaled by the Hadamard gain d=64 (||HDu||^2 =
    64 ||u||^2 exactly for +-1 H), so the two variants read on ONE
    integer scale with no division anywhere.

    Determinism: integer quantization floor(v * 4096) BEFORE the
    rotation, so y is exact BIGINT (every H D entry is +-1) and both
    distortion columns are exact integer sums; argmin ties break to
    the smallest code (numpy argmin-first == the oracle's ORDER BY
    dist, code).

    Scale shape: ONE shuffle-free Arrow pass over one parquet scan —
    the 64 x 64 H matrix and both codebooks (plain + rotated seeds,
    2 x 16 x 64 BIGINTs) live in the kernel closure; each batch pays
    one int64 (n, 64) @ (64, 64) matmul plus the two per-subspace
    distance sweeps, and emits <= 2 x 8 partial rows. The final
    groupBy collapses map-side to 16 rows. Zero joins, zero
    corpus-sized exchanges — the oracle's 8M-row rotation join is the
    brute-force replay, not the plan."""
    import numpy as np  # noqa: PLC0415

    emb = load(spark, sf_dir, "embeddings")
    ds = np.array(_rot_dsign(), dtype=np.int64)
    H = _rot_hadamard()

    def quant(vecs) -> "np.ndarray":
        a = np.array(
            [np.asarray(v, dtype=np.float32) for v in vecs],
            dtype=np.float64,
        )
        return np.floor(a * ROT_Q).astype(np.int64)

    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    if not seed:
        # empty corpus: the oracle's per-subspace GROUP BY emits no
        # rows — match it (quant([]) is 1-D and cannot rotate)
        return spark.createDataFrame(
            [],
            schema="variant string, m long, n_vectors long, "
            "distortion_q long",
        )
    cb_p = quant([r["embedding"] for r in seed])  # (<=PQ_K, 64)
    cb_r = (cb_p * ds) @ H  # rotated seeds: same transform as data
    cbs = {
        # -1, not PQ_K: partial codebooks on sub-seed corpora
        "plain": cb_p.reshape(-1, PQ_M, PQ_SUBD).tolist(),
        "rotated": cb_r.reshape(-1, PQ_M, PQ_SUBD).tolist(),
    }
    h_list = H.tolist()
    ds_list = ds.tolist()

    def report(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        HH = np.array(h_list, dtype=np.int64)
        DS = np.array(ds_list, dtype=np.int64)
        CBS = {
            v: np.array(cb, dtype=np.int64) for v, cb in cbs.items()
        }
        for pdf in batches:
            if not len(pdf):
                continue
            Q = quant(pdf["embedding"].tolist())
            data = {"plain": Q, "rotated": (Q * DS) @ HH}
            variants, ms, ns, dists = [], [], [], []
            for v, X in data.items():
                Xs = X.reshape(-1, PQ_M, PQ_SUBD)
                for m in range(PQ_M):
                    diff = Xs[:, None, m, :] - CBS[v][None, :, m, :]
                    dist = (diff * diff).sum(axis=2)  # (n, PQ_K)
                    best = dist[
                        np.arange(len(Xs)), dist.argmin(axis=1)
                    ]
                    variants.append(v)
                    ms.append(m)
                    ns.append(len(Xs))
                    dists.append(int(best.sum()))
            yield pd.DataFrame(
                {
                    "variant": variants,
                    "m": ms,
                    "n": ns,
                    "dist": dists,
                }
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            report, "variant string, m long, n long, dist long"
        )
        .groupBy("variant", "m")
        .agg(
            F.sum("n").cast("long").alias("n_vectors"),
            F.sum("dist").cast("long").alias("dist"),
        )
        .select(
            "variant",
            "m",
            "n_vectors",
            F.when(
                F.col("variant") == "plain",
                F.col("dist") * F.lit(ROT_D),
            )
            .otherwise(F.col("dist"))
            .cast("long")
            .alias("distortion_q"),
        )
    )


#: ADC-recall eval query set: every 25th vector under the cap — the
#: KNN_SEED_CAP / MRL_QUERY_CAP scale contract (an eval set is fixed-
#: size; the corpus being searched grows without bound)
ADC_QUERY_MOD = 25
ADC_QUERY_CAP = 2000
ADC_K = 10


def _pq_adc_oracle() -> str:
    tops = []
    for tag in ("p", "r"):
        tops.append(f"""
    , qset_{tag} AS (
      SELECT vec_id AS qid, m, j, q FROM sub_{tag}
      WHERE vec_id % {ADC_QUERY_MOD} = 0 AND vec_id < {ADC_QUERY_CAP}
    ), lut_{tag} AS (
      SELECT qs.qid, qs.m, cb.code,
             CAST(SUM((qs.q - cb.c) * (qs.q - cb.c)) AS BIGINT) AS d
      FROM qset_{tag} qs JOIN cb_{tag} cb
        ON cb.m = qs.m AND cb.j = qs.j
      GROUP BY qs.qid, qs.m, cb.code
    ), adc_{tag} AS (
      SELECT l.qid, a.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
      FROM a_{tag} a JOIN lut_{tag} l
        ON l.m = a.m AND l.code = a.code
      WHERE a.vec_id <> l.qid
      GROUP BY l.qid, a.vec_id
    ), top_{tag} AS (
      SELECT qid, vec_id FROM adc_{tag}
      QUALIFY row_number() OVER (
        PARTITION BY qid ORDER BY dist, vec_id) <= {ADC_K}
    )""")
    return (
        _pq_rot_chain()
        + "".join(tops)
        + f"""
    , exd AS (
      SELECT q.qid, c.vec_id,
             CAST(SUM((q.q - c.q) * (q.q - c.q)) AS BIGINT) AS dist
      FROM qset_p q JOIN sub_p c
        ON c.m = q.m AND c.j = q.j AND c.vec_id <> q.qid
      GROUP BY q.qid, c.vec_id
    ), truth AS (
      SELECT qid, vec_id FROM exd
      QUALIFY row_number() OVER (
        PARTITION BY qid ORDER BY dist, vec_id) <= {ADC_K}
    )
    SELECT 'plain' AS variant,
           CAST(COUNT(DISTINCT r.qid) AS BIGINT) AS n_queries,
           CAST(COUNT(t.vec_id) AS BIGINT) AS hits,
           CASE WHEN COUNT(DISTINCT r.qid) = 0 THEN NULL
                ELSE CAST(COUNT(t.vec_id) * 100
                     // (COUNT(DISTINCT r.qid) * {ADC_K}) AS BIGINT)
           END AS recall_pct
    FROM top_p r
    LEFT JOIN truth t ON t.qid = r.qid AND t.vec_id = r.vec_id
    UNION ALL
    SELECT 'rotated',
           CAST(COUNT(DISTINCT r.qid) AS BIGINT),
           CAST(COUNT(t.vec_id) AS BIGINT),
           CASE WHEN COUNT(DISTINCT r.qid) = 0 THEN NULL
                ELSE CAST(COUNT(t.vec_id) * 100
                     // (COUNT(DISTINCT r.qid) * {ADC_K}) AS BIGINT)
           END
    FROM top_r r
    LEFT JOIN truth t ON t.qid = r.qid AND t.vec_id = r.vec_id
    """
    )


@query(
    "embedding_pq_adc_recall",
    oracle=_pq_adc_oracle(),
    tags=("clustering", "embedding"),
)
def embedding_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-side verdict on the Hadamard rotation: recall@10 of
    ASYMMETRIC DISTANCE (ADC) rankings — query scans the corpus as
    4-bit PQ codes via a per-query lookup table, the billion-vector
    serving path — under plain vs rotated codes, both judged against
    ONE exact top-10 truth. One truth suffices because the signed
    Hadamard is an exact scaled isometry on the quantized grid
    (||HD(a-b)||^2 = 64 ||a-b||^2 in integers), so the exact ranking
    is IDENTICAL in both spaces — the distortion report
    (embedding_pq_rotated) says how tightly codes fit; THIS says
    whether that translates into retrieval quality, which is what
    decides deployment.

    Determinism: distances are exact integer sums end to end (codes:
    argmin ties to smallest code; rankings: ties to smallest vec_id);
    the recall is an integer-division percentage (matryoshka's rule).

    Scale shape: one Arrow pass over the corpus — the <=80-query eval
    set (fixed-size by the KNN/MRL cap contract), both codebooks, and
    H live in the kernel closure; per batch each variant pays the
    encode sweep plus ADC as pure LUT gathers (queries x docs int
    adds, no floats), the exact arm one int64 matmul, and emission is
    <= 3 x |queries| x 10 partial-top rows. The global merge windows
    over batches x that bound, and the final recall is computed from
    a <=2,400-row control-plane collect (exactly the oracle's NULL
    semantics on degenerate corpora). The corpus is never joined,
    shuffled, or re-scanned."""
    import numpy as np  # noqa: PLC0415

    emb = load(spark, sf_dir, "embeddings")
    ds = np.array(_rot_dsign(), dtype=np.int64)
    H = _rot_hadamard()

    def quant(vecs) -> "np.ndarray":
        a = np.array(
            [np.asarray(v, dtype=np.float32) for v in vecs],
            dtype=np.float64,
        )
        return np.floor(a * ROT_Q).astype(np.int64)

    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    qrows = sorted(
        emb.where(
            (F.col("vec_id") % ADC_QUERY_MOD == 0)
            & (F.col("vec_id") < ADC_QUERY_CAP)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    out_schema = (
        "variant string, n_queries long, hits long, recall_pct long"
    )
    if not qrows or not seed:
        return spark.createDataFrame(
            [("plain", 0, 0, None), ("rotated", 0, 0, None)],
            schema=out_schema,
        )
    cb_p = quant([r["embedding"] for r in seed])
    qp = quant([r["embedding"] for r in qrows])
    qids = [int(r["vec_id"]) for r in qrows]
    cbs = {
        "plain": cb_p.tolist(),
        "rotated": ((cb_p * ds) @ H).tolist(),
    }
    qs = {
        "plain": qp.tolist(),
        "rotated": ((qp * ds) @ H).tolist(),
    }
    h_list, ds_list = H.tolist(), ds.tolist()
    SENTINEL = 1 << 62

    def topk(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        HH = np.array(h_list, dtype=np.int64)
        DS = np.array(ds_list, dtype=np.int64)
        QID = np.array(qids, dtype=np.int64)
        CB = {
            v: np.array(c, dtype=np.int64).reshape(
                -1, PQ_M, PQ_SUBD
            )
            for v, c in cbs.items()
        }
        QV = {v: np.array(q, dtype=np.int64) for v, q in qs.items()}
        # per-query ADC LUT: (nq, PQ_M, PQ_K) exact squared distances
        LUT = {}
        for v in CB:
            Qr = QV[v].reshape(-1, PQ_M, PQ_SUBD)
            diff = Qr[:, :, None, :] - np.transpose(
                CB[v], (1, 0, 2)
            )[None, :, :, :]
            LUT[v] = (diff * diff).sum(axis=3)  # (nq, M, K)
        QEX = QV["plain"]
        qq = (QEX * QEX).sum(axis=1)  # (nq,)

        def emit(rows, variant, vids, D):
            # per-batch partial top-k per query, ties (dist, vec_id)
            for qi in range(D.shape[0]):
                order = np.lexsort((vids, D[qi]))[:ADC_K]
                for ix in order:
                    if D[qi, ix] >= SENTINEL:
                        continue
                    rows.append(
                        (
                            variant,
                            int(QID[qi]),
                            int(vids[ix]),
                            int(D[qi, ix]),
                        )
                    )

        for pdf in batches:
            if not len(pdf):
                continue
            vids = pdf["vec_id"].to_numpy()
            X = quant(pdf["embedding"].tolist())
            self_mask = QID[:, None] == vids[None, :]
            rows: list[tuple] = []
            for v in CB:
                Xv = X if v == "plain" else (X * DS) @ HH
                Xs = Xv.reshape(-1, PQ_M, PQ_SUBD)
                codes = np.empty(
                    (Xs.shape[0], PQ_M), dtype=np.int64
                )
                for m in range(PQ_M):
                    diff = Xs[:, None, m, :] - CB[v][None, :, m, :]
                    codes[:, m] = (
                        (diff * diff).sum(axis=2).argmin(axis=1)
                    )
                D = np.zeros(
                    (len(QID), Xs.shape[0]), dtype=np.int64
                )
                for m in range(PQ_M):
                    D += LUT[v][:, m, :][:, codes[:, m]]
                D[self_mask] = SENTINEL
                emit(rows, v, vids, D)
            # exact arm (plain space; identical ranking in rotated
            # space by the scaled-isometry identity)
            dots = QEX @ X.T  # (nq, n)
            xx = (X * X).sum(axis=1)
            DE = qq[:, None] - 2 * dots + xx[None, :]
            DE[self_mask] = SENTINEL
            emit(rows, "exact", vids, DE)
            yield pd.DataFrame(
                rows, columns=["variant", "qid", "vec_id", "dist"]
            )

    from pyspark.sql import Window  # noqa: PLC0415

    partials = emb.select("vec_id", "embedding").mapInPandas(
        topk, "variant string, qid long, vec_id long, dist long"
    )
    w = Window.partitionBy("variant", "qid").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    merged = (
        partials.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ADC_K)
        .select("variant", "qid", "vec_id")
        .collect()
    )
    truth = {
        (r["qid"], r["vec_id"])
        for r in merged
        if r["variant"] == "exact"
    }
    out = []
    for v in ("plain", "rotated"):
        vs = [r for r in merged if r["variant"] == v]
        nq = len({r["qid"] for r in vs})
        hits = sum(
            1 for r in vs if (r["qid"], r["vec_id"]) in truth
        )
        out.append(
            (
                v,
                nq,
                hits,
                hits * 100 // (nq * ADC_K) if nq else None,
            )
        )
    return spark.createDataFrame(out, schema=out_schema)


def _ivfpq_oracle() -> str:
    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUANT,
        QUERY_VEC_ID,
    )

    return f"""
    WITH flat AS (
      SELECT vec_id, label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), cent AS (
      SELECT label, pos,
             (CAST(SUM(CAST(floor(v * {QUANT}) AS BIGINT)) AS DOUBLE)
              / {QUANT}) / COUNT(*) AS c
      FROM flat GROUP BY label, pos
    ), dots AS (
      SELECT f.vec_id, c.label,
             SUM(CAST(floor((f.v * c.c) * {QUANT}) AS BIGINT)) AS dp
      FROM flat f JOIN cent c ON c.pos = f.pos
      GROUP BY f.vec_id, c.label
    ), assigned AS (
      SELECT vec_id, label AS cell FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dp DESC, label ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ), probe AS (
      SELECT label FROM dots WHERE vec_id = {QUERY_VEC_ID}
      ORDER BY dp DESC, label ASC LIMIT 3
    ), sub AS (
      SELECT vec_id, pos // {PQ_SUBD} AS m, pos % {PQ_SUBD} AS j,
             CAST(floor(v * {KM_Q}) AS BIGINT) AS q
      FROM flat
    ), cb AS (
      SELECT CAST(vec_id AS INT) AS code, m, j, q AS c
      FROM sub WHERE vec_id < {PQ_K}
    ), d AS (
      SELECT s.vec_id, s.m, cb.code,
             SUM((s.q - cb.c) * (s.q - cb.c)) AS dist
      FROM sub s JOIN cb ON cb.m = s.m AND cb.j = s.j
      WHERE s.vec_id IN (SELECT vec_id FROM assigned
                         WHERE cell IN (SELECT label FROM probe))
      GROUP BY s.vec_id, s.m, cb.code
    ), a AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM d
      ) WHERE rn = 1
    ), lut AS (
      SELECT cb.m, cb.code, SUM((qs.q - cb.c) * (qs.q - cb.c)) AS ld
      FROM cb JOIN (SELECT m, j, q FROM sub
                    WHERE vec_id = {QUERY_VEC_ID}) qs
        ON qs.m = cb.m AND qs.j = cb.j
      GROUP BY cb.m, cb.code
    )
    SELECT a.vec_id, CAST(SUM(l.ld) AS BIGINT) AS adc_q
    FROM a JOIN lut l ON l.m = a.m AND l.code = a.code
    GROUP BY a.vec_id
    ORDER BY adc_q ASC, vec_id ASC
    LIMIT 10
    """


@query("similarity_ann_ivfpq", oracle=_ivfpq_oracle(), tags=("ann", "pq"))
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVFPQ serving path (FAISS's billion-vector layout):
    coarse IVF cells prune the corpus to the query's 3 probed cells,
    then candidates are ranked WITHOUT touching their float vectors —
    an asymmetric-distance (ADC) sum of per-subspace lookup-table
    entries over their 4-bit PQ codes.  Composes this module's PQ
    codebook with similarity_ann_ivf's coarse quantizer; at serving
    scale the float embeddings never leave cold storage — the index
    is cells + 4-byte code words.

    Driver-checkable end to end: coarse assignment and probe choice
    use the exact quantized dot fold (similarity_ann_ivf's rule), PQ
    codes and the 8x16 LUT are integer fixed-point on the KM_Q grid,
    and ADC is an integer sum — the oracle replays cell pruning, code
    assignment, LUT build, and ranking bit-exactly.

    Scale shape: one Arrow-batched kernel over one scan — coarse
    codebook, probe set, PQ codebook, and LUT all ship in the closure
    (control-plane: L*d + 3 + K*d + M*K values).  Per batch the
    kernel drops non-probed rows BEFORE encoding, so PQ work is
    proportional to probed mass (nprobe/ncells of the corpus); output
    is (vec_id, adc_q) for candidates only, closed by
    TakeOrderedAndProject — no global sort, no joins, no exchange
    except the final top-k."""
    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUANT,
        QUERY_VEC_ID,
        embedding_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = embedding_centroids(spark, sf_dir).collect()  # tiny codebook
    by_label: dict[int, list[float]] = {}
    dim_row = emb.select("embedding").head()
    if dim_row is None:
        # empty corpus: no dims, no query, no ranking (oracle: empty)
        return spark.createDataFrame([], schema="vec_id long, adc_q long")
    dim = len(dim_row[0])
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * dim)[r["pos"]] = r["centroid"]
    labels = sorted(by_label)

    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    )
    if qrow is None:
        # no query vector in the corpus: the oracle's query-scoped
        # CTEs are empty, so the ranking is too — match it
        return spark.createDataFrame(
            [], schema="vec_id long, adc_q long"
        )
    qv = [float(x) for x in qrow[0]]

    import math  # noqa: PLC0415

    def pydot(a, b):
        # exact quantized fold, bit-identical to the oracle's dots CTE
        return sum(int(math.floor(x * y * QUANT)) for x, y in zip(a, b))

    probe = set(sorted(labels, key=lambda lab: -pydot(qv, by_label[lab]))[:3])

    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cb_list = [
        [int(x) for x in row]
        for row in _quantize_np([r["embedding"] for r in seed])
    ]
    qq = [int(x) for x in _quantize_np([qv])[0]]

    labels_arr = list(labels)
    cent_rows = [by_label[lab] for lab in labels_arr]

    def probe_and_adc(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cent_rows, dtype=np.float64)  # (L, D)
        probe_mask = np.array([lab in probe for lab in labels_arr])
        CB = np.array(cb_list, dtype=np.int64).reshape(-1, PQ_M, PQ_SUBD)
        QQ = np.array(qq, dtype=np.int64).reshape(PQ_M, PQ_SUBD)
        # the 8x16 ADC lookup table, exact integer
        ldiff = QQ[None, :, :] - CB  # (K, M, SUBD)
        LUT = (ldiff * ldiff).sum(axis=2).T  # (M, K)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            for s in range(0, len(V), 2048):
                chunk = V[s : s + 2048]
                prod = chunk[:, None, :] * C[None, :, :]
                dots = np.floor(prod * float(QUANT)).sum(axis=2)
                keep = probe_mask[np.argmax(dots, axis=1)]
                if not keep.any():
                    continue
                Q = np.floor(chunk[keep] * float(KM_Q)).astype(
                    np.int64
                ).reshape(-1, PQ_M, PQ_SUBD)
                adc = np.zeros(Q.shape[0], dtype=np.int64)
                for m in range(PQ_M):
                    diff = Q[:, None, m, :] - CB[None, :, m, :]
                    dist = (diff * diff).sum(axis=2)
                    adc += LUT[m][dist.argmin(axis=1)]
                yield pd.DataFrame(
                    {"vec_id": ids[s : s + 2048][keep], "adc_q": adc}
                )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        probe_and_adc, "vec_id long, adc_q long"
    )
    return scored.orderBy(F.asc("adc_q"), F.asc("vec_id")).limit(10)


#: cluster-balanced sampling quota: keep this many vectors per cell,
#: selected by deterministic md5 order (value-based, so the sample is
#: stable under repartitioning and replayable in SQL).
CB_QUOTA = 20


@query(
    "sample_cluster_balanced",
    oracle=f"""
    WITH flat AS (
      {_FLAT_SQL}
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS k, pos, q AS c
      FROM flat WHERE vec_id < {KM_K}
    ), d AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN c0 c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), a AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, k) AS rn
        FROM d
      ) WHERE rn = 1
    ), ranked AS (
      SELECT vec_id, k,
             ROW_NUMBER() OVER (
               PARTITION BY k
               ORDER BY CAST(('0x' || substring(
                 md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
               vec_id
             ) AS rk
      FROM a
    )
    SELECT CAST(k AS INT) AS cluster, vec_id,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {CB_QUOTA}
    """,
    tags=("clustering", "sampling"),
)
def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling — the anti-mode-collapse selection a
    curation pipeline runs after clustering (DSIR / SemDeDup-style:
    cap each semantic cell's contribution instead of letting the head
    cluster dominate the mixture): assign every vector to its nearest
    seed cell (kmeans_lloyd's c0 — swap in trained centroids the same
    way), then keep CB_QUOTA vectors per cell in deterministic
    md5-of-id order, the value-based coin every sampler in this
    engine uses (sample_hash's rule) so the sample survives
    repartitioning and replays in SQL.

    Scale shape: assignment is the shuffle-free Arrow kernel
    (centroids in the closure); the per-cell quota is a rank-limit
    window on (cell, md5) that Spark 4 pushes below the exchange as
    WindowGroupLimit PARTIAL (sample_domain_quota's plan, pinned
    there) — each map task forwards at most CB_QUOTA rows per cell,
    so the exchange carries ~cells*quota rows per task regardless of
    corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    src = emb.select("vec_id", "embedding")
    seed = sorted(
        src.where(F.col("vec_id") < KM_K).collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [
        [int(x) for x in row]
        for row in _quantize_np([r["embedding"] for r in seed])
    ]

    def assign(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cents, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            Q = _quantize_np(pdf["embedding"].tolist())
            diff = Q[:, None, :] - C[None, :, :]
            a = (diff * diff).sum(axis=2).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cluster": a.astype(np.int32),
                    "vec_id": pdf["vec_id"].to_numpy(),
                }
            )

    from pyspark.sql import Window  # noqa: PLC0415

    assigned = src.mapInPandas(assign, "cluster int, vec_id long")
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col("vec_id").asc())
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= CB_QUOTA)
        .select("cluster", "vec_id", F.col("rk").cast("long").alias("rk"))
    )


IVF_TRAINED_PROBE = 2  #: cells probed out of KM_K at serve time.


def _ivf_trained_oracle() -> str:
    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUERY_VEC_ID,
    )

    rounds, prev = _kmeans_rounds_sql()
    return f"""
    WITH flat AS (
      {_FLAT_SQL}
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS k, pos, q AS c
      FROM flat WHERE vec_id < {KM_K}
    ),
    {rounds},
    dF AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN {prev} c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), aF AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM dF
      ) WHERE rn = 1
    ), probe AS (
      SELECT k FROM dF WHERE vec_id = {QUERY_VEC_ID}
      ORDER BY dist, k LIMIT {IVF_TRAINED_PROBE}
    ), qv AS (
      SELECT pos, q FROM flat WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT f.vec_id,
           CAST(SUM((f.q - qv.q) * (f.q - qv.q)) AS BIGINT) AS d2_q
    FROM flat f JOIN qv ON qv.pos = f.pos
    WHERE f.vec_id IN (SELECT vec_id FROM aF
                       WHERE k IN (SELECT k FROM probe))
    GROUP BY f.vec_id
    ORDER BY d2_q ASC, f.vec_id ASC
    LIMIT 10
    """


@query(
    "similarity_ann_ivf_trained",
    oracle=_ivf_trained_oracle(),
    tags=("ann", "ivf", "clustering"),
)
def similarity_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full train->index->serve ANN path on a TRAINED coarse
    quantizer: run Lloyd's (lloyd_train — the exact loop kmeans_lloyd
    registers), assign every vector to its trained cell, probe the
    query's {IVF_TRAINED_PROBE} nearest cells, and exact-rerank the
    probed candidates by integer L2.  Closes the composition the
    module docstring promises: similarity_ann_ivf serves off the
    per-label codebook (supervised stand-in), THIS query serves off
    centroids the engine itself trained — the shape a real
    embedding-corpus deployment runs, where no labels exist.

    Everything replays in SQL: the oracle re-trains the same K rounds
    (the shared _kmeans_rounds_sql chain), re-derives assignment,
    probe choice (integer distances, ties to the smaller cell), and
    the exact rerank.  Serving is one Arrow kernel pass over one scan
    — trained centroids and probe set in the closure, candidates
    pruned BEFORE the distance emit, closed by TakeOrderedAndProject;
    training cost is the K-round loop amortized across every query
    batch that reuses the codebook (a deployment persists it — the
    control-plane frame is K*d ints)."""
    import numpy as np  # noqa: PLC0415

    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUERY_VEC_ID,
    )

    emb = load(spark, sf_dir, "embeddings")
    src = emb.select("vec_id", "embedding").localCheckpoint()
    cents = lloyd_train(src)

    C = np.array(cents, dtype=np.int64)
    qrow = src.where(F.col("vec_id") == QUERY_VEC_ID).head()
    if qrow is None:
        # no query vector in the corpus: the oracle's query-scoped
        # CTEs are empty — match its empty ranking
        return spark.createDataFrame([], schema="vec_id long, d2_q long")
    qq = _quantize_np([qrow["embedding"]])[0]
    qd = ((C - qq[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(C)), qd))
    probe = set(int(k) for k in order[:IVF_TRAINED_PROBE])

    def serve(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        Cl = np.array(cents, dtype=np.int64)
        pm = np.array([k in probe for k in range(len(Cl))])
        Q = np.array(qq, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = _quantize_np(pdf["embedding"].tolist())
            diff = V[:, None, :] - Cl[None, :, :]
            a = (diff * diff).sum(axis=2).argmin(axis=1)
            keep = pm[a]
            if not keep.any():
                continue
            kv = V[keep]
            d2 = ((kv - Q[None, :]) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "d2_q": d2,
                }
            )

    scored = src.mapInPandas(serve, "vec_id long, d2_q long")
    return scored.orderBy(F.asc("d2_q"), F.asc("vec_id")).limit(10)


def _pq_residual_oracle() -> str:
    rounds, prev = _kmeans_rounds_sql()
    return f"""
    WITH flat AS (
      {_FLAT_SQL}
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS k, pos, q AS c
      FROM flat WHERE vec_id < {KM_K}
    ),
    {rounds},
    dF AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN {prev} c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), aF AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM dF
      ) WHERE rn = 1
    ), res AS (
      SELECT f.vec_id, a.k AS cell,
             f.pos // {PQ_SUBD} AS m, f.pos % {PQ_SUBD} AS j,
             f.q - c.c AS r
      FROM flat f
      JOIN aF a ON a.vec_id = f.vec_id
      JOIN {prev} c ON c.k = a.k AND c.pos = f.pos
    ), cb AS (
      SELECT CAST(vec_id AS INT) AS code, m, j, r AS c
      FROM res WHERE vec_id < {PQ_K}
    ), pqd AS (
      SELECT s.vec_id, s.m, cb.code,
             SUM((s.r - cb.c) * (s.r - cb.c)) AS dist
      FROM res s JOIN cb ON cb.m = s.m AND cb.j = s.j
      GROUP BY s.vec_id, s.m, cb.code
    ), pqa AS (
      SELECT vec_id, m, code, dist FROM (
        SELECT vec_id, m, code, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM pqd
      ) WHERE rn = 1
    )
    SELECT pqa.vec_id,
           CAST(MIN(res.cell) AS INT) AS cell,
           CAST(SUM(pqa.code) AS BIGINT) AS code_sum,
           CAST(SUM(pqa.dist) AS BIGINT) AS recon_err_q
    FROM pqa JOIN res ON res.vec_id = pqa.vec_id AND res.m = pqa.m
                    AND res.j = 0
    GROUP BY pqa.vec_id
    """


@query(
    "embedding_pq_residual",
    oracle=_pq_residual_oracle(),
    tags=("clustering", "pq"),
)
def embedding_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual product quantization — the FAISS IVFPQ default:
    PQ-encode each vector's RESIDUAL from its trained coarse centroid
    instead of the raw vector, so the codebook spends its 4 bits on
    the within-cell detail the coarse quantizer already removed.
    Composes lloyd_train (coarse) with the PQ encode; emits per
    vector its cell, a code checksum, and the exact integer residual
    distortion — compare recon_err_q against embedding_pq's raw
    encoding to see the residual win.

    Residuals stay ON the integer grid (q - c is int64), so the
    entire path — training rounds, cell argmin, residual, codeword
    argmin, distortion — replays bit-exactly in the oracle, which
    re-trains the same K rounds via the shared unrolled chain.

    Scale shape: one Arrow kernel pass over one scan (trained
    centroids + residual codebook in the closure; assignment,
    residual, and encode fused per batch — the corpus is read once,
    nothing shuffles)."""
    import numpy as np  # noqa: PLC0415

    emb = load(spark, sf_dir, "embeddings")
    src = emb.select("vec_id", "embedding").localCheckpoint()
    cents = lloyd_train(src)
    C = np.array(cents, dtype=np.int64)

    # residual codebook seeds: the first PQ_K vectors' residuals —
    # one control-plane collect + driver-side numpy.
    seed = sorted(
        src.where(F.col("vec_id") < PQ_K).collect(),
        key=lambda r: r["vec_id"],
    )
    if not seed:
        # empty corpus: no residual codebook, no rows (the oracle's
        # seed-scoped CTEs are empty); _quantize_np([]) is 1-D
        return spark.createDataFrame(
            [],
            schema="vec_id long, cell int, code_sum long, "
            "recon_err_q long",
        )
    SQ = _quantize_np([r["embedding"] for r in seed])
    sa = ((SQ[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    CB = (SQ - C[sa]).reshape(-1, PQ_M, PQ_SUBD)
    cb_list = [[int(x) for x in row.reshape(-1)] for row in CB]

    def encode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        Cl = np.array(cents, dtype=np.int64)
        CBl = np.array(cb_list, dtype=np.int64).reshape(
            -1, PQ_M, PQ_SUBD
        )
        for pdf in batches:
            if not len(pdf):
                continue
            Q = _quantize_np(pdf["embedding"].tolist())
            diff = Q[:, None, :] - Cl[None, :, :]
            a = (diff * diff).sum(axis=2).argmin(axis=1)
            R = (Q - Cl[a]).reshape(-1, PQ_M, PQ_SUBD)
            n = R.shape[0]
            code_sum = np.zeros(n, dtype=np.int64)
            err = np.zeros(n, dtype=np.int64)
            for m in range(PQ_M):
                dd = R[:, None, m, :] - CBl[None, :, m, :]
                dist = (dd * dd).sum(axis=2)
                c = dist.argmin(axis=1)
                code_sum += c
                err += dist[np.arange(n), c]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": a.astype(np.int32),
                    "code_sum": code_sum,
                    "recon_err_q": err,
                }
            )

    return src.mapInPandas(
        encode, "vec_id long, cell int, code_sum long, recon_err_q long"
    )


_IVFPQ_IDX_MEMO: dict = {}


def _ivfpq_index(spark: SparkSession, sf_dir: str) -> str | None:
    """Build (or reuse) the PARKED IVFPQ index: managed table
    ``fss_ivfpq_<slug>`` of (vec_id, codes array<int>) PARTITIONED BY
    the coarse cell — the billion-vector layout where the floats
    never leave cold storage and the served index is cells + 4-byte
    code words. Returns None on an empty corpus. Bounded retention:
    rebuilding drops other ivfpq generations and sweeps orphaned
    warehouse dirs (same contract as the shingle/posting indexes)."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUANT,
        embedding_centroids,
    )
    from file_scraper_spark.tables import data_key  # noqa: PLC0415

    key = data_key(sf_dir, "embeddings")
    hit = _IVFPQ_IDX_MEMO.get(key)
    if hit is not None and spark.catalog.tableExists(hit):
        return hit
    emb = load(spark, sf_dir, "embeddings")
    dim_row = emb.select("embedding").head()
    if dim_row is None:
        return None
    dim = len(dim_row[0])
    cents = embedding_centroids(spark, sf_dir).collect()
    by_label: dict[int, list[float]] = {}
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * dim)[r["pos"]] = r["centroid"]
    labels = sorted(by_label)
    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cb_list = [
        [int(x) for x in row]
        for row in _quantize_np([r["embedding"] for r in seed])
    ]

    slug = hashlib.md5(repr(key).encode()).hexdigest()[:12]
    name = f"fss_ivfpq_{slug}"
    for t in spark.catalog.listTables():
        if t.name.startswith("fss_ivfpq_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    try:
        for d in os.scandir(wh):
            if d.name.startswith("fss_ivfpq_"):
                shutil.rmtree(d.path, ignore_errors=True)
    except OSError:
        pass

    cent_rows = [by_label[lab] for lab in labels]
    labels_arr = list(labels)

    def assign_and_encode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cent_rows, dtype=np.float64)
        CB = np.array(cb_list, dtype=np.int64).reshape(-1, PQ_M, PQ_SUBD)
        lab_np = np.array(labels_arr, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            for s in range(0, len(V), 2048):
                chunk = V[s : s + 2048]
                prod = chunk[:, None, :] * C[None, :, :]
                dots = np.floor(prod * float(QUANT)).sum(axis=2)
                cell = lab_np[np.argmax(dots, axis=1)]
                Q = np.floor(chunk * float(KM_Q)).astype(np.int64).reshape(
                    -1, PQ_M, PQ_SUBD
                )
                codes = np.empty((Q.shape[0], PQ_M), dtype=np.int32)
                for m in range(PQ_M):
                    diff = Q[:, None, m, :] - CB[None, :, m, :]
                    codes[:, m] = (diff * diff).sum(axis=2).argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": ids[s : s + 2048],
                        "cell": cell,
                        "codes": list(codes),
                    }
                )

    (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            assign_and_encode, "vec_id long, cell long, codes array<int>"
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(name)
    )
    _IVFPQ_IDX_MEMO[key] = name
    return name


@query(
    "similarity_ann_ivfpq_indexed",
    oracle=_ivfpq_oracle(),
    tags=("ann", "pq", "indexed"),
)
def similarity_ann_ivfpq_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """similarity_ann_ivfpq's DEPLOYMENT shape — the serving story
    FAISS-on-a-lakehouse actually runs: cells + 4-bit codes PARK in a
    warehouse table partitioned by coarse cell (built once per corpus
    change by `_ivfpq_index`, floats touched only at build time); a
    query then (a) picks its 3 probe cells driver-side from the tiny
    centroid codebook, (b) reads ONLY those cells via partition
    pruning (plan-pinned: PartitionFilters on ``cell``, no embeddings
    scan, no Python at serve time), and (c) ranks by asymmetric
    distance ENTIRELY JVM-SIDE — the 8x16 integer LUT ships as a
    nested array literal and the ADC sum is one array HOF over the
    stored codes, closed by a TakeOrderedAndProject top-10. Same
    oracle as the one-pass variant: one spec, two physical
    strategies, byte-identical results.

    Cost split at 10^9 vectors: build = one kernel pass + partitioned
    write (amortized over every query); serve = read nprobe/ncells of
    a 4-bytes-per-vector index, 128-entry LUT lookup per row, zero
    shuffles before the bounded top-k merge. This is the end state
    the similarity family's docstrings promise; the gate proves the
    parked path returns exactly the one-pass ranking."""
    import math  # noqa: PLC0415

    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        QUANT,
        QUERY_VEC_ID,
        embedding_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    name = _ivfpq_index(spark, sf_dir)
    if name is None:
        return spark.createDataFrame([], schema="vec_id long, adc_q long")
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    )
    if qrow is None:
        return spark.createDataFrame([], schema="vec_id long, adc_q long")
    qv = [float(x) for x in qrow[0]]
    dim = len(qv)
    cents = embedding_centroids(spark, sf_dir).collect()
    by_label: dict[int, list[float]] = {}
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * dim)[r["pos"]] = r["centroid"]
    labels = sorted(by_label)

    def pydot(a, b):
        return sum(int(math.floor(x * y * QUANT)) for x, y in zip(a, b))

    probe = sorted(
        sorted(labels, key=lambda lab: -pydot(qv, by_label[lab]))[:3]
    )

    import numpy as np  # noqa: PLC0415

    seed = sorted(
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    CB = np.array(
        [[int(x) for x in row] for row in _quantize_np([r["embedding"] for r in seed])],
        dtype=np.int64,
    ).reshape(-1, PQ_M, PQ_SUBD)
    QQ = (
        np.array([int(x) for x in _quantize_np([qv])[0]], dtype=np.int64)
        .reshape(PQ_M, PQ_SUBD)
    )
    ldiff = QQ[None, :, :] - CB  # (K, M, SUBD)
    LUT = (ldiff * ldiff).sum(axis=2).T  # (M, K)

    lut_lit = F.array(
        *[
            F.array(*[F.lit(int(LUT[m][k])) for k in range(LUT.shape[1])])
            for m in range(PQ_M)
        ]
    )
    t = spark.table(name).filter(F.col("cell").isin([int(p) for p in probe]))
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda c, m: F.element_at(
                F.element_at(F.col("lut"), m + 1), c.cast("int") + 1
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        t.withColumn("lut", lut_lit)
        .select("vec_id", adc.alias("adc_q"))
        .orderBy(F.asc("adc_q"), F.asc("vec_id"))
        .limit(10)
    )


#: nprobe recall sweep: probe budgets to evaluate, candidates ranked
#: by exact cosine within the probed cells, judged against the
#: unfiltered exact top-IVFR_K.
IVFR_NPROBES = (1, 2, 3)
IVFR_K = 10
IVFR_QUERY_MOD = 25
IVFR_QUERY_CAP = 2000


def _ivfr_oracle() -> str:
    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        PAIR_QUANT,
        QUANT,
    )

    probes = ", ".join(str(p) for p in IVFR_NPROBES)
    return f"""
    WITH flat AS (
      SELECT vec_id, label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), cent AS (
      SELECT label, pos,
             (CAST(SUM(CAST(floor(v * {QUANT}) AS BIGINT)) AS DOUBLE)
              / {QUANT}) / COUNT(*) AS c
      FROM flat GROUP BY label, pos
    ), dots AS (
      SELECT f.vec_id, c.label,
             SUM(CAST(floor((f.v * c.c) * {QUANT}) AS BIGINT)) AS dp
      FROM flat f JOIN cent c ON c.pos = f.pos
      GROUP BY f.vec_id, c.label
    ), assigned AS (
      SELECT vec_id, label AS cell FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dp DESC, label ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ), qset AS (
      SELECT vec_id AS qid FROM embeddings
      WHERE vec_id % {IVFR_QUERY_MOD} = 0 AND vec_id < {IVFR_QUERY_CAP}
    ), cellrank AS (
      SELECT d.vec_id AS qid, d.label,
             ROW_NUMBER() OVER (
               PARTITION BY d.vec_id ORDER BY d.dp DESC, d.label ASC
             ) AS cr
      FROM dots d JOIN qset q ON q.qid = d.vec_id
    ), iv AS (
      SELECT vec_id, pos,
             CAST(floor(v * {PAIR_QUANT}) AS BIGINT) AS q
      FROM flat
    ), nrm AS (
      SELECT vec_id, sqrt(CAST(SUM(q * q) AS DOUBLE)) AS n
      FROM iv GROUP BY vec_id
    ), pd AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, SUM(a.q * b.q) AS dp
      FROM iv a
      JOIN qset qs ON qs.qid = a.vec_id
      JOIN iv b ON b.pos = a.pos AND b.vec_id <> a.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), cos AS (
      SELECT pd.qid, pd.cid,
             CAST(pd.dp AS DOUBLE) / (nq.n * nc.n) AS cosine
      FROM pd
      JOIN nrm nq ON nq.vec_id = pd.qid
      JOIN nrm nc ON nc.vec_id = pd.cid
      WHERE nq.n > 0 AND nc.n > 0
    ), lv AS (
      SELECT unnest([{probes}]) AS nprobe
    ), cand AS (
      SELECT l.nprobe, c.qid, c.cid, c.cosine
      FROM cos c
      JOIN assigned a ON a.vec_id = c.cid
      JOIN cellrank r ON r.qid = c.qid AND r.label = a.cell
      CROSS JOIN lv l
      WHERE r.cr <= l.nprobe
    ), ranked AS (
      SELECT nprobe, qid, cid FROM cand
      QUALIFY row_number() OVER (
        PARTITION BY nprobe, qid ORDER BY cosine DESC, cid
      ) <= {IVFR_K}
    ), truth AS (
      SELECT qid, cid FROM cos
      QUALIFY row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) <= {IVFR_K}
    )
    SELECT CAST(r.nprobe AS BIGINT) AS nprobe,
           CAST(COUNT(DISTINCT r.qid) AS BIGINT) AS n_queries,
           CAST(COUNT(t.cid) AS BIGINT) AS hits,
           CAST(COUNT(t.cid) * 100
                // (COUNT(DISTINCT r.qid) * {IVFR_K}) AS BIGINT)
             AS recall_pct
    FROM ranked r
    LEFT JOIN truth t ON t.qid = r.qid AND t.cid = r.cid
    GROUP BY r.nprobe
    """


@query(
    "ivf_nprobe_recall",
    oracle=_ivfr_oracle(),
    tags=("ann", "eval"),
)
def ivf_nprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe tuning curve — the instrument every IVF deployment
    reads before fixing its probe budget: for nprobe in (1, 2, 3),
    rank the corpus against a fixed query set by exact cosine WITHIN
    the query's top-nprobe coarse cells only, and report recall@10
    vs the unfiltered exact ranking. Closes the ANN instrument set
    (embedding_matryoshka_recall sweeps DIMENSION budget,
    embedding_pq_adc_recall judges CODE fidelity; this sweeps the
    CELL budget — the three axes a serving config actually tunes).

    Scale shape — the matryoshka kernel with a cell mask: the query
    set is fixed-size and ships in the closure with its per-query
    CELL PREFERENCE ORDER (ranked by the exact quantized dot rule the
    IVF family shares); ONE Arrow pass assigns each corpus vector's
    cell (argmax, ties to lowest label — identical to the oracle's
    row_number rule), computes exact int64 pair dots, and emits only
    per-batch top-K per (query, budget) — plus a budget-0 truth
    lane. The global merge is a bounded window; recall math is
    integer floor-division. Determinism: the similarity_pairs
    argument (exact int dots, IEEE division on identical operands,
    vec_id tiebreaks)."""
    import numpy as np  # noqa: PLC0415

    from file_scraper_spark.operators.similarity import (  # noqa: PLC0415
        PAIR_QUANT,
        QUANT,
        embedding_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    out_schema = "nprobe long, n_queries long, hits long, recall_pct long"
    dim_row = emb.select("embedding").head()
    if dim_row is None:
        return spark.createDataFrame([], out_schema)
    dim = len(dim_row[0])
    q_rows = (
        emb.where(
            (F.col("vec_id") % IVFR_QUERY_MOD == 0)
            & (F.col("vec_id") < IVFR_QUERY_CAP)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    q_rows.sort(key=lambda r: r["vec_id"])

    cents = embedding_centroids(spark, sf_dir).collect()
    by_label: dict[int, list[float]] = {}
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * dim)[r["pos"]] = r["centroid"]
    labels = sorted(by_label)

    import math  # noqa: PLC0415

    def pydot(a, b):
        return sum(int(math.floor(x * y * QUANT)) for x, y in zip(a, b))

    qids_l, Qf, cell_rank_rows = [], [], []
    for r in q_rows:
        qv = [float(x) for x in r["embedding"]]
        order = sorted(labels, key=lambda lab: (-pydot(qv, by_label[lab]), lab))
        rank_of = {lab: i + 1 for i, lab in enumerate(order)}
        qids_l.append(r["vec_id"])
        Qf.append(qv)
        cell_rank_rows.append([rank_of[lab] for lab in labels])

    Q = np.floor(np.array(Qf, dtype=np.float64) * PAIR_QUANT).astype(np.int64)
    qn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    qids = np.array(qids_l, dtype=np.int64)
    CR = np.array(cell_rank_rows, dtype=np.int64)  # (nq, L)
    cent_rows = [by_label[lab] for lab in labels]
    budgets = list(IVFR_NPROBES)

    def topk_kernel(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cent_rows, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            Vf = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            vids = pdf["vec_id"].to_numpy()
            prod = Vf[:, None, :] * C[None, :, :]
            cell_idx = np.argmax(
                np.floor(prod * float(QUANT)).sum(axis=2), axis=1
            )  # index into labels, ties -> lowest label
            V = np.floor(Vf * float(PAIR_QUANT)).astype(np.int64)
            cn = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            D = V @ Q.T  # (n, nq)
            out_q, out_p, out_v, out_c = [], [], [], []
            for j in range(len(qids)):
                if qn[j] == 0.0:
                    continue
                r_level = CR[j][cell_idx]  # (n,) rank of each vec's cell
                base = (cn > 0.0) & (vids != qids[j])
                cos = np.where(
                    base, D[:, j] / (cn * qn[j] + (~base)), -np.inf
                )
                for p in [0, *budgets]:
                    keep = base if p == 0 else (base & (r_level <= p))
                    if not keep.any():
                        continue
                    cosk = np.where(keep, cos, -np.inf)
                    k = min(IVFR_K, int(keep.sum()))
                    idx = np.argpartition(-cosk, k - 1)[:k]
                    out_q.extend([qids[j]] * k)
                    out_p.extend([p] * k)
                    out_v.extend(vids[idx])
                    out_c.extend(cosk[idx])
            yield pd.DataFrame(
                {
                    "qid": np.array(out_q, dtype=np.int64),
                    "nprobe": np.array(out_p, dtype=np.int64),
                    "cid": np.array(out_v, dtype=np.int64),
                    "cosine": np.array(out_c, dtype=np.float64),
                }
            )

    from pyspark.sql import Window as W  # noqa: PLC0415

    cand = emb.select("vec_id", "embedding").mapInPandas(
        topk_kernel, "qid long, nprobe long, cid long, cosine double"
    )
    w = W.partitionBy("nprobe", "qid").orderBy(
        F.desc("cosine"), F.asc("cid")
    )
    ranked = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFR_K)
        .select("nprobe", "qid", "cid")
        .localCheckpoint(eager=False)
    )
    truth = ranked.filter(F.col("nprobe") == 0).select(
        F.col("qid").alias("t_qid"), F.col("cid").alias("t_cid")
    )
    return (
        ranked.filter(F.col("nprobe") > 0)
        .join(
            truth,
            (F.col("qid") == F.col("t_qid")) & (F.col("cid") == F.col("t_cid")),
            "left",
        )
        .groupBy("nprobe")
        .agg(
            F.countDistinct("qid").cast("long").alias("n_queries"),
            F.count("t_cid").cast("long").alias("hits"),
            F.expr(
                f"CAST((count(t_cid) * 100) div "
                f"(count(distinct qid) * {IVFR_K}) AS BIGINT)"
            ).alias("recall_pct"),
        )
    )
