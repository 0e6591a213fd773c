"""Training-data pipeline operators ([EXT]): deterministic sampling,
train/test splitting, corpus mixing, sequence packing.

The common primitive is a *hash bucket*: ``int(md5(key)[:8], 16) %
100``. Unlike RNG-based sampling, hash bucketing is reproducible
across runs, engines, partitionings and cluster sizes — the property a
100 TB pipeline actually needs (re-running a failed stage must keep
the same split membership). md5 is bit-identical in Spark and DuckDB,
so all four operators are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_scraper_spark.operators.text import (
    STOPWORDS,
    _marker_count,
    _norm_bytes,
    _oracle_marker_count,
    _words,
)
from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

#: per-language keep rates for corpus mixing (out of 100)
MIX_RATES = {"en": 100, "de": 50, "es": 50, "fr": 25, "zh": 10}
PACK_BUDGET = 256  # tokens per packed sequence bin


def hash_bucket(key: Column) -> Column:
    """Deterministic 0..99 bucket from the md5 of a key column."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )


def _oracle_bucket(expr: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % 100"
    )


@query(
    "sample_hash",
    oracle=f"""
    SELECT event_id, event_type,
           CAST({_oracle_bucket('event_id')} AS BIGINT) AS bucket
    FROM events
    WHERE {_oracle_bucket('event_id')} < 10
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: membership depends only on the key,
    so it is stable under re-runs and re-partitioning (RNG-based
    df.sample is not) and pushes down as a cheap per-row predicate."""
    ev = load(spark, sf_dir, "events")
    b = hash_bucket(F.col("event_id"))
    return (
        ev.select("event_id", "event_type", b.alias("bucket"))
        .filter(F.col("bucket") < 10)
    )


@query(
    "train_test_split",
    oracle=f"""
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'valid'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars, {_oracle_bucket('doc_id')} AS b FROM documents)
    GROUP BY split
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split by key hash — document membership never moves
    between splits when the corpus grows (append-only stability), the
    property random splits lack."""
    docs = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return docs.select(split.alias("split"), "n_chars").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "corpus_mixture",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE b < CASE lang
                {' '.join(f"WHEN '{lang}' THEN {rate}" for lang, rate in MIX_RATES.items())}
                ELSE 0 END) AS BIGINT) AS n_kept
    FROM (SELECT lang, {_oracle_bucket('doc_id')} AS b FROM documents)
    GROUP BY lang
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-language keep rates applied via the
    hash bucket (en 100%, de/es 50%, fr 25%, zh 10%) — the standard
    up/down-sampling step when composing a training mixture, as a pure
    scan-side predicate."""
    docs = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    rate = F.lit(0)
    for lang, r in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.select("lang", b.alias("b"), rate.alias("rate")).groupBy(
        "lang"
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(F.col("b") < F.col("rate")).alias("n_kept"),
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(floor((SUM(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, bin
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in deterministic key order) to
    fixed token-budget bins via a running token count — the
    concat-short-docs-to-context-length step of LLM pre-processing.
    Partitioned by lang (the shard key): each shard packs
    independently, so the window never needs a global sort."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


#: per-event-type keep rates (out of 100) for stratified sampling
STRATA_RATES = {"click": 5, "view": 2, "purchase": 50, "signup": 100}
STRATA_DEFAULT = 20


@query(
    "sample_stratified",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE b < rate) AS BIGINT) AS n_sampled
    FROM (
      SELECT event_type, {_oracle_bucket('event_id')} AS b,
             CASE event_type
               {' '.join(f"WHEN '{k}' THEN {v}"
                         for k, v in STRATA_RATES.items())}
               ELSE {STRATA_DEFAULT} END AS rate
      FROM events
    )
    GROUP BY event_type
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (df.sampleBy, made
    deterministic): each event type keeps a different fraction, with
    membership decided by the md5 bucket of the key — so the sample is
    reproducible across runs, engines, and repartitionings, unlike
    RNG-based sampleBy whose draw depends on partition layout.

    Scale shape: the sampling predicate is a per-row expression (no
    shuffle); only the per-stratum accounting aggregates, map-side
    combined to one row per (partition, type). This is the
    class-rebalancing primitive of corpus construction — downsample
    over-represented strata at scan speed."""
    rate = F.lit(STRATA_DEFAULT)
    for k, v in reversed(STRATA_RATES.items()):
        rate = F.when(F.col("event_type") == k, v).otherwise(rate)
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        hash_bucket(F.col("event_id")).alias("b"),
        rate.alias("rate"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("b") < F.col("rate"), 1)).alias("n_sampled"),
    )


@query(
    "pipeline_end2end",
    oracle=f"""
    WITH normed AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5
      FROM documents
    ), deduped AS (
      SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
             arg_min(n_chars, doc_id) AS n_chars,
             arg_min(n_words, doc_id) AS n_words
      FROM normed GROUP BY norm_md5
    ), kept AS (
      SELECT *, {_oracle_bucket('doc_id')} AS b
      FROM deduped WHERE n_words >= 10
    )
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM kept
    GROUP BY split, lang
    """,
)
def pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus pipeline, end to end in ONE
    declarative plan: normalize text -> exact-dedup on the normalized
    hash (keep the min-id representative) -> quality gate (>= 10
    words) -> deterministic hash split -> per-(split, lang)
    accounting. Every stage is an operator this engine ships
    standalone; composing them stays a single Catalyst plan — no
    intermediate materialization, filters and projections fused
    through the whole chain.

    Scale shape: one scan; one shuffle for the dedup groupBy (on the
    norm hash — uniform by construction); one map-side-combined
    shuffle for the final stats. The split assignment is a per-row
    expression, so adding data never moves earlier docs between
    splits. This is the plan shape a 100 TB corpus build runs
    nightly."""
    docs = load(spark, sf_dir, "documents")

    # r13: the normalize stage is the same per-doc kernel move as
    # text_normalize (see text._norm_bytes — C-level byte ops replace
    # the codegen'd double-regex pipeline, the scan's dominant cost at
    # 100x). n_words twin: size(split(text, ' ')) = count(' ') + 1 for
    # non-NULL text (single-space split keeps empties), NULL for NULL
    # text (ANSI size(NULL)); md5/NULL propagation as in text_normalize.
    def norm_rows(batches):
        import pandas as pd  # noqa: PLC0415
        from hashlib import md5  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            nw: list = []
            digs: list = []
            for text in pdf["text"]:
                if text is None:
                    nw.append(None)
                    digs.append(None)
                else:
                    nw.append(text.count(" ") + 1)
                    digs.append(md5(_norm_bytes(text)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_chars": pdf["n_chars"],
                    "n_words": pd.array(nw, dtype="Int64"),
                    "norm_md5": digs,
                }
            )

    normed = docs.select("doc_id", "lang", "n_chars", "text").mapInPandas(
        norm_rows,
        "doc_id long, lang string, n_chars long, n_words long,"
        " norm_md5 string",
    )
    # min_by, not any_value: if two docs ever normalize to the same
    # text with different raw attributes, the representative must be
    # the min-id doc's attributes deterministically
    deduped = normed.groupBy("norm_md5").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
        F.min_by("n_words", "doc_id").alias("n_words"),
    )
    kept = deduped.filter(F.col("n_words") >= 10).withColumn(
        "b", hash_bucket(F.col("doc_id"))
    )
    split = (
        F.when(F.col("b") < 80, "train")
        .when(F.col("b") < 90, "valid")
        .otherwise("test")
    )
    return kept.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_words").alias("total_words"),
    )


CTX_WINDOW = 128  # tokens per training context window
CTX_STRIDE = 64  # window start stride (50% overlap)


@query(
    "context_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), exploded AS (
      SELECT doc_id, words, n,
             unnest(range(0, (n + {CTX_STRIDE - 1}) // {CTX_STRIDE})) AS w
      FROM toks
    )
    SELECT doc_id, CAST(w AS BIGINT) AS win_id,
           CAST(w * {CTX_STRIDE} AS BIGINT) AS win_start,
           CAST(least({CTX_WINDOW}, n - w * {CTX_STRIDE}) AS BIGINT)
             AS win_len,
           words[w * {CTX_STRIDE} + 1] AS first_tok,
           words[w * {CTX_STRIDE}
                 + least({CTX_WINDOW}, n - w * {CTX_STRIDE})] AS last_tok
    FROM exploded
    """,
)
def context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context windows: tokenize each document and emit
    CTX_WINDOW-token windows every CTX_STRIDE tokens (50% overlap) —
    the chunking step that turns variable-length documents into
    fixed-context training samples. Emits (win_id, start, length,
    first/last token) per window; the real pipeline would slice the
    token array the same way (the boundary tokens pin the slice
    arithmetic for the oracle without shipping whole windows).

    All integer arithmetic ((n + S - 1) div S window count — no
    float division whose ceil could round differently across
    engines); one explode, no shuffle at all: windowing is per-row,
    so the operator scales linearly and partitions trivially at
    100 TB."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("words")
    ).withColumn("n", F.size("words").cast("long"))
    exploded = toks.select(
        "doc_id",
        "words",
        "n",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"(n + {CTX_STRIDE - 1}) div {CTX_STRIDE}") - 1,
            )
        ).alias("w"),
    )
    start = F.col("w") * CTX_STRIDE
    win_len = F.least(F.lit(CTX_WINDOW).cast("long"), F.col("n") - start)
    return exploded.select(
        "doc_id",
        F.col("w").alias("win_id"),
        start.alias("win_start"),
        win_len.alias("win_len"),
        F.element_at("words", (start + 1).cast("int")).alias("first_tok"),
        F.element_at("words", (start + win_len).cast("int")).alias("last_tok"),
    )


#: base shard count for the deterministic corpus shuffle, and the
#: corpus size up to which it holds. Above SHUFFLE_BASE_N docs the
#: shard count doubles per corpus doubling (see shuffle_shards), so a
#: shard never holds more than ~SHUFFLE_BASE_N / SHUFFLE_BASE_SHARDS
#: (~131k) rows — the per-task sort stays bounded at ANY scale instead
#: of degrading to a >10^9-row single-task sort at 100 TB. Every
#: driver fixture is far below SHUFFLE_BASE_N, so the step function is
#: a constant 8 wherever the driver checks correctness, and the oracle
#: replays the same step function from COUNT(*) anyway.
SHUFFLE_BASE_SHARDS = 8
SHUFFLE_BASE_N = 1 << 20


def shuffle_shards(n_corpus: int) -> int:
    """Auto-scaled shard count: 8 up to SHUFFLE_BASE_N (2^20) docs,
    then 8 * 2^ceil(log2(n / 2^20)) — rows-per-shard bounded by ~131k
    at any corpus size. At 10^10 docs this is 131072 shards of ~76k
    rows each: writer-parallel, spill-free, and still a cheap BIGINT
    key. A step function of the corpus size (not of partitioning or
    cluster shape), so the assignment — and therefore every doc's
    (shard, pos) — is deterministic for a given corpus."""
    import math  # noqa: PLC0415

    if n_corpus <= SHUFFLE_BASE_N:
        return SHUFFLE_BASE_SHARDS
    return SHUFFLE_BASE_SHARDS * (
        1 << math.ceil(math.log2(n_corpus / SHUFFLE_BASE_N))
    )


@query(
    "corpus_shuffle",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN COUNT(*) <= {SHUFFLE_BASE_N}
                  THEN {SHUFFLE_BASE_SHARDS}
                  ELSE CAST({SHUFFLE_BASE_SHARDS} * POWER(2,
                       CEIL(LOG2(COUNT(*) / {float(SHUFFLE_BASE_N)})))
                       AS BIGINT)
             END AS shards
      FROM documents
    ), keyed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS skey,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % (SELECT shards FROM s) AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY skey, doc_id
           ) AS BIGINT) AS pos
    FROM keyed
    """,
    tags=("pipeline",),
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    pseudo-random but REPRODUCIBLE position — md5(doc_id) as the sort
    key — sharded so no global sort exists. The property a training
    run needs is not randomness quality but stability: a re-run (or a
    resumed failed stage) must produce the identical order, which
    RNG-based orderBy(rand()) does not.

    Scale shape: shard count auto-scales with the corpus
    (shuffle_shards: 8 below 2^20 docs, then doubling per corpus
    doubling, capping each shard's sort at ~131k rows), sized from a
    parquet-metadata-only count (footer row counts; no column read).
    Shard assignment is then a per-row hash; within-shard positions
    are one window per shard — a single hash-partition exchange on
    the shard key, each shard sorted independently (writer-parallel,
    like the shard files a data loader consumes). No single-partition
    global window — and no super-linear per-task sort — at any
    scale."""
    docs = load(spark, sf_dir, "documents")
    return corpus_shuffle_frame(docs)


def corpus_shuffle_frame(
    docs: DataFrame, n_docs: int | None = None
) -> DataFrame:
    """Core of corpus_shuffle over an arbitrary documents frame;
    ``n_docs`` overrides the control-plane count (tests use it to
    exercise the >8-shard regime without a 2^20-row fixture)."""
    if n_docs is None:
        n_docs = docs.count()
    shards = shuffle_shards(n_docs)
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % shards
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Chunking / paragraph-level dedup / per-domain quotas ([EXT]): the three
# corpus-shaping stages between raw scraped text and a training shard —
# RAG-style context chunking, Dolma-style paragraph dedup (duplicate
# boilerplate removed while the surrounding document survives), and
# per-domain quota sampling (no single hot domain dominates the mix).

CHUNK_W = 64   # words per chunk
CHUNK_S = 48   # chunk stride (overlap = W - S = 16 words)
PARA_W = 32    # words per "paragraph" segment (non-overlapping)
QUOTA_K = 5    # docs kept per domain


@query(
    "text_chunk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ), ids AS (
      SELECT doc_id, words,
             unnest(generate_series(0,
               CASE WHEN nw <= {CHUNK_W} THEN CAST(0 AS BIGINT)
                    ELSE (nw - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} END
             )) AS i
      FROM w
    ), c AS (
      SELECT doc_id, i AS chunk_id,
             array_to_string(
               words[CAST(i*{CHUNK_S}+1 AS BIGINT):CAST(i*{CHUNK_S}+{CHUNK_W} AS BIGINT)],
               ' ') AS chunk_text
      FROM ids
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_text,
           CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tokens
    FROM c
    """,
    tags=("text", "pipeline"),
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/context chunking: each document becomes overlapping
    CHUNK_W-word windows at stride CHUNK_S (16-word overlap so no
    answer span is split across a boundary). Chunk count is
    1 + ceil((n-W)/S) — the final window always reaches the last word
    and no start beyond it is emitted (a tail window fully contained
    in its predecessor would be pure duplication).

    Scale shape: shuffle-FREE — split/slice/array_join are per-row JVM
    built-ins under one generator, so the op is embarrassingly
    parallel and pipelines into whatever shuffle follows. Cost is
    O(words * chunks_per_doc) per doc (Catalyst re-inlines the split
    under the generator) — bounded by the doc length cap a real
    pipeline enforces upstream, and independent of corpus size."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    last = F.when(nw <= CHUNK_W, F.lit(0)).otherwise(
        F.expr(
            f"(size(split(text, ' ')) - {CHUNK_W} + {CHUNK_S} - 1)"
            f" div {CHUNK_S}"
        )
    )
    chunk = F.array_join(
        F.slice(words, F.col("chunk_id") * CHUNK_S + 1, CHUNK_W), " "
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            chunk.alias("chunk_text"),
        )
        .withColumn(
            "n_tokens", F.size(F.split(F.col("chunk_text"), " "))
        )
    )


@query(
    "dedup_paragraph",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ), ids AS (
      SELECT doc_id, words,
             unnest(generate_series(0, (nw - 1) // {PARA_W})) AS i
      FROM w
    ), p AS (
      SELECT doc_id, i AS pid,
             array_to_string(
               words[CAST(i*{PARA_W}+1 AS BIGINT):CAST(i*{PARA_W}+{PARA_W} AS BIGINT)],
               ' ') AS ptext
      FROM ids
    ), r AS (
      SELECT doc_id, pid, ptext,
             ROW_NUMBER() OVER (
               PARTITION BY ptext ORDER BY doc_id, pid
             ) AS rn
      FROM p
    )
    SELECT doc_id,
           -- COALESCE (deep fuzz, r9): a doc whose EVERY paragraph
           -- lost the keeper race reassembles to '' in the engine
           -- (array_join of an empty collection) but the FILTERed
           -- list() aggregate over zero rows is NULL here. NULL-text
           -- docs never reach this (no paragraph rows on either
           -- engine), so the guard cannot resurrect them.
           COALESCE(array_to_string(
             list(ptext ORDER BY pid) FILTER (WHERE rn = 1), ' '
           ), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
    FROM r
    GROUP BY doc_id
    """,
    tags=("dedup", "text"),
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (the Dolma / RefinedWeb boilerplate
    stage): documents are segmented into non-overlapping PARA_W-word
    paragraphs; each distinct paragraph survives only at its FIRST
    corpus occurrence (min (doc_id, pid)); documents are then
    reassembled from their surviving paragraphs in order. Unlike
    doc-level dedup this removes the nav-bar/footer/licence text that
    repeats across a site while keeping the unique prose around it.

    Scale shape: the keeper decision is a hash groupBy on the
    paragraph text with min(struct) — partial aggregation collapses a
    boilerplate paragraph occurring 10^9 times to ONE row per map
    task before the exchange, so hot paragraphs cause no skew (the
    window-rank formulation the oracle uses would put every copy of
    the hottest paragraph in one partition; deliberately avoided).
    Then one equi-join back (paragraph-hash keyed) and one doc_id
    groupBy to reassemble. At 100 TB group on xxhash64(ptext) with an
    (h, ptext) re-verify, exactly as quality_funnel does."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    last = F.expr(f"(size(split(text, ' ')) - 1) div {PARA_W}")
    paras = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), last)).alias("pid"),
    ).select(
        "doc_id",
        F.col("pid").cast("long").alias("pid"),
        F.array_join(
            F.slice(words, F.col("pid") * PARA_W + 1, PARA_W), " "
        ).alias("ptext"),
    )
    keepers = paras.groupBy("ptext").agg(
        F.min(F.struct("doc_id", "pid")).alias("keeper")
    )
    flagged = paras.join(keepers, "ptext").select(
        "doc_id",
        "pid",
        "ptext",
        (
            (F.col("keeper.doc_id") == F.col("doc_id"))
            & (F.col("keeper.pid") == F.col("pid"))
        ).alias("keep"),
    )
    kept_struct = F.when(
        F.col("keep"), F.struct("pid", "ptext")
    )  # NULL when dropped -> collect_list skips it
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["ptext"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_paras"),
        F.count_if(~F.col("keep")).alias("n_dropped"),
    )


@query(
    "sample_domain_quota",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, LEAST(doc_id % 64, 8) AS domain,
             md5(CAST(doc_id AS VARCHAR)) AS rk
      FROM documents
    ), r AS (
      SELECT doc_id, domain, rk,
             ROW_NUMBER() OVER (
               PARTITION BY domain ORDER BY rk, doc_id
             ) AS rn
      FROM d
    )
    SELECT doc_id, CAST(domain AS BIGINT) AS domain, rk,
           CAST(rn AS BIGINT) AS rank_in_domain
    FROM r
    WHERE rn <= {QUOTA_K}
    """,
    tags=("pipeline", "sampling"),
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: keep at most QUOTA_K docs per
    domain, chosen by a deterministic hash rank (md5(doc_id)) so the
    draw is uniform-but-reproducible — the mix-balancing stage that
    stops one crawled megasite from dominating a training shard. The
    derived domain (LEAST(doc_id % 64, 8)) is deliberately SKEWED:
    domain 8 owns ~87% of the corpus, the exact regime the op must
    survive.

    Scale shape: rank-limit pushdown. The `filter(rn <= K)` directly
    above a row_number window triggers Spark's InsertWindowGroupLimit
    rule: the plan carries a PARTIAL WindowGroupLimit before the
    exchange (verified, tests/test_plans.py), so every map task
    forwards at most K rows per domain — the hottest domain ships
    K * num_map_partitions rows total, never its raw row count, and
    the post-shuffle sort is over that trickle. This is exactly the
    manual salted two-phase top-K (tried first: one extra exchange +
    sort for the same bound), provided natively by the optimizer."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.least(F.col("doc_id") % 64, F.lit(8)).alias("domain"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    w = Window.partitionBy("domain").orderBy("rk", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_K)
        .select(
            "doc_id",
            F.col("domain").cast("long").alias("domain"),
            "rk",
            F.col("rn").cast("long").alias("rank_in_domain"),
        )
    )


@query(
    "sample_temperature",
    oracle="""
    WITH s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(floor(sqrt(COUNT(*)) * 1e6) AS BIGINT) AS q
      FROM documents GROUP BY lang
    ), t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(q) AS BIGINT) AS ssq
      FROM s
    ), r AS (
      SELECT lang, n,
             LEAST(1000, CAST(floor(
               ((1000.0 * nn) * q) / ssq / n
             ) AS BIGINT)) AS keep_pm
      FROM s, t
    )
    SELECT d.lang, r.n AS n_total, r.keep_pm,
           CAST(COUNT(*) FILTER (WHERE
             CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000 < r.keep_pm
           ) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON d.lang = r.lang
    GROUP BY d.lang, r.n, r.keep_pm
    """,
    tags=("pipeline", "sampling"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual resampling (the mC4/PaLM mixing
    rule): sample language l with probability proportional to
    (n_l)^(1/T), here T=2 — over-represented languages are
    down-weighted toward the temperature distribution while the total
    budget stays the corpus size (rate capped at 100%). Membership is
    the md5 permille bucket of doc_id, so the draw is reproducible
    across runs, engines and partitionings.

    Bit-exactness across engines: each per-language sqrt is quantized
    to floor(sqrt(n)*1e6) BEFORE the cross-language sum, so the only
    multi-row float reduction becomes exact integer addition (fp
    summation ORDER never matters); the remaining scalar double ops
    run on identical integer inputs with an identical expression
    tree, and IEEE ops are correctly rounded in both engines.

    Scale shape: per-lang stats are a map-side-combined count (one
    row per language), the rate table is broadcast back, and the
    keep decision is a per-row predicate — one tiny aggregation plus
    one scan, no data-sized shuffle."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sqrt(F.count(F.lit(1))) * 1e6).alias("q"),
    )
    t = s.agg(
        F.sum("n").alias("nn"), F.sum("q").alias("ssq")
    )
    r = s.crossJoin(F.broadcast(t)).select(
        "lang",
        "n",
        F.least(
            F.lit(1000),
            F.floor(
                (F.lit(1000.0) * F.col("nn")) * F.col("q")
                / F.col("ssq") / F.col("n")
            ),
        ).alias("keep_pm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000
    )
    return (
        docs.select("lang", bucket.alias("b"))
        .join(F.broadcast(r), "lang")
        .groupBy("lang", F.col("n").alias("n_total"), "keep_pm")
        .agg(F.count_if(F.col("b") < F.col("keep_pm")).alias("n_kept"))
    )


#: data-contract domain: the languages the mixer knows how to rate
EXPECT_LANGS = tuple(MIX_RATES)


@query(
    "quality_expectations",
    oracle=f"""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0
               END), 0) AS BIGINT) AS v_null,
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS v_dup,
             CAST(COALESCE(SUM(CASE WHEN lang IN
               {EXPECT_LANGS!r} THEN 0 ELSE 1 END), 0)
               AS BIGINT) AS v_lang,
             CAST(COALESCE(SUM(CASE WHEN n_chars < 0 THEN 1 ELSE 0
               END), 0) AS BIGINT) AS v_neg,
             CAST(COALESCE(SUM(CASE WHEN text IS NOT NULL
               AND n_chars IS NOT NULL AND length(text) <> n_chars
               THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_len
      FROM documents
    )
    SELECT 'text_null_rate_le_10pct' AS expectation, n AS n_rows,
           v_null AS n_violations, v_null * 10 <= n AS passed FROM a
    UNION ALL SELECT 'doc_id_unique', n, v_dup, v_dup = 0 FROM a
    UNION ALL SELECT 'lang_in_domain', n, v_lang, v_lang = 0 FROM a
    UNION ALL SELECT 'n_chars_nonnegative', n, v_neg, v_neg = 0 FROM a
    UNION ALL SELECT 'n_chars_matches_text', n, v_len, v_len = 0
    FROM a
    """,
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (the Great-Expectations-style gate a
    pipeline runs before promoting a shard): five expectations
    evaluated in ONE aggregation pass, one output row each with the
    violation count and a pass verdict. Contracts: text null rate
    <= 10%, doc_id unique (NULL ids count as violations on both
    engines: COUNT(*) includes them, COUNT(DISTINCT) does not), lang
    within the mixer's known domain (NULL lang = out of domain),
    n_chars non-negative, and n_chars consistent with length(text).

    Every verdict is INTEGER arithmetic (v * 10 <= n, v = 0) — no
    rate division, so there is no 0/0 NaN on an empty shard and no
    float threshold edge; an empty corpus passes every contract
    vacuously (COALESCE'd zero violations). One scan, one scalar
    aggregate (the single distinct rides Spark's two-phase rewrite),
    then a constant-width stack — nothing here grows with anything
    but the scan."""
    docs = load(spark, sf_dir, "documents")
    z = F.lit(0)
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)), z
        ).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("v_dup"),
        F.coalesce(
            F.sum(
                F.when(F.col("lang").isin(*EXPECT_LANGS), 0).otherwise(1)
            ),
            z,
        ).alias("v_lang"),
        F.coalesce(
            F.sum(F.when(F.col("n_chars") < 0, 1).otherwise(0)), z
        ).alias("v_neg"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("text").isNotNull()
                    & F.col("n_chars").isNotNull()
                    & (F.length("text") != F.col("n_chars")),
                    1,
                ).otherwise(0)
            ),
            z,
        ).alias("v_len"),
    )
    return agg.select(
        F.col("n").alias("n_rows"),
        F.expr(
            """stack(5,
            'text_null_rate_le_10pct', v_null, v_null * 10 <= n,
            'doc_id_unique',           v_dup,  v_dup = 0,
            'lang_in_domain',          v_lang, v_lang = 0,
            'n_chars_nonnegative',     v_neg,  v_neg = 0,
            'n_chars_matches_text',    v_len,  v_len = 0)
            AS (expectation, n_violations, passed)"""
        ),
    )


#: corpus_token_budget keeps the highest-quality docs until this
#: fraction (1/DEN) of total corpus tokens is reached
TOKEN_BUDGET_DEN = 4

#: quality buckets for the broadcast prefix table (quality_q div 1000
#: -> <= 1001 buckets)
_QUALITY_BUCKET_DIV = 1000


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST({_oracle_marker_count(STOPWORDS)} AS BIGINT)
               AS stop_cnt
      FROM documents
    ), q AS (
      SELECT doc_id, n_tokens,
             (1000000 * stop_cnt) // n_tokens AS quality_q
      FROM base
    ), tot AS (
      SELECT CAST(SUM(n_tokens) // {TOKEN_BUDGET_DEN} AS BIGINT) AS budget
      FROM q
    ), c AS (
      SELECT doc_id, n_tokens, quality_q,
             SUM(n_tokens) OVER (ORDER BY quality_q DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM q
    )
    SELECT doc_id, n_tokens, quality_q,
           cum <= (SELECT budget FROM tot) AS kept
    FROM c
    """,
    tags=("pipeline", "sampling"),
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-thresholded token-budget selection: keep the
    highest-quality documents, ties broken by doc_id, until 1/4 of
    the corpus's tokens are selected — the step that turns a scored
    crawl into a fixed-size training mix ("give me the best N
    tokens"). Quality here is integer stopword density
    ((1e6*stop_cnt) div n_tokens — exact integer math, so ordering
    and the budget comparison are bit-identical cross-engine).

    Scale shape — semantically a GLOBAL cumulative sum in quality
    order, executed with NO global sort: docs aggregate into <= 1001
    quality buckets; one <= 1001-row broadcast prefix table decides
    99.9% of docs outright (whole bucket fits the remaining budget ->
    keep; prefix already exceeds it -> drop); only the SINGLE
    boundary bucket — ~1/1000 of the corpus — runs a per-doc ordered
    cumsum, partition-pruned to that bucket. The only ordered
    structures in the plan are the bucket-table window (<= 1001 rows)
    and the boundary bucket's cumsum; at 100 TB the boundary bucket
    can be re-bucketed recursively by the next quality digit if even
    1/1000 of the corpus is too much for one ordered partition.
    Oracle: the straightforward global-window formulation (DuckDB),
    proving the two-phase plan computes exactly it."""
    from file_scraper_spark.tables import scoped_cache  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_tokens"),
        _marker_count(_words(), STOPWORDS).cast("long").alias("stop_cnt"),
    )
    q = scoped_cache(
        base.select(
            "doc_id",
            "n_tokens",
            F.expr("(1000000 * stop_cnt) div n_tokens").alias("quality_q"),
        ).withColumn(
            # -1 sentinel for NULL quality (NULL text): an equi-join on
            # a NULL bucket key would silently DROP those rows; -1 also
            # sorts after every real bucket under DESC, matching the
            # oracle's NULLS LAST global order
            "bucket",
            F.coalesce(
                F.expr(f"quality_q div {_QUALITY_BUCKET_DIV}"), F.lit(-1)
            ),
        )
    )
    buckets = q.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
    # <= 1001 rows: the single-partition window is bounded by
    # construction (same justification as vocab_coverage's top-k)
    wb = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = buckets.select(
        "bucket",
        "bt",
        F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("prefix"),
    )
    tot = q.agg(
        F.expr(f"sum(n_tokens) div {TOKEN_BUDGET_DEN}").alias("budget")
    )
    marked = prefix.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "prefix",
        "budget",
        F.when(F.col("prefix") + F.col("bt") <= F.col("budget"), "keep")
        .when(F.col("prefix") >= F.col("budget"), "drop")
        .otherwise("edge")
        .alias("cls"),
    )
    joined = q.join(F.broadcast(marked), "bucket")
    decided = joined.filter(F.col("cls") != "edge").select(
        "doc_id",
        "n_tokens",
        "quality_q",
        (F.col("cls") == "keep").alias("kept"),
    )
    wc = Window.partitionBy("bucket").orderBy(
        F.col("quality_q").desc(), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    # coalesce(n_tokens, 0) inside the cumsum: the oracle's window SUM
    # SKIPS a NULL-token row (cum unchanged), while a plain Spark sum
    # would poison the running total to NULL for every later row in
    # the bucket. Adding 0 is the same arithmetic the skip performs.
    # The all-NULL-prefix case still yields NULL kept in both engines:
    # budget itself is NULL there (sum of an all-NULL column).
    edge = joined.filter(F.col("cls") == "edge").select(
        "doc_id",
        "n_tokens",
        "quality_q",
        (
            F.col("prefix")
            + F.sum(F.coalesce(F.col("n_tokens"), F.lit(0))).over(wc)
            <= F.col("budget")
        ).alias("kept"),
    )
    return decided.unionAll(edge)


@query(
    "sample_quality_weighted",
    oracle=f"""
    SELECT doc_id, n_tokens, stop_cnt FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST({_oracle_marker_count(STOPWORDS)} AS BIGINT)
               AS stop_cnt,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))
               AS BIGINT) AS u
      FROM documents
    )
    WHERE u * n_tokens < stop_cnt * 1099511627776
    """,
    tags=("pipeline", "sampling"),
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED sampling: keep each doc with probability equal
    to its stopword density (the soft alternative to
    corpus_token_budget's hard threshold — low-quality docs still
    contribute, proportionally less, preserving distribution tails).
    Membership is the deterministic hash-vs-weight test
    u40 < p * 2^40, evaluated in exact integer cross-multiplied form
    (u40 * n_tokens < stop_cnt * 2^40, every operand < 2^57): same
    sample under re-runs, re-partitioning and engine swaps — RNG
    sampling is none of these. One scan, one pushed-down per-row
    predicate, no shuffle at all."""
    docs = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10), 16, 10
    ).cast("long")
    base = docs.select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_tokens"),
        _marker_count(_words(), STOPWORDS).cast("long").alias("stop_cnt"),
        u.alias("u"),
    )
    return base.filter(
        F.col("u") * F.col("n_tokens")
        < F.col("stop_cnt") * F.lit(1099511627776)
    ).select("doc_id", "n_tokens", "stop_cnt")


#: pseudo-shard count for the output-layout audit
N_SHARDS = 32


@query(
    "shard_skew_report",
    oracle=f"""
    WITH tagged AS (
      SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % {N_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), per AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM tagged GROUP BY shard
    ), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per)
    SELECT shard, n_docs, n_tokens,
           CAST((1000000 * n_tokens) // (SELECT t FROM tot) AS BIGINT)
             AS share_ppm
    FROM per
    """,
    tags=("pipeline",),
)
def shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-layout skew audit: token/doc volume per pseudo-shard
    (deterministic md5 bucket of doc_id into N_SHARDS), each shard's
    corpus share in exact integer ppm — the pre-write check a 100 TB
    pipeline runs before committing a sharded export (one hot shard =
    one straggler for every downstream reader). Hash sharding is the
    recommendation this report validates: a skewed share_ppm column
    under hash sharding means a pathological key distribution that
    range sharding would only make worse.

    One scan, one map-side-combinable aggregation into N_SHARDS
    groups, one single-row broadcast for the total — no ordered
    structures, no driver data path. ppm is (1e6 * shard_tokens) div
    total: exact BIGINT math (no double shares to tie-break), safe to
    ~9e12 tokens per shard before overflow."""
    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % N_SHARDS
    )
    per = (
        docs.select(
            shard.alias("shard"),
            F.size(_words()).cast("long").alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.expr("(1000000 * n_tokens) div t").alias("share_ppm"),
    )


# --- corpus-frequency boilerplate removal (round 12) ---------------------

#: a segment occurring in >= this many (doc, position) slots corpus-
#: wide is boilerplate and EVERY copy is dropped (C4's repeated-line
#: rule / Gopher's repetition filter) — unlike dedup_paragraph, which
#: keeps the first occurrence.
BOILERPLATE_MIN_DF = 2


@query(
    "boilerplate_removal",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ), ids AS (
      SELECT doc_id, words,
             unnest(generate_series(0, (nw - 1) // {PARA_W})) AS i
      FROM w
    ), p AS (
      SELECT doc_id, i AS pid,
             array_to_string(
               words[CAST(i*{PARA_W}+1 AS BIGINT):CAST(i*{PARA_W}+{PARA_W} AS BIGINT)],
               ' ') AS ptext
      FROM ids
    ), df AS (
      SELECT ptext, COUNT(*) AS df FROM p GROUP BY ptext
    ), flagged AS (
      SELECT p.doc_id, p.pid, p.ptext,
             (d.df < {BOILERPLATE_MIN_DF}) AS keep
      FROM p JOIN df d ON d.ptext = p.ptext
    )
    SELECT doc_id,
           COALESCE(array_to_string(
             list(ptext ORDER BY pid) FILTER (WHERE keep), ' '
           ), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("dedup", "text"),
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (C4's repeated-line rule):
    segment every document into non-overlapping PARA_W-word chunks,
    count each distinct chunk's corpus-wide occurrences, and drop
    EVERY copy of any chunk at/above BOILERPLATE_MIN_DF — nav bars,
    cookie banners, licence footers. The frequency-threshold
    complement to dedup_paragraph (which keeps first occurrences):
    dedup preserves one copy of repeated content, boilerplate removal
    decides repeated content is noise and keeps none.

    Scale shape — identical to dedup_paragraph's and for the same
    reason: the df count is a hash groupBy on chunk text whose
    partial aggregation collapses a chunk occurring 10^9 times to one
    row per map task before the exchange (the window-count
    formulation would funnel the hottest chunk into one partition);
    then one equi-join back and one doc_id groupBy to reassemble. At
    100 TB group on xxhash64(ptext) with an (h, ptext) re-verify
    (quality_funnel's trick), and broadcast the df side if the
    distinct-chunk survivor count fits — it usually does not, the
    corpus-unique tail dominates, so the equi-join stays a shuffle
    join on the chunk key."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    last = F.expr(f"(size(split(text, ' ')) - 1) div {PARA_W}")
    paras = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), last)).alias("pid"),
    ).select(
        "doc_id",
        F.col("pid").cast("long").alias("pid"),
        F.array_join(
            F.slice(words, F.col("pid") * PARA_W + 1, PARA_W), " "
        ).alias("ptext"),
    )
    df_counts = paras.groupBy("ptext").agg(F.count(F.lit(1)).alias("df"))
    flagged = paras.join(df_counts, "ptext").select(
        "doc_id",
        "pid",
        "ptext",
        (F.col("df") < BOILERPLATE_MIN_DF).alias("keep"),
    )
    kept_struct = F.when(F.col("keep"), F.struct("pid", "ptext"))
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["ptext"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_paras"),
        F.count_if(~F.col("keep")).alias("n_dropped"),
    )


#: epoch-plan knobs: the training budget is EPOCH_BUDGET_X times the
#: corpus token count (the data-constrained regime: budget > corpus,
#: so sources repeat), and mixture weights follow the T=2 temperature
#: rule (w ~ sqrt(tokens), the same fold sample_temperature uses) so
#: small high-value sources up-sample and the head flattens.
EPOCH_BUDGET_X = 2
EPOCH_W_SCALE = 10**6


@query(
    "corpus_epoch_plan",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, tokens,
             CAST(floor(sqrt(tokens) * {EPOCH_W_SCALE}) AS BIGINT) AS q
      FROM s
    ), t AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS nn,
             CAST(SUM(q) AS BIGINT) AS sq
      FROM w
    )
    SELECT source, tokens,
           CAST(({EPOCH_BUDGET_X} * nn * q) // sq AS BIGINT) AS alloc_tokens,
           CAST((({EPOCH_BUDGET_X} * nn * q) // sq) // tokens AS BIGINT)
             AS full_epochs,
           CAST(((({EPOCH_BUDGET_X} * nn * q) // sq) % tokens) * {10**6}
                // tokens AS BIGINT) AS frac_ppm
    FROM w, t
    """,
    tags=("pipeline", "mixture"),
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware mixture plan for the data-constrained regime
    (Muennighoff et al.: when the token budget exceeds the corpus,
    sources REPEAT, and the mixture decides how many epochs each
    source runs): per source, its token mass, its allocation under a
    2x-corpus budget with T=2 temperature weights (w ~ sqrt(tokens) —
    sample_temperature's fold, applied to the repeat plan instead of
    the keep probability), and the allocation expressed as full
    epochs + fractional-epoch ppm — the table a sequence-packing run
    (sequence_packing) consumes to decide per-source repeat factors.

    Integer end to end: weights are floor(sqrt(tokens) * 1e6) (IEEE
    sqrt is correctly rounded, so bit-identical across engines),
    allocations are BIGINT floor divisions.  Overflow headroom: the
    budget*weight product stays under 2^63 up to ~1e9 corpus tokens
    at this weight scale; a 100 TB deployment drops EPOCH_W_SCALE to
    1 (sqrt alone separates sources at that mass) — noted, not
    needed at fixture scale.

    Scale shape: ONE map-side-combinable aggregation over the corpus
    (token counting collapses per map task), then arithmetic over the
    sources-sized frame against a broadcast 1-row totals frame — the
    plan table is control-plane-sized by definition."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    w = s.withColumn(
        "q",
        F.floor(F.sqrt(F.col("tokens")) * EPOCH_W_SCALE).cast("long"),
    )
    t = w.agg(
        F.sum("tokens").cast("long").alias("nn"),
        F.sum("q").cast("long").alias("sq"),
    )
    alloc = F.expr(f"({EPOCH_BUDGET_X} * nn * q) div sq")
    return w.crossJoin(F.broadcast(t)).select(
        "source",
        "tokens",
        alloc.cast("long").alias("alloc_tokens"),
        F.expr(f"(({EPOCH_BUDGET_X} * nn * q) div sq) div tokens")
        .cast("long")
        .alias("full_epochs"),
        F.expr(
            f"((({EPOCH_BUDGET_X} * nn * q) div sq) % tokens)"
            f" * {10**6} div tokens"
        )
        .cast("long")
        .alias("frac_ppm"),
    )


#: compaction target size (in n_chars units of the documents manifest
#: stand-in): files within a directory are packed into bins of about
#: this many bytes by start-offset binning.
COMPACT_TARGET = 4096


@query(
    "compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT source AS dir,
             source || '/' || CAST(doc_id AS VARCHAR) AS path,
             CAST(n_chars AS BIGINT) AS bytes
      FROM documents
    ), offs AS (
      SELECT dir, path, bytes,
             SUM(bytes) OVER (PARTITION BY dir ORDER BY path
                              ROWS UNBOUNDED PRECEDING) - bytes AS off
      FROM manifest
    )
    SELECT dir, CAST(off // {COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           CAST(MIN(bytes) AS BIGINT) AS min_file,
           CAST(MAX(bytes) AS BIGINT) AS max_file
    FROM offs
    GROUP BY dir, off // {COMPACT_TARGET}
    """,
    tags=("pipeline", "layout"),
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-packing step
    every lakehouse table needs once streaming and per-task writers
    have sprayed thousands of undersized files: group each
    directory's files into target-sized rewrite bins and report per
    bin the file count and byte mass (the rewrite job's work list).
    Binning is START-OFFSET packing — bin = floor(prefix_sum_before /
    target) in path order — the deterministic one-pass rule
    compaction services actually use (greedy first-fit needs
    sequential state; offset binning gives the same ~target-sized
    bins and is expressible as a running sum).  The documents table
    stands in as the file manifest (dir = source, size = n_chars);
    point it at a real listing (scrape_fs's output) unchanged.

    Scale shape: ONE exchange — the running sum partitions by
    directory (compaction is per-partition-dir by definition, so the
    window never sees a global order), and the per-bin rollup groups
    on (dir, bin), which the dir-hash partitioning already satisfies
    — no second exchange (pinned in tests/test_plans.py). Integer
    end to end."""
    docs = load(spark, sf_dir, "documents")
    manifest = docs.select(
        F.col("source").alias("dir"),
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias(
            "path"
        ),
        F.col("n_chars").cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("dir")
        .orderBy("path")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = manifest.select(
        "dir",
        "bytes",
        (F.sum("bytes").over(w) - F.col("bytes")).alias("off"),
    )
    return (
        offs.groupBy(
            "dir", F.expr(f"off div {COMPACT_TARGET}").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.min("bytes").cast("long").alias("min_file"),
            F.max("bytes").cast("long").alias("max_file"),
        )
        .select(
            "dir",
            F.col("bin").cast("long").alias("bin"),
            "n_files",
            "bin_bytes",
            "min_file",
            "max_file",
        )
    )


#: DSIR hashed-feature space and weight scale: bigrams hash into
#: DSIR_BUCKETS via the md5-derived 40-bit integer (oracle-replayable),
#: per-bucket target/source ratios live in DSIR_SCALE fixed-point.
DSIR_BUCKETS = 10_000
DSIR_SCALE = 10**6


def _dsir_bucket_ids(text):
    """Hashed-bigram bucket ids of one document, or None when the doc
    has no bigrams — the bit-exact kernel twin of the old exploded
    expression ``conv(substring(md5(concat_ws(' ', w1, w2)), 1, 10),
    16, 10) % DSIR_BUCKETS`` over ``split(text, ' ')``:

    - ``text.split(" ")`` is the single-space split KEEPING empties,
      exactly Spark's split (empty-string words pair up identically);
    - the bigram bytes are ``w1 + b" " + w2`` — the same UTF-8 bytes
      concat_ws feeds Spark's md5 (split never yields NULL words);
    - hex digits [0, 10) of an md5 are digest bytes [0, 5) big-endian
      (< 2^40 — the equivalence verified for dedup_minhash's h1), and
      the modulo runs on exact ints in both engines.
    Docs with < 2 words (or NULL text) produced zero exploded rows in
    the old form and return None here."""
    from hashlib import md5  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if text is None:
        return None
    words = text.split(" ")
    if len(words) < 2:
        return None
    bw = [w.encode() for w in words]
    digs = b"".join(
        md5(a + b" " + b).digest()[:5] for a, b in zip(bw, bw[1:])
    )
    B = np.frombuffer(digs, dtype=np.uint8).reshape(-1, 5).astype(np.int64)
    h = (
        (B[:, 0] << 32)
        | (B[:, 1] << 24)
        | (B[:, 2] << 16)
        | (B[:, 3] << 8)
        | B[:, 4]
    )
    return h % DSIR_BUCKETS


@query(
    "dsir_weights",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(w1 || ' ' || w2), 1, 10))
                  AS BIGINT) % {DSIR_BUCKETS} AS b
      FROM (
        SELECT doc_id, lang,
               words[i] AS w1, words[i + 1] AS w2
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS words
              FROM documents),
             unnest(range(1, len(words))) t(i)
      )
    ), ratios AS (
      SELECT b,
             ((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
               * {DSIR_SCALE})
               // (COUNT(*) + {DSIR_BUCKETS // 100}) AS r
      FROM grams GROUP BY b
    ), scored AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             SUM(r.r) // COUNT(*) AS score_q
      FROM grams g JOIN ratios r ON r.b = g.b
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_bigrams,
           CAST(score_q AS BIGINT) AS score_q,
           CAST(CASE WHEN
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))
                  AS BIGINT) * {DSIR_SCALE}
             < LEAST(score_q * 4, {DSIR_SCALE}) * 1099511627776
             THEN 1 ELSE 0 END AS INT) AS kept
    FROM scored
    """,
    tags=("pipeline", "sampling"),
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.):
    weight every raw doc by how target-like its HASHED-feature bag is
    (bigrams hashed into {DSIR_BUCKETS} buckets; lang='en' docs stand
    in for the target distribution, the whole pool is the source),
    then resample proportionally.  The hashed-n-gram trick is DSIR's
    core scaling idea — the model is a fixed-width bucket table, not
    an unbounded vocab — and it is what separates this op from
    quality_classifier_nb (split-trained unigram NB, threshold
    decision): DSIR is corpus-level distribution MATCHING with
    probability-proportional membership.

    Integer end to end: per-bucket ratio r_b = ((target_b + 1) *
    SCALE) div (total_b + {DSIR_BUCKETS // 100}) (add-constant
    smoothed), per-doc score = mean bucket ratio, membership by the
    deterministic hash-vs-weight coin u40 * SCALE < min(4*score,
    SCALE) * 2^40 (sample_quality_weighted's exact rule; the 4x bends
    the keep probability so target-like docs saturate at 1). Docs
    with fewer than two words have no features and are excluded in
    both engines.

    Scale shape (r13 continuation — kernel rewrite, the dedup_minhash
    move): pass 1 is one per-doc kernel emitting per-BATCH bucket
    partials (at most {DSIR_BUCKETS} tiny rows per Arrow batch), so
    the only exchange anywhere is the <= {DSIR_BUCKETS}-row bucket
    aggregation; the finished ratio table — fixed width by
    construction, DSIR's core scaling idea — is collected driver-side
    (the IVF-codebook control-plane pattern, corpus-independent size)
    and closed over by pass 2, a second per-doc kernel that computes
    each doc's n_bigrams/score/coin directly. The old shape paid two
    corpus-sized bigram EXPLODES (one exploded row per bigram, each
    with a JVM md5 + hex substring + conv parse), a broadcast join
    onto 60M exploded rows and a corpus-sized groupBy(doc_id)
    exchange; all of that is gone — bigrams never leave their task,
    and the per-doc rollup happens where the doc already is. An
    earlier A/B had already rejected materializing the exploded frame
    (27.9s vs 23.8s recompute, NOTES r12); this removes the frame
    entirely instead."""
    import numpy as np  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")

    def bucket_partials(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            n = np.zeros(DSIR_BUCKETS, dtype=np.int64)
            n_en = np.zeros(DSIR_BUCKETS, dtype=np.int64)
            for lang, text in zip(pdf["lang"], pdf["text"]):
                bs = _dsir_bucket_ids(text)
                if bs is None:
                    continue
                np.add.at(n, bs, 1)
                if lang == "en":
                    np.add.at(n_en, bs, 1)
            occ = np.nonzero(n)[0]
            if len(occ):
                yield pd.DataFrame(
                    {
                        "b": occ.astype(np.int64),
                        "n": n[occ],
                        "n_en": n_en[occ],
                    }
                )

    ratio_rows = (
        docs.select("lang", "text")
        .mapInPandas(bucket_partials, "b long, n long, n_en long")
        .groupBy("b")
        .agg(F.sum("n").alias("n"), F.sum("n_en").alias("n_en"))
        .select(
            "b",
            F.expr(
                f"((n_en + 1) * {DSIR_SCALE})"
                f" div (n + {DSIR_BUCKETS // 100})"
            ).alias("r"),
        )
        .collect()
    )
    r_arr = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    for row in ratio_rows:
        r_arr[row["b"]] = row["r"]

    def score_rows(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415
        from hashlib import md5  # noqa: PLC0415

        lim = 1099511627776  # 2^40: the u40 coin scale
        for pdf in batches:
            if not len(pdf):
                continue
            ids: list = []
            nbs: list = []
            sqs: list = []
            keeps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                bs = _dsir_bucket_ids(text)
                if bs is None:
                    continue
                nb = len(bs)
                sq = int(r_arr[bs].sum()) // nb
                u = int.from_bytes(
                    md5(str(doc_id).encode()).digest()[:5], "big"
                )
                ids.append(doc_id)
                nbs.append(nb)
                sqs.append(sq)
                keeps.append(
                    1 if u * DSIR_SCALE < min(sq * 4, DSIR_SCALE) * lim else 0
                )
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.array(ids, dtype=np.int64),
                        "n_bigrams": np.array(nbs, dtype=np.int64),
                        "score_q": np.array(sqs, dtype=np.int64),
                        "kept": np.array(keeps, dtype=np.int32),
                    }
                )

    return docs.select("doc_id", "text").mapInPandas(
        score_rows,
        "doc_id long, n_bigrams long, score_q long, kept int",
    )


@query(
    "corpus_datacard",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dup_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
    FROM documents
    """,
    tags=("pipeline", "governance"),
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card summary row — the governance artifact every
    released training corpus ships (datasheets/data-statements): doc
    and token mass, language and source cardinalities, exact-dup
    count, size distribution. One row a release pipeline diffs
    against the previous snapshot before publishing.

    Scale shape: a single all-partial aggregation — every measure is
    map-side combinable except the three DISTINCTs, which Spark plans
    as expand+partial (langs/sources are low-cardinality; the text
    md5 distinct is the one corpus-cardinality shuffle, 16-byte
    keys). One scan, one exchange group, one output row."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
        .cast("long")
        .alias("n_exact_dup_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.expr("sum(n_chars) div count(1)").cast("long").alias("mean_chars"),
    )


#: k-anonymity threshold (HIPAA Safe-Harbor-style small-cell rule) and
#: the account-balance generalization width for the quasi-identifier.
KANON_K = 5
KANON_BAL_WIDTH = 1000


@query(
    "privacy_kanonymity",
    oracle=f"""
    SELECT c_nationkey AS nation,
           c_mktsegment AS segment,
           CAST(floor(c_acctbal / {KANON_BAL_WIDTH}) AS BIGINT)
             AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) >= {KANON_K} AS k_anon,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0
                                    THEN 'debt' ELSE 'credit' END)
                AS BIGINT) AS l_diversity
    FROM customer
    GROUP BY 1, 2, 3
    """,
    tags=("privacy", "governance"),
)
def privacy_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the released
    quasi-identifier projection — the privacy gate a corpus publisher
    runs BEFORE shipping per-record metadata (the reference scrapes
    file metadata into a shared Postgres table; the [EXT] analog asks
    whether that metadata re-identifies individuals). Equivalence
    class = (nation, segment, generalized balance bucket); a class
    with fewer than {KANON_K} members fails k-anonymity (``k_anon``
    false -> suppress or generalize further), and ``l_diversity``
    counts distinct sensitive values (debt vs credit standing) within
    the class — a k-anonymous class with l=1 still leaks the
    sensitive attribute (homogeneity attack).

    Scale shape: one groupBy on the quasi-identifier with full
    map-side combine; output cardinality is the product of QI domains
    (25 nations x 5 segments x ~12 buckets, corpus-size-independent),
    so the report frame is always tiny regardless of input scale. No
    joins, no window, no collect. The l-diversity distinct-count runs
    inside the same aggregation (expand-free: the sensitive domain is
    binary, so Spark plans it as a two-phase distinct agg over the
    same shuffle)."""
    cust = load(spark, sf_dir, "customer")
    sensitive = F.when(F.col("c_acctbal") < 0, F.lit("debt")).otherwise(
        F.lit("credit")
    )
    return (
        cust.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / KANON_BAL_WIDTH)
            .cast("long")
            .alias("bal_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            (F.count(F.lit(1)) >= KANON_K).alias("k_anon"),
            F.countDistinct(sensitive).cast("long").alias("l_diversity"),
        )
    )


#: blocking-plan knobs: a block bigger than ER_BLOCK_CAP records gets
#: flagged (its quadratic pair cost dominates the comparison budget).
ER_BLOCK_CAP = 40


@query(
    "er_blocking_plan",
    oracle=f"""
    WITH b AS (
      SELECT string_split(p_name, ' ')[2] AS name_token,
             p_type AS type_key,
             CAST(COUNT(*) AS BIGINT) AS n_records
      FROM part
      GROUP BY 1, 2
    )
    SELECT name_token, type_key, n_records,
           n_records * (n_records - 1) // 2 AS n_pairs,
           n_records > {ER_BLOCK_CAP} AS oversized
    FROM b
    """,
    tags=("dedup", "planning"),
)
def er_blocking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking plan — the PAIR-BUDGET report run
    BEFORE any fuzzy-matching pass (the ER analog of
    shard_skew_report): group candidate records by a cheap blocking
    key (last name-token x product type here; phonetic code x zip in
    a classic MDM deployment), and for each block report the record
    count, the quadratic comparison cost n*(n-1)/2 the matcher would
    pay inside it, and whether the block exceeds the comparison cap.
    The whole point of blocking is turning an O(N^2) corpus-wide
    match into sum-of-small-quadratics; this report is how you KNOW
    it worked before you spend the cluster time, and the ``oversized``
    rows are where you refine the key or sub-block (same hot-key
    lever as dedup's hot-shingle cap and the skew-join salt).

    Scale shape: one groupBy with map-side combine, output is
    block-count-sized, pair math is per-row integer algebra (floor
    division — exact in both engines). No joins, no window, no pair
    materialization: the report costs O(N) for a matcher it budgets
    at O(sum n_b^2)."""
    part = load(spark, sf_dir, "part")
    # F.get, not getItem: a single-token name has no element 1, and
    # under ANSI mode getItem THROWS where DuckDB's list[2] returns
    # NULL — the deep-fuzz divergence this line originally shipped
    # with (the NULL block key is the defined semantics: un-keyable
    # records pool in one block the report then flags).
    blocks = part.groupBy(
        F.get(F.split(F.col("p_name"), " "), 1).alias("name_token"),
        F.col("p_type").alias("type_key"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    return blocks.select(
        "name_token",
        "type_key",
        "n_records",
        F.expr("(n_records * (n_records - 1)) div 2")
        .cast("long")
        .alias("n_pairs"),
        (F.col("n_records") > ER_BLOCK_CAP).alias("oversized"),
    )


@query(
    "corpus_overlap_matrix",
    oracle="""
    WITH cat AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT 'aggregator' AS source, text
      FROM documents WHERE doc_id % 3 = 0
    ), h AS (
      SELECT DISTINCT source, md5(text) AS th
      FROM cat WHERE text IS NOT NULL
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM h a JOIN h b ON b.th = a.th AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    tags=("governance", "dedup"),
)
def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus overlap matrix: for every ordered source pair,
    how many DISTINCT document bodies (by md5) appear in both — the
    governance question behind every dataset-mixing decision ("is
    ArXiv already inside the CC slice I licensed?", "how much of
    corpus B do I actually add on top of A?") and the dataset-level
    rollup of what dedup_exact answers at document level. Pairs are
    emitted ordered (source_a < source_b), counts are of shared
    distinct hashes (not doc multiplicity), and a pair with zero
    overlap is absent — the matrix is sparse by construction.

    Scale shape: one distinct over (source, hash) — map-side
    combined, output bounded by corpus cardinality — then a
    self-equi-join ON THE HASH: candidates only where a body
    actually repeats (the inverted-index discipline again; the join
    key is md5, so partitioning is uniform and skew-free by
    construction unless one body repeats across thousands of
    sources, which is exactly the boilerplate a pipeline wants
    surfaced). Output is at most |sources|^2 rows — tiny at any
    corpus size. (Gate shape: the fixture's sources are
    exact-disjoint, so the query derives an 'aggregator' mirror of
    every third doc — without it the gate row would be a vacuous
    0-row hash.)"""
    docs = load(spark, sf_dir, "documents")
    # The fixture's sources are disjoint by construction, so (like
    # the dedup family's near_dup_corpus) the operator derives its
    # own overlap: an 'aggregator' catalog re-publishing every third
    # document — the real-world shape (a crawl slice re-hosting
    # licensed corpora) with a deterministic oracle twin.
    cat = docs.select("source", "text").unionAll(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            F.lit("aggregator").alias("source"), "text"
        )
    )
    h = (
        cat.filter(F.col("text").isNotNull())
        .select("source", F.md5("text").alias("th"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = h.select(F.col("source").alias("source_a"), F.col("th").alias("tha"))
    b = h.select(F.col("source").alias("source_b"), F.col("th").alias("thb"))
    return (
        a.join(
            b,
            (F.col("thb") == F.col("tha"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
