"""Registry-level corpus fuzzing: the gate queries on ADVERSARIAL data.

The driver gate and tools/check_correctness.py run every registered
query against its DuckDB oracle — but always on the ONE fixed synthetic
fixture. Data-dependent divergences hide there: empty corpora, empty
texts, single-word docs, exact-duplicate docs, unicode tokens, ids on
the perturbation boundary (doc_id % 5), degenerate vocabularies where
every shingle is hot. This harness generates random `documents` tables
with exactly those shapes, writes each to a throwaway parquet dir, and
replays a randomly drawn documents-backed REGISTRY query — the real
registered fn against its real registered oracle — comparing sorted
column names + row count + the same canonical value hash as the gate.

Scope: queries whose oracle reads ONLY `documents` (other tables don't
exist in the throwaway dir) and whose cost is bounded on a ~20-doc
corpus. The spec under test is the registry entry itself, so a failure
here is a genuine engine-vs-oracle divergence on legal input, never a
transcription accident.

Budget: N_EXAMPLES per run (env SPARK_GRAFT_FUZZ_EXAMPLES cranks it,
same knob as test_fuzz_duckdb); each example runs ONE query.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_scraper_spark import registry
from tools.check_correctness import duckdb_run, value_hash

registry._ensure_loaded()

N_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "25"))

#: documents-only, bounded-cost registry queries. Excluded on purpose:
#: pipeline_end2end (composed, pays the whole dedup stage per example),
#: csv/json/xml roundtrips (file-format IO, covered by their own gate
#: rows), multimodal_* (binary-column plumbing, fixture-shape-specific
#: width assumptions), udf_arrow_*/udtf (worker spin-up dominates, the
#: scalar surface is already covered by udf_surface in the gate).
QUERIES = (
    "boilerplate_removal",
    "bpe_train_steps",
    "compaction_plan",
    "contamination_check",
    "corpus_curriculum",
    "corpus_epoch_plan",
    "dedup_soft_weights",
    "dedup_winnowing",
    "dsir_weights",
    "gopher_quality_gate",
    "quality_classifier_nb",
    "quality_ensemble",
    "tokenizer_vocab_apply",
    "unigram_tokenize_cost",
    "unigram_train_steps",
    "context_windows",
    "corpus_mixture",
    "corpus_overlap_matrix",
    "corpus_shuffle",
    "corpus_token_budget",
    "dedup_cluster_cap",
    "dedup_clusters",
    "dedup_clusters_sampled",
    "dedup_cdc_chunks",
    "dedup_cdc_chunks_indexed",
    "dedup_containment",
    "dedup_containment_sampled",
    "dedup_editdistance",
    "dedup_editdistance_sampled",
    "dedup_exact",
    "dedup_exact_substring",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "dedup_jaccard_sampled",
    "dedup_keep_best",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_paragraph",
    "dedup_simhash",
    "dedup_url",
    "decontaminate_filter",
    "doc_fingerprint",
    "path_split",
    "profile_table",
    "quality_expectations",
    "quality_funnel",
    "sample_domain_quota",
    "sample_quality_weighted",
    "sample_temperature",
    "sequence_packing",
    "shard_skew_report",
    "snapshot_diff",
    "text_chunk",
    "text_bm25_topk",
    "text_collocations_pmi",
    "text_phrase_search",
    "text_phrase_search_indexed",
    "text_search_boolean",
    "text_diversity",
    "text_heavy_hitters",
    "text_langid",
    "text_ccnet_buckets",
    "text_lm_score",
    "text_normalize",
    "text_quality",
    "text_redact",
    "text_repetition",
    "text_tfidf_topterms",
    "text_tokens",
    "text_topn_ngrams",
    "text_wordcount",
    "train_test_split",
)

#: small vocabulary => forced collisions: hot shingles, duplicate
#: texts, tied counts. Mixes ASCII, digits, unicode, a stopword, and
#: PII-shaped tokens (text_redact's regexes must agree cross-engine).
WORDS = (
    "the", "a", "data", "spark", "café", "中文",
    "x1", "zz", "q", "lorem", "7", "bob@x.io",
)

#: ~1-in-8 NULL text: the fixtures are NULL-free, so without this no
#: registry query has ever seen a NULL in a nullable column — but a
#: scraped corpus with missing bodies is production-normal, and both
#: engines NULL-propagate through split/len/md5/lower identically
_plain_text = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=12
).map(" ".join)
_texts = st.integers(0, 7).flatmap(
    lambda i: st.none() if i == 0 else _plain_text
)

#: 0..22 docs; sequential ids hit the doc_id % 5 == 0 perturbation
#: branch of near_dup_corpus by construction
_corpora = st.lists(_texts, min_size=0, max_size=22)


def _write_documents(rows: list[tuple]) -> str:
    d = tempfile.mkdtemp(prefix="fss_fuzz_docs_")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


#: queries whose DuckDB oracle is exact only on ASCII text (byte- vs
#: code-point-counting levenshtein; see dedup_editdistance docstring)
ASCII_DOMAIN_QUERIES = frozenset(
    {"dedup_editdistance", "dedup_editdistance_sampled"}
)
#: ASCII stand-ins preserving word multiplicity structure
_ASCII_SUBS = {"café": "kafe", "中文": "zhw"}


@given(texts=_corpora, data=st.data())
@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_docs_backed_registry_queries_on_random_corpora(spark, texts, data):
    qname = data.draw(st.sampled_from(QUERIES))
    if qname in ASCII_DOMAIN_QUERIES:
        # documented cross-engine domain (cf. MAP_DOMAIN_QUERIES):
        # edit distance counts CODE POINTS in the engine (Spark
        # levenshtein == Myers kernel) but BYTES in DuckDB's
        # levenshtein, so the oracle replays exactly on ASCII only —
        # divergence pinned in test_fuzz_duckdb.py
        texts = [
            None
            if t is None
            else " ".join(_ASCII_SUBS.get(w, w) for w in t.split(" "))
            for t in texts
        ]
    langs = ("en", "de", "zz")
    rows = [
        (
            i,
            t,
            langs[i % len(langs)],
            f"s3://bkt/p{i % 3}/f{i}.txt",
            len(t) if t is not None else None,
        )
        for i, t in enumerate(texts)
    ]
    d = _write_documents(rows)
    try:
        spec = registry.REGISTRY[qname]
        sdf = spec.fn(spark, d)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        o_cols, o_rows = duckdb_run(d, spec.oracle)
        assert sorted(s_cols) == sorted(o_cols), (
            f"{qname}: schema {sorted(s_cols)} vs {sorted(o_cols)}"
        )
        assert len(s_rows) == len(o_rows), (
            f"{qname}: {len(s_rows)} vs {len(o_rows)} rows on {rows!r}"
        )
        assert value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows), (
            f"{qname}: value hash mismatch on corpus {rows!r}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


#: embeddings-only, bounded-cost queries. Excluded: dedup_embedding /
#: knn_join (their static 8-bit-band oracles are pinned to the fixture
#: scale — see _STATIC_BAND_QUERIES in tools/check_correctness.py),
#: the ANN probes (fixture-dimension hyperplanes + driver-side probe
#: selection, gate-covered).
EMB_QUERIES = (
    "dedup_semdedup",
    "knn_classify",
    "embedding_gram",
    "embedding_centroids",
    "embedding_quantize",
    "ivf_nprobe_recall",
    "similarity_maxsim",
    "similarity_pairs",
    "similarity_topk",
    "unnest_explode",
    "unnest_outer",
)

#: tiny value pool => constant vectors, tied cosines, zero vectors and
#: duplicate embeddings arise naturally (all exact float32 values)
_VALS = (-4.0, -1.5, 0.0, 0.25, 1.0, 2.5)


def _write_embeddings(vecs: list[list[float]]) -> str:
    d = tempfile.mkdtemp(prefix="fss_fuzz_emb_")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [i % 3 for i in range(len(vecs))], pa.int32()
            ),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return d


@given(
    dim=st.integers(min_value=1, max_value=6),
    n=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_embeddings_backed_registry_queries_on_random_corpora(
    spark, dim, n, data
):
    qname = data.draw(st.sampled_from(EMB_QUERIES))
    vecs = data.draw(
        st.lists(
            st.lists(
                st.sampled_from(_VALS), min_size=dim, max_size=dim
            ),
            min_size=n,
            max_size=n,
        )
    )
    d = _write_embeddings(vecs)
    try:
        spec = registry.REGISTRY[qname]
        sdf = spec.fn(spark, d)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        o_cols, o_rows = duckdb_run(d, spec.oracle)
        assert sorted(s_cols) == sorted(o_cols), (
            f"{qname}: schema {sorted(s_cols)} vs {sorted(o_cols)}"
        )
        assert len(s_rows) == len(o_rows), (
            f"{qname}: {len(s_rows)} vs {len(o_rows)} rows on {vecs!r}"
        )
        assert value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows), (
            f"{qname}: value hash mismatch on corpus {vecs!r}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


#: events-only, bounded-cost queries. Excluded: stream_* (memory-sink
#: harness spin-up dominates; the streaming semantics have their own
#: gate + test_streaming coverage), json/csv/xml roundtrips (file IO),
#: scrape_merge_full (drives the whole scrape pipeline),
#: agg_approx_distinct / hll_sketch_merge / bitmap_distinct /
#: approx_quantile (sketch-estimate envelopes are calibrated to
#: fixture-scale cardinalities), recursive_cte (session-conf scoped,
#: covered by its own gate row), zorder_layout (fixture-range
#: bit-interleave constants).
EV_QUERIES = (
    "anomaly_mad",
    "interval_join",
    "agg_bitwise",
    "agg_distinct",
    "agg_minmax_by",
    "antijoin_deleted",
    "array_agg_funcs",
    "asof_join",
    "conditional_agg",
    "date_arith",
    "funnel_analysis",
    "event_pattern_match",
    "map_funcs",
    "map_transform_funcs",
    "merge_upsert",
    "microbatch_window",
    "null_handling",
    "pivot_agg",
    "retention_cohort",
    "salted_agg",
    "sample_hash",
    "sample_stratified",
    "scalar_datetime_math_json",
    "scalar_try_funcs",
    "scd2_history",
    "sessionize",
    "timeseries_ema",
    "timeseries_gapfill",
    "timeseries_locf",
    "timeseries_ohlc",
    "timeseries_rollup",
    "union_seen",
    "unpivot_stack",
    "winsorize_stats",
    "window_lag_frame",
    "window_rank_stats",
    "window_time_range",
)

EVENT_TYPES_POOL = ("click", "view", "purchase", "signup", "zz")
#: exact-double values: ties, zeros, negatives
VALUES_POOL = (0.0, 1.0, -2.5, 0.25, 100.0, 1.0)
#: valid, nested, empty-object, and MALFORMED props — malformed JSON
#: is production-plausible and must degrade per each op's try-/
#: get-semantics, not crash
PROPS_POOL = (
    '{"a": 1}',
    '{"a": {"b": [1, 2]}}',
    '{"tag": "x", "n": 7}',
    "{}",
    "",
    "not json",
)
#: flat integer-valued objects: the documented cross-engine domain of
#: the map-parsing queries (Spark's from_json map<string,bigint> nulls
#: the WHOLE map on any non-bigint value, DuckDB's JSON->MAP cast
#: coerces per-value — outside this domain the two parses legitimately
#: differ, see the map_funcs oracle comment)
FLAT_INT_PROPS = (
    '{"k": 77}',
    '{"k": 3, "j": 900}',
    "{}",
    '{"a": 1}',
    '{"k": 0, "a": -5}',
)
MAP_DOMAIN_QUERIES = frozenset({"map_funcs", "map_transform_funcs"})

#: one-day micro-second window => bounded gapfill/rollup series
_TS_BASE = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
_TS_SPAN = 86_400_000_000


def _write_events(rows: list[tuple]) -> str:
    d = tempfile.mkdtemp(prefix="fss_fuzz_ev_")
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@given(
    n=st.integers(min_value=1, max_value=30),
    data=st.data(),
)
@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_events_backed_registry_queries_on_random_corpora(spark, n, data):
    qname = data.draw(st.sampled_from(EV_QUERIES))
    props_pool = (
        FLAT_INT_PROPS if qname in MAP_DOMAIN_QUERIES else PROPS_POOL
    )

    def maybe(pool):
        # ~1-in-8 NULL per nullable cell: the fixtures are NULL-free,
        # so this is the only place registry queries meet real NULLs
        if data.draw(st.integers(0, 7)) == 0:
            return None
        return data.draw(st.sampled_from(pool))

    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                _TS_BASE
                + data.draw(
                    st.integers(min_value=0, max_value=_TS_SPAN)
                ),
                maybe(tuple(range(5))),
                maybe(EVENT_TYPES_POOL),
                maybe(VALUES_POOL),
                maybe(props_pool),
            )
        )
    d = _write_events(rows)
    try:
        spec = registry.REGISTRY[qname]
        sdf = spec.fn(spark, d)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        o_cols, o_rows = duckdb_run(d, spec.oracle)
        assert sorted(s_cols) == sorted(o_cols), (
            f"{qname}: schema {sorted(s_cols)} vs {sorted(o_cols)}"
        )
        assert len(s_rows) == len(o_rows), (
            f"{qname}: {len(s_rows)} vs {len(o_rows)} rows on {rows!r}"
        )
        assert value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows), (
            f"{qname}: value hash mismatch on events {rows!r}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


#: TPC-H-table-backed, bounded-cost queries (the 21 shape suite + the
#: relational surface). Excluded: orc/xml/csv/partitioned write-read
#: roundtrips and file_metadata_cols (file IO, gate-covered).
TPCH_QUERIES = (
    "agg_groupby",
    "agg_median_mode",
    "collation_compare",
    "filter_predicate",
    "grouping_sets",
    "histogram_bucket",
    "join_family",
    "lateral_topn",
    "mime_lookup",
    "null_aware_antijoin",
    "rollup_cube",
    "scan_project",
    "setops",
    "setops_all",
    "subquery_family",
    "topk_sort_limit",
    "window_distribution",
    "window_first_last",
    "window_rank",
    "privacy_kanonymity",
    "graph_triangle_count",
    "graph_hits",
    "graph_kcore_peel",
    "graph_link_predict",
    "zonemap_prune_report",
    "er_blocking_plan",
) + tuple(f"tpch_q{i}_shape" for i in range(2, 23))

_TPCH_TS_BASE = 789_000_000_000_000  # 1995-01-02T06:40Z in micros
_TPCH_TS_SPAN = 6 * 365 * 86_400_000_000  # ~6 years, spans the shapes'
#                                           literal date predicates
_PRICE_POOL = (0.0, 999.99, 25000.0, 49999.5, 123456.75, 499999.0)
_QTY_POOL = (1.0, 2.0, 24.0, 24.0, 49.0, 50.0)
_DISC_POOL = (0.0, 0.05, 0.06, 0.07, 0.1)
_SEGS = ("BUILDING", "AUTOMOBILE", "ZZ")
_PRIOS = ("1-URGENT", "3-MEDIUM", "5-LOW")
_PTYPES = ("SMALL BRUSHED COPPER", "LARGE POLISHED STEEL",
           "ECONOMY ANODIZED TIN")


def _int_col(vals, t=pa.int64()):
    return pa.array(vals, t)


def _mnull(draw, strategy):
    """~1-in-8 NULL, else a draw — TPC-H measures and dates are
    nullable in production even though keys are not (spec NOT NULL);
    the fixtures are NULL-free, so this is where the relational
    registry queries meet NULLs."""
    if draw(st.integers(0, 7)) == 0:
        return None
    return draw(strategy)


_TPCH_DATE = st.integers(0, _TPCH_TS_SPAN).map(
    lambda o: _TPCH_TS_BASE + o
)


def _write_tpch(d: str, draw) -> None:
    """Consistent-but-adversarial mini TPC-H: unique PKs, DANGLING
    foreign keys on purpose (joins must agree on the misses too),
    boundary dates around the shapes' literal predicates, tied values
    from tiny pools."""
    n_nat, n_cust, n_ord, n_li = (
        draw(st.integers(2, 3)),
        draw(st.integers(0, 6)),
        draw(st.integers(0, 10)),
        draw(st.integers(0, 20)),
    )
    pq.write_table(pa.table({
        "r_regionkey": _int_col([0, 1], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
    }), os.path.join(d, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": _int_col(list(range(n_nat)), pa.int32()),
        "n_name": pa.array([f"NATION{i}" for i in range(n_nat)], pa.string()),
        "n_regionkey": _int_col(
            [draw(st.integers(0, 2)) for _ in range(n_nat)], pa.int32()
        ),  # 2 dangles
    }), os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": _int_col(list(range(n_cust))),
        "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)], pa.string()),
        "c_nationkey": _int_col(
            [draw(st.integers(0, n_nat)) for _ in range(n_cust)],
            pa.int32(),
        ),
        "c_acctbal": pa.array(
            [_mnull(draw, st.sampled_from(_PRICE_POOL))
             for _ in range(n_cust)],
            pa.float64(),
        ),
        "c_mktsegment": pa.array(
            [draw(st.sampled_from(_SEGS)) for _ in range(n_cust)],
            pa.string(),
        ),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": _int_col([0, 1, 2]),
        "s_name": pa.array([f"Supplier#{i}" for i in range(3)], pa.string()),
        "s_nationkey": _int_col(
            [draw(st.integers(0, n_nat)) for _ in range(3)], pa.int32()
        ),
        "s_acctbal": pa.array(
            [_mnull(draw, st.sampled_from(_PRICE_POOL))
             for _ in range(3)],
            pa.float64(),
        ),
    }), os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": _int_col([0, 1, 2, 3]),
        "p_name": pa.array(
            ["tomato navy", "green forest", "navy blue", "plum"],
            pa.string(),
        ),
        "p_brand": pa.array(
            [draw(st.sampled_from(("Brand#1", "Brand#2")))
             for _ in range(4)],
            pa.string(),
        ),
        "p_type": pa.array(
            [draw(st.sampled_from(_PTYPES)) for _ in range(4)],
            pa.string(),
        ),
        "p_size": _int_col(
            [draw(st.integers(1, 9)) for _ in range(4)], pa.int32()
        ),
        "p_retailprice": pa.array(
            [_mnull(draw, st.sampled_from(_PRICE_POOL))
             for _ in range(4)],
            pa.float64(),
        ),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": _int_col(list(range(n_ord))),
        "o_custkey": _int_col(
            [draw(st.integers(0, n_cust + 1)) for _ in range(n_ord)]
        ),
        "o_orderstatus": pa.array(
            [draw(st.sampled_from(("O", "F", "P"))) for _ in range(n_ord)],
            pa.string(),
        ),
        "o_totalprice": pa.array(
            [_mnull(draw, st.sampled_from(_PRICE_POOL))
             for _ in range(n_ord)],
            pa.float64(),
        ),
        "o_orderdate": pa.array(
            [_mnull(draw, _TPCH_DATE) for _ in range(n_ord)],
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(
            [draw(st.sampled_from(_PRIOS)) for _ in range(n_ord)],
            pa.string(),
        ),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": _int_col(
            [draw(st.integers(0, n_ord + 1)) for _ in range(n_li)]
        ),
        "l_partkey": _int_col(
            [draw(st.integers(0, 4)) for _ in range(n_li)]
        ),
        "l_suppkey": _int_col(
            [draw(st.integers(0, 3)) for _ in range(n_li)]
        ),
        "l_linenumber": _int_col(
            [draw(st.integers(1, 4)) for _ in range(n_li)], pa.int32()
        ),
        "l_quantity": pa.array(
            [_mnull(draw, st.sampled_from(_QTY_POOL))
             for _ in range(n_li)],
            pa.float64(),
        ),
        "l_extendedprice": pa.array(
            [_mnull(draw, st.sampled_from(_PRICE_POOL))
             for _ in range(n_li)],
            pa.float64(),
        ),
        "l_discount": pa.array(
            [_mnull(draw, st.sampled_from(_DISC_POOL))
             for _ in range(n_li)],
            pa.float64(),
        ),
        "l_tax": pa.array(
            [_mnull(draw, st.sampled_from(_DISC_POOL))
             for _ in range(n_li)],
            pa.float64(),
        ),
        "l_returnflag": pa.array(
            [draw(st.sampled_from(("A", "N", "R"))) for _ in range(n_li)],
            pa.string(),
        ),
        "l_linestatus": pa.array(
            [draw(st.sampled_from(("O", "F"))) for _ in range(n_li)],
            pa.string(),
        ),
        "l_shipdate": pa.array(
            [_mnull(draw, _TPCH_DATE) for _ in range(n_li)],
            pa.timestamp("us"),
        ),
    }), os.path.join(d, "lineitem.parquet"))


@given(data=st.data())
@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tpch_backed_registry_queries_on_random_tables(spark, data):
    qname = data.draw(st.sampled_from(TPCH_QUERIES))
    d = tempfile.mkdtemp(prefix="fss_fuzz_tpch_")
    try:
        _write_tpch(d, data.draw)
        spec = registry.REGISTRY[qname]
        sdf = spec.fn(spark, d)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        o_cols, o_rows = duckdb_run(d, spec.oracle)
        assert sorted(s_cols) == sorted(o_cols), (
            f"{qname}: schema {sorted(s_cols)} vs {sorted(o_cols)}"
        )
        assert len(s_rows) == len(o_rows), (
            f"{qname}: {len(s_rows)} vs {len(o_rows)} rows"
        )
        assert value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows), (
            f"{qname}: value hash mismatch (dir preserved? {d})"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_fuzz_query_pool_is_registered():
    missing = [
        q
        for q in QUERIES + EMB_QUERIES + EV_QUERIES + TPCH_QUERIES
        if q not in registry.REGISTRY
    ]
    assert not missing, f"fuzz pool names unknown queries: {missing}"
