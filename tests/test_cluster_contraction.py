"""Star-contraction connected components + the edge-list spill tier
(round 12: _propagate_clusters rewrite and the FSS_EDGE_SPILL_DIR disk
memo under dedup's shared edge pipeline).

The registered dedup_clusters query only ever sees the fixture's
near-dup graph — almost all 2-node components. These tests drive the
contraction on ADVERSARIAL graph shapes it never meets there (long
paths past the old min-label 20-round diameter cap, bi-stars that fool
a parents∩children-only convergence test, webs, forests), with a
plain-Python union-find as the ground truth.
"""

from __future__ import annotations

import os

import pytest

from file_scraper_spark.operators import dedup


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Ground truth: min node id per component, union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _contract(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Run _propagate_clusters on an explicit edge list and return the
    touched-node labels (the fixture singletons are filtered back out
    so the assertion is purely about the contraction)."""
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = dedup._propagate_clusters(spark, "/root/testdata/sf0.001", df)
    touched = {n for e in edges for n in e}
    return {
        r.doc_id: r.cluster
        for r in out.collect()
        if r.doc_id in touched
    }


GRAPHS = {
    # diameter 39: the SUPERSEDED min-label loop's 20-round cap would
    # have returned a partially-propagated (wrong) labeling here;
    # star contraction needs O(log^2) rounds
    "long_path": [(i, i + 1) for i in range(1000, 1040)],
    # bi-star: {(3,1),(3,2)} — children∩parents is EMPTY yet it is NOT
    # a star forest; pins the multi-parent clause of the convergence
    # test (a parents-only check would exit early and mislabel 2)
    "bi_star": [(1, 3), (2, 3)],
    "two_pairs": [(1, 2), (10, 11)],
    "triangle_plus_tail": [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],
    "star_already": [(1, 2), (1, 3), (1, 4), (1, 5)],
    "reverse_star": [(5, 9), (6, 9), (7, 9), (8, 9)],
    "web": [
        (a, b)
        for a in range(100, 110)
        for b in range(100, 110)
        if a < b and (a * 7 + b * 3) % 4 == 0
    ],
    # self-loops: jaccard never emits one, but the shared helper must
    # not hang the convergence test on own-child-own-parent rows
    "self_loop_mixed": [(7, 7), (7, 8)],
    "self_loop_only": [(9, 9)],
    "forest_mixed": (
        [(i, i + 1) for i in range(200, 216)]  # path of 17
        + [(300, 301)]
        + [(400, 402), (401, 402), (402, 403)]
    ),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_contraction_matches_union_find(spark, name):
    edges = GRAPHS[name]
    assert _contract(spark, edges) == _uf_components(edges)


def test_winnowing_ab_arm_matches_live_on_fixture(spark, sf_dir):
    """The superseded r12 winnowing tail (broadcast-sizes form, kept
    one round as the bench A/B baseline) and the live window-nf form
    must agree row-for-row on the fixture (the A/B arms are
    apples-to-apples, ab_variants contract)."""
    from file_scraper_spark.ab_variants import _old_dedup_winnowing

    new = sorted(map(tuple, dedup.dedup_winnowing(spark, sf_dir).collect()))
    old = sorted(map(tuple, _old_dedup_winnowing(spark, sf_dir).collect()))
    assert new == old and len(new) > 0


# ---------------------------------------------------------------- spill


def test_edge_spill_roundtrip_and_cross_session_key(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A cold session (memo cleared) must find the spilled artifact on
    disk and return byte-identical edges without rebuilding; the spill
    key must NOT contain the Spark application id (cross-process
    reuse is the point)."""
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", str(tmp_path / "spill"))
    dedup._EDGES_MEMO.clear()
    a = sorted(map(tuple, dedup.jaccard_pairs(spark, sf_dir).collect()))
    subdirs = os.listdir(str(tmp_path / "spill"))
    assert len(subdirs) == 1, "exactly one keyed spill subdir"
    dedup._EDGES_MEMO.clear()
    hit = dedup.jaccard_pairs(spark, sf_dir)
    # the hit is a parquet read of the spill, not a rebuilt pipeline
    assert "fss" not in hit.schema.simpleString()  # schema sanity
    plan = hit._sc._jvm.PythonSQLUtils.explainString(
        hit._jdf.queryExecution(), "simple"
    )
    assert "edges" in plan and "Scan parquet" in plan
    assert sorted(map(tuple, hit.collect())) == a


def test_memoized_frame_survives_external_spill_clear(
    spark, sf_dir, tmp_path, monkeypatch
):
    """PROBE_r12's one sweep defect, hardened (VERDICT r12 task #5):
    a memoized DataFrame over the disk spill is a plan over parquet
    files that an external actor can delete between consumers
    (another harness's clear_edge_spill, cross-process eviction).
    The memo hit must validate the backing dir and fall back to a
    rebuild — not serve a frame that dies with FAILED_READ_FILE at
    action time."""
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", str(tmp_path / "spill"))
    dedup._EDGES_MEMO.clear()
    dedup._EDGES_MEMO_SPILL.clear()
    a = sorted(map(tuple, dedup.jaccard_pairs(spark, sf_dir).collect()))
    assert dedup._EDGES_MEMO and dedup._EDGES_MEMO_SPILL
    # the harness rug-pull: spill cleared while the memo entry lives
    dedup.clear_edge_spill()
    again = dedup.jaccard_pairs(spark, sf_dir)
    assert sorted(map(tuple, again.collect())) == a
    dedup._EDGES_MEMO.clear()
    dedup._EDGES_MEMO_SPILL.clear()


def test_edge_spill_key_mismatch_is_miss(tmp_path, monkeypatch, spark):
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", str(tmp_path))
    slug_dir = tmp_path / dedup._spill_slug(("some", "key"))
    slug_dir.mkdir()
    (slug_dir / "_KEY").write_text("repr-of-a-DIFFERENT-key")
    assert dedup._edge_spill_load(spark, ("some", "key")) is None


def test_edge_spill_disabled_by_empty_env(monkeypatch):
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", "")
    assert dedup._edge_spill_root() is None


def test_edge_spill_eviction_keeps_newest(tmp_path, monkeypatch):
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", str(tmp_path))
    for i in range(dedup._EDGE_SPILL_KEEP + 3):
        d = tmp_path / f"k{i:02d}"
        d.mkdir()
        os.utime(d, ns=(i * 10**9, i * 10**9))
    dedup._edge_spill_evict(str(tmp_path))
    left = sorted(p.name for p in tmp_path.iterdir())
    # room for KEEP-1 existing + the one about to be written
    assert len(left) == dedup._EDGE_SPILL_KEEP - 1
    assert left[0] == "k04"  # oldest evicted


def test_sampled_edges_never_spill(spark, sf_dir, tmp_path, monkeypatch):
    """Sampled variants are probe levers whose cold rows must keep
    measuring their own builds — only the unsampled key may land on
    disk."""
    monkeypatch.setenv("FSS_EDGE_SPILL_DIR", str(tmp_path / "s"))
    dedup._EDGES_MEMO.clear()
    dedup.jaccard_pairs(
        spark, sf_dir, sample_mod=dedup.SHINGLE_SAMPLE_MOD
    ).count()
    assert not (tmp_path / "s").exists()


def test_near_dup_ids_matches_corpus_nodes(spark, sf_dir):
    """near_dup_ids is a shuffle-free id-only twin of near_dup_corpus;
    the two derivations must never drift (the clusterer's singleton
    anti-join quietly mislabels docs if they do)."""
    from file_scraper_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    ids = {r.doc_id for r in dedup.near_dup_ids(docs).collect()}
    nodes = {
        r.doc_id
        for r in dedup.near_dup_corpus(docs).select("doc_id").collect()
    }
    assert ids == nodes and len(ids) > 0
