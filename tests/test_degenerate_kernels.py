"""Degenerate-input hardening for the Arrow kernels (ADVICE r12).

Two failure shapes the fixture gate can never produce:

- an EMPTY Arrow batch reaching a mapInPandas kernel (real executors
  emit them on empty scan splits / after selective filters) — the
  Lloyd update/stats kernels indexed `Q[:, None, :]` on the 1-D
  shape-(0,) array `_quantize_np` returns for an empty list;
- a corpus whose seed predicate selects NOTHING (every vec_id >=
  KNN_SEED_CAP, or every seed zero-norm) — knn_classify built numpy
  arrays from an empty collect and crashed driver-side where the
  oracle returns an empty relation.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_scraper_spark.operators.clustering import (
    _stats_kernel,
    _update_kernel,
)
from file_scraper_spark.operators.similarity import KNN_SEED_CAP


def _empty_batch() -> pd.DataFrame:
    return pd.DataFrame({"embedding": pd.Series([], dtype=object)})


def test_lloyd_update_kernel_skips_empty_batch():
    fn = _update_kernel([[0] * 4, [100] * 4])
    assert list(fn(iter([_empty_batch()]))) == []
    # and still emits partials for a real batch after an empty one
    real = pd.DataFrame({"embedding": [[0.1, 0.1, 0.1, 0.1]]})
    out = list(fn(iter([_empty_batch(), real])))
    assert len(out) == 1 and len(out[0]) == 4  # d rows for one cluster


def test_lloyd_stats_kernel_skips_empty_batch():
    fn = _stats_kernel([[0] * 4])
    assert list(fn(iter([_empty_batch()]))) == []
    real = pd.DataFrame({"embedding": [[0.2, 0.0, 0.0, 0.0]]})
    out = list(fn(iter([_empty_batch(), real])))
    assert len(out) == 1 and out[0]["n"].tolist() == [1]


def test_knn_classify_empty_seed_set_returns_empty(spark, tmp_path):
    """Every vec_id sits at/above KNN_SEED_CAP -> the seed collect is
    empty -> empty result with the registered schema (the oracle's
    top-k per query is empty on the same corpus), not an AxisError."""
    from file_scraper_spark.operators.similarity import knn_classify

    tbl = pa.table(
        {
            "vec_id": pa.array(
                [KNN_SEED_CAP + i for i in range(6)], pa.int64()
            ),
            "embedding": pa.array(
                [[0.1, 0.2, 0.3, 0.4]] * 6, pa.list_(pa.float32())
            ),
            "label": pa.array([i % 3 for i in range(6)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = knn_classify(spark, str(tmp_path))
    assert out.columns == ["vec_id", "pred_label", "votes", "is_correct"]
    assert out.count() == 0
