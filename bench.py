"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized through the noop sink (full JVM execution,
no driver collect, no Python serialization in the measurement path).

Per-query times are the MEDIAN of $SPARK_GRAFT_BENCH_REPS passes
(default 3), interleaved round-robin so a transient JVM hiccup (GC,
JIT recompile) lands in one pass, not one query: single-pass timings
on this box swing +/-25% run-to-run (NOTES.md), which the median
kills. `value` is the sum of medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from file_scraper_spark import registry
from file_scraper_spark.session import get_spark

# Representative operator families (SURVEY §2): scan+agg, joins,
# windows, sessionization, range join, text, dedup sketches, vector
# search, scrape-merge semantics.
HEADLINE = [
    "agg_groupby",
    "filter_predicate",
    "join_family",
    "rollup_cube",
    "window_rank",
    "window_lag_frame",
    "topk_sort_limit",
    "microbatch_window",
    "sessionize",
    "range_join",
    "scalar_datetime_math_json",
    "agg_distinct",
    "text_wordcount",
    "text_quality",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding",
    "similarity_topk",
    "timeseries_rollup",
    "merge_upsert",
    "union_seen",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "asof_join",
    "pivot_agg",
    "conditional_agg",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = registry.all_queries()

    # warm the JVM, codegen and parquet footers: one cheap metadata pass
    # per table so per-query timings reflect steady state
    from file_scraper_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    materialize(queries["topk_sort_limit"](spark, sf_dir))

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
