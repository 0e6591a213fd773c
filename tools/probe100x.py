"""100x scale probe: run a representative heavy subset of the headline
queries against a 100x-replicated sf0.1 fixture (build with
`python tools/build_scale_probe.py /root/testdata/sf0.1 /tmp/sf100X
100`) and print one JSON line of per-query seconds.

Subset rationale: the queries whose scaling behavior is nontrivial —
shuffling aggregations/joins, the sweep-count range join, and the
whole dedup family (capped inverted index, banded LSH with
auto-scaled bits, composite-blocked Levenshtein). Scan-dominated
queries scale trivially and are skipped to keep the probe under ten
minutes.

Usage: python tools/probe100x.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_scraper_spark import registry
from file_scraper_spark.session import get_spark

SUBSET = [
    "agg_groupby",
    "join_family",
    "window_rank",
    "sessionize",
    "range_join",
    "tpch_q5_shape",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding",
    "similarity_topk",
    "merge_upsert",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100X"
    only = sys.argv[2:] or SUBSET
    spark = get_spark("probe100x")
    queries = registry.all_queries()
    timings: dict[str, float] = {}
    for name in only:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {"metric": "probe100x_sec", "queries": timings,
             "total": round(sum(timings.values()), 2)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
