"""Assemble PROBE_r8.json: the round-8 100x sweep of every
previously-unprobed query (VERDICT r7 task #6) merged with the
follow-up jaccard-family warm-memo run.

Usage: python tools/merge_probe_r8.py sweep.json [more.json ...]

Each input is one probe100x JSON line; later inputs override earlier
per-query values ONLY if smaller (min across runs — probe noise on
this box is strictly additive, NOTES.md). Errors sections are merged
verbatim. The output also records which registered queries STILL have
no 100x number anywhere (union of PROBE_r6/r7/r8) with the written
reason, so the coverage claim is auditable in the artifact itself.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: queries intentionally without a 100x row, with the reason the
#: artifact carries (VERDICT r7 task #6 allows "a written reason why
#: 100x is not the relevant axis")
REASONS: dict[str, str] = {}


def main() -> None:
    from file_scraper_spark import registry

    registry._ensure_loaded()
    queries: dict[str, float] = {}
    errors: dict[str, str] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            d = json.loads(f.read().strip())
        for name, sec in d.get("queries", {}).items():
            if name not in queries or sec < queries[name]:
                queries[name] = sec
        errors.update(d.get("errors", {}))

    # drop error rows that a later run measured successfully
    errors = {n: e for n, e in errors.items() if n not in queries}

    covered = set(queries)
    for prev in ("PROBE_r6.json", "PROBE_r7.json"):
        try:
            with open(os.path.join(REPO, prev)) as f:
                d = json.load(f)
            covered |= set(d.get("queries", d))
        except (OSError, ValueError):
            pass
    missing = sorted(set(registry.REGISTRY) - covered)
    unexplained = [n for n in missing if n not in REASONS and n not in errors]

    out = {
        "metric": "probe100x_sec",
        "sf_dir": "/tmp/sf100X",
        "round": 8,
        "queries": dict(sorted(queries.items())),
        "total": round(sum(queries.values()), 2),
        "note": (
            "min across interleaved reps and runs; covers every "
            "registered query never probed at scale before round 8 — "
            "union with PROBE_r6/r7 = full registry. Caveats: "
            "streaming entries include the micro-batch harness "
            "execution itself (the bench artifact prices harness "
            "overhead separately); dedup_clusters' min is the "
            "session-warm number (rep 2 reuses the memoized jaccard "
            "edge list — the intended production shape; its cold "
            "floor is the ~60-70s edge pipeline, NOTES.md)"
        ),
    }
    if errors:
        out["errors"] = errors
    if REASONS:
        out["unprobed_reasons"] = REASONS
    if unexplained:
        out["UNEXPLAINED_GAPS"] = unexplained  # loud: should be empty
    with open(os.path.join(REPO, "PROBE_r8.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(
        f"PROBE_r8.json: {len(queries)} queries, "
        f"{len(errors)} errors, {len(unexplained)} unexplained gaps"
    )


if __name__ == "__main__":
    main()
