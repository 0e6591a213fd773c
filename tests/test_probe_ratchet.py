"""100x-scale performance RATCHET (VERDICT r8 task 4).

The per-round 100x probe (tools/probe100x.py -> PROBE_r{N}.json) is
evidence, but evidence nobody re-checks is how the O(d^2)
lambda-inlining class came back twice before round 8's tail sweep
caught it. This test turns the newest probe artifact into a CI
ratchet: the N most expensive registry queries are re-probed at the
100x fixture and each must finish within RATCHET_FACTOR x its
recorded row — so the next quadratic-blowup reintroduction fails a
test instead of waiting for a judge.

Opt-in (SPARK_GRAFT_RATCHET=1) because it needs the ~1.4 GB /tmp
fixture, ~5 minutes, and an otherwise-idle box (timing noise on this
machine is additive, NOTES round 6; the 3x factor absorbs ambient
swing but not a competing JVM). The probe runs as a SUBPROCESS of
tools/probe100x.py so the measurement methodology — 48g driver heap,
min-over-reps, noop sink — is byte-identical to how the baseline rows
were recorded; an in-process run under pytest's 8-shuffle-partition
16g session would ratchet against a different machine configuration.

Run:  SPARK_GRAFT_RATCHET=1 python -m pytest tests/test_probe_ratchet.py -q
(build the fixture first if absent:
 python tools/build_scale_probe.py /root/testdata/sf0.1 /tmp/sf100X 100)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.environ.get("SPARK_GRAFT_RATCHET_DIR", "/tmp/sf100X")
RATCHET_FACTOR = 3.0
TOP_N = 20  # widened from 10 (VERDICT r9 next-#1)
#: rows below this are dominated by fixed session/stream-harness cost,
#: not by the query's scaling behavior; ratcheting them would pin noise
MIN_BASELINE_SEC = 5.0

ratchet = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RATCHET") != "1",
    reason="opt-in 100x ratchet: set SPARK_GRAFT_RATCHET=1 on an idle box",
)


def newest_probe() -> tuple[int, dict[str, float]]:
    """Most recent PROBE_r{N}.json's per-query seconds, by parsed
    round number (NOT filename order — the rotation.py r100+ lesson)."""
    best: tuple[int, dict] | None = None
    for path in glob.glob(os.path.join(REPO, "PROBE_r*.json")):
        m = re.search(r"PROBE_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        rnd = int(m.group(1))
        qs = data.get("queries", {})
        if qs and (best is None or rnd > best[0]):
            best = (rnd, qs)
    assert best, "no PROBE_r*.json with per-query rows found"
    return best


@ratchet
def test_top20_within_ratchet():
    if not os.path.isdir(FIXTURE):
        pytest.skip(f"{FIXTURE} missing — build with tools/build_scale_probe.py")
    rnd, baseline = newest_probe()
    top = sorted(
        ((s, n) for n, s in baseline.items() if s >= MIN_BASELINE_SEC),
        reverse=True,
    )[:TOP_N]
    names = [n for _, n in top]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "probe100x.py"),
         FIXTURE, *names],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_PROBE_REPS": "2"},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not out.get("errors"), out["errors"]
    measured = out["queries"]
    over = {
        n: (measured[n], baseline[n])
        for n in names
        if n in measured and measured[n] > RATCHET_FACTOR * baseline[n]
    }
    assert not over, (
        f"queries regressed past {RATCHET_FACTOR}x their PROBE_r{rnd} "
        f"row (measured_sec, baseline_sec): {over}"
    )
