"""bench.py is driver-facing infrastructure: it must print exactly one
JSON line with the contract keys, whatever else happens. A regression
here costs a full driver round, so it gets its own subprocess test at
smoke scale."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_SMOKE


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_SMOKE,
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "bench_total_wall"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert payload["queries"] and all(
        isinstance(v, (int, float)) for v in payload["queries"].values()
    )
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.05
    assert payload["sf"] == 0.001
    # per-rep evidence: every query ships all rep times, and the
    # headline number is their min (noise vs regression in one glance)
    assert set(payload["reps"]) == set(payload["queries"])
    for name, rep_times in payload["reps"].items():
        assert len(rep_times) == 3
        assert min(rep_times) == payload["queries"][name]
