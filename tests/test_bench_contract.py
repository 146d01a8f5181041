"""The driver's bench contract: one JSON line with metric/value/unit/queries/
sf keys. Run at tiny scale so the guard is cheap."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the repo-root bench harness, not a package)


def test_bench_emits_driver_contract_json():
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        DEMETER_BENCH_FACTOR="2",
        DEMETER_BENCH_RES="8",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=480,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in data, key
    assert data["unit"] == "sec" and data["value"] > 0
    # Derived from the shared constant so a new bench query cannot silently
    # break this contract (VERDICT r04 #1).
    assert set(data["queries"]) == set(bench.FULL_MODE_QUERIES)
    assert all(v >= 0 for v in data["queries"].values())
    assert data["rows"]["q1_spatial_join"] > 0
