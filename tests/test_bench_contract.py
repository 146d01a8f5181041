"""The driver's bench contract: one JSON line with metric/value/unit/queries/
sf keys. Run at tiny scale so the guard is cheap."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    assert set(data["queries"]) == {
        "q1_spatial_join", "q2_extract_text", "q3_knn", "q4_zonal",
        "q5_dedup_minhash", "q6_ann_multiprobe",
    }
    assert all(v >= 0 for v in data["queries"].values())
    assert data["rows"]["q1_spatial_join"] > 0
