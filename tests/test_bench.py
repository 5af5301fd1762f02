"""The round-record pipeline depends on bench.py printing one valid JSON
line — smoke it end-to-end on the CPU wavefront backend at tiny size."""
import json
import os
import pathlib
import subprocess
import sys


def test_bench_emits_valid_json():
    root = pathlib.Path(__file__).resolve().parent.parent
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "BENCH_BACKEND": "wavefront", "BENCH_SPP": "2",
           "BENCH_WIDTH": "64", "BENCH_HEIGHT": "48"}
    # generous budget: this is a round-record-critical contract test and
    # must not flake when the whole suite loads the CPU (it took 124 s
    # standalone but >300 s under full-suite contention in round 1)
    res = subprocess.run(
        [sys.executable, str(root / "bench.py")],
        capture_output=True, text=True, timeout=900, cwd=str(root),
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "Msamples/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert "reference_64x48" in rec["metric"]
