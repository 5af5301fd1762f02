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


def test_recoverable_retry_retries_then_succeeds(monkeypatch):
    """BENCH_r02 regression: a transient UNAVAILABLE during setup (backend
    init inside pack()) must be retried, not zero the round record."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE")
        return 42.0

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._recoverable_retry(flaky, attempts=3) == 42.0
    assert len(calls) == 2


def test_recoverable_retry_raises_deterministic_errors(monkeypatch):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench

    calls = []

    def broken():
        calls.append(1)
        raise ValueError("bad scene")

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    try:
        bench._recoverable_retry(broken, attempts=3)
        raise AssertionError("should have raised")
    except ValueError:
        pass
    assert len(calls) == 1  # no retry burn on deterministic failures


def test_bench_prints_parseable_line_on_total_failure():
    """Even when the device never comes back, bench.py must emit the
    headline JSON (value null, error recorded) so the round record is a
    diagnosis, not an empty rc=1."""
    root = pathlib.Path(__file__).resolve().parent.parent
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "BENCH_EXTRA": "0",
           "BENCH_SCENE": "no-such-scene"}
    res = subprocess.run(
        [sys.executable, str(root / "bench.py")],
        capture_output=True, text=True, timeout=300, cwd=str(root),
        env=env,
    )
    assert res.returncode == 1
    rec = json.loads(res.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "error" in rec
