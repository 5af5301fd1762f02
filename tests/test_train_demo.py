"""End-to-end inverse-rendering smoke test: tools/train_demo.py must
actually recover the perturbed sphere colors (common-random-numbers
pairing makes the tiny-budget problem deterministic and well-posed)."""
import os
import pathlib
import re
import subprocess
import sys


def test_train_demo_recovers_colors(tmp_path):
    root = pathlib.Path(__file__).resolve().parent.parent
    out = tmp_path / "demo.png"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(root)}
    res = subprocess.run(
        [sys.executable, str(root / "tools" / "train_demo.py"),
         "--steps", "40", "--width", "48", "--height", "36",
         "--spp", "4", "--out", str(out)],
        capture_output=True, text=True, timeout=420, cwd=str(root),
        env=env,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    m = re.search(r"color MAD ([0-9.]+) -> ([0-9.]+)", res.stdout)
    assert m, res.stdout[-2000:]
    before, after = float(m.group(1)), float(m.group(2))
    assert after < before / 3, (before, after)
    assert out.exists()
