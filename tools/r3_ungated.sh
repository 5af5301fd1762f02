#!/bin/bash
# Round-3 stage 2: classic machine with monolithic tiles (now the
# default): leaf-size and tile-shape sweep, teapot + gopher.
set -u
cd "$(dirname "$0")/.."
while ps -o args= -C bash | grep -qE "r3_(matrix|mxu_rerun)\.sh"; do sleep 20; done
run() {
  echo "=== $* ==="
  timeout 3000 env "$@" || echo "!! rc=$? for: $*"
  echo
}
run SWEEP_LEAF=16,32,64,128 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot
run SWEEP_LEAF=32 SWEEP_TILES=8x1024,16x512,8x256 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot
run SWEEP_LEAF=16,32,64 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py gopher
echo "=== ungated sweep done ==="
