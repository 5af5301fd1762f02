#!/bin/bash
# Round-3 consolidated mesh hardware A/B matrix (VERDICT item 2).
# Strictly sequential — one process on the chip at a time.
# Usage: bash tools/r3_all.sh 2>&1 | tee tools/r3_matrix.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date -u +%H:%M:%S) $* ==="
  timeout 3000 env "$@" || echo "!! rc=$? for: $*"
  echo
}

# 1. Classic machine (ungated default), leaf-size sweep, teapot.
run SWEEP_LEAF=16,32,64,128 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot

# 2. MXU leaf machine, leaf-size sweep, teapot.
run PT_TRAVERSAL=mxu SWEEP_LEAF=16,32,64,128 SWEEP_TILES=8x512 \
    SWEEP_ORDERS=block python tools/mesh_sweep.py teapot

# 3. Node-walk-only ablation (calibrates node/leaf cost split).
run PT_ABLATE_LEAF=1 SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot

# 4. Tile-shape sweep at the best-known leaf.
run SWEEP_LEAF=32 SWEEP_TILES=8x1024,16x512,8x256 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot

# 5. Tile-order A/B under the ungated walk (order still changes coherence).
run SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=subblock,rowblock \
    python tools/mesh_sweep.py teapot

# 6. Gated walk re-check at the sweep's best classic config.
run PT_SUBPACKET=1 SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=block,subblock \
    python tools/mesh_sweep.py teapot

# 7. Gopher: classic leaf sweep + MXU best-guess configs.
run SWEEP_LEAF=16,32,64 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py gopher
run PT_TRAVERSAL=mxu SWEEP_LEAF=32,64 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py gopher

echo "=== matrix done ==="
