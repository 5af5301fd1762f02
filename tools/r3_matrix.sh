#!/bin/bash
# Round-3 mesh hardware A/B matrix (VERDICT item 2).
# Strictly sequential — one process on the chip at a time.
# Usage: bash tools/r3_matrix.sh 2>&1 | tee tools/r3_matrix.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  # 2400s cap per config set: remote compiles have varied 6s-7min each.
  timeout 2400 env "$@" || echo "!! rc=$? for: $*"
  echo
}

# 1. Classic machine, tile-order A/B (block is the round-2 shipped default).
run SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=block,subblock,rowblock \
    python tools/mesh_sweep.py teapot

# 2. MXU leaf machine, leaf-size sweep.
run PT_TRAVERSAL=mxu SWEEP_LEAF=16,32,64,128 SWEEP_TILES=8x512 \
    SWEEP_ORDERS=block python tools/mesh_sweep.py teapot

# 3. Node-walk-only ablation (calibrates node/leaf cost split).
run PT_ABLATE_LEAF=1 SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot

# 4. Sub-packet gating ablation.
run PT_SUBPACKET=0 SWEEP_LEAF=32 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py teapot

# 5. Gopher on classic orders + best-guess MXU configs.
run SWEEP_LEAF=16 SWEEP_TILES=8x512 SWEEP_ORDERS=block,subblock,rowblock \
    python tools/mesh_sweep.py gopher
run PT_TRAVERSAL=mxu SWEEP_LEAF=32,64 SWEEP_TILES=8x512 SWEEP_ORDERS=block \
    python tools/mesh_sweep.py gopher

echo "=== matrix done ==="
