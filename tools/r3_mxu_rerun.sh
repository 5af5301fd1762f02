#!/bin/bash
# Rerun the MXU teapot sweep after the Mosaic ADD-reduction fix
# (waits for any running r3_matrix.sh to exit first).
set -u
cd "$(dirname "$0")/.."
while pgrep -x mesh_sweep >/dev/null 2>&1 || ps -C bash -o args= | grep -q r3_matrix.sh; do
  sleep 20
done
echo "=== MXU teapot rerun (post-fix) ==="
timeout 3000 env PT_TRAVERSAL=mxu SWEEP_LEAF=16,32,64,128 SWEEP_TILES=8x512 \
    SWEEP_ORDERS=block python tools/mesh_sweep.py teapot || echo "!! rc=$?"
echo "=== rerun done ==="
