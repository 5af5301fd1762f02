#!/bin/bash
# Round-5 hardware verdict matrix (VERDICT r4 ask #3): chunk-axis sample
# packing (5ef38e6) x PT_SUBPACKET gating/independent-walk modes
# (0002181), teapot + gopher, coherent defaults. Each cell = one
# mesh_sweep run (device-only steady-state timing, 8-spp launches).
# Run strictly alone on the TPU:  bash tools/r5_matrix.sh | tee tools/r5_matrix.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/pathtracer_tpu_xla}"

run() { # scene leaf axis pack tiles subpacket-label
  local scene=$1 leaf=$2 axis=$3 pack=$4 tiles=$5 sp=$6
  local env=(SWEEP_LEAF=$leaf SWEEP_PACK_AXIS=$axis SWEEP_PACK=$pack
             SWEEP_TILES=$tiles)
  if [ "$sp" != "-" ]; then env+=(PT_SUBPACKET=$sp); fi
  echo "=== scene=$scene axis=$axis pack=$pack tiles=$tiles subpacket=$sp"
  env "${env[@]}" timeout 900 python tools/mesh_sweep.py "$scene"
}

for scene in teapot gopher; do
  leaf=32; [ "$scene" = gopher ] && leaf=16
  # row-packed baseline of record + row/subpacket=3
  run $scene $leaf row 8 8x512 -
  run $scene $leaf row 8 8x512 3
  # chunk-packed: pack 4 at (8,512) (cw=128) and pack 8 at (8,1024)
  run $scene $leaf chunk 4 8x512 -
  run $scene $leaf chunk 8 8x1024 -
  run $scene $leaf chunk 4 8x512 2
  run $scene $leaf chunk 8 8x1024 2
  run $scene $leaf chunk 4 8x512 3
  run $scene $leaf chunk 8 8x1024 3
done
