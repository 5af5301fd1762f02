#!/bin/bash
# Round-5 matrix, pass 2: the cells the 900 s compile-queue cap killed,
# plus the gopher confirmation of the teapot winner. Longer per-cell cap.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/pathtracer_tpu_xla}"
run() {
  local scene=$1 leaf=$2 axis=$3 pack=$4 tiles=$5 sp=$6
  local env=(SWEEP_LEAF=$leaf SWEEP_PACK_AXIS=$axis SWEEP_PACK=$pack
             SWEEP_TILES=$tiles)
  if [ "$sp" != "-" ]; then env+=(PT_SUBPACKET=$sp); fi
  echo "=== scene=$scene axis=$axis pack=$pack tiles=$tiles subpacket=$sp"
  env "${env[@]}" timeout 2400 python tools/mesh_sweep.py "$scene"
}
# teapot: missing cells
run teapot 32 chunk 4 8x512 -
run teapot 32 chunk 4 8x512 3
# gopher: baseline + the winner candidate + its ungated control
run gopher 16 row 8 8x512 -
run gopher 16 chunk 4 8x512 2
run gopher 16 chunk 4 8x512 -
# teapot stragglers, lower priority
run teapot 32 chunk 8 8x1024 2
run gopher 16 chunk 4 8x512 3
