"""Pallas TPU megakernel: the full per-pixel path tracer in one kernel.

TPU-native re-design of the reference's OpenCL megakernel `trace`
(internal/ocl/tracer.cl:831-1188). One kernel launch traces a TILE of rays
through the whole sample loop x bounce loop entirely in VMEM/registers:

- scene object tables live in SMEM (the analogue of the reference copying
  objects into __local memory, tracer.cl:846-849)
- the object loop is a static Python unroll, so every inverse-transform
  element is a compile-time-scheduled scalar broadcast (no gathers)
- RNG is the on-core PRNG (pltpu.prng_random_bits), seeded per tile —
  replacing both the host seed buffer (ocltracer.go:260-263) and the
  threefry streams of the wavefront path (same estimator, different
  uniforms)
- the bounce loop early-exits per tile once every ray has died, mirroring
  the reference's per-work-item break (tracer.cl:1107) at tile granularity

Covers untextured scenes of plane/sphere/cylinder/box primitives AND BVH
triangle meshes (packet traversal, _packet_traverse), with all roulette
branches (reflect / thin-shell / refract / diffuse). Textured scenes fall
back to the wavefront integrator (integrator.py), which itself uses the
intersect-only kernel below for mesh scenes on real TPUs;
`supports_scene` / `supports_intersect` decide.

Numerics are float32 like the wavefront path; estimator parity is verified
statistically in tests/test_pallas.py (same mean image, independent noise).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.pack import SceneArrays, SceneMeta
from ..scene.shapes import BOX, CYLINDER, GROUP, PLANE, SPHERE

# SMEM object-table column layout (per object row):
#   0-11  inverse (3x4 row-major)
#   12-23 inverse-transpose (3x4 row-major)
#   24-26 color rgb
#   27-29 emission rgb
#   30    refractive index
#   31    reflectivity
#   32    min_y
#   33    max_y
#   34-36 group bbox min (local space; GROUP objects only)
#   37-39 group bbox max
#   40-42 forward-transform translation (world light origin; NEE,
#         tracer.cl:790)
#   43    light scale = max diagonal of the forward transform
#         (tracer.cl:791)
#   44    forward transform [0,0] (NEE attenuation heuristic,
#         tracer.cl:819)
_OBJ_COLS = 45

# SMEM camera vector layout:
#   0-11 inverse (3x4 row-major), 12 pixel_size, 13 half_width,
#   14 half_height, 15 aperture, 16 focal_length
_CAM_COLS = 17

# VMEM mesh-node row layout (one BVH node per sublane row):
#   0-2 bbmin, 3-5 bbmax, 6 tri_start (exact f32 int), 7 is_leaf, 8 exit
_NODE_COLS = 16
# VMEM triangle rows: 4 slots per row, 24-col stride per slot
# (dual-basis layout, see _packet_traverse):
#   +0-2 p1, +3-5 Ng (= e1 x e2, unnormalized), +6-8 U, +9-11 V
#   (U.e1 = 1, U.e2 = 0; V.e1 = 0, V.e2 = 1; both in-plane),
#   +12-14 n1, +15-17 d21 (= n2-n1), +18-20 d31 (= n3-n1), +21-23 color
_TRI_SLOTS_PER_ROW = 4
_TRI_STRIDE = 24

_BIG = 1e30
_INV24 = float(2.0 ** -24)


def textures_computable(meta: SceneMeta) -> bool:
    """True when every texture the scene samples (color AND normal maps)
    is megakernel-servable: either it carries a render/proctex
    descriptor (the texels are COMPUTED in-kernel — TPU has no per-lane
    gather to FETCH them) or it is a small file-backed image that
    pack._stage_file_textures VMEM-staged for the one-hot MXU fetch
    (("__staged__", ...) descriptor, _sample_staged). Large file-backed
    images stay desc=None -> wavefront gather path."""
    if not meta.textured_types and not meta.has_normal_maps:
        return True
    return all(desc is not None
               for (_slot, desc, _w, _h, _sx, _sy)
               in meta.obj_tex + meta.obj_tex_nm)


def textures_procedural(meta: SceneMeta) -> bool:
    """True when every sampled texture carries a PROCEDURAL proctex
    descriptor (no VMEM-staged file images). The wavefront integrator's
    computed-texel mode (_use_computed_tex) needs this stricter check:
    it can only COMPUTE proctex programs — staged file textures must
    keep the pool-gather path there."""
    if not meta.textured_types and not meta.has_normal_maps:
        return True
    return all(desc is not None
               and not (isinstance(desc, tuple) and desc
                        and desc[0] == "__staged__")
               for (_slot, desc, _w, _h, _sx, _sy)
               in meta.obj_tex + meta.obj_tex_nm)


def staged_lanes(meta: SceneMeta) -> int:
    """Lane width of the VMEM-staged file-texture atlas this scene needs
    (0 when nothing is staged). Mirrors pack._stage_file_textures's
    GLOBAL color-outer layout: each staged texture spans ceil(h/128)*w
    lanes from its within-plane base, the plane pads to a 128-lane
    multiple, and the atlas is three planes wide."""
    m = 0
    for (_slot, desc, _w, _h, _sx, _sy) in meta.obj_tex + meta.obj_tex_nm:
        if isinstance(desc, tuple) and desc and desc[0] == "__staged__":
            _, b, w, h = desc
            m = max(m, b + (-(-h // 128)) * w)
    return 3 * max(128, -(-m // 128) * 128) if m else 0


def supports_scene(meta: SceneMeta, scn: SceneArrays = None) -> bool:
    """Megakernel coverage: the 4 primitives plus BVH triangle meshes
    (packet traversal), with textures/normal maps when they are
    procedural (textures_computable). Scenes sampling file-backed image
    textures fall back to the wavefront integrator."""
    prim = all(t in (PLANE, SPHERE, CYLINDER, BOX, GROUP)
               for t in meta.obj_types)
    if meta.has_groups and meta.leaf_size % _TRI_SLOTS_PER_ROW != 0:
        return False
    return prim and textures_computable(meta)


def build_scene_table(scn: SceneArrays, meta: SceneMeta) -> np.ndarray:
    """[No, _OBJ_COLS] float32 host-side table for SMEM."""
    n = meta.n_objects
    out = np.zeros((n, _OBJ_COLS), dtype=np.float32)
    inv = np.asarray(scn.inverse, dtype=np.float32)
    invt = np.asarray(scn.inverse_transpose, dtype=np.float32)
    out[:, 0:12] = inv[:n, :3, :].reshape(n, 12)
    out[:, 12:24] = invt[:n, :3, :].reshape(n, 12)
    out[:, 24:27] = np.asarray(scn.color)[:n]
    out[:, 27:30] = np.asarray(scn.emission)[:n]
    out[:, 30] = np.asarray(scn.refractive_index)[:n]
    out[:, 31] = np.asarray(scn.reflectivity)[:n]
    out[:, 32] = np.asarray(scn.min_y)[:n]
    out[:, 33] = np.asarray(scn.max_y)[:n]
    out[:, 34:37] = np.asarray(scn.bb_min)[:n]
    out[:, 37:40] = np.asarray(scn.bb_max)[:n]
    tr = np.asarray(scn.transform, dtype=np.float32)
    out[:, 40:43] = tr[:n, :3, 3]
    out[:, 43] = np.maximum(np.maximum(tr[:n, 0, 0], tr[:n, 1, 1]),
                            tr[:n, 2, 2])
    out[:, 44] = tr[:n, 0, 0]
    return out


def build_mesh_tables(scn: SceneArrays, meta: SceneMeta,
                      traversal: str = None,
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """VMEM-resident mesh pools for packet traversal.

    nodes: [Nn, _NODE_COLS] f32, one skip-link BVH node per row.
    tris:  [ceil(Ns/4), 96] f32, 4 triangle slots per row (a leaf of 8
    slots spans exactly 2 rows; degenerate padding slots keep det == 0).
    Indices are stored as f32 (pool sizes < 2^24, exact).

    traversal=None resolves to traversal_mode(meta) — the megakernel
    consults the same helper, so tables and kernel stay consistent by
    default. Grad paths (classic-only) pass traversal="classic"
    explicitly. "mxu" swaps the triangle table for the MXU layout
    (build_mxu_tri_table)."""
    if traversal is None:
        traversal = traversal_mode(meta)
    if traversal == "mxu" and meta.has_groups:
        nodes, _ = build_mesh_tables(scn, meta, traversal="classic")
        return nodes, build_mxu_tri_table(scn, meta)
    if not meta.has_groups:
        return (np.zeros((1, _NODE_COLS), dtype=np.float32),
                np.zeros((1, _TRI_SLOTS_PER_ROW * _TRI_STRIDE),
                         dtype=np.float32))
    nn = int(np.asarray(scn.node_bb_min).shape[0])
    nodes = np.zeros((nn, _NODE_COLS), dtype=np.float32)
    nodes[:, 0:3] = np.asarray(scn.node_bb_min)
    nodes[:, 3:6] = np.asarray(scn.node_bb_max)
    nodes[:, 6] = np.asarray(scn.node_tri_start)
    nodes[:, 7] = np.asarray(scn.node_is_leaf)
    nodes[:, 8] = np.asarray(scn.node_exit)

    ns = int(np.asarray(scn.tri_p1).shape[0])
    rows = (ns + _TRI_SLOTS_PER_ROW - 1) // _TRI_SLOTS_PER_ROW
    tris = np.zeros((rows, _TRI_SLOTS_PER_ROW * _TRI_STRIDE),
                    dtype=np.float32)
    # dual-basis precompute (see _packet_traverse): Ng = e1 x e2 and the
    # in-plane reciprocal basis U = e2 x Ng / |Ng|^2, V = Ng x e1 / |Ng|^2
    # so the kernel's barycentrics are two affine dot products. Normal
    # slots 15-20 hold DELTAS (n2-n1, n3-n1): smooth-normal interpolation
    # is n1 + u*d21 + v*d31 (2 FMAs per component). Degenerate (padding)
    # slots have Ng = 0 -> den_ok false in-kernel; their U/V are zeroed
    # here to avoid inf/nan in the table.
    # f32 throughout so this table is bit-identical to scene_tables_jnp
    e1 = np.asarray(scn.tri_e1, dtype=np.float32)
    e2 = np.asarray(scn.tri_e2, dtype=np.float32)
    ng = np.cross(e1, e2)
    l2 = (ng * ng).sum(axis=1, keepdims=True)
    safe = np.where(l2 > 0.0, l2, 1.0)
    uu = np.where(l2 > 0.0, np.cross(e2, ng) / safe, 0.0)
    vv = np.where(l2 > 0.0, np.cross(ng, e1) / safe, 0.0)
    fields = [scn.tri_p1, ng, uu, vv, scn.tri_n1,
              np.asarray(scn.tri_n2) - np.asarray(scn.tri_n1),
              np.asarray(scn.tri_n3) - np.asarray(scn.tri_n1),
              scn.tri_color]
    flat = np.concatenate([np.asarray(f, dtype=np.float32)
                           for f in fields], axis=1)  # [Ns, 24]
    for s in range(ns):
        r, k = divmod(s, _TRI_SLOTS_PER_ROW)
        tris[r, k * _TRI_STRIDE:(k + 1) * _TRI_STRIDE] = flat[s]
    return nodes, tris


def traversal_mode(meta: SceneMeta) -> str:
    """Which packet-traversal leaf machine the megakernel uses
    (trace-time static; table layout must match, so every megakernel
    call site passes this to the table builders):

    - "classic" — dual-basis VPU unroll with sub-packet gating
      (_packet_traverse), the measured round-2 default.
    - "mxu"     — leaf triangle tests as MXU matmuls
      (_packet_traverse_mxu): one [6K,128]@[128,L] plane-dot matmul per
      live sublane row per leaf (lane-packed table, scratch-placed ray
      coefficients) + a one-hot payload matmul. PT_TRAVERSAL=mxu;
      mesh scenes only (primitive scenes have no triangle pool).
    """
    import os

    if os.environ.get("PT_TRAVERSAL") == "mxu" and meta.has_groups:
        return "mxu"
    return "classic"


def _mxu_plane_arrays(xp, p1, e1, e2, n1, n2, n3, color, K):
    """Shared math for the MXU triangle tables (numpy or jnp `xp`).

    Returns (a [nl, 6K, 8], pay [nl, 16, K]) per-leaf blocks, where the
    slot pool is nl * K (leaves own aligned contiguous slot blocks —
    asserted by the callers); _mxu_pack lane-packs them into the single
    [rows, 128] VMEM table.

    A-row groups per leaf (contraction operand q = [o,1,d,0] per ray):
      g0 den   =  d.Ng          g1 num_t = -(o-P1).Ng
      g2 ou    =  (o-P1).U      g3 du    =  d.U
      g4 ov    =  (o-P1).V      g5 dv    =  d.V
    so the kernel computes t = num_t/den, u = ou + t*du, v = ov + t*dv
    — the same dual-basis hit test as _packet_traverse, as matmuls.

    Payload rows (per leaf, lanes = slot k): 0-2 n1, 3-5 n2-n1,
    6-8 n3-n1, 9-11 color, 12-15 zero padding."""
    ns = p1.shape[0]
    nl = ns // K
    ng = xp.cross(e1, e2)
    l2 = (ng * ng).sum(axis=1, keepdims=True)
    safe = xp.where(l2 > 0.0, l2, 1.0)
    uu = xp.where(l2 > 0.0, xp.cross(e2, ng) / safe, xp.zeros_like(ng))
    vv = xp.where(l2 > 0.0, xp.cross(ng, e1) / safe, xp.zeros_like(ng))
    z1 = xp.zeros((ns, 1), dtype=p1.dtype)
    z4 = xp.zeros((ns, 4), dtype=p1.dtype)

    def odot(vec):  # -(o-P1).vec as [vec, +P1.vec] on q[0:4]
        return xp.concatenate(
            [vec, -(p1 * vec).sum(axis=1, keepdims=True), z4], axis=1)

    def ddot(vec):  # d.vec on q[4:7]
        return xp.concatenate([z4, vec, z1], axis=1)

    groups = [
        ddot(ng),                                   # g0 den
        xp.concatenate(
            [-ng, (p1 * ng).sum(axis=1, keepdims=True), z4], axis=1),
        odot(uu),                                   # g2 ou
        ddot(uu),                                   # g3 du
        odot(vv),                                   # g4 ov
        ddot(vv),                                   # g5 dv
    ]
    a = xp.stack(groups, axis=1)                    # [Ns, 6, 8]
    a = a.reshape(nl, K, 6, 8).transpose(0, 2, 1, 3).reshape(nl, 6 * K, 8)

    pay = xp.concatenate([n1, n2 - n1, n3 - n1, color], axis=1)  # [Ns,12]
    pay = pay.reshape(nl, K, 12).transpose(0, 2, 1)              # [nl,12,K]
    pay = xp.concatenate(
        [pay, xp.zeros((nl, 4, K), dtype=p1.dtype)], axis=1)     # 16 rows
    return a, pay


def _mxu_leaves_per_block(K: int) -> Tuple[int, int]:
    """(A-block, payload-block) leaves packed side by side on the 128
    lanes of the MXU table: a leaf's A matrix is [6K, 8] (8 lanes), its
    payload [16, K] (K lanes). Mosaic pads any VMEM array's minor dim to
    128 lanes, so packing ~16 leaves per lane-block is what makes the
    table ~16x smaller than a naive [6*Ns, 8] layout (which would cost
    3 KB/tri physically — over VMEM for the benchmark meshes)."""
    return 16, max(1, 128 // K)


def _mxu_pack(xp, a, pay, K: int):
    """Lane-pack per-leaf blocks into the single [rows, 128] table:

      A region   rows [0, nab*6K):   table[B*6K + r, 8*j  + c] = a[16B+j,  r, c]
      pay region rows [nab*6K, ..):  table[base + Bp*16 + r, K*jp + k] = pay[PLPB*Bp+jp, r, k]

    The kernel extracts leaf b by placing its [8, L] ray-coefficient
    matrix (or [K, L] one-hot) at sublane offset 8*(b%16) (K*(b%PLPB))
    of a zeroed [128, L] scratch — the 128-lane contraction then reads
    exactly leaf b's lanes against nonzero rows."""
    ALPB, PLPB = _mxu_leaves_per_block(K)
    nl = a.shape[0]
    nab = -(-nl // ALPB)
    npb = -(-nl // PLPB)
    a = xp.concatenate(
        [a, xp.zeros((nab * ALPB - nl,) + a.shape[1:], a.dtype)], axis=0)
    a_pack = a.reshape(nab, ALPB, 6 * K, 8).transpose(0, 2, 1, 3)
    a_pack = a_pack.reshape(nab * 6 * K, ALPB * 8)
    pay = xp.concatenate(
        [pay, xp.zeros((npb * PLPB - nl,) + pay.shape[1:], pay.dtype)],
        axis=0)
    p_pack = pay.reshape(npb, PLPB, 16, K).transpose(0, 2, 1, 3)
    p_pack = p_pack.reshape(npb * 16, PLPB * K)
    if PLPB * K < 128:
        p_pack = xp.concatenate(
            [p_pack, xp.zeros((p_pack.shape[0], 128 - PLPB * K),
                              p_pack.dtype)], axis=1)
    return xp.concatenate([a_pack, p_pack], axis=0)


def _mxu_pay_base(n_slots: int, K: int) -> int:
    """First row of the payload region in the packed MXU table."""
    ALPB, _ = _mxu_leaves_per_block(K)
    nl = n_slots // K
    return -(-nl // ALPB) * 6 * K


def build_mxu_tri_table(scn: SceneArrays, meta: SceneMeta) -> np.ndarray:
    """Single [rows, 128] VMEM table for the MXU leaf machine: the
    lane-packed A-plane region then the lane-packed payload region
    (_mxu_pack). Replaces the classic 24-stride table when
    traversal_mode(meta) == "mxu"."""
    K = meta.leaf_size
    ns = int(np.asarray(scn.tri_p1).shape[0])
    assert ns % K == 0, "slot pool must be whole leaves"
    f = lambda a: np.asarray(a, dtype=np.float32)
    a, pay = _mxu_plane_arrays(
        np, f(scn.tri_p1), f(scn.tri_e1), f(scn.tri_e2), f(scn.tri_n1),
        f(scn.tri_n2), f(scn.tri_n3), f(scn.tri_color), K)
    return _mxu_pack(np, a, pay, K)


def default_tile(meta: SceneMeta) -> Tuple[int, int]:
    """Ray-tile shape, swept on hardware (tools/tpu_leaf_sweep.py-style
    A/Bs, device-only timing):

    - mesh scenes: (8, 512) — one scalar BVH packet pointer per tile;
      larger packets amortize the traversal loop, (8, 512) beat (8, 128)
      by ~1.4x and (8, 1024)/(16, 512) regress
    - primitive scenes: (64, 256) — smaller tiles let the per-tile
      bounce-loop early-exit fire sooner once every ray in the tile has
      died; 542 vs 480 Msamples/s against the old (128, 256)
    - scenes with VMEM-staged file textures: (8, 512) — the one-hot MXU
      texel fetch unrolls one matmul per sublane row per bounce
      (_sample_staged), so few fat rows bound the unroll"""
    if meta.has_groups or staged_lanes(meta):
        return (8, 512)
    return (64, 256)


def default_order(meta: SceneMeta) -> str:
    """Pixel->tile assignment order: compact blocks for mesh scenes
    (smaller packet unions, +9% teapot), scanline for primitive scenes
    (block measured neutral there, 213.9 vs 212.6 Ms/s at 8 spp — keep
    the layout the 597 Ms/s headline was measured with). PT_TILE_ORDER
    still overrides both."""
    import os

    return os.environ.get(
        "PT_TILE_ORDER", "block" if meta.has_groups else "linear")


def default_pack_axis(meta: SceneMeta) -> str:
    """Which tile axis carries the sample replicas ("row" | "chunk").

    "row"   — sample-in-rows (round 3): replica r = sublane-row group r.
    "chunk" — sample-in-lane-chunks (round 4): replica c = 128-lane
              chunk group c. The point of chunk packing is ALIGNMENT
              with the scratch-gated walk (_packet_traverse_gated),
              which gates leaf work per 128-lane chunk: with chunk
              replicas + chunk-coherent sampling (_uniform_chunk), each
              gating chunk is ONE near-pencil after a diffuse bounce,
              so its slab mask kills every leaf outside its own small
              union — the gated walk then skips ~(nc-1)/nc of the leaf
              vector work instead of ~none (with row replicas every
              chunk mixes all spp_pack pencil directions and overlaps
              everything). PT_PACK_AXIS overrides.

    Round-5 default: CHUNK for mesh scenes — the full hardware matrix
    (tools/r5_matrix.log, docs/PERFORMANCE.md) measured chunk-packed
    (8,512) at 34.2/18.5 Ms/s on teapot/gopher vs 29.4/15.9 row-packed
    (+16%), with production-size mean parity verified over 8 seeds and
    per-pixel variance parity over 64 (tools/variance_check.py).
    Primitive scenes have no traversal to help, so they keep "row"
    (their pack is 1 anyway, default_pack).
    """
    import os

    v = os.environ.get("PT_PACK_AXIS")
    if v:
        return v
    return "chunk" if meta.has_groups else "row"


def clamp_pack(pack: int, S: int, L: int, pack_axis: str) -> int:
    """Largest packing factor <= pack the tile supports on the axis:
    row replicas must divide S; chunk replicas must cut L into
    128-lane-aligned groups (vreg + gating alignment)."""
    if pack_axis == "chunk":
        while pack > 1 and (L % pack or (L // pack) % 128):
            pack //= 2
    else:
        while pack > 1 and S % pack:
            pack //= 2
    return max(1, pack)


def default_pack(meta: SceneMeta, spp: int = None) -> int:
    """Sample-in-rows packing factor (see _make_kernel). Mesh scenes
    default to 8 — each (8,512) tile then traces 8 samples of one
    compact 32x16-pixel rect, halving the packet's traversal union
    (tools/spp_pack_sim.py; hardware A/B in docs/PERFORMANCE.md).
    Primitive scenes have no traversal, so packing only shrinks the
    early-exit granularity — keep 1. PT_SPP_PACK overrides; the factor
    is clamped to divide spp when given."""
    import os

    pack = int(os.environ.get("PT_SPP_PACK",
                              "8" if meta.has_groups else "1"))
    if spp is not None:
        while pack > 1 and spp % pack:
            pack //= 2
    return max(1, pack)


def tile_pixel_layout(W: int, H: int, S: int, L: int,
                      shard_granule: int = 1, order: str = None,
                      spp_pack: int = 1, pack_axis: str = "row"):
    """Assign pixels to ray tiles.

    Returns (px [rows, L] i32, py [rows, L] i32, pid [rows*L] i64) where
    pid maps each tile slot to its flat pixel index (-1 = padding slot;
    padding renders a duplicate pixel and is dropped by untile_image).

    spp_pack=s > 1 (sample-in-rows packing, see _make_kernel): each
    (S, L) tile carries only S*L/s distinct pixels — one compact block
    laid out for an (S/s, L) sub-tile, repeated across the s sublane-row
    groups. Replicated slots share the pixel id, so untile_image SUMS
    them (each slot holds spp/s of the pixel's spp samples).

    pack_axis="chunk": the replicas live along the LANE dim instead —
    one compact (S, L/s) block repeated across the s lane-chunk groups
    (requires L/s to be a multiple of 128 so each replica is whole
    vreg-width chunks; see default_pack_axis for why this alignment
    matters to the gated walk).

    order:
    - "linear" — scanline order (tile = S*L consecutive pixels, ~3 full
      rows at 1280 wide). The round-1 layout.
    - "block"  — square pixel blocks of S*L pixels (64x64 for the mesh
      tile): each packet is spatially COMPACT, so its rays traverse
      similar BVH regions. Packet traversal pays the UNION of its rays'
      node/leaf visits (_packet_traverse) — compact packets shrink that
      union for primary rays and keep it correlated across bounces, and
      whole packets over dead regions early-out. This is the difference
      between ~3-scanline strips that all intersect the mesh's screen
      band and square blocks most of which never touch it.
    - "subblock" — like "block", but the slots are permuted so each
      128-lane chunk of the tile is itself a COMPACT sub-block (e.g.
      the 4 chunks of an (8,512) tile become the four 32x32 quadrants
      of the 64x64 block) instead of interleaved 64-wide stripes. The
      sub-packet leaf gating in _packet_traverse conds triangle work
      per chunk, so chunk-compactness shrinks the unions that gating
      acts on (primary rays especially).
    - "rowblock" — like "block", but each SUBLANE ROW of the tile is a
      compact sub-rectangle (an (8,512) tile's 64x64 block becomes a
      2x4 grid of 32x16 row-rects) instead of a 64x8 stripe. The MXU
      leaf machine (_packet_traverse_mxu) gates its matmul + tail per
      sublane row, so row-compactness shrinks the unions ITS gating
      acts on.
    - None/"auto" — PT_TILE_ORDER env override, else "block".

    rows is padded to a multiple of S*shard_granule so shard_map can
    split tile rows evenly across 'pixels' shards.
    """
    import os

    if order is None:
        order = os.environ.get("PT_TILE_ORDER", "block")
    if spp_pack > 1 and pack_axis == "chunk":
        if L % spp_pack or (L // spp_pack) % 128:
            raise ValueError(
                f"chunk pack={spp_pack} needs L={L} to split into "
                f"128-lane-aligned replica groups")
        cw = L // spp_pack
        xs, ys, pid = tile_pixel_layout(
            W, H, S, cw, shard_granule=shard_granule, order=order)
        xs = np.ascontiguousarray(np.tile(xs, (1, spp_pack)))
        ys = np.ascontiguousarray(np.tile(ys, (1, spp_pack)))
        pid = np.ascontiguousarray(
            np.tile(pid.reshape(-1, cw), (1, spp_pack))).reshape(-1)
        return xs, ys, pid
    if spp_pack > 1:
        if S % spp_pack:
            raise ValueError(f"spp_pack={spp_pack} must divide S={S}")
        Ss = S // spp_pack
        xs, ys, pid = tile_pixel_layout(W, H, Ss, L, order=order)
        n_tiles = xs.shape[0] // Ss
        rep = lambda a: np.ascontiguousarray(np.broadcast_to(  # noqa: E731
            a.reshape(n_tiles, 1, Ss, L),
            (n_tiles, spp_pack, Ss, L)).reshape(-1, L))
        xs = rep(xs)
        ys = rep(ys)
        pid = np.ascontiguousarray(
            np.broadcast_to(pid.reshape(n_tiles, 1, Ss * L),
                            (n_tiles, spp_pack, Ss * L))).reshape(-1)
        extra_t = (-n_tiles) % shard_granule
        if extra_t:   # pad with whole dummy tiles for even sharding
            xs = np.concatenate(
                [xs, np.full((extra_t * S, L), W - 1, np.int32)])
            ys = np.concatenate(
                [ys, np.full((extra_t * S, L), H - 1, np.int32)])
            pid = np.concatenate(
                [pid, np.full(extra_t * S * L, -1, pid.dtype)])
        return xs, ys, pid
    tile_sz = S * L
    n_pix = W * H

    if order in ("block", "subblock", "rowblock"):
        side = int(math.isqrt(tile_sz))
        while tile_sz % side:
            side -= 1
        bw, bh = tile_sz // side, side    # e.g. 4096 -> 64x64
        nbx = -(-W // bw)
        nby = -(-H // bh)
        k = np.arange(nbx * nby * tile_sz)
        b = k // tile_sz                  # block id
        i = k % tile_sz                   # slot within block
        nc = L // 128 if (L % 128 == 0 and L > 128) else 1
        S_rows = tile_sz // L
        if order == "rowblock" and S_rows > 1:
            # sublane row s = one compact (bw/gx) x (bh/gy) rect
            s, l = i // L, i % L
            gx = int(math.isqrt(S_rows))
            while S_rows % gx:
                gx -= 1
            gy = S_rows // gx             # gx*gy row-rect grid
            rw, rh = bw // gx, bh // gy   # rw*rh == L always
            ix = (s % gx) * rw + l % rw
            iy = (s // gx) * rh + l // rw
        elif order == "subblock" and nc > 1:
            # permute slots so lane chunk j = one compact sub-block:
            # slot i = s*L + 128*j + m  ->  sub-block j, local p=s*128+m
            s, l = i // L, i % L
            j, m = l // 128, l % 128
            p = s * 128 + m               # [0, S*128) = sub-block size
            gx = int(math.isqrt(nc))
            while nc % gx:
                gx -= 1
            gy = nc // gx                 # gx*gy sub-block grid
            sbw, sbh = bw // gx, bh // gy # sbw*sbh == S*128 always
            ix = (j % gx) * sbw + p % sbw
            iy = (j // gx) * sbh + p // sbw
        else:
            ix, iy = i % bw, i // bw
        x = (b % nbx) * bw + ix
        y = (b // nbx) * bh + iy
        valid = (x < W) & (y < H)
        pid = np.where(valid, y * W + x, -1)
        xs = np.minimum(x, W - 1).astype(np.int32)
        ys = np.minimum(y, H - 1).astype(np.int32)
    else:
        pad = (-n_pix) % tile_sz
        ids = np.arange(n_pix + pad)
        pid = np.where(ids < n_pix, ids, -1)
        xs = (ids % W).astype(np.int32)
        ys = np.minimum(ids // W, H - 1).astype(np.int32)

    rows = xs.shape[0] // L
    extra = (-rows) % (S * shard_granule)
    if extra:
        xs = np.concatenate([xs, np.full(extra * L, W - 1, np.int32)])
        ys = np.concatenate([ys, np.full(extra * L, H - 1, np.int32)])
        pid = np.concatenate([pid, np.full(extra * L, -1, pid.dtype)])
        rows += extra
    return xs.reshape(rows, L), ys.reshape(rows, L), pid


def untile_image(flat: np.ndarray, pid: np.ndarray, W: int, H: int
                 ) -> np.ndarray:
    """Scatter tiled per-slot values [rows*L, C] back to [H*W, C].

    Accumulating scatter: sample-in-rows packing (tile_pixel_layout
    spp_pack > 1) legitimately maps several slots to one pixel, each
    holding a partial sample sum — duplicates ADD. Unpacked layouts
    have unique valid pids, for which this is the plain scatter."""
    out = np.zeros((W * H, flat.shape[-1]), dtype=flat.dtype)
    valid = pid >= 0
    np.add.at(out, pid[valid], flat[valid])
    return out


def build_camera_vec(cam) -> np.ndarray:
    """Build the SMEM camera vector from the HOST Camera (numpy fields).

    Passing the device-side CameraArrays here instead is a severe perf
    bug: each float()/np.asarray() of a device array is a device_get,
    and tiny gets over the remote-TPU tunnel cost SECONDS each (measured
    ~100 s for the six fields) — keep this strictly host-side."""
    out = np.zeros((_CAM_COLS,), dtype=np.float32)
    inv = np.asarray(cam.inverse, dtype=np.float32)
    assert isinstance(cam.inverse, np.ndarray) or not hasattr(
        cam.inverse, "devices"), "pass the host Camera, not CameraArrays"
    out[0:12] = inv[:3, :].reshape(12)
    out[12] = float(cam.pixel_size)
    out[13] = float(cam.half_width)
    out[14] = float(cam.half_height)
    out[15] = float(cam.aperture)
    out[16] = float(cam.focal_length)
    return out


# --- kernel PRNG ---------------------------------------------------------
#
# On hardware: the on-core PRNG (pltpu.prng_seed / prng_random_bits),
# seeded per (seed, tile) — free vector randomness with no carried state.
# In interpret mode (CPU): those primitives have no lowering, so a
# SOFTWARE counter-based generator stands in — each draw site passes a
# static draw id plus its loop indices (sample n, bounce b) and the
# value is a murmur3-style hash of (seed, tile, did, n, b, slot). This
# keeps the megakernel, the differentiable megakernel, and
# render_sharded_pallas fully testable on the CPU (forward and replay
# see identical draws BY CONSTRUCTION — both name the same ids), at the
# cost of a different — but equally uniform — stream than hardware.
# _SW_PRNG is flipped at trace time by the pallas_call wrappers when
# interpret=True; kernels call _prng_seed/_uniform, never pltpu.prng_*.
_SW_PRNG = False
_sw_key = {}


def _prng_seed(seed, pid):
    """Seed the per-tile stream (hardware PRNG or the software hash)."""
    if _SW_PRNG:
        _sw_key["k"] = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
                        ^ pid.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    else:
        pltpu.prng_seed(seed, pid)


def _uniform(shape, did=0, n=None, b=None):
    """f32 uniforms in [0,1).

    Hardware path: prng_random_bits returns int32 — bitcast to uint32
    before the shift or the arithmetic shift smears the sign bit
    ([-0.5, 0.5) uniforms). `did`/`n`/`b` are ignored (the hardware
    stream advances statefully).

    Software path (interpret mode): murmur3 finalizer over
    (seed-key, draw id `did`, sample `n`, bounce `b`, element index) —
    stateless, so the grad kernel's replay reproduces the forward's
    draws exactly by naming the same ids."""
    if not _SW_PRNG:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # logical shift in uint32, then back to int32 for the f32 cast
        # (Mosaic has no uint32->float32 cast; values < 2^24 are exact
        # in i32)
        top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
        return top24.astype(jnp.float32) * _INV24
    h = _sw_key["k"] ^ jnp.uint32((did * 0xC2B2AE3D) & 0xFFFFFFFF)
    if n is not None:
        h = h + n.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
    if b is not None:
        h = h + b.astype(jnp.uint32) * jnp.uint32(0x165667B1)
    r0 = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    r1 = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    x = h + r0 * jnp.uint32(shape[-1]) + r1
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    top24 = (x >> jnp.uint32(8)).astype(jnp.int32)
    return top24.astype(jnp.float32) * _INV24


def _coherent_sampling() -> bool:
    """Coherent path tracing (Sadeghi et al. 2009): share the bounce /
    roulette / light-sample uniforms across each sublane ROW of the
    tile. Every pixel's per-sample estimator keeps the exact same
    distribution (unbiased, same per-pixel variance — only CROSS-pixel
    noise correlation within a row at the same sample index changes,
    which averages out over spp), but all rays of a row bounce into the
    same direction relative to their local frame — on flat surfaces the
    outgoing packet is a near-pencil, which collapses the packet BVH
    walk's union of visited leaves (the dominant mesh-scene cost,
    docs/PERFORMANCE.md). PT_COHERENT=0 opts out (e.g. for
    tight-tolerance statistical tests, where row correlation inflates
    the variance of image-mean estimates)."""
    return os.environ.get("PT_COHERENT", "1") != "0"


def _uniform_row(shape, did=0, n=None, b=None):
    """One shared f32 uniform in [0,1) per sublane row.

    Draws a full per-lane tile with _uniform — so the hardware PRNG
    stream advances EXACTLY as in the per-lane path and the grad
    kernel's replay stays aligned — then lane-broadcasts column 0.
    With spp_pack > 1 each sublane row belongs to exactly one sample
    replica, so row-sharing never correlates distinct samples of the
    same pixel."""
    x = _uniform(shape, did, n, b)
    return jnp.broadcast_to(x[:, 0:1], shape)


def _uniform_chunk(shape, cw, did=0, n=None, b=None):
    """One shared f32 uniform in [0,1) per cw-lane CHUNK group (the
    coherent-sampling unit for chunk-packed tiles, default_pack_axis).

    Like _uniform_row, the full per-lane tile is drawn first so the
    hardware PRNG stream advances identically in every mode; chunk c's
    value is the draw at (row 0, lane c*cw), broadcast over the whole
    (S, cw) replica. With chunk packing each replica group is exactly
    one sample index of the tile's pixel block, so chunk-sharing never
    correlates distinct samples of one pixel — while ROW-sharing here
    WOULD (the same pixel block repeats across chunks), which is why
    the sharing unit must follow the packing axis."""
    S, L = shape
    x = _uniform(shape, did, n, b)
    # Mosaic has no combined sublane-and-lane vector broadcast
    # ((1,1)->(S,cw) fails to lower, and a two-step composition gets
    # re-fused by layout inference; optimization_barrier has no Pallas
    # lowering) — but a SCALAR splat always lowers: reduce the (1,1)
    # slice to rank 0, then jnp.full-splat it over the replica
    x0 = x[0:1, :]
    if cw >= L:
        return jnp.full(shape, jnp.sum(x0[:, 0:1]), jnp.float32)
    return jnp.concatenate(
        [jnp.full((S, cw), jnp.sum(x0[:, c * cw:c * cw + 1]), jnp.float32)
         for c in range(L // cw)], axis=1)


def _mat12_point(m, x, y, z):
    """(12 scalars) 3x4 matrix x point."""
    return (
        m[0] * x + m[1] * y + m[2] * z + m[3],
        m[4] * x + m[5] * y + m[6] * z + m[7],
        m[8] * x + m[9] * y + m[10] * z + m[11],
    )


def _mat12_vec(m, x, y, z):
    return (
        m[0] * x + m[1] * y + m[2] * z,
        m[4] * x + m[5] * y + m[6] * z,
        m[8] * x + m[9] * y + m[10] * z,
    )


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _axis_slab(o, d, mn, mx, eps):
    use = jnp.abs(d) >= eps
    d_safe = jnp.where(use, d, 1.0)
    t1 = jnp.where(use, (mn - o) / d_safe, (mn - o) * _BIG)
    t2 = jnp.where(use, (mx - o) / d_safe, (mx - o) * _BIG)
    return jnp.minimum(t1, t2), jnp.maximum(t1, t2)


def _plane_t(oy, dy, eps):
    ok = jnp.abs(dy) > eps
    t = -oy / jnp.where(ok, dy, 1.0)
    return jnp.where(ok & (t > eps), t, _BIG)


def _sphere_t(ox, oy, oz, dx, dy, dz, eps):
    """Geometric foot-point form (see intersect.py:_sphere_t for why)."""
    a = dx * dx + dy * dy + dz * dz
    t_mid = -(ox * dx + oy * dy + oz * dz) / a
    mx = ox + dx * t_mid
    my = oy + dy * t_mid
    mz = oz + dz * t_mid
    perp2 = mx * mx + my * my + mz * mz
    ok = perp2 < 1.0
    dt = jnp.sqrt(jnp.where(ok, (1.0 - perp2) / a, 0.0))
    t1 = t_mid - dt
    t2 = t_mid + dt
    return jnp.minimum(
        jnp.where(ok & (t1 > eps), t1, _BIG),
        jnp.where(ok & (t2 > eps), t2, _BIG),
    )


def _cylinder_t(ox, oy, oz, dx, dy, dz, min_y, max_y, eps):
    a = dx * dx + dz * dz
    ok_a = jnp.abs(a) >= eps
    a_safe = jnp.where(ok_a, a, 1.0)
    t_mid = -(ox * dx + oz * dz) / a_safe
    mx = ox + dx * t_mid
    mz = oz + dz * t_mid
    perp2 = mx * mx + mz * mz
    ok = ok_a & (perp2 <= 1.0)
    dt = jnp.sqrt(jnp.where(ok, (1.0 - perp2) / a_safe, 0.0))
    t0 = t_mid - dt
    t1 = t_mid + dt
    y0 = oy + t0 * dy
    y1 = oy + t1 * dy
    v0 = ok & (y0 > min_y) & (y0 < max_y) & (t0 > eps)
    v1 = ok & (y1 > min_y) & (y1 < max_y) & (t1 > eps)
    return jnp.minimum(jnp.where(v0, t0, _BIG), jnp.where(v1, t1, _BIG))


def _box_t(ox, oy, oz, dx, dy, dz, eps):
    x1, x2 = _axis_slab(ox, dx, -1.0, 1.0, eps)
    y1, y2 = _axis_slab(oy, dy, -1.0, 1.0, eps)
    z1, z2 = _axis_slab(oz, dz, -1.0, 1.0, eps)
    tmin = jnp.maximum(jnp.maximum(x1, y1), z1)
    tmax = jnp.minimum(jnp.minimum(x2, y2), z2)
    ok = tmin <= tmax
    return jnp.minimum(
        jnp.where(ok & (tmin > eps), tmin, _BIG),
        jnp.where(ok & (tmax > eps), tmax, _BIG),
    )


def _schlick(cx, cy, cz, nx, ny, nz, n1, n2):
    """tracer.cl:485-505 with scalar-or-vector n1/n2."""
    cos = _dot(cx, cy, cz, nx, ny, nz)
    n = n1 / n2
    sin2t = (n * n) * (1.0 - cos * cos)
    tir = (n1 > n2) & (sin2t > 1.0)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2t, 0.0, None))
    cos_eff = jnp.where(n1 > n2, cos_t, cos)
    temp = (n1 - n2) / (n1 + n2)
    r0 = temp * temp
    m = 1.0 - cos_eff
    m2 = m * m
    res = r0 + (1.0 - r0) * (m2 * m2 * m)
    return jnp.where(tir, 1.0, res)


def _refract(cx, cy, cz, nx, ny, nz, n1, n2):
    cos_i = _dot(cx, cy, cz, nx, ny, nz)
    ratio = n1 / n2
    sin2t = (ratio * ratio) * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2t, 0.0, None))
    k = ratio * cos_i - cos_t
    ok = sin2t <= 1.0
    return (
        jnp.where(ok, nx * k - cx * ratio, 0.0),
        jnp.where(ok, ny * k - cy * ratio, 0.0),
        jnp.where(ok, nz * k - cz * ratio, 0.0),
    )


def _atan_poly(z):
    """atan(z) for z in [0,1]: odd degree-13 least-squares fit, max err
    7.7e-7 rad (Mosaic has no atan2/acos primitive, so the sphere UV
    builds them from this)."""
    z2 = z * z
    return z * (0.99999659 + z2 * (-0.33319012 + z2 * (0.19823318
        + z2 * (-0.13294270 + z2 * (0.08076473 + z2 * (-0.03461463
        + z2 * 0.00715190))))))


def _atan2(y, x):
    """Four-quadrant atan2 via octant reduction to _atan_poly."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    z = num / jnp.maximum(den, jnp.float32(1e-30))
    r = _atan_poly(z)
    r = jnp.where(swap, jnp.float32(math.pi / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(math.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(x):
    """acos(x) = atan2(sqrt(1-x^2), x) for x in [-1, 1]."""
    s = jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0))
    return _atan2(s, x)


def _spherical_uv(lx, ly, lz):
    """Unit-sphere local point -> texture (u, v), matching
    uv.spherical_map + the integrator's v flip (tracer.cl:178-213)."""
    theta = _atan2(lx, lz)
    radius = jnp.sqrt(lx * lx + ly * ly + lz * lz)
    phi = _acos(jnp.clip(ly / radius, -1.0, 1.0))
    raw_u = theta * jnp.float32(1.0 / (2.0 * math.pi))
    u = 1.0 - (raw_u + 0.5)
    v = phi * jnp.float32(1.0 / math.pi)  # = 1 - (1 - phi/pi)
    return u, v


def _cfmod(a, b):
    """C fmod (truncated, sign of dividend) — cube-cross UV helper."""
    return a - b * jnp.trunc(a * jnp.float32(1.0 / b))


def _cube_uv(x, y, z):
    """Cube-cross UV for a unit-cube local point, matching uv.cube_uv
    (tracer.cl:113-175)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    az = jnp.abs(z)
    coord = jnp.maximum(jnp.maximum(ax, ay), az)

    third = jnp.float32(0.333333)
    v_mid = jnp.float32(0.6666666) - (_cfmod(y + 1.0, 2.0) * 0.5) * third
    u_right = 0.5 + (_cfmod(1.0 - z, 2.0) * 0.5) * 0.25
    u_left = (_cfmod(z + 1.0, 2.0) * 0.5) * 0.25
    u_top = 0.25 + (_cfmod(x + 1.0, 2.0) * 0.5) * 0.25
    v_top = 1.0 - (_cfmod(1.0 - z, 2.0) * 0.5) * third
    v_bottom = (_cfmod(z + 1.0, 2.0) * 0.5) * third
    u_back = 0.75 + (_cfmod(1.0 - x, 2.0) * 0.5) * 0.25

    sel_right = coord == x
    sel_left = (~sel_right) & (coord == -x)
    sel_top = (~sel_right) & (~sel_left) & (coord == y)
    sel_bottom = (~sel_right) & (~sel_left) & (~sel_top) & (coord == -y)
    sel_front = (~sel_right) & (~sel_left) & (~sel_top) & (~sel_bottom) \
        & (coord == z)

    u = jnp.where(sel_right, u_right,
        jnp.where(sel_left, u_left,
        jnp.where(sel_top, u_top,
        jnp.where(sel_bottom, u_top,
        jnp.where(sel_front, u_top, u_back)))))
    v = jnp.where(sel_top, v_top,
        jnp.where(sel_bottom, v_bottom, v_mid))
    return u, v


def _wrap_tex(a, m):
    """Floor-mod wrap of a float-held integer coordinate to [0, m)."""
    fm = jnp.float32(m)
    return a - fm * jnp.floor(a / fm)


def _sample_proc(desc, w: int, h: int, u, v):
    """Bilinear REPEAT sample of a PROCEDURAL texture: the four texel
    taps are COMPUTED with the proctex program (incl. the pool's rgb8
    quantization) instead of gathered — the megakernel's texturing
    strategy (render/proctex.py). Semantics match uv.sample_texture_pool
    / tracer.cl:829 (normalized coords, REPEAT, LINEAR)."""
    from . import proctex

    fx = u * jnp.float32(w) - 0.5
    fy = v * jnp.float32(h) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0w = _wrap_tex(x0, w)
    x1w = _wrap_tex(x0 + 1.0, w)
    y0w = _wrap_tex(y0, h)
    y1w = _wrap_tex(y0 + 1.0, h)

    c00 = proctex.eval_texel(jnp, desc, x0w, y0w, h, w)
    c01 = proctex.eval_texel(jnp, desc, x1w, y0w, h, w)
    c10 = proctex.eval_texel(jnp, desc, x0w, y1w, h, w)
    c11 = proctex.eval_texel(jnp, desc, x1w, y1w, h, w)
    out = []
    for k in range(3):
        top = c00[k] * (1.0 - tx) + c01[k] * tx
        bot = c10[k] * (1.0 - tx) + c11[k] * tx
        out.append(top * (1.0 - ty) + bot * ty)
    return out


def _sample_staged(tex_ref, desc, u, v):
    """Bilinear REPEAT sample of a VMEM-STAGED file-backed texture.

    TPU vector lanes cannot gather, so the fetch is ALGEBRA on the MXU
    (probe: tools/tex_vmem_probe.py — 0.515 Gfetch/s at 128x128 on a
    v5e, 2x the XLA flat-pool gather the wavefront path uses): per
    sublane row of the tile, a bilinear-weighted one-hot row matrix
    M[h, l] = (h==y0)*(1-ty) + (h==y1)*ty selects-and-blends the two
    texel rows of every lane with ONE [128,L]x[128,3w] matmul (row
    blend and column blend commute, so the y-weights fold into M;
    textures taller than 128 take one matmul per row tap, lane-masked
    to the 128-row window each lane's y falls in), then a tx-weighted
    one-hot lane mask — color-INDEPENDENT thanks to the atlas's
    color-outer layout (pack._stage_file_textures), so it is built once
    and reduces each color plane by a static slice. Cost is O(texture
    area) per texel — why staging is capped. Coordinate semantics
    identical to _sample_proc / uv.sample_texture_pool / tracer.cl:829,
    and the staged texels are rgb8-quantized like the wavefront pool,
    so the two paths agree texel-exactly."""
    _, base, w, h = desc
    hb = -(-h // 128)
    # round-5 atlas layout: GLOBAL color-outer (plane stride P = Ltot/3,
    # pack._stage_file_textures) — re-assemble this group's [r | g | b]
    # window from the three static plane slices; the window math below
    # is unchanged
    P = tex_ref.shape[1] // 3
    win = jnp.concatenate(
        [tex_ref[:, c * P + base: c * P + base + hb * w]
         for c in range(3)], axis=1)                # [128, 3*hb*w]
    fx = u * jnp.float32(w) - 0.5
    fy = v * jnp.float32(h) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    # integer index space (Mosaic iota must be integer)
    x0i = _wrap_tex(x0, w).astype(jnp.int32)
    x1i = _wrap_tex(x0 + 1.0, w).astype(jnp.int32)
    y0i = _wrap_tex(y0, h).astype(jnp.int32)
    y1i = _wrap_tex(y0 + 1.0, h).astype(jnp.int32)
    S, L = u.shape
    cw = hb * w                  # one color plane's lane width
    col = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, cw), 1)
    rowoh = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)

    # fori_loop (not a static unroll) over sublane rows: the [L, *]
    # sel/mask temporaries are reused across iterations instead of all
    # being live at once — an S-row unroll blew Mosaic's 16 MB scoped
    # VMEM stack at production tiles
    def row(s, acc):
        def take(a):             # [S, L] -> [L]: row s by masked reduce
            # (dynamic sublane indexing of a VALUE has no Mosaic
            # lowering; a one-hot sublane sum does the same job)
            return jnp.sum(jnp.where(rowoh == s, a,
                                     jnp.zeros_like(a)), axis=0)

        def bc_row(a):           # [S, L] -> [128, L] (broadcast row s)
            return jax.lax.broadcast_in_dim(take(a), (128, L), (1,))

        def bc_lane(a):          # [S, L] -> [L, cw]
            return jax.lax.broadcast_in_dim(take(a), (L, cw), (0,))

        txl = bc_lane(tx)
        if hb == 1:
            # y-blend inside the one matmul
            m = ((col == bc_row(y0i)).astype(jnp.float32)
                 * bc_row(1.0 - ty)
                 + (col == bc_row(y1i)).astype(jnp.float32)
                 * bc_row(ty))
            sel = jax.lax.dot_general(
                m, win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [L, 3w]
            # ONE color-independent x mask (color-outer atlas layout),
            # three static-slice reduces
            n = ((lane == bc_lane(x0i)).astype(jnp.float32)
                 * (1.0 - txl)
                 + (lane == bc_lane(x1i)).astype(jnp.float32) * txl)
            res = [jnp.sum(sel[:, c * cw:(c + 1) * cw] * n, axis=1)
                   for c in range(3)]
        else:
            # two row taps; the (window, x) mask is color-independent
            # and built once per tap
            taps = []
            for yi in (y0i, y1i):
                k = yi // 128                            # window index
                m = (col == bc_row(yi - 128 * k)).astype(jnp.float32)
                sel = jax.lax.dot_general(
                    m, win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [L, 3*cw]
                kl = bc_lane(k) * w
                n = ((lane == (kl + bc_lane(x0i))).astype(jnp.float32)
                     * (1.0 - txl)
                     + (lane == (kl + bc_lane(x1i)))
                     .astype(jnp.float32) * txl)
                taps.append(
                    [jnp.sum(sel[:, c * cw:(c + 1) * cw] * n, axis=1)
                     for c in range(3)])
            tys = take(ty)                               # [L]
            res = [taps[0][c] * (1.0 - tys) + taps[1][c] * tys
                   for c in range(3)]
        # scatter the row result into the [S, L] accumulators via a
        # row one-hot (no dynamic sublane stores on values)
        oh = (rowoh == s).astype(jnp.float32)
        return tuple(
            a + oh * jax.lax.broadcast_in_dim(r, (S, L), (1,))
            for a, r in zip(acc, res))

    zero = jnp.zeros((S, L), jnp.float32)
    return list(jax.lax.fori_loop(0, S, row, (zero, zero, zero)))


def _sample_tex(tex_ref, desc, w, h, u, v):
    """Texture sample dispatch: VMEM-staged file image (one-hot MXU
    fetch) vs procedural program (computed texels)."""
    if isinstance(desc, tuple) and desc and desc[0] == "__staged__":
        return _sample_staged(tex_ref, desc, u, v)
    return _sample_proc(desc, w, h, u, v)


def _unified_staged() -> bool:
    """Round 5: fetch ALL of a bounce's staged textures with ONE matmul
    pair per sublane row instead of one per texture group. The staged
    path is DISPATCH-bound, not area-bound (measured: 64² mips of every
    texture buy only +13% over full sizes, docs/PERFORMANCE.md), so
    merging the per-group matmuls — identical MACs over the
    concatenated atlas, ~n_groups× fewer MXU dispatches — attacks the
    actual cost. PT_TEX_UNIFIED=0 restores the per-group fetch."""
    return os.environ.get("PT_TEX_UNIFIED", "1") != "0"


def _sample_staged_unified(tex_ref, base, w, h, u, v, active):
    """Bilinear REPEAT sample of VMEM-staged textures with PER-LANE
    descriptors: base/w/h are f32 [S, L] vectors (the winning object's
    staged-texture geometry, where()-merged exactly like its color), so
    ONE call serves every staged group of the bounce.

    Same algebra as _sample_staged's multi-window path — per sublane
    row, per row-tap, one one-hot [128, L] x [128, Ltot] matmul over
    the WHOLE atlas, then ONE color-independent lane mask: the atlas is
    GLOBAL color-outer (all red planes | green | blue, plane stride
    P = Ltot/3, pack._stage_file_textures), so color c's texel for
    every texture sits at c*P + base + k*w + x and the three color
    reduces are static [L, P] slices sharing the mask. MAC count
    equals the sum of the per-group fetches; dispatch count is
    n_groups× smaller (the staged path is dispatch-bound —
    docs/PERFORMANCE.md). Lanes with `active` False fetch garbage
    harmlessly (weights zeroed via the m matrix; results masked by the
    caller)."""
    Ltot = tex_ref.shape[1]
    P = Ltot // 3
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    wsafe = jnp.maximum(w, 1.0)
    hsafe = jnp.maximum(h, 1.0)
    y0f = _wrap_tex(y0, hsafe)
    y1f = _wrap_tex(y0 + 1.0, hsafe)
    # per-lane PLANE offsets of the two x taps, computed in [S, L]
    # space per row-tap (window offset k*w folds in) so the row body
    # broadcasts only THREE [L, P] arrays — the naive form's ~8 [L, P]
    # temporaries blew Mosaic's 16 MB scoped-VMEM stack
    def tap_offsets(yif):
        koff = base + jnp.floor(yif / 128.0) * w
        return (koff + _wrap_tex(x0, wsafe),
                koff + _wrap_tex(x0 + 1.0, wsafe))

    S, L = u.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, P), 1)
    rowoh = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    act_f = active.astype(jnp.float32)
    # color planes stacked along SUBLANES once per call: ONE
    # [384, P] x [P, L] matmul per row-tap then serves all three colors
    # (t[c*128+h, l] = sum_x win_c[h, x] n[l, x] — the color reduce is
    # folded into the matmul; the row-select against m is elementwise)
    w3 = jnp.concatenate(
        [tex_ref[:, c * P:(c + 1) * P] for c in range(3)], axis=0)

    def row(s, acc):
        def take(a):             # [S, L] -> [L] (row s, masked reduce)
            return jnp.sum(jnp.where(rowoh == s, a,
                                     jnp.zeros_like(a)), axis=0)

        def bc_row(a):           # [S, L] -> [128, L]
            return jax.lax.broadcast_in_dim(take(a), (128, L), (1,))

        def bc_lane(a):          # [S, L] -> [L, P]
            return jax.lax.broadcast_in_dim(take(a), (L, P), (0,))

        txl = bc_lane(tx)
        res = [jnp.zeros((L,), jnp.float32) for _ in range(3)]
        for yif, wy in ((y0f, 1.0 - ty), (y1f, ty)):
            yi = bc_row(yif).astype(jnp.int32)
            m = ((col == yi - 128 * (yi // 128)).astype(jnp.float32)
                 * bc_row(wy * act_f))               # [128, L]
            off0, off1 = tap_offsets(yif)
            n = ((lane == bc_lane(off0).astype(jnp.int32))
                 .astype(jnp.float32) * (1.0 - txl)
                 + (lane == bc_lane(off1).astype(jnp.int32))
                 .astype(jnp.float32) * txl)          # [L, P]
            t = jax.lax.dot_general(
                w3, n, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [384, L]
            for c in range(3):
                res[c] = res[c] + jnp.sum(
                    m * t[c * 128:(c + 1) * 128], axis=0)
        oh = (rowoh == s).astype(jnp.float32)
        return tuple(
            a + oh * jax.lax.broadcast_in_dim(r, (S, L), (1,))
            for a, r in zip(acc, res))

    zero = jnp.zeros((S, L), jnp.float32)
    return list(jax.lax.fori_loop(0, S, row, (zero, zero, zero)))


def _tex_groups(entries, obj_types):
    """Group per-object texture records that share (desc, w, h, sx, sy)
    and primitive type (the type picks the UV mapping), so objects with
    the same program evaluate it once per bounce (e.g. the three
    squares-textured walls of the `textures` scene)."""
    groups = {}
    for (slot, desc, w, h, sx, sy) in entries:
        key = (desc, w, h, sx, sy, obj_types[slot])
        groups.setdefault(key, []).append(slot)
    return [(slots, desc, w, h, sx, sy, tcode)
            for (desc, w, h, sx, sy, tcode), slots in groups.items()]


def _group_octant_base(meta: SceneMeta, pre, tdx, tdy, tdz):
    """Node-table offset selecting the front-to-back DFS copy for this
    packet's majority direction octant (scene/bvh.octant_node_orders).
    Returns None when the scene has no octant copies. Four cheap
    reductions + scalar ops per group traversal."""
    if not meta.octant_orders:
        return None
    act = pre.astype(jnp.float32)
    half = jnp.sum(act) * 0.5
    bx = jnp.sum(act * (tdx < 0.0).astype(jnp.float32)) > half
    by = jnp.sum(act * (tdy < 0.0).astype(jnp.float32)) > half
    bz = jnp.sum(act * (tdz < 0.0).astype(jnp.float32)) > half
    oct = (bx.astype(jnp.int32) + 2 * by.astype(jnp.int32)
           + 4 * bz.astype(jnp.int32))
    return (1 + oct) * jnp.int32(meta.n_nodes)


def _lane_chunks(x, nc):
    """Split the lane (minor) dim into `nc` vreg-aligned chunks."""
    if nc == 1:
        return [x]
    w = x.shape[-1] // nc
    return [x[..., j * w:(j + 1) * w] for j in range(nc)]


def _leaf_tests(tri_ref, r0, leaf_rows, eps, tox, toy, toz,
                tdx, tdy, tdz, start, uniform_color=None,
                return_slot=False):
    """All triangle tests of one leaf against one ray chunk, reduced to
    the single closest hit by a pairwise min-TREE.

    Round-4 restructure of the leaf body (tools/leaf_microbench.py):
    each triangle's chain is fully independent — validity has no `hb`
    and no `t < best_t` term, the hit point h = p + t*d is computed
    once and u = h.U, v = h.V (vs the p.U + t*(d.U) form: ~9 fewer ops
    per test) — and the winner is folded in a log2(K)-deep tree instead
    of a K-long serial select chain. Ties keep the LOWER slot (strict
    <), matching the serial unroll. The caller merges the winner into
    its running state with ONE `hb & (tw < bt)` select per leaf.

    Returns (tw, nx, ny, nz [, cr, cg, cb] [, slotf]); tw = _BIG where
    the leaf has no valid hit. Payload entries start as 0-d scalars for
    padding-free selects; they broadcast at the first tree level."""
    block = tri_ref[pl.ds(r0, leaf_rows), :]
    cand = []
    for r in range(leaf_rows):
        for s in range(_TRI_SLOTS_PER_ROW):
            c = s * _TRI_STRIDE
            # dual-basis test (see _packet_traverse docstring); layout:
            # P1(0) Ng(3) U(6) V(9) n1(12) d21(15) d31(18) color(21)
            pxx = tox - block[r, c + 0]
            pyy = toy - block[r, c + 1]
            pzz = toz - block[r, c + 2]
            den = (tdx * block[r, c + 3]
                   + tdy * block[r, c + 4]
                   + tdz * block[r, c + 5])
            num_t = -(pxx * block[r, c + 3]
                      + pyy * block[r, c + 4]
                      + pzz * block[r, c + 5])
            den_ok = jnp.abs(den) >= eps
            f = 1.0 / jnp.where(den_ok, den, 1.0)
            t = num_t * f
            hx = pxx + t * tdx
            hy = pyy + t * tdy
            hz = pzz + t * tdz
            u = (hx * block[r, c + 6] + hy * block[r, c + 7]
                 + hz * block[r, c + 8])
            v = (hx * block[r, c + 9] + hy * block[r, c + 10]
                 + hz * block[r, c + 11])
            # u <= 1 is implied by v >= 0 & u + v <= 1
            valid = (den_ok & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t > eps))
            tv = jnp.where(valid, t, _BIG)
            # smooth normal n2*u + n3*v + n1*(1-u-v) (tracer.cl:669)
            # = n1 + u*(n2-n1) + v*(n3-n1)
            cnx = (block[r, c + 12] + block[r, c + 15] * u
                   + block[r, c + 18] * v)
            cny = (block[r, c + 13] + block[r, c + 16] * u
                   + block[r, c + 19] * v)
            cnz = (block[r, c + 14] + block[r, c + 17] * u
                   + block[r, c + 20] * v)
            entry = [tv, cnx, cny, cnz]
            if uniform_color is None:
                entry += [block[r, c + 21], block[r, c + 22],
                          block[r, c + 23]]
            if return_slot:
                entry.append((start + jnp.int32(
                    r * _TRI_SLOTS_PER_ROW + s)).astype(jnp.float32))
            cand.append(tuple(entry))
    while len(cand) > 1:
        nxt = []
        for a, b in zip(cand[::2], cand[1::2]):
            take = b[0] < a[0]
            nxt.append(tuple(
                [jnp.minimum(a[0], b[0])]
                + [jnp.where(take, b[k], a[k])
                   for k in range(1, len(a))]))
        if len(cand) % 2:
            nxt.append(cand[-1])
        cand = nxt
    return cand[0]


def _packet_traverse(node_ref, tri_ref, leaf_rows, eps, t_max,
                     root, end, tox, toy, toz, tdx, tdy, tdz,
                     active, bt0, oct_base=None, uniform_color=None,
                     return_slot=False):
    """Packet skip-link BVH walk: ONE scalar node pointer for the whole
    ray tile (classic packet tracing on the TPU's scalar-core + VPU
    split), replacing both the reference's per-work-item stack
    (tracer.cl:624) and the wavefront path's per-ray skip index. Per
    iteration: one scalar node fetch, a vectorized slab test, an
    any-reduce, and (for hit leaves) vectorized triangle tests with
    running-best selects of t / interpolated smooth normal /
    per-triangle color. best-t starts from `bt0` (the closest hit among
    earlier objects) so occluded packets prune immediately.

    Two cost-model refinements over the naive packet walk (both A/B'd on
    hardware, docs/PERFORMANCE.md):

    - SUB-PACKET LEAF GATING (opt-in, PT_SUBPACKET=1 — it LOST the
      round-3 hardware A/B by 25%): the tile's lane dim is split into
      vreg-sized (128-lane) chunks, each carrying its own slab mask and
      best-t, and each leaf's triangle tests run under a PER-CHUNK
      lax.cond. A leaf pays vector work only for the sub-packets that
      actually overlap it — but on hardware the per-chunk cond overhead
      exceeds the skipped vector work, so the monolithic walk ships as
      the default.
    - DUAL-BASIS TRIANGLE TEST: build_mesh_tables precomputes, per
      triangle, the geometric normal Ng = E1 x E2 and the in-plane dual
      basis (U, V) with U.E1 = 1, U.E2 = 0 (and symmetrically V), so the
      hit test is plane-t plus two affine barycentric evaluations:
      t = (P1 - o).Ng / d.Ng, u = (o - P1 + t d).U, v = likewise.
      Same hits as Möller–Trumbore (tracer.cl:640-674) — |d.Ng| equals
      MT's |det|, so the eps degeneracy test is unchanged — at ~2/3 the
      VPU ops (the two per-triangle cross products fall out).

    `uniform_color` (meta.tri_uniform_color): when every real triangle
    in the pool shares one color, the per-triangle color selects are
    statically elided and the constant is broadcast instead.

    `return_slot`: additionally track the WINNING global triangle slot
    index per ray (f32; -1.0 = no triangle hit) and append it to the
    returns — the differentiable megakernel's per-triangle color
    gradients key on it (pallas_grad.py). Off by default: the extra
    per-slot select is pure overhead for rendering.

    Shared by the megakernel (_make_kernel) and the intersect-only kernel
    (_make_intersect_kernel). Returns (t, nx, ny, nz, cr, cg, cb) plus
    slot when `return_slot`."""
    shape = tox.shape
    # Sub-packet gating modes (vreg-aligned 128-lane chunks; the CPU
    # exact-replay simulator predicts gating skips 40-60% of leaf
    # vector work, tools/subpacket_sim.py):
    #   PT_SUBPACKET=1  legacy lax.cond gating — LOST the round-3
    #                   hardware A/B by 25%: each cond copies its 4-8
    #                   vreg carries on both paths, which exceeds the
    #                   skipped vector work. Kept for A/Bs.
    #   PT_SUBPACKET=2  round-4 scratch gating — per-chunk hit state
    #                   lives in VMEM scratch refs and leaf bodies run
    #                   under pl.when, so a skipped chunk costs one
    #                   scalar branch and NO carry traffic.
    # Default: monolithic (no gating) unless the round-4 A/B promotes
    # mode 2 (see docs/PERFORMANCE.md).
    spmode = os.environ.get("PT_SUBPACKET", "")
    if (spmode == "2" and shape[-1] % 128 == 0 and shape[-1] > 128
            and os.environ.get("PT_ABLATE_LEAF") != "1"):
        return _packet_traverse_gated(
            node_ref, tri_ref, leaf_rows, eps, t_max, root, end,
            tox, toy, toz, tdx, tdy, tdz, active, bt0,
            oct_base=oct_base, uniform_color=uniform_color,
            return_slot=return_slot)
    nc = 1
    if (spmode == "1"
            and shape[-1] % 128 == 0 and shape[-1] > 128):
        nc = shape[-1] // 128
    c_shape = (shape[0], shape[-1] // nc)
    zero = jnp.zeros(c_shape, jnp.float32)
    any_pre = jnp.any(active)
    root_e = jnp.int32(root)
    end_e = jnp.int32(end)
    if oct_base is not None:
        root_e = root_e + oct_base
        end_e = end_e + oct_base

    ctox = _lane_chunks(tox, nc)
    ctoy = _lane_chunks(toy, nc)
    ctoz = _lane_chunks(toz, nc)
    ctdx = _lane_chunks(tdx, nc)
    ctdy = _lane_chunks(tdy, nc)
    ctdz = _lane_chunks(tdz, nc)
    cact = _lane_chunks(active, nc)
    cbt0 = _lane_chunks(bt0, nc)

    # hoist the slab-test divisions out of the walk: 1/d computed once
    # per packet; near-zero components take the BIG branch (same
    # semantics as _axis_slab)
    def inv_safe(td):
        ok = jnp.abs(td) >= eps
        return jnp.where(ok, 1.0 / jnp.where(ok, td, 1.0), _BIG)

    cinv_dx = [inv_safe(d) for d in ctdx]
    cinv_dy = [inv_safe(d) for d in ctdy]
    cinv_dz = [inv_safe(d) for d in ctdz]

    ztuple = tuple(zero for _ in range(nc))
    negtuple = tuple(zero - 1.0 for _ in range(nc))
    # color carries exist only when the mesh is not statically uniform;
    # the slot carry (last position) only when requested
    n_base = 7 if uniform_color is None else 4
    n_carry = n_base + (1 if return_slot else 0)
    init = (jnp.where(any_pre, root_e, end_e), tuple(cbt0)) + \
        (ztuple,) * (n_base - 1) + \
        ((negtuple,) if return_slot else ())

    def tcond(st):
        return st[0] < end_e

    def tbody(st):
        idx = st[0]
        bt, gnx, gny, gnz = st[1], st[2], st[3], st[4]
        if uniform_color is None:
            gcr, gcg, gcb = st[5], st[6], st[7]
        else:
            gcr = gcg = gcb = ztuple
        gsl = st[1 + n_base] if return_slot else negtuple
        node = node_ref[pl.ds(idx, 1), :]
        hitb = []
        for j in range(nc):
            ax1 = (node[0, 0] - ctox[j]) * cinv_dx[j]
            ax2 = (node[0, 3] - ctox[j]) * cinv_dx[j]
            ay1 = (node[0, 1] - ctoy[j]) * cinv_dy[j]
            ay2 = (node[0, 4] - ctoy[j]) * cinv_dy[j]
            az1 = (node[0, 2] - ctoz[j]) * cinv_dz[j]
            az2 = (node[0, 5] - ctoz[j]) * cinv_dz[j]
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(ax1, ax2), jnp.minimum(ay1, ay2)),
                jnp.minimum(az1, az2))
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(ax1, ax2), jnp.maximum(ay1, ay2)),
                jnp.maximum(az1, az2))
            hitb.append(cact[j] & (tmin <= tmax) & (tmax > eps)
                        & (tmin < bt[j]))
        anyhit_c = [jnp.any(h) for h in hitb]
        anyhit = anyhit_c[0]
        for j in range(1, nc):
            anyhit = anyhit | anyhit_c[j]
        is_leaf = node[0, 7] > 0.5
        start = node[0, 6].astype(jnp.int32)
        exitn = node[0, 8].astype(jnp.int32)
        r0 = jax.lax.div(start, jnp.int32(_TRI_SLOTS_PER_ROW))

        def leaf_fn(j):
            def body(carry):
                import os as _os

                if _os.environ.get("PT_ABLATE_LEAF") == "1":
                    # diagnostic ablation: traversal structure intact,
                    # triangle tests removed (renders WRONG; cost
                    # attribution only — docs/PERFORMANCE.md cost model)
                    return carry
                res = _leaf_tests(
                    tri_ref, r0, leaf_rows, eps,
                    ctox[j], ctoy[j], ctoz[j],
                    ctdx[j], ctdy[j], ctdz[j], start,
                    uniform_color=uniform_color,
                    return_slot=return_slot)
                bt = carry[0]
                tw = res[0]
                won = hitb[j] & (tw < bt) & (tw < t_max)
                return (jnp.where(won, tw, bt),) + tuple(
                    jnp.where(won, res[k], carry[k])
                    for k in range(1, len(carry)))
            return body

        outs = [[] for _ in range(n_carry)]
        for j in range(nc):
            carry_j = (bt[j], gnx[j], gny[j], gnz[j])
            if uniform_color is None:
                carry_j = carry_j + (gcr[j], gcg[j], gcb[j])
            if return_slot:
                carry_j = carry_j + (gsl[j],)
            cj = jax.lax.cond(
                anyhit_c[j] & is_leaf, leaf_fn(j), lambda cr: cr, carry_j)
            for k in range(n_carry):
                outs[k].append(cj[k])

        nidx = jnp.where(anyhit, idx + 1, exitn)
        return (nidx,) + tuple(tuple(o) for o in outs)

    st = jax.lax.while_loop(tcond, tbody, init)

    def cat(parts):
        return parts[0] if nc == 1 else jnp.concatenate(parts, axis=-1)

    bt = cat(list(st[1]))
    if uniform_color is None:
        cr, cg, cb = cat(list(st[5])), cat(list(st[6])), cat(list(st[7]))
    else:
        # statically uniform mesh color: broadcast where a tri was hit
        # (callers select by `closer = t < best_t`, so dead lanes never
        # read these)
        cr = jnp.full(shape, uniform_color[0], jnp.float32)
        cg = jnp.full(shape, uniform_color[1], jnp.float32)
        cb = jnp.full(shape, uniform_color[2], jnp.float32)
    out = (bt, cat(list(st[2])), cat(list(st[3])), cat(list(st[4])),
           cr, cg, cb)
    if return_slot:
        out = out + (cat(list(st[1 + n_base])),)
    return out


def _packet_traverse_gated(node_ref, tri_ref, leaf_rows, eps, t_max,
                           root, end, tox, toy, toz, tdx, tdy, tdz,
                           active, bt0, oct_base=None,
                           uniform_color=None, return_slot=False):
    """Scratch-gated packet walk (PT_SUBPACKET=2): the tile's lane dim
    is split into vreg-sized 128-lane chunks, each carrying its own
    slab mask and best-t, and each leaf's triangle tests run only for
    the chunks that actually overlap it — the round-2b simulator
    predicts that skips 40-60% of leaf vector work on the benchmark
    meshes (tools/subpacket_sim.py).

    Unlike the legacy lax.cond gating (PT_SUBPACKET=1, lost its
    hardware A/B to carry copies), the per-chunk hit state (best-t +
    payload) lives in VMEM *scratch refs* (pl.run_scoped) and each
    leaf-chunk body is a pl.when region that loads, updates, and stores
    its 128-lane slice in place. A skipped chunk costs one scalar
    any-reduce and a branch; the while_loop carries ONE scalar (the
    node index). Inactive lanes are pruned by seeding their best-t
    scratch with -_BIG, which fails every `tmin < bt` slab test and
    every `tw < bt` merge.

    Same walk semantics and returns as _packet_traverse; bit-identical
    output to the monolithic walk (same _leaf_tests math, same strict-<
    merge)."""
    shape = tox.shape
    S, L = shape
    nc = L // 128
    any_pre = jnp.any(active)
    root_e = jnp.int32(root)
    end_e = jnp.int32(end)
    if oct_base is not None:
        root_e = root_e + oct_base
        end_e = end_e + oct_base

    ctox = _lane_chunks(tox, nc)
    ctoy = _lane_chunks(toy, nc)
    ctoz = _lane_chunks(toz, nc)
    ctdx = _lane_chunks(tdx, nc)
    ctdy = _lane_chunks(tdy, nc)
    ctdz = _lane_chunks(tdz, nc)

    def inv_safe(td):
        ok = jnp.abs(td) >= eps
        return jnp.where(ok, 1.0 / jnp.where(ok, td, 1.0), _BIG)

    cinv_dx = [inv_safe(d) for d in ctdx]
    cinv_dy = [inv_safe(d) for d in ctdy]
    cinv_dz = [inv_safe(d) for d in ctdz]

    n_pay = 3 + (0 if uniform_color is not None else 3) \
        + (1 if return_slot else 0)

    def scoped(bt_ref, *pay_refs):
        bt_ref[...] = jnp.where(active, bt0, -_BIG)
        for k, pr in enumerate(pay_refs):
            if return_slot and k == n_pay - 1:
                pr[...] = jnp.full(shape, -1.0, jnp.float32)
            else:
                pr[...] = jnp.zeros(shape, jnp.float32)

        def tcond(idx):
            return idx < end_e

        def tbody(idx):
            node = node_ref[pl.ds(idx, 1), :]
            hitb = []
            anyhit_c = []
            for j in range(nc):
                btj = bt_ref[:, j * 128:(j + 1) * 128]
                ax1 = (node[0, 0] - ctox[j]) * cinv_dx[j]
                ax2 = (node[0, 3] - ctox[j]) * cinv_dx[j]
                ay1 = (node[0, 1] - ctoy[j]) * cinv_dy[j]
                ay2 = (node[0, 4] - ctoy[j]) * cinv_dy[j]
                az1 = (node[0, 2] - ctoz[j]) * cinv_dz[j]
                az2 = (node[0, 5] - ctoz[j]) * cinv_dz[j]
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(ax1, ax2),
                                jnp.minimum(ay1, ay2)),
                    jnp.minimum(az1, az2))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(ax1, ax2),
                                jnp.maximum(ay1, ay2)),
                    jnp.maximum(az1, az2))
                hb = (tmin <= tmax) & (tmax > eps) & (tmin < btj)
                hitb.append(hb)
                anyhit_c.append(jnp.any(hb))
            is_leaf = node[0, 7] > 0.5
            start = node[0, 6].astype(jnp.int32)
            exitn = node[0, 8].astype(jnp.int32)
            r0 = jax.lax.div(start, jnp.int32(_TRI_SLOTS_PER_ROW))

            for j in range(nc):
                @pl.when(anyhit_c[j] & is_leaf)
                def _leaf_chunk(j=j, hb=hitb[j]):
                    res = _leaf_tests(
                        tri_ref, r0, leaf_rows, eps,
                        ctox[j], ctoy[j], ctoz[j],
                        ctdx[j], ctdy[j], ctdz[j], start,
                        uniform_color=uniform_color,
                        return_slot=return_slot)
                    sl = slice(j * 128, (j + 1) * 128)
                    bt = bt_ref[:, sl]
                    tw = res[0]
                    won = hb & (tw < bt) & (tw < t_max)
                    bt_ref[:, sl] = jnp.where(won, tw, bt)
                    for k, pr in enumerate(pay_refs):
                        pr[:, sl] = jnp.where(won, res[1 + k], pr[:, sl])

            anyhit = anyhit_c[0]
            for j in range(1, nc):
                anyhit = anyhit | anyhit_c[j]
            return jnp.where(anyhit, idx + 1, exitn)

        jax.lax.while_loop(tcond, tbody,
                           jnp.where(any_pre, root_e, end_e))
        bt = jnp.where(active, bt_ref[...], bt0)
        return (bt,) + tuple(pr[...] for pr in pay_refs)

    st = pl.run_scoped(
        scoped, *[pltpu.VMEM((S, L), jnp.float32)
                  for _ in range(1 + n_pay)])

    bt = st[0]
    out = (bt, st[1], st[2], st[3])
    if uniform_color is None:
        out = out + (st[4], st[5], st[6])
    else:
        out = out + (jnp.full(shape, uniform_color[0], jnp.float32),
                     jnp.full(shape, uniform_color[1], jnp.float32),
                     jnp.full(shape, uniform_color[2], jnp.float32))
    if return_slot:
        out = out + (st[1 + n_pay - 1],)
    return out


def _packet_traverse_mxu(node_ref, tri_ref, K, n_slots, eps, t_max,
                         root, end, tox, toy, toz, tdx, tdy, tdz,
                         active, bt0, oct_base=None):
    """Packet skip-link BVH walk with the leaf triangle tests on the
    MXU (PT_TRAVERSAL=mxu; table layout build_mxu_tri_table/_mxu_pack).

    The dual-basis hit test is six dot products per (triangle, ray) —
    dense linear algebra. The packed table holds 16 leaves per A
    lane-block and 128//K per payload lane-block (Mosaic pads any VMEM
    minor dim to 128 lanes, so narrower layouts waste 4-16x physical
    VMEM — enough to overflow it on the benchmark meshes). Per leaf
    visit the kernel places the [8, L] ray-coefficient matrix
    q_s = [o,1,d,0] (loop-invariant, built once per walk) at sublane
    offset 8*(b%16) of a zeroed [128, L] scratch and runs ONE
    [6K,128]@[128,L] matmul per live sublane row — the 128-lane
    contraction reads exactly leaf b's lanes against nonzero rows,
    giving all six planes for all K triangles at once. The VPU tail
    runs on full [K,L] slabs (t = num/den, barycentrics, validity), a
    sublane min-reduce finds the closest hit, and payload
    (n1/deltas/color) arrives via a one-hot [16,128]@[128,L] matmul
    with the [K, L] one-hot placed at sublane offset K*(b%PLPB) the
    same way. Exact ties average their payload (the classic unroll
    keeps the first; both are valid smooth-normal choices at a shared
    edge).

    Same walk semantics/returns as _packet_traverse; no sub-packet
    gating (the matmul is monolithic per sublane row)."""
    S, L = tox.shape
    zero_row = jnp.zeros((1, L), jnp.float32)
    one_row = jnp.ones((1, L), jnp.float32)
    any_pre = jnp.any(active)
    root_e = jnp.int32(root)
    end_e = jnp.int32(end)
    if oct_base is not None:
        root_e = root_e + oct_base
        end_e = end_e + oct_base

    # hoisted slab reciprocals (same semantics as _packet_traverse)
    def inv_safe(td):
        ok = jnp.abs(td) >= eps
        return jnp.where(ok, 1.0 / jnp.where(ok, td, 1.0), _BIG)

    inv_dx = inv_safe(tdx)
    inv_dy = inv_safe(tdy)
    inv_dz = inv_safe(tdz)

    # loop-invariant ray-coefficient blocks: qs[s] = [8, L] rows
    # [ox,oy,oz,1,dx,dy,dz,0] for sublane row s
    qs = [
        jnp.concatenate([
            tox[s:s + 1], toy[s:s + 1], toz[s:s + 1], one_row,
            tdx[s:s + 1], tdy[s:s + 1], tdz[s:s + 1], zero_row,
        ], axis=0)
        for s in range(S)
    ]
    ALPB, PLPB = _mxu_leaves_per_block(K)
    pay_base = _mxu_pay_base(n_slots, K)
    dn = (((1,), (0,)), ((), ()))

    zeros = jnp.zeros((S, L), jnp.float32)
    init = (jnp.where(any_pre, root_e, end_e), bt0,
            zeros, zeros, zeros, zeros, zeros, zeros)

    def tcond(st):
        return st[0] < end_e

    def scoped(q_scr, oh_scr):
        q_scr[...] = jnp.zeros((128, L), jnp.float32)
        oh_scr[...] = jnp.zeros((128, L), jnp.float32)

        def tbody(st):
            idx, bt, gnx, gny, gnz, gcr, gcg, gcb = st
            node = node_ref[pl.ds(idx, 1), :]
            ax1 = (node[0, 0] - tox) * inv_dx
            ax2 = (node[0, 3] - tox) * inv_dx
            ay1 = (node[0, 1] - toy) * inv_dy
            ay2 = (node[0, 4] - toy) * inv_dy
            az1 = (node[0, 2] - toz) * inv_dz
            az2 = (node[0, 5] - toz) * inv_dz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(ax1, ax2), jnp.minimum(ay1, ay2)),
                jnp.minimum(az1, az2))
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(ax1, ax2), jnp.maximum(ay1, ay2)),
                jnp.maximum(az1, az2))
            hitb = active & (tmin <= tmax) & (tmax > eps) & (tmin < bt)
            anyhit = jnp.any(hitb)
            is_leaf = node[0, 7] > 0.5
            start = node[0, 6].astype(jnp.int32)
            exitn = node[0, 8].astype(jnp.int32)

            def leaf_fn(carry):
                bt, gnx, gny, gnz, gcr, gcg, gcb = carry
                b = jax.lax.div(start, jnp.int32(K))
                ja = jax.lax.rem(b, jnp.int32(ALPB))
                jp = jax.lax.rem(b, jnp.int32(PLPB))
                arow = 6 * K * jax.lax.div(b, jnp.int32(ALPB))
                prow_b = pay_base + 16 * jax.lax.div(b, jnp.int32(PLPB))
                A = tri_ref[pl.ds(arow, 6 * K), :]             # [6K,128]
                P = tri_ref[pl.ds(prow_b, 16), :]              # [16,128]
                rows = [[] for _ in range(7)]  # bt,nx,ny,nz,cr,cg,cb

                def live_fn(s):
                    # per-sublane gating: under block tiling a sublane
                    # row is a compact 64x8 pixel strip, so rows whose
                    # rays all miss this leaf skip their matmul + tail
                    q_scr[pl.ds(8 * ja, 8), :] = qs[s]
                    # HIGHEST: TPU DEFAULT matmul precision is bf16;
                    # den/num/t decide hit-vs-miss, so operand rounding
                    # visibly changes the image (measured: gopher mean
                    # 0.266 vs classic 0.289 before this)
                    out = jax.lax.dot_general(
                        A, q_scr[...], dn,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    den = out[0 * K:1 * K]
                    num_t = out[1 * K:2 * K]
                    ou = out[2 * K:3 * K]
                    du = out[3 * K:4 * K]
                    ov = out[4 * K:5 * K]
                    dv = out[5 * K:6 * K]
                    den_ok = jnp.abs(den) >= eps
                    f = 1.0 / jnp.where(den_ok, den, 1.0)
                    t = num_t * f
                    u = ou + t * du
                    v = ov + t * dv
                    hb_s = hitb[s:s + 1]
                    bt_s = bt[s:s + 1]
                    # upper t bound folds t_max and the running best-t
                    # into one [K,L] compare
                    t_hi = jnp.minimum(bt_s, t_max)
                    good = (hb_s & den_ok & (u >= 0.0) & (v >= 0.0)
                            & (u + v <= 1.0) & (t > eps) & (t < t_hi))
                    tt = jnp.where(good, t, _BIG)
                    tmin_s = jnp.min(tt, axis=0, keepdims=True)  # [1,L]
                    hit_s = tmin_s < bt_s

                    def upd_fn(_):
                        # payload resolve only when some ray improved
                        # its best-t: with front-to-back octant order
                        # most later leaf visits lose to best-t and
                        # skip the one-hot + payload matmul entirely
                        oh = jnp.where(tt == tmin_s, 1.0, 0.0) \
                            * good.astype(jnp.float32)           # [K,L]

                        # sublane sums via a [1,K]@[K,L] matmul: the
                        # Mosaic backend rejects float ADD
                        # multi_reductions whose input layout carries a
                        # sublane offset (inherited here from the
                        # [s:s+1] row slices); matmul operands get
                        # relaid out automatically
                        ones_k = jnp.ones((1, K), jnp.float32)

                        def sum0(x):
                            return jax.lax.dot_general(
                                ones_k, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

                        cnt = sum0(oh)
                        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
                        oh_scr[pl.ds(K * jp, K), :] = oh
                        pay = jax.lax.dot_general(
                            P, oh_scr[...], dn,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        ub = sum0(oh * u) * inv_cnt
                        vb = sum0(oh * v) * inv_cnt

                        def prow(j):
                            return pay[j:j + 1] * inv_cnt

                        nx_s = prow(0) + ub * prow(3) + vb * prow(6)
                        ny_s = prow(1) + ub * prow(4) + vb * prow(7)
                        nz_s = prow(2) + ub * prow(5) + vb * prow(8)
                        return (jnp.where(hit_s, tmin_s, bt_s),
                                jnp.where(hit_s, nx_s, gnx[s:s + 1]),
                                jnp.where(hit_s, ny_s, gny[s:s + 1]),
                                jnp.where(hit_s, nz_s, gnz[s:s + 1]),
                                jnp.where(hit_s, prow(9), gcr[s:s + 1]),
                                jnp.where(hit_s, prow(10),
                                          gcg[s:s + 1]),
                                jnp.where(hit_s, prow(11),
                                          gcb[s:s + 1]))

                    return jax.lax.cond(
                        jnp.any(hit_s), upd_fn,
                        lambda _: (bt_s, gnx[s:s + 1], gny[s:s + 1],
                                   gnz[s:s + 1], gcr[s:s + 1],
                                   gcg[s:s + 1], gcb[s:s + 1]),
                        0)

                for s in range(S):
                    vals = jax.lax.cond(
                        jnp.any(hitb[s]),
                        lambda _, s=s: live_fn(s),
                        lambda _, s=s: (bt[s:s + 1], gnx[s:s + 1],
                                        gny[s:s + 1], gnz[s:s + 1],
                                        gcr[s:s + 1], gcg[s:s + 1],
                                        gcb[s:s + 1]),
                        0)
                    for w, val in zip(rows, vals):
                        w.append(val)
                # restore the zeroed scratches for the next leaf (whose
                # lane-block offsets ja/jp will differ)
                q_scr[pl.ds(8 * ja, 8), :] = jnp.zeros((8, L),
                                                       jnp.float32)
                oh_scr[pl.ds(K * jp, K), :] = jnp.zeros((K, L),
                                                        jnp.float32)
                return tuple(jnp.concatenate(w, axis=0) for w in rows)

            carry = jax.lax.cond(
                anyhit & is_leaf, leaf_fn, lambda cr: cr,
                (bt, gnx, gny, gnz, gcr, gcg, gcb))
            nidx = jnp.where(anyhit, idx + 1, exitn)
            return (nidx,) + carry

        return jax.lax.while_loop(tcond, tbody, init)

    st = pl.run_scoped(scoped,
                       pltpu.VMEM((128, L), jnp.float32),
                       pltpu.VMEM((128, L), jnp.float32))
    return st[1], st[2], st[3], st[4], st[5], st[6], st[7]


def _make_kernel(meta: SceneMeta, cfg: RenderConfig, spp: int,
                 total_samples: int, tile: Tuple[int, int],
                 spp_pack: int = 1, pack_axis: str = "row"):
    """Build the tile kernel body closed over static scene structure.

    spp_pack > 1 = sample-in-rows packing: the caller's pixel layout
    (tile_pixel_layout(spp_pack=s)) repeats one compact block of
    S*L/s pixels across s sublane-row groups, so each wave of the
    sample loop traces s samples of a block s-fold smaller. Packet
    traversal pays the UNION of the tile's ray visits, and the union
    of a 32x16-pixel block's rays is ~half that of a 64x64 block's
    (tools/spp_pack_sim.py: 0.50x leaf visits for teapot at s=8) —
    same total rays, same estimator, the per-ray PRNG streams already
    differ per element. Only the sunflower DoF index must become
    per-row: global sample = wave * s + replica + sample_base.

    pack_axis="chunk": replicas along 128-lane chunk groups instead
    (default_pack_axis) — the replica index and the coherent-sampling
    unit both become lane-chunk-based so the scratch-gated walk's
    chunks line up with the coherent pencils."""
    obj_types = meta.obj_types
    group_bvh = {g: (r, e) for g, r, e in meta.group_bvh}
    leaf_rows = meta.leaf_size // _TRI_SLOTS_PER_ROW
    eps = cfg.epsilon
    t_max = cfg.t_max
    max_b = cfg.max_bounces
    max_eff = cfg.max_effective_bounces
    golden2 = ((math.sqrt(5.0) + 1.0) / 2.0) ** 2
    sun_n = float(total_samples)
    sun_b = round(2.0 * math.sqrt(sun_n))  # sunflower boundary count
    # static texture programs: one masked in-kernel evaluation per
    # distinct (program, scale, type) per bounce (see _sample_proc;
    # untextured scenes compile none of this)
    tex_groups = _tex_groups(meta.obj_tex, obj_types) \
        if meta.textured_types else []
    nm_groups = _tex_groups(meta.obj_tex_nm, obj_types) \
        if meta.has_normal_maps else []
    track_obj = bool(tex_groups or nm_groups)

    staged = staged_lanes(meta) > 0

    def kernel(seed_ref, cam_ref, obj_ref, node_ref, tri_ref, *rest):
        # scenes with VMEM-staged file textures carry one extra input
        # (the [128, Ltot] atlas) between the scene tables and the
        # pixel tiles; see trace_tiles' in_specs
        if staged:
            tex_ref, px_ref, py_ref, out_r, out_g, out_b = rest
        else:
            tex_ref = None
            px_ref, py_ref, out_r, out_g, out_b = rest
        _prng_seed(seed_ref[0], pl.program_id(0))
        # global sample base for segmented/sharded launches: the sunflower
        # DoF index must be n + base, not n, or every segment re-samples
        # lens points 0..spp-1 (wrong bokeh; the wavefront path threads s0
        # through rays_for_pixels for the same reason)
        sample_base = seed_ref[1]

        fx = px_ref[...].astype(jnp.float32)
        fy = py_ref[...].astype(jnp.float32)
        shape = fx.shape

        cam = [cam_ref[k] for k in range(12)]
        pixel_size = cam_ref[12]
        half_w = cam_ref[13]
        half_h = cam_ref[14]
        aperture = cam_ref[15]
        focal = cam_ref[16]
        has_dof = aperture != 0.0

        acc_r = jnp.zeros(shape, jnp.float32)
        acc_g = jnp.zeros(shape, jnp.float32)
        acc_b = jnp.zeros(shape, jnp.float32)

        # camera origin = inverse(0,0,0) = the translation column:
        # loop-invariant across samples, hoisted out of sample_body
        oxw = jnp.full(shape, cam[3], jnp.float32)
        oyw = jnp.full(shape, cam[7], jnp.float32)
        ozw = jnp.full(shape, cam[11], jnp.float32)

        def traverse_packet(root, end, tox, toy, toz, tdx, tdy, tdz,
                            active, bt0):
            # PT_SUBPACKET=3: fully INDEPENDENT per-chunk walks — each
            # 128-lane chunk runs its own while_loop with its own
            # majority-octant DFS copy and its own best-t pruning, so a
            # chunk pays neither slab tests nor leaf bodies for nodes
            # only other chunks need, and (with chunk-coherent packing)
            # each walk is one pencil in ITS front-to-back order. Costs
            # nc sequential scalar node streams; pays off only when the
            # chunk unions are mostly disjoint (chunk packing).
            if (os.environ.get("PT_SUBPACKET", "") == "3"
                    and traversal_mode(meta) != "mxu"
                    and tox.shape[-1] > 128 and tox.shape[-1] % 128 == 0):
                outs = []
                for j in range(tox.shape[-1] // 128):
                    sl = slice(j * 128, (j + 1) * 128)
                    cargs = [a[:, sl] for a in (tox, toy, toz,
                                                tdx, tdy, tdz, active, bt0)]
                    ob = _group_octant_base(meta, cargs[6], cargs[3],
                                            cargs[4], cargs[5])
                    outs.append(_packet_traverse(
                        node_ref, tri_ref, leaf_rows, eps, t_max,
                        root, end, *cargs, oct_base=ob,
                        uniform_color=meta.tri_uniform_color))
                return tuple(
                    jnp.concatenate([o[k] for o in outs], axis=1)
                    for k in range(len(outs[0])))
            oct_base = _group_octant_base(meta, active, tdx, tdy, tdz)
            if traversal_mode(meta) == "mxu":
                return _packet_traverse_mxu(
                    node_ref, tri_ref, meta.leaf_size, meta.n_tri_slots,
                    eps, t_max, root, end, tox, toy, toz,
                    tdx, tdy, tdz, active, bt0, oct_base=oct_base)
            return _packet_traverse(node_ref, tri_ref, leaf_rows, eps,
                                    t_max, root, end, tox, toy, toz,
                                    tdx, tdy, tdz, active, bt0,
                                    oct_base=oct_base,
                                    uniform_color=meta.tri_uniform_color)

        def sample_body(n, acc):
            acc_r, acc_g, acc_b = acc
            # --- rayForPixel (tracer.cl:745-779) -----------------------
            jx = _uniform(shape, 0, n)
            jy = _uniform(shape, 1, n)
            x_off = pixel_size * (fx + jx)
            y_off = pixel_size * (fy + jy)
            vx = half_w - x_off
            vy = half_h - y_off
            vz = jnp.full(shape, -1.0, jnp.float32)
            pxw, pyw, pzw = _mat12_point(cam, vx, vy, vz)
            dx, dy, dz = _normalize(pxw - oxw, pyw - oyw, pzw - ozw)

            # DoF via sunflower(totalSamples, alpha=2, n) (tracer.cl:762-776)
            if spp_pack > 1:
                # replica = sublane-row group (row axis) or lane-chunk
                # group (chunk axis): global sample index n*s + rep
                # (+ base) per replica, so packed DoF still covers the
                # whole sunflower spiral
                if pack_axis == "chunk":
                    rep = (jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                           // (tile[1] // spp_pack))
                else:
                    rep = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                           // (tile[0] // spp_pack))
                nf = (n * spp_pack + rep + sample_base).astype(jnp.float32)
            else:
                nf = (n + sample_base).astype(jnp.float32)
            r_sun = jnp.where(
                nf <= (sun_n - sun_b),
                jnp.sqrt(jnp.maximum(nf - 0.5, 0.0))
                / math.sqrt(max(sun_n - (sun_b + 1.0) / 2.0, 1e-9)),
                1.0,
            )
            theta = 2.0 * math.pi * nf / golden2
            sun_x = r_sun * jnp.cos(theta)
            sun_y = r_sun * jnp.sin(theta)
            fpx = oxw + dx * focal
            fpy = oyw + dy * focal
            fpz = ozw + dz * focal
            dox = oxw + sun_y * aperture   # reference swaps x/y
            doy = oyw + sun_x * aperture
            ox = jnp.where(has_dof, dox, oxw)
            oy = jnp.where(has_dof, doy, oyw)
            oz = ozw
            dx = jnp.where(has_dof, fpx - dox, dx)
            dy = jnp.where(has_dof, fpy - doy, dy)
            dz = jnp.where(has_dof, fpz - oz, dz)

            mask_r = jnp.ones(shape, jnp.float32)
            mask_g = jnp.ones(shape, jnp.float32)
            mask_b = jnp.ones(shape, jnp.float32)
            srr = jnp.zeros(shape, jnp.float32)
            srg = jnp.zeros(shape, jnp.float32)
            srb = jnp.zeros(shape, jnp.float32)
            # alive/inside carried as i32: Mosaic cannot lower selects
            # between 1-bit (bool) vectors ("Unsupported target bitwidth
            # for truncation")
            alive_i = jnp.ones(shape, jnp.int32)
            inside_i = jnp.zeros(shape, jnp.int32)
            n_hits = jnp.zeros(shape, jnp.int32)
            eff = jnp.zeros(shape, jnp.int32)

            def bounce_cond(st):
                b = st[0]
                alive_i = st[7]
                return (b < max_b) & (jnp.max(alive_i) > 0)

            def bounce_body(st):
                (b, ox, oy, oz, dx, dy, dz, alive_i, inside_i, n_hits, eff,
                 mask_r, mask_g, mask_b, srr, srg, srb) = st
                alive = alive_i > 0
                inside = inside_i > 0

                # ---- intersect: static unroll over objects ------------
                best_t = jnp.full(shape, _BIG, jnp.float32)
                l_ox = ox; l_oy = oy; l_oz = oz
                l_dx = dx; l_dy = dy; l_dz = dz
                col_r = jnp.zeros(shape, jnp.float32)
                col_g = jnp.zeros(shape, jnp.float32)
                col_b = jnp.zeros(shape, jnp.float32)
                emi_r = jnp.zeros(shape, jnp.float32)
                refl = jnp.zeros(shape, jnp.float32)
                refr = jnp.ones(shape, jnp.float32)
                invt = [jnp.zeros(shape, jnp.float32)] * 12
                w_type = jnp.full(shape, -1, jnp.int32)
                w_obj = jnp.full(shape, -1, jnp.int32) if track_obj else None
                w_min_y = jnp.zeros(shape, jnp.float32)
                w_max_y = jnp.zeros(shape, jnp.float32)
                emi_g = jnp.zeros(shape, jnp.float32)
                emi_b = jnp.zeros(shape, jnp.float32)
                is_tri_f = jnp.zeros(shape, jnp.float32)
                tnx = jnp.zeros(shape, jnp.float32)
                tny = jnp.zeros(shape, jnp.float32)
                tnz = jnp.zeros(shape, jnp.float32)

                for j, code in enumerate(obj_types):
                    m = [obj_ref[j, k] for k in range(12)]
                    tox, toy, toz = _mat12_point(m, ox, oy, oz)
                    tdx, tdy, tdz = _mat12_vec(m, dx, dy, dz)
                    g_tri = None
                    if code == PLANE:
                        t_j = _plane_t(toy, tdy, eps)
                    elif code == SPHERE:
                        t_j = _sphere_t(tox, toy, toz, tdx, tdy, tdz, eps)
                    elif code == CYLINDER:
                        t_j = _cylinder_t(tox, toy, toz, tdx, tdy, tdz,
                                          obj_ref[j, 32], obj_ref[j, 33],
                                          eps)
                    elif code == BOX:
                        t_j = _box_t(tox, toy, toz, tdx, tdy, tdz, eps)
                    else:  # GROUP: pretest group bbox, then packet walk
                        x1, x2 = _axis_slab(tox, tdx, obj_ref[j, 34],
                                            obj_ref[j, 37], eps)
                        y1, y2 = _axis_slab(toy, tdy, obj_ref[j, 35],
                                            obj_ref[j, 38], eps)
                        z1, z2 = _axis_slab(toz, tdz, obj_ref[j, 36],
                                            obj_ref[j, 39], eps)
                        gtmin = jnp.maximum(jnp.maximum(x1, y1), z1)
                        gtmax = jnp.minimum(jnp.minimum(x2, y2), z2)
                        pre = ((alive_i > 0) & (gtmin <= gtmax)
                               & (gtmax > eps) & (gtmin < best_t))
                        root, end = group_bvh[j]
                        t_j, g_nx, g_ny, g_nz, g_cr, g_cg, g_cb = \
                            traverse_packet(root, end, tox, toy, toz,
                                            tdx, tdy, tdz, pre, best_t)
                        g_tri = (g_nx, g_ny, g_nz, g_cr, g_cg, g_cb)

                    closer = t_j < best_t
                    best_t = jnp.where(closer, t_j, best_t)
                    l_ox = jnp.where(closer, tox, l_ox)
                    l_oy = jnp.where(closer, toy, l_oy)
                    l_oz = jnp.where(closer, toz, l_oz)
                    l_dx = jnp.where(closer, tdx, l_dx)
                    l_dy = jnp.where(closer, tdy, l_dy)
                    l_dz = jnp.where(closer, tdz, l_dz)
                    if g_tri is None:
                        col_r = jnp.where(closer, obj_ref[j, 24], col_r)
                        col_g = jnp.where(closer, obj_ref[j, 25], col_g)
                        col_b = jnp.where(closer, obj_ref[j, 26], col_b)
                        emi_r = jnp.where(closer, obj_ref[j, 27], emi_r)
                        emi_g = jnp.where(closer, obj_ref[j, 28], emi_g)
                        emi_b = jnp.where(closer, obj_ref[j, 29], emi_b)
                        is_tri_f = jnp.where(closer, 0.0, is_tri_f)
                    else:
                        # per-triangle color; emission forced to 0 for
                        # mesh hits (tracer.cl:672-673, 1071-1073)
                        g_nx, g_ny, g_nz, g_cr, g_cg, g_cb = g_tri
                        col_r = jnp.where(closer, g_cr, col_r)
                        col_g = jnp.where(closer, g_cg, col_g)
                        col_b = jnp.where(closer, g_cb, col_b)
                        emi_r = jnp.where(closer, 0.0, emi_r)
                        emi_g = jnp.where(closer, 0.0, emi_g)
                        emi_b = jnp.where(closer, 0.0, emi_b)
                        is_tri_f = jnp.where(closer, 1.0, is_tri_f)
                        tnx = jnp.where(closer, g_nx, tnx)
                        tny = jnp.where(closer, g_ny, tny)
                        tnz = jnp.where(closer, g_nz, tnz)
                    refr = jnp.where(closer, obj_ref[j, 30], refr)
                    refl = jnp.where(closer, obj_ref[j, 31], refl)
                    w_min_y = jnp.where(closer, obj_ref[j, 32], w_min_y)
                    w_max_y = jnp.where(closer, obj_ref[j, 33], w_max_y)
                    invt = [jnp.where(closer, obj_ref[j, 12 + k], invt[k])
                            for k in range(12)]
                    w_type = jnp.where(closer, code, w_type)
                    if track_obj:
                        w_obj = jnp.where(closer, j, w_obj)

                hit_ok = best_t < t_max
                t = jnp.minimum(best_t, t_max)

                # ---- surface normal by type (tracer.cl:903-950) -------
                lx = l_ox + l_dx * t
                ly = l_oy + l_dy * t
                lz = l_oz + l_dz * t
                one = jnp.ones(shape, jnp.float32)
                zero = jnp.zeros(shape, jnp.float32)
                # cylinder incl. caps
                dist = lx * lx + lz * lz
                top = (dist < 1.0) & (ly >= w_max_y - eps)
                bot = (dist < 1.0) & (ly <= w_min_y + eps)
                cyl_nx = jnp.where(top | bot, zero, lx)
                cyl_ny = jnp.where(top, one, jnp.where(bot, -one, zero))
                cyl_nz = jnp.where(top | bot, zero, lz)
                # box: dominant axis
                ax = jnp.abs(lx); ay = jnp.abs(ly); az = jnp.abs(lz)
                maxc = jnp.maximum(jnp.maximum(ax, ay), az)
                sel_x = maxc == ax
                sel_y = (~sel_x) & (maxc == ay)
                box_nx = jnp.where(sel_x, lx, zero)
                box_ny = jnp.where(sel_y, ly, zero)
                box_nz = jnp.where(sel_x | sel_y, zero, lz)

                is_plane = w_type == PLANE
                is_cyl = w_type == CYLINDER
                is_box = w_type == BOX
                use_tri = is_tri_f > 0.5
                nlx = jnp.where(use_tri, tnx,
                      jnp.where(is_plane, zero,
                      jnp.where(is_cyl, cyl_nx,
                      jnp.where(is_box, box_nx, lx))))
                nly = jnp.where(use_tri, tny,
                      jnp.where(is_plane, one,
                      jnp.where(is_cyl, cyl_ny,
                      jnp.where(is_box, box_ny, ly))))
                nlz = jnp.where(use_tri, tnz,
                      jnp.where(is_plane, zero,
                      jnp.where(is_cyl, cyl_nz,
                      jnp.where(is_box, box_nz, lz))))
                # plane normal maps: the COMPUTED texel is the
                # object-space normal (tracer.cl:907-911; the wavefront's
                # pre-normalize is redundant here — the cascade output is
                # normalized after the invt transform below)
                for (slots, desc, twn, thn, sxn, syn, _t) in nm_groups:
                    msk = functools.reduce(
                        jnp.logical_or, [w_obj == s for s in slots])
                    nm_u = jnp.abs(lx) * sxn
                    nm_v = jnp.abs(lz) * syn
                    nmx, nmy, nmz = _sample_tex(tex_ref, desc, twn, thn,
                                                nm_u, nm_v)
                    nlx = jnp.where(msk, nmx, nlx)
                    nly = jnp.where(msk, nmy, nly)
                    nlz = jnp.where(msk, nmz, nlz)
                nx, ny, nz = _mat12_vec(invt, nlx, nly, nlz)
                nx, ny, nz = _normalize(nx, ny, nz)
                # face-forward
                ex, ey, ez = -dx, -dy, -dz
                flip = _dot(ex, ey, ez, nx, ny, nz) < 0.0
                nx = jnp.where(flip, -nx, nx)
                ny = jnp.where(flip, -ny, ny)
                nz = jnp.where(flip, -nz, nz)

                # ---- texture color (tracer.cl:1075-1093): computed, not
                # gathered — one masked program eval per distinct texture
                staged_grps = [g for g in tex_groups
                               if isinstance(g[1], tuple) and g[1]
                               and g[1][0] == "__staged__"]
                unify = _unified_staged() and len(staged_grps) >= 2
                if unify:
                    # round 5: merge every staged group's fetch into ONE
                    # unified per-lane-descriptor sample (the staged
                    # path is dispatch-bound; docs/PERFORMANCE.md) —
                    # UV + the winning texture's geometry are
                    # where()-merged per group, then one fetch serves
                    # them all
                    su = jnp.zeros(shape, jnp.float32)
                    sv = jnp.zeros(shape, jnp.float32)
                    sb = jnp.zeros(shape, jnp.float32)
                    sw = jnp.ones(shape, jnp.float32)
                    sh = jnp.ones(shape, jnp.float32)
                    s_act = jnp.zeros(shape, jnp.bool_)
                for (slots, desc, tw, th, sx, sy, tcode) in tex_groups:
                    msk = functools.reduce(
                        jnp.logical_or, [w_obj == s for s in slots])
                    if tcode == PLANE:
                        tu = lx * sx
                        tv = lz * sy
                    elif tcode == SPHERE:
                        tu, tv = _spherical_uv(lx, ly, lz)
                    else:  # BOX (cube-cross)
                        tu, tv = _cube_uv(lx, ly, lz)
                    if unify and (slots, desc, tw, th, sx, sy, tcode) \
                            in staged_grps:
                        _, d_base, d_w, d_h = desc
                        su = jnp.where(msk, tu, su)
                        sv = jnp.where(msk, tv, sv)
                        sb = jnp.where(msk, float(d_base), sb)
                        sw = jnp.where(msk, float(d_w), sw)
                        sh = jnp.where(msk, float(d_h), sh)
                        s_act = s_act | msk
                        continue
                    tcr, tcg, tcb = _sample_tex(tex_ref, desc, tw, th,
                                                tu, tv)
                    col_r = jnp.where(msk, tcr, col_r)
                    col_g = jnp.where(msk, tcg, col_g)
                    col_b = jnp.where(msk, tcb, col_b)
                if unify:
                    tcr, tcg, tcb = _sample_staged_unified(
                        tex_ref, sb, sw, sh, su, sv, s_act)
                    col_r = jnp.where(s_act, tcr, col_r)
                    col_g = jnp.where(s_act, tcg, col_g)
                    col_b = jnp.where(s_act, tcb, col_b)

                # ---- material roulette (tracer.cl:982-1061) -----------
                # coherent mode: replica-shared roulette + hemisphere
                # draws — per sublane row (row packing) or per lane
                # chunk (chunk packing); see _coherent_sampling /
                # _uniform_chunk for why the unit must follow the axis
                if not _coherent_sampling():
                    _udraw = _uniform
                elif pack_axis == "chunk" and tile[1] >= 128:
                    # fixed 128-lane granule: always vreg/gating-chunk
                    # aligned; never correlates two samples of a pixel
                    # (replica groups are whole multiples of 128 lanes,
                    # so one chunk never spans two replicas). With
                    # spp_pack=1 this pairs with the `subblock` order:
                    # every chunk is then a DIFFERENT compact pixel
                    # block with its own pencil — disjoint by origin
                    # and direction.
                    _udraw = (lambda shape, did=0, n=None, b=None:
                              _uniform_chunk(shape, 128, did, n, b))
                else:
                    _udraw = _uniform_row
                u_refl = _udraw(shape, 2, n, b)
                u_schl = _udraw(shape, 3, n, b)
                u1 = _udraw(shape, 4, n, b)
                u2 = _udraw(shape, 5, n, b)

                wx = ox + dx * t
                wy = oy + dy * t
                wz = oz + dz * t
                over_x = wx + nx * eps
                over_y = wy + ny * eps
                over_z = wz + nz * eps
                under_x = wx - nx * eps
                under_y = wy - ny * eps
                under_z = wz - nz * eps

                do_reflect = (refl != 0.0) & (u_refl < refl)
                thin = (~do_reflect) & (refr == -1.0)
                sch_thin = _schlick(ex, ey, ez, nx, ny, nz,
                                    jnp.float32(1.0), jnp.float32(1.5))
                thin_pass = thin & (sch_thin < u_schl)
                thin_reflect = thin & ~(sch_thin < u_schl)

                solid = (~do_reflect) & (~thin) & (refr != 1.0)
                outside = ~inside
                sch = jnp.where(
                    outside,
                    _schlick(ex, ey, ez, nx, ny, nz, jnp.float32(1.0), refr),
                    _schlick(ex, ey, ez, nx, ny, nz, refr, jnp.float32(1.0)),
                )
                do_refract = solid & (sch < u_schl)
                rf_o = _refract(ex, ey, ez, nx, ny, nz, jnp.float32(1.0), refr)
                rf_i = _refract(ex, ey, ez, nx, ny, nz, refr, jnp.float32(1.0))
                rfx = jnp.where(outside, rf_o[0], rf_i[0])
                rfy = jnp.where(outside, rf_o[1], rf_i[1])
                rfz = jnp.where(outside, rf_o[2], rf_i[2])
                solid_reflect = solid & ~do_refract
                diffuse = (~do_reflect) & (~thin) & (~solid)

                # cosine-weighted hemisphere (tracer.cl:348-366)
                rand1 = 2.0 * math.pi * u1
                rand2s = jnp.sqrt(u2)
                pick = jnp.abs(nx) > 0.1
                axx = jnp.where(pick, zero, one)
                axy = jnp.where(pick, one, zero)
                # u = axis x n, normalized
                ux = axy * nz
                uy = -(axx * nz)
                uz = axx * ny - axy * nx
                ux, uy, uz = _normalize(ux, uy, uz)
                # v = n x u
                vx2 = ny * uz - nz * uy
                vy2 = nz * ux - nx * uz
                vz2 = nx * uy - ny * ux
                cu = jnp.cos(rand1) * rand2s
                cv = jnp.sin(rand1) * rand2s
                cn = jnp.sqrt(1.0 - u2)
                hx = ux * cu + vx2 * cv + nx * cn
                hy = uy * cu + vy2 * cv + ny * cn
                hz = uz * cu + vz2 * cv + nz * cn

                ddn = 2.0 * _dot(dx, dy, dz, nx, ny, nz)
                rx = dx - nx * ddn
                ry = dy - ny * ddn
                rz = dz - nz * ddn

                any_reflect = do_reflect | thin_reflect | solid_reflect
                ndx = jnp.where(any_reflect, rx,
                      jnp.where(thin_pass, dx,
                      jnp.where(do_refract, rfx, hx)))
                ndy = jnp.where(any_reflect, ry,
                      jnp.where(thin_pass, dy,
                      jnp.where(do_refract, rfy, hy)))
                ndz = jnp.where(any_reflect, rz,
                      jnp.where(thin_pass, dz,
                      jnp.where(do_refract, rfz, hz)))
                cos = jnp.where(diffuse,
                                _dot(hx, hy, hz, nx, ny, nz), 1.0)
                go_under = thin_pass | do_refract
                nox = jnp.where(go_under, under_x, over_x)
                noy = jnp.where(go_under, under_y, over_y)
                noz = jnp.where(go_under, under_z, over_z)

                entering = do_refract & outside
                exiting = do_refract & inside
                new_inside_i = jnp.where(
                    do_refract, outside.astype(jnp.int32), inside_i)
                is_refraction = entering | exiting

                # ---- fold resolve forward (tracer.cl:1116-1176) -------
                rec = alive & hit_ok
                no_refr = rec & ~is_refraction
                is_light = emi_r > 0.0

                srr = srr + jnp.where(no_refr, mask_r * emi_r, 0.0)
                srg = srg + jnp.where(no_refr, mask_g * emi_g, 0.0)
                srb = srb + jnp.where(no_refr, mask_b * emi_b, 0.0)

                # ---- optional next-event estimation (tracer.cl:786-829;
                # the reference ships with the call disabled,
                # tracer.cl:1168) — statically elided unless cfg.nee.
                # One full shadow traversal per light per bounce:
                # capability parity with the reference's experimental
                # estimator, exactly as biased (the BSDF light hit is
                # NOT shadow-discounted), using the PRE-update mask and
                # the post-texture surface color like the wavefront
                # path (integrator._next_event_estimation).
                if cfg.nee and meta.light_indices:
                    nee_cond = no_refr & ~is_light
                    for li, l in enumerate(meta.light_indices):
                        nu1 = _udraw(shape, 6 + 2 * li, n, b)
                        nu2 = _udraw(shape, 7 + 2 * li, n, b)
                        # randomPointOnSphere (tracer.cl:321-336) kept
                        # verbatim incl. its latitude offset; acos via
                        # the kernel polynomial (_acos)
                        lat = _acos(2.0 * nu1 - 1.0) - 2.0 * math.pi
                        lon = 2.0 * math.pi * nu2
                        cl = jnp.cos(lat)
                        scale_by = obj_ref[l, 43]
                        lpx = obj_ref[l, 40] + cl * jnp.cos(lon) * scale_by
                        lpy = obj_ref[l, 41] \
                            + (jnp.sin(lat) - math.pi * 0.25) * scale_by
                        lpz = obj_ref[l, 42] + cl * jnp.sin(lon) * scale_by
                        sdx, sdy, sdz = _normalize(lpx - wx, lpy - wy,
                                                   lpz - wz)
                        sox = wx + sdx * eps
                        soy = wy + sdy * eps
                        soz = wz + sdz * eps
                        ldn = _dot(sdx, sdy, sdz, nx, ny, nz)
                        # nearest shadow hit over the whole scene: the
                        # same static unroll as the main intersect, t
                        # and winning index only
                        s_best = jnp.full(shape, _BIG, jnp.float32)
                        s_idx = jnp.full(shape, -1, jnp.int32)
                        for j, code in enumerate(obj_types):
                            m = [obj_ref[j, k] for k in range(12)]
                            stox, stoy, stoz = _mat12_point(
                                m, sox, soy, soz)
                            stdx, stdy, stdz = _mat12_vec(
                                m, sdx, sdy, sdz)
                            if code == PLANE:
                                t_s = _plane_t(stoy, stdy, eps)
                            elif code == SPHERE:
                                t_s = _sphere_t(stox, stoy, stoz,
                                                stdx, stdy, stdz, eps)
                            elif code == CYLINDER:
                                t_s = _cylinder_t(
                                    stox, stoy, stoz, stdx, stdy, stdz,
                                    obj_ref[j, 32], obj_ref[j, 33], eps)
                            elif code == BOX:
                                t_s = _box_t(stox, stoy, stoz,
                                             stdx, stdy, stdz, eps)
                            else:  # GROUP: bbox pretest + packet walk
                                x1, x2 = _axis_slab(
                                    stox, stdx, obj_ref[j, 34],
                                    obj_ref[j, 37], eps)
                                y1, y2 = _axis_slab(
                                    stoy, stdy, obj_ref[j, 35],
                                    obj_ref[j, 38], eps)
                                z1, z2 = _axis_slab(
                                    stoz, stdz, obj_ref[j, 36],
                                    obj_ref[j, 39], eps)
                                gtmin = jnp.maximum(
                                    jnp.maximum(x1, y1), z1)
                                gtmax = jnp.minimum(
                                    jnp.minimum(x2, y2), z2)
                                pre = (nee_cond & (gtmin <= gtmax)
                                       & (gtmax > eps)
                                       & (gtmin < s_best))
                                root, end = group_bvh[j]
                                t_s = traverse_packet(
                                    root, end, stox, stoy, stoz,
                                    stdx, stdy, stdz, pre, s_best)[0]
                            s_closer = t_s < s_best
                            s_best = jnp.where(s_closer, t_s, s_best)
                            s_idx = jnp.where(s_closer, j, s_idx)
                        visible = (nee_cond & (ldn > 0.0) & (s_idx == l)
                                   & (s_best > eps) & (s_best < t_max))
                        sxl = obj_ref[l, 44]
                        atten = 1.0 - s_best / jnp.sqrt(
                            s_best * s_best + sxl * sxl)
                        w_nee = ldn * atten
                        srr = srr + jnp.where(
                            visible,
                            mask_r * col_r * obj_ref[l, 27] * w_nee, 0.0)
                        srg = srg + jnp.where(
                            visible,
                            mask_g * col_g * obj_ref[l, 28] * w_nee, 0.0)
                        srb = srb + jnp.where(
                            visible,
                            mask_b * col_b * obj_ref[l, 29] * w_nee, 0.0)

                direct = no_refr & is_light & (n_hits == 0)
                srr = jnp.where(direct, col_r, srr)
                srg = jnp.where(direct, col_g, srg)
                srb = jnp.where(direct, col_b, srb)
                upd = no_refr & ~is_light
                mask_r = jnp.where(upd, mask_r * col_r * cos, mask_r)
                mask_g = jnp.where(upd, mask_g * col_g * cos, mask_g)
                mask_b = jnp.where(upd, mask_b * col_b * cos, mask_b)

                eff = eff + jnp.where(
                    rec & ~is_refraction & ~any_reflect, 1, 0)
                n_hits = n_hits + rec.astype(jnp.int32)
                alive_i = (
                    alive & hit_ok & ~(rec & is_light) & (eff < max_eff)
                ).astype(jnp.int32)

                ox = jnp.where(rec, nox, ox)
                oy = jnp.where(rec, noy, oy)
                oz = jnp.where(rec, noz, oz)
                dx = jnp.where(rec, ndx, dx)
                dy = jnp.where(rec, ndy, dy)
                dz = jnp.where(rec, ndz, dz)
                inside_i = jnp.where(rec, new_inside_i, inside_i)

                return (b + 1, ox, oy, oz, dx, dy, dz, alive_i, inside_i,
                        n_hits, eff, mask_r, mask_g, mask_b, srr, srg, srb)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz, alive_i, inside_i,
                  n_hits, eff, mask_r, mask_g, mask_b, srr, srg, srb)
            st = jax.lax.while_loop(bounce_cond, bounce_body, st)
            return (acc_r + st[14], acc_g + st[15], acc_b + st[16])

        acc_r, acc_g, acc_b = jax.lax.fori_loop(
            0, spp // spp_pack, sample_body, (acc_r, acc_g, acc_b))

        out_r[...] = acc_r
        out_g[...] = acc_g
        out_b[...] = acc_b

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("meta", "cfg", "spp", "total_samples", "tile",
                     "spp_pack", "pack_axis", "interpret"),
)
def trace_tiles(
    seed: jnp.ndarray,          # i32 [2]: (prng seed, global sample base)
    cam_vec: jnp.ndarray,       # [_CAM_COLS] f32
    obj_table: jnp.ndarray,     # [No, _OBJ_COLS] f32
    node_table: jnp.ndarray,    # [Nn, _NODE_COLS] f32 (dummy if no mesh)
    tri_table: jnp.ndarray,     # [rows, 96] f32
    px: jnp.ndarray,            # [T*S, L] i32
    py: jnp.ndarray,
    meta: SceneMeta = None,
    cfg: RenderConfig = None,
    spp: int = 1,
    total_samples: int = 1,
    tile: Tuple[int, int] = (128, 256),
    spp_pack: int = 1,
    pack_axis: str = "row",
    interpret: bool = False,
    tex: jnp.ndarray = None,    # [128, Ltot] staged file-texture atlas
):
    """Run the megakernel over all tiles; returns (r, g, b) sums [T*S, L].

    spp_pack: sample packing factor along `pack_axis` (see
    _make_kernel). px/py must come from tile_pixel_layout(
    spp_pack=spp_pack, pack_axis=pack_axis); each slot then sums
    spp/spp_pack samples and untile_image adds the replicas."""
    S, L = tile
    if spp % spp_pack:
        raise ValueError(f"spp_pack={spp_pack} must divide spp={spp}")
    if pack_axis == "chunk":
        if L % spp_pack or (L // spp_pack) % 128:
            raise ValueError(
                f"chunk pack={spp_pack} needs L={L} to split into "
                f"128-lane-aligned replica groups")
    elif S % spp_pack:
        raise ValueError(
            f"spp_pack={spp_pack} must divide the sublane count S={S}")
    n_tiles = px.shape[0] // S
    kernel = _make_kernel(meta, cfg, spp, total_samples, tile, spp_pack,
                          pack_axis)

    staged = staged_lanes(meta)
    if staged:
        if tex is None:
            raise ValueError(
                "scene has VMEM-staged file textures; pass "
                "tex=arrays.tex_staged to trace_tiles")
        if tex.shape != (128, staged):
            raise ValueError(
                f"staged texture atlas shape {tex.shape} != "
                f"(128, {staged}) required by this scene's meta")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # seed
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),              # objects
            pl.BlockSpec(memory_space=pltpu.VMEM),              # BVH nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),              # triangles
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]            # staged
             if staged else []) + [                             # atlas
            pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),              # px
            pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),              # py
        ],
        out_specs=[
            pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct(px.shape, jnp.float32)] * 3
    # interpret mode swaps the on-core PRNG for the software hash
    # stream (no CPU lowering for pltpu.prng_*); the flag is read at
    # kernel-trace time, which happens inside the pallas_call call
    global _SW_PRNG
    prev = _SW_PRNG
    _SW_PRNG = bool(interpret)
    try:
        args = (seed, cam_vec, obj_table, node_table, tri_table) + (
            (tex,) if staged else ()) + (px, py)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,  # CPU testing (tests/test_pallas.py)
        )(*args)
    finally:
        _SW_PRNG = prev


def render_pallas(scn: SceneArrays, meta: SceneMeta, camera, cfg: RenderConfig,
                  seed: int = None, interpret: bool = False,
                  tile: Tuple[int, int] = None) -> np.ndarray:
    """Full-image render via the megakernel. Returns [H, W, 3] float32."""
    assert supports_scene(meta), "scene not supported by the megakernel"
    W, H = camera.width, camera.height
    S, L = tile if tile is not None else default_tile(meta)

    spp = cfg.samples
    axis = default_pack_axis(meta)
    pack = clamp_pack(default_pack(meta, spp), S, L, axis)
    xs, ys, pid = tile_pixel_layout(W, H, S, L, order=default_order(meta),
                                    spp_pack=pack, pack_axis=axis)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(build_camera_vec(camera))
    obj_table, nodes, tris = scene_tables_jnp(
        scn, meta, traversal=traversal_mode(meta))

    r, g, b = trace_tiles(
        jnp.asarray([seed if seed is not None else cfg.seed, 0], jnp.int32),
        cam_vec, obj_table, nodes, tris, px, py,
        meta=meta, cfg=cfg, spp=spp, total_samples=cfg.samples, tile=(S, L),
        spp_pack=pack, pack_axis=axis, interpret=interpret,
        tex=scn.tex_staged if staged_lanes(meta) else None,
    )
    img = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    img = untile_image(img.reshape(-1, 3), pid, W, H).reshape(H, W, 3)
    return img / float(cfg.samples)


# ---------------------------------------------------------------------------
# Intersect-only kernel: fast packet BVH for the WAVEFRONT integrator
# ---------------------------------------------------------------------------

def _make_intersect_kernel(meta: SceneMeta, cfg: RenderConfig,
                           tile: Tuple[int, int]):
    """One full-scene intersection pass per ray tile (no shading). Lets the
    wavefront integrator — which keeps textures/materials in XLA where
    gathers are available — replace its gather-bound per-ray BVH walk with
    the packet traversal. Same structure as the megakernel's intersect
    section, but emits (t, winning object index, object-space ray, triangle
    normal/color) for XLA to shade."""
    obj_types = meta.obj_types
    group_bvh = {g: (r, e) for g, r, e in meta.group_bvh}
    leaf_rows = meta.leaf_size // _TRI_SLOTS_PER_ROW
    eps = cfg.epsilon
    t_max = cfg.t_max

    def kernel(obj_ref, node_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, idx_out, lox_out, loy_out, loz_out,
               ldx_out, ldy_out, ldz_out, tri_out,
               tnx_out, tny_out, tnz_out, tcr_out, tcg_out, tcb_out):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        shape = ox.shape
        zero = jnp.zeros(shape, jnp.float32)

        def traverse(root, end, tox, toy, toz, tdx, tdy, tdz, active,
                     bt0):
            oct_base = _group_octant_base(meta, active, tdx, tdy, tdz)
            if traversal_mode(meta) == "mxu":
                return _packet_traverse_mxu(
                    node_ref, tri_ref, meta.leaf_size, meta.n_tri_slots,
                    eps, t_max, root, end, tox, toy, toz,
                    tdx, tdy, tdz, active, bt0, oct_base=oct_base)
            return _packet_traverse(node_ref, tri_ref, leaf_rows, eps,
                                    t_max, root, end, tox, toy, toz,
                                    tdx, tdy, tdz, active, bt0,
                                    oct_base=oct_base,
                                    uniform_color=meta.tri_uniform_color)

        best_t = jnp.full(shape, _BIG, jnp.float32)
        w_idx = jnp.zeros(shape, jnp.int32)
        l_ox = ox; l_oy = oy; l_oz = oz
        l_dx = dx; l_dy = dy; l_dz = dz
        is_tri_f = jnp.zeros(shape, jnp.float32)
        tnx = zero; tny = zero; tnz = zero
        tcr = zero; tcg = zero; tcb = zero
        alive = jnp.ones(shape, jnp.bool_)

        for j, code in enumerate(obj_types):
            m = [obj_ref[j, k] for k in range(12)]
            tox, toy, toz = _mat12_point(m, ox, oy, oz)
            tdx, tdy, tdz = _mat12_vec(m, dx, dy, dz)
            g_tri = None
            if code == PLANE:
                t_j = _plane_t(toy, tdy, eps)
            elif code == SPHERE:
                t_j = _sphere_t(tox, toy, toz, tdx, tdy, tdz, eps)
            elif code == CYLINDER:
                t_j = _cylinder_t(tox, toy, toz, tdx, tdy, tdz,
                                  obj_ref[j, 32], obj_ref[j, 33], eps)
            elif code == BOX:
                t_j = _box_t(tox, toy, toz, tdx, tdy, tdz, eps)
            else:  # GROUP
                x1, x2 = _axis_slab(tox, tdx, obj_ref[j, 34],
                                    obj_ref[j, 37], eps)
                y1, y2 = _axis_slab(toy, tdy, obj_ref[j, 35],
                                    obj_ref[j, 38], eps)
                z1, z2 = _axis_slab(toz, tdz, obj_ref[j, 36],
                                    obj_ref[j, 39], eps)
                gtmin = jnp.maximum(jnp.maximum(x1, y1), z1)
                gtmax = jnp.minimum(jnp.minimum(x2, y2), z2)
                pre = alive & (gtmin <= gtmax) & (gtmax > eps) \
                    & (gtmin < best_t)
                root, end = group_bvh[j]
                t_j, g_nx, g_ny, g_nz, g_cr, g_cg, g_cb = traverse(
                    root, end, tox, toy, toz, tdx, tdy, tdz, pre, best_t)
                g_tri = (g_nx, g_ny, g_nz, g_cr, g_cg, g_cb)

            closer = t_j < best_t
            best_t = jnp.where(closer, t_j, best_t)
            w_idx = jnp.where(closer, j, w_idx)
            l_ox = jnp.where(closer, tox, l_ox)
            l_oy = jnp.where(closer, toy, l_oy)
            l_oz = jnp.where(closer, toz, l_oz)
            l_dx = jnp.where(closer, tdx, l_dx)
            l_dy = jnp.where(closer, tdy, l_dy)
            l_dz = jnp.where(closer, tdz, l_dz)
            if g_tri is None:
                is_tri_f = jnp.where(closer, 0.0, is_tri_f)
            else:
                g_nx, g_ny, g_nz, g_cr, g_cg, g_cb = g_tri
                is_tri_f = jnp.where(closer, 1.0, is_tri_f)
                tnx = jnp.where(closer, g_nx, tnx)
                tny = jnp.where(closer, g_ny, tny)
                tnz = jnp.where(closer, g_nz, tnz)
                tcr = jnp.where(closer, g_cr, tcr)
                tcg = jnp.where(closer, g_cg, tcg)
                tcb = jnp.where(closer, g_cb, tcb)

        t_out[...] = jnp.minimum(best_t, t_max)
        idx_out[...] = w_idx
        lox_out[...] = l_ox
        loy_out[...] = l_oy
        loz_out[...] = l_oz
        ldx_out[...] = l_dx
        ldy_out[...] = l_dy
        ldz_out[...] = l_dz
        tri_out[...] = is_tri_f
        tnx_out[...] = tnx
        tny_out[...] = tny
        tnz_out[...] = tnz
        tcr_out[...] = tcr
        tcg_out[...] = tcg
        tcb_out[...] = tcb

    return kernel


@functools.partial(
    jax.jit, static_argnames=("meta", "cfg", "tile"),
)
def intersect_tiles(
    obj_table: jnp.ndarray,
    node_table: jnp.ndarray,
    tri_table: jnp.ndarray,
    ox, oy, oz, dx, dy, dz,     # [T*S, L] f32 each
    meta: SceneMeta = None,
    cfg: RenderConfig = None,
    tile: Tuple[int, int] = (8, 512),
):
    """Packet-BVH intersection of a padded tiled ray batch. Returns
    (t, obj_idx, l_ox..l_dz, is_tri_f, tnx..tnz, tcr..tcb), all [T*S, L]."""
    S, L = tile
    n_tiles = ox.shape[0] // S
    kernel = _make_intersect_kernel(meta, cfg, tile)

    bspec = pl.BlockSpec((S, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct(ox.shape, jnp.float32)
    i32 = jax.ShapeDtypeStruct(ox.shape, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # objects
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangles
        ] + [bspec] * 6,
        out_specs=[bspec] * 15,
        out_shape=[f32, i32] + [f32] * 13,
    )(obj_table, node_table, tri_table, ox, oy, oz, dx, dy, dz)


def scene_tables_jnp(scn: SceneArrays, meta: SceneMeta,
                     traversal: str = None):
    """Build the SMEM/VMEM scene tables with jnp ops so they can be traced
    from inside a jitted wavefront step (the numpy builders above are for
    host-side call sites). traversal=None resolves to
    traversal_mode(meta); "mxu" emits the MXU triangle-table layout
    (build_mxu_tri_table); grad paths pass "classic" explicitly."""
    if traversal is None:
        traversal = traversal_mode(meta)
    n = meta.n_objects
    f = lambda a: a.astype(jnp.float32)
    obj = jnp.concatenate([
        f(scn.inverse[:n, :3, :].reshape(n, 12)),
        f(scn.inverse_transpose[:n, :3, :].reshape(n, 12)),
        f(scn.color[:n]), f(scn.emission[:n]),
        f(scn.refractive_index[:n, None]), f(scn.reflectivity[:n, None]),
        f(scn.min_y[:n, None]), f(scn.max_y[:n, None]),
        f(scn.bb_min[:n]), f(scn.bb_max[:n]),
        # NEE light columns (40-44): forward translation, max-diag
        # scale, and [0,0] for the attenuation heuristic
        f(scn.transform[:n, :3, 3]),
        f(jnp.maximum(jnp.maximum(scn.transform[:n, 0, 0],
                                  scn.transform[:n, 1, 1]),
                      scn.transform[:n, 2, 2])[:, None]),
        f(scn.transform[:n, 0, 0][:, None]),
    ], axis=1)
    if not meta.has_groups:
        return (obj, jnp.zeros((1, _NODE_COLS), jnp.float32),
                jnp.zeros((1, _TRI_SLOTS_PER_ROW * _TRI_STRIDE),
                          jnp.float32))
    nn = scn.node_bb_min.shape[0]
    nodes = jnp.concatenate([
        f(scn.node_bb_min), f(scn.node_bb_max),
        f(scn.node_tri_start[:, None]),
        f(scn.node_is_leaf[:, None]),
        f(scn.node_exit[:, None]),
        jnp.zeros((nn, _NODE_COLS - 9), jnp.float32),
    ], axis=1)
    ns = scn.tri_p1.shape[0]
    # dual-basis precompute + normal deltas (see build_mesh_tables)
    e1 = f(scn.tri_e1)
    e2 = f(scn.tri_e2)
    ng = jnp.cross(e1, e2)
    l2 = (ng * ng).sum(axis=1, keepdims=True)
    safe = jnp.where(l2 > 0.0, l2, 1.0)
    uu = jnp.where(l2 > 0.0, jnp.cross(e2, ng) / safe, 0.0)
    vv = jnp.where(l2 > 0.0, jnp.cross(ng, e1) / safe, 0.0)
    flat = jnp.concatenate([
        f(scn.tri_p1), f(ng), f(uu), f(vv), f(scn.tri_n1),
        f(scn.tri_n2) - f(scn.tri_n1), f(scn.tri_n3) - f(scn.tri_n1),
        f(scn.tri_color),
    ], axis=1)                                            # [Ns, 24]
    flat = jnp.pad(flat, ((0, (-ns) % _TRI_SLOTS_PER_ROW), (0, 0)))
    tris = flat.reshape(-1, _TRI_SLOTS_PER_ROW * _TRI_STRIDE)
    if traversal == "mxu":
        K = meta.leaf_size
        a, pay = _mxu_plane_arrays(
            jnp, f(scn.tri_p1), e1, e2, f(scn.tri_n1), f(scn.tri_n2),
            f(scn.tri_n3), f(scn.tri_color), K)
        tris = _mxu_pack(jnp, a, pay, K)
    return obj, nodes, tris


def supports_intersect(meta: SceneMeta) -> bool:
    """The intersect-only kernel handles ALL scenes the wavefront can
    (textures don't matter — shading stays in XLA)."""
    prim = all(t in (PLANE, SPHERE, CYLINDER, BOX, GROUP)
               for t in meta.obj_types)
    return prim and meta.leaf_size % _TRI_SLOTS_PER_ROW == 0


def intersect_batch(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                    origin, direction, tile: Tuple[int, int] = (8, 512)):
    """Pallas packet intersection of a flat [R] SoA ray batch (callable
    from inside jit). Returns (t, obj_idx, local_origin, local_dir,
    is_tri, tri_normal, tri_color) with Vec3 fields as 3-tuples of [R]."""
    S, L = tile
    R = origin[0].shape[0]
    pad = (-R) % (S * L)

    def tiled(a, fill=0.0):
        return jnp.pad(a.astype(jnp.float32), (0, pad),
                       constant_values=fill).reshape(-1, L)

    obj, nodes, tris = scene_tables_jnp(
        scn, meta, traversal=traversal_mode(meta))
    outs = intersect_tiles(
        obj, nodes, tris,
        tiled(origin[0], 1e6), tiled(origin[1], 1e6), tiled(origin[2], 1e6),
        tiled(direction[0], 1.0), tiled(direction[1]), tiled(direction[2]),
        meta=meta, cfg=cfg, tile=tile,
    )

    def untile(a):
        return a.reshape(-1)[:R]

    (t, idx, lox, loy, loz, ldx, ldy, ldz, trif,
     tnx, tny, tnz, tcr, tcg, tcb) = (untile(o) for o in outs)
    return (t, idx, (lox, loy, loz), (ldx, ldy, ldz), trif > 0.5,
            (tnx, tny, tnz), (tcr, tcg, tcb))
