"""Differentiable Pallas megakernel: fused forward+backward path tracing.

The wavefront AD path (diff/grad.py + integrator.py early_exit=False) pays
XLA gathers and HBM residuals per bounce — ~50x slower than the forward
megakernel. This module gives the megakernel a hand-written backward pass
for the parameters that matter for inverse rendering: object color and
emission (make_diff_render), plus per-triangle mesh colors via a
per-bounce HBM tape + XLA segment-sum (make_diff_render_tri). Textured
scenes DO ride the megakernel for FORWARD rendering (computed
procedural texels since round 2c, VMEM-staged small file textures since
round 4 — docs/PERFORMANCE.md "Textured scenes"); this module's
backward pass covers untextured scenes plus (round 5) staged/procedural
TEXEL color gradients via make_diff_render_tex:

- The estimator per sample is S = sum_b contrib_b * m_b * e_b with
  m_{b+1} = m_b * c_b * cos_b on recorded diffuse bounces and a direct
  light hit overwriting S with the light COLOR
  (reference resolve loop, internal/ocl/tracer.cl:1116-1176). Both
  c and e enter LINEARLY given the sampled trajectory, so the pathwise
  gradient only needs the trajectory replayed — not differentiated.
- The backward kernel REPLAYS the forward trajectory with the identical
  on-core PRNG stream (same seed, same draw order as the forward
  megakernel — determinism is the residual), records a compact per-bounce
  tape (winning object, cos, color, emission, mask, flags) in VMEM
  scratch, then runs the per-sample backward recurrence
      T_b = contrib_{b+1} e_{b+1} + (upd_{b+1} ? c_{b+1} cos_{b+1} : 1) T_{b+1}
      dS/dc_b = upd_b ? cos_b m_b T_b   (direct hit: dS/dc = 1, rest 0)
      dS/de_b = contrib_b ? m_b
  and scatters per-ray gradients into per-object VMEM accumulators
  (static unroll over the <=16-object table — no gathers anywhere).
- jax.custom_vjp glues it together: primal = the fast forward megakernel
  (render/pallas_kernel.trace_tiles), backward = one grad kernel launch.

Mesh (per-triangle) hits record winning object -1, so they carry no
OBJECT-color gradient; their PER-TRIANGLE color gradients flow through
the tri_grads tape instead (make_diff_render_tri): the traversal tracks
the winning slot (_packet_traverse return_slot), the backward emits
(slot, dS/dc) per (ray, bounce) to HBM, and jax.ops.segment_sum does the
per-triangle scatter-add where the kernel can't (no per-lane scatter on
this hardware). Everything else about the trajectory (including the
triangle color inside T) is exact in both modes.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.pack import SceneMeta
from ..scene.shapes import BOX, CYLINDER, GROUP, PLANE, SPHERE
from . import pallas_kernel as pk
from .pallas_kernel import (_BIG, _axis_slab, _box_t, _cylinder_t, _dot,
                            _mat12_point, _mat12_vec, _normalize,
                            _packet_traverse, _plane_t, _prng_seed,
                            _refract, _schlick, _sphere_t,
                            _coherent_sampling, _uniform, _uniform_row)


def _scatter_staged(tex_out, desc, u, v, g_r, g_g, g_b):
    """Transpose of pk._sample_staged: accumulate per-texel gradients
    into the [1, 128, Ltot] output-block atlas accumulator.

    Forward fetch (per sublane row s): c_c(l) = sum_{h,x} M[h,l] N[l,x]
    win[h, c*cw+x] with M the bilinear y one-hot and N the bilinear x
    one-hot. Therefore dS/dwin[h, c*cw+x] = sum_l M[h,l] g_c(l) N[l,x],
    i.e. per color ONE [128,L]x[L,cw] matmul of (M .* g-broadcast) with
    N — the same one-hot algebra as the fetch, transposed, so the
    backward texel scatter costs ~3x the forward fetch. Textures taller
    than 128 rows mirror the forward's two-tap window path (one matmul
    per row tap). g_* must already be masked to lanes whose winning
    object samples this texture."""
    _, base, w, h = desc
    hb = -(-h // 128)
    cw = hb * w                  # one color plane's lane width
    fx = u * jnp.float32(w) - 0.5
    fy = v * jnp.float32(h) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = pk._wrap_tex(x0, w).astype(jnp.int32)
    x1i = pk._wrap_tex(x0 + 1.0, w).astype(jnp.int32)
    y0i = pk._wrap_tex(y0, h).astype(jnp.int32)
    y1i = pk._wrap_tex(y0 + 1.0, h).astype(jnp.int32)
    S, L = u.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, cw), 1)
    rowoh = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)

    def row(s, acc):
        def take(a):             # [S, L] -> [L] (row s, masked reduce)
            return jnp.sum(jnp.where(rowoh == s, a,
                                     jnp.zeros_like(a)), axis=0)

        def bc_row(a):           # [S, L] -> [128, L]
            return jax.lax.broadcast_in_dim(take(a), (128, L), (1,))

        def bc_lane(a):          # [S, L] -> [L, cw]
            return jax.lax.broadcast_in_dim(take(a), (L, cw), (0,))

        txl = bc_lane(tx)
        if hb == 1:
            # y-blend folded into one matmul (forward's hb==1 branch)
            m = ((col == bc_row(y0i)).astype(jnp.float32)
                 * bc_row(1.0 - ty)
                 + (col == bc_row(y1i)).astype(jnp.float32)
                 * bc_row(ty))
            n = ((lane == bc_lane(x0i)).astype(jnp.float32)
                 * (1.0 - txl)
                 + (lane == bc_lane(x1i)).astype(jnp.float32) * txl)
            return tuple(
                a + jax.lax.dot_general(
                    m * bc_row(g), n, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for a, g in zip(acc, (g_r, g_g, g_b)))
        # two row taps, each with its own window-offset lane mask
        out = list(acc)
        for yi, wy in ((y0i, 1.0 - ty), (y1i, ty)):
            k = yi // 128                                # window index
            m = (col == bc_row(yi - 128 * k)).astype(jnp.float32)
            kl = bc_lane(k) * w
            n = ((lane == (kl + bc_lane(x0i))).astype(jnp.float32)
                 * (1.0 - txl)
                 + (lane == (kl + bc_lane(x1i))).astype(jnp.float32)
                 * txl)
            out = [
                a + jax.lax.dot_general(
                    m * bc_row(wy * g), n, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for a, g in zip(out, (g_r, g_g, g_b))]
        return tuple(out)

    z = jnp.zeros((128, cw), jnp.float32)
    gr, gg, gb = jax.lax.fori_loop(0, S, row, (z, z, z))
    # round-5 GLOBAL color-outer atlas: color c of this texture lives
    # at c*P + base (P = plane stride, pack._stage_file_textures)
    P = tex_out.shape[2] // 3
    for c, g in enumerate((gr, gg, gb)):
        tex_out[0, :, c * P + base: c * P + base + cw] += g


def _scatter_staged_unified(tex_out, base, w, h, u, v, g_r, g_g, g_b):
    """Transpose of pk._sample_staged_unified: scatter per-lane texel
    gradients for ALL staged textures of a bounce with one matmul per
    (row-tap, color) — 3-6× fewer MXU dispatches than the per-group
    scatter at identical MACs (the staged path is dispatch-bound,
    docs/PERFORMANCE.md). base/w/h are per-lane f32 descriptors
    (inactive lanes: g zeroed by the caller, w/h >= 1); the atlas is
    GLOBAL color-outer with plane stride P = Ltot/3."""
    P = tex_out.shape[2] // 3
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    wsafe = jnp.maximum(w, 1.0)
    hsafe = jnp.maximum(h, 1.0)
    y0f = pk._wrap_tex(y0, hsafe)
    y1f = pk._wrap_tex(y0 + 1.0, hsafe)

    # per-lane plane offsets per row-tap in [S, L] space (same
    # scoped-VMEM diet as pk._sample_staged_unified: only three [L, P]
    # temporaries live in the row body)
    def tap_offsets(yif):
        koff = base + jnp.floor(yif / 128.0) * w
        return (koff + pk._wrap_tex(x0, wsafe),
                koff + pk._wrap_tex(x0 + 1.0, wsafe))

    S, L = u.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, P), 1)
    rowoh = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (384, L), 0) % 128

    def row(s, acc):
        def take(a):
            return jnp.sum(jnp.where(rowoh == s, a,
                                     jnp.zeros_like(a)), axis=0)

        def bc_row3(a):          # [S, L] -> [384, L]
            return jax.lax.broadcast_in_dim(take(a), (384, L), (1,))

        def bc_lane(a):
            return jax.lax.broadcast_in_dim(take(a), (L, P), (0,))

        txl = bc_lane(tx)
        out = acc
        # per-color gradients stacked along sublanes [384, L]: rows
        # [c*128, (c+1)*128) carry m .* (wy * g_c) — ONE
        # [384, L] x [L, P] matmul per row-tap scatters all 3 planes
        crow = jax.lax.broadcasted_iota(jnp.int32, (384, L), 0) // 128
        g3 = jnp.where(crow == 0, bc_row3(g_r),
             jnp.where(crow == 1, bc_row3(g_g), bc_row3(g_b)))
        for yif, wy in ((y0f, 1.0 - ty), (y1f, ty)):
            yi3 = bc_row3(yif).astype(jnp.int32)
            m3 = ((col3 == yi3 - 128 * (yi3 // 128))
                  .astype(jnp.float32) * bc_row3(wy) * g3)  # [384, L]
            off0, off1 = tap_offsets(yif)
            n = ((lane == bc_lane(off0).astype(jnp.int32))
                 .astype(jnp.float32) * (1.0 - txl)
                 + (lane == bc_lane(off1).astype(jnp.int32))
                 .astype(jnp.float32) * txl)                # [L, P]
            out = out + jax.lax.dot_general(
                m3, n, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [384, P]
        return out

    z = jnp.zeros((384, P), jnp.float32)
    g3out = jax.lax.fori_loop(0, S, row, z)
    for c in range(3):
        tex_out[0, :, c * P: (c + 1) * P] += g3out[c * 128:(c + 1) * 128]


def _scatter_slots(out_ref, slot_f, g_r, g_g, g_b, nw):
    """One-hot MXU scatter of per-lane (slot, gradient) pairs into the
    [1, 128, 3*nw] slot-atlas accumulator (round 5, VERDICT r4 ask #6:
    replaces the per-(ray, bounce) HBM tape + XLA segment-sum).

    Slot s lives at (row = s % 128, lane window = s // 128) of the
    atlas; per sublane row of the tile, per color, ONE
    [128, L] x [L, nw] matmul of (row-one-hot .* gradient) with the
    window-one-hot performs the scatter-add — the same transposed
    one-hot algebra as _scatter_staged with the bilinear weights
    replaced by exact one-hots, on the otherwise-idle MXU. slot_f < 0
    (no mesh hit) must arrive with zero gradient; its window one-hot
    (lane == -1) also never fires."""
    S, L = slot_f.shape
    slot_i = slot_f.astype(jnp.int32)
    win_i = jnp.where(slot_i >= 0, slot_i // 128, -1)
    row_i = slot_i - win_i * 128          # s % 128 for valid slots
    col = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, nw), 1)
    rowoh = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)

    def row(s, acc):
        def take(a):             # [S, L] -> [L] (row s, masked reduce)
            return jnp.sum(jnp.where(rowoh == s, a,
                                     jnp.zeros_like(a)), axis=0)

        def bc_row(a):           # [S, L] -> [128, L]
            return jax.lax.broadcast_in_dim(take(a), (128, L), (1,))

        def bc_lane(a):          # [S, L] -> [L, nw]
            return jax.lax.broadcast_in_dim(take(a), (L, nw), (0,))

        m = (col == bc_row(row_i)).astype(jnp.float32)
        n = (lane == bc_lane(win_i)).astype(jnp.float32)
        return tuple(
            a + jax.lax.dot_general(
                m * bc_row(g), n, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for a, g in zip(acc, (g_r, g_g, g_b)))

    z = jnp.zeros((128, nw), jnp.float32)
    gr, gg, gb = jax.lax.fori_loop(0, S, row, (z, z, z))
    for c, g in enumerate((gr, gg, gb)):
        out_ref[0, :, c * nw: (c + 1) * nw] += g


def _make_grad_kernel(meta: SceneMeta, cfg: RenderConfig, spp: int,
                      total_samples: int, tile: Tuple[int, int],
                      tri_grads: bool = False, tex_grads: bool = False,
                      tri_mode: str = "onehot"):
    """Forward-replay + tape + backward-accumulate kernel body.

    The forward section mirrors pallas_kernel._make_kernel's sample_body
    EXACTLY (same PRNG draw order, same arithmetic) — any divergence
    breaks the replay; tests/test_grad_pallas.py pins fwd parity.

    `tri_grads`: additionally emit a per-bounce PER-TRIANGLE gradient
    tape to HBM — the winning global triangle slot (f32, -1 = not a
    mesh hit) and the three per-channel color-gradient values — for the
    XLA-side segment-sum in grad_tiles. Per-triangle accumulators can't
    live in VMEM ([Nt,3] with Nt in the thousands and no per-lane
    scatter on this hardware), so the scatter-add runs outside the
    kernel. The tape holds one plane per (sample, bounce): spp samples
    per launch stream spp*max_b planes per tile (VMEM block budget
    bounds spp — see grad_tiles)."""
    obj_types = meta.obj_types
    group_bvh = {g: (r, e) for g, r, e in meta.group_bvh}
    leaf_rows = meta.leaf_size // pk._TRI_SLOTS_PER_ROW
    eps = cfg.epsilon
    t_max = cfg.t_max
    max_b = cfg.max_bounces
    max_eff = cfg.max_effective_bounces
    golden2 = ((math.sqrt(5.0) + 1.0) / 2.0) ** 2
    sun_n = float(total_samples)
    sun_b = round(2.0 * math.sqrt(sun_n))
    n_obj = meta.n_objects
    # tex_grads: forward-replay the megakernel's texture-color overwrite
    # (staged one-hot fetch / computed proc texels), tape the winning
    # UV per bounce, and scatter dS/dtexel into a per-tile atlas
    # accumulator in the backward pass (see _scatter_staged)
    tex_groups = (pk._tex_groups(meta.obj_tex, obj_types)
                  if tex_grads and meta.obj_tex else [])
    staged_groups = [g for g in tex_groups
                     if isinstance(g[1], tuple) and g[1]
                     and g[1][0] == "__staged__"]
    # slots whose color is a texture: their OBJECT-color gradient is
    # exactly zero (the texel overwrites it in the forward)
    tex_slots = {s for (slots, *_r) in tex_groups for s in slots}

    onehot_tri = tri_grads and tri_mode == "onehot"
    nw_tri = -(-meta.n_tri_slots // 128) if tri_grads else 0

    def kernel(seed_ref, cam_ref, obj_ref, node_ref, tri_ref, *args):
        # arg order mirrors grad_tiles' specs: inputs
        # [tex?] px py cot_r cot_g cot_b; outputs gout [tex_out?]
        # [tri_atlas_out | tslot tgrad?]; scratch win cos c e m flags
        # acc [wtri?] [u v?]
        args = list(args)
        tex_ref = args.pop(0) if tex_grads else None
        (px_ref, py_ref, cot_r_ref, cot_g_ref, cot_b_ref,
         gout_ref) = args[:6]
        rest = args[6:]
        tex_out = rest.pop(0) if tex_grads else None
        tslot_out = tgrad_out = t_wtri = tri_out = None
        t_u = t_v = None
        if tex_grads:
            # scratch list ends with the (u, v) tapes
            t_v = rest.pop()
            t_u = rest.pop()
        if onehot_tri:
            (tri_out, t_win, t_cos, t_c, t_e, t_m,
             t_flags, g_acc, t_wtri) = rest
            tri_out[...] = jnp.zeros(tri_out.shape, jnp.float32)
        elif tri_grads:
            (tslot_out, tgrad_out, t_win, t_cos, t_c, t_e, t_m,
             t_flags, g_acc, t_wtri) = rest
        else:
            t_win, t_cos, t_c, t_e, t_m, t_flags, g_acc = rest
        if tex_grads:
            tex_out[...] = jnp.zeros(tex_out.shape, jnp.float32)
        _prng_seed(seed_ref[0], pl.program_id(0))
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

        cot_r = cot_r_ref[...]
        cot_g = cot_g_ref[...]
        cot_b = cot_b_ref[...]

        g_acc[...] = jnp.zeros((n_obj * 6,) + shape, jnp.float32)

        def traverse_packet(root, end, tox, toy, toz, tdx, tdy, tdz,
                            active, bt0):
            oct_base = pk._group_octant_base(meta, active, tdx, tdy, tdz)
            # tri mode reads true per-slot colors (no uniform elision —
            # the differentiable colors vary even if the packed scene's
            # are uniform) and tracks the winning slot for the tape
            return _packet_traverse(
                node_ref, tri_ref, leaf_rows, eps,
                t_max, root, end, tox, toy, toz,
                tdx, tdy, tdz, active, bt0,
                oct_base=oct_base,
                uniform_color=(None if tri_grads
                               else meta.tri_uniform_color),
                return_slot=tri_grads)

        def sample_body(n, carry):
            # --- rayForPixel: identical to the forward megakernel -------
            jx = _uniform(shape, 0, n)
            jy = _uniform(shape, 1, n)
            x_off = pixel_size * (fx + jx)
            y_off = pixel_size * (fy + jy)
            vx = half_w - x_off
            vy = half_h - y_off
            vz = jnp.full(shape, -1.0, jnp.float32)
            pxw, pyw, pzw = _mat12_point(cam, vx, vy, vz)
            # camera origin = the translation column (must stay
            # value-identical to pallas_kernel's forward raygen — the
            # backward replay reuses this trajectory)
            oxw = jnp.full(shape, cam[3], jnp.float32)
            oyw = jnp.full(shape, cam[7], jnp.float32)
            ozw = jnp.full(shape, cam[11], jnp.float32)
            dx, dy, dz = _normalize(pxw - oxw, pyw - oyw, pzw - ozw)

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
            dox = oxw + sun_y * aperture
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
            alive_i = jnp.ones(shape, jnp.int32)
            inside_i = jnp.zeros(shape, jnp.int32)
            n_hits = jnp.zeros(shape, jnp.int32)
            eff = jnp.zeros(shape, jnp.int32)

            # stale tape flags from the previous sample must not leak
            # into the backward pass (the bounce loop can exit early)
            t_flags[...] = jnp.zeros((max_b,) + shape, jnp.float32)
            if tex_grads:
                # u/v at unreached bounces are uninitialized scratch
                # (NaN in interpret mode); 0 * NaN would poison the
                # one-hot weights even under a zero gradient mask
                t_u[...] = jnp.zeros((max_b,) + shape, jnp.float32)
                t_v[...] = jnp.zeros((max_b,) + shape, jnp.float32)
            if tri_grads:
                # slots at bounces the loop never reaches must read -1
                t_wtri[...] = jnp.full((max_b,) + shape, -1.0,
                                       jnp.float32)

            def bounce_cond(st):
                b = st[0]
                alive_i = st[7]
                return (b < max_b) & (jnp.max(alive_i) > 0)

            def bounce_body(st):
                (b, ox, oy, oz, dx, dy, dz, alive_i, inside_i, n_hits,
                 eff, mask_r, mask_g, mask_b) = st
                alive = alive_i > 0
                inside = inside_i > 0

                # ---- intersect: static unroll (forward-identical) -----
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
                w_min_y = jnp.zeros(shape, jnp.float32)
                w_max_y = jnp.zeros(shape, jnp.float32)
                emi_g = jnp.zeros(shape, jnp.float32)
                emi_b = jnp.zeros(shape, jnp.float32)
                is_tri_f = jnp.zeros(shape, jnp.float32)
                tnx = jnp.zeros(shape, jnp.float32)
                tny = jnp.zeros(shape, jnp.float32)
                tnz = jnp.zeros(shape, jnp.float32)
                win_f = jnp.full(shape, -1.0, jnp.float32)
                wtri = jnp.full(shape, -1.0, jnp.float32)

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
                    else:
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
                        tp = traverse_packet(root, end, tox, toy, toz,
                                             tdx, tdy, tdz, pre, best_t)
                        if tri_grads:
                            (t_j, g_nx, g_ny, g_nz, g_cr, g_cg, g_cb,
                             g_sl) = tp
                        else:
                            t_j, g_nx, g_ny, g_nz, g_cr, g_cg, g_cb = tp
                            g_sl = None
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
                        win_f = jnp.where(closer, float(j), win_f)
                        if tri_grads:
                            wtri = jnp.where(closer, -1.0, wtri)
                    else:
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
                        # -1: mesh hits carry no OBJECT-color gradient
                        # (their colors are per-triangle; see tri_grads)
                        win_f = jnp.where(closer, -1.0, win_f)
                        if tri_grads:
                            wtri = jnp.where(closer, g_sl, wtri)
                    refr = jnp.where(closer, obj_ref[j, 30], refr)
                    refl = jnp.where(closer, obj_ref[j, 31], refl)
                    w_min_y = jnp.where(closer, obj_ref[j, 32], w_min_y)
                    w_max_y = jnp.where(closer, obj_ref[j, 33], w_max_y)
                    invt = [jnp.where(closer, obj_ref[j, 12 + k], invt[k])
                            for k in range(12)]
                    w_type = jnp.where(closer, code, w_type)

                hit_ok = best_t < t_max
                t = jnp.minimum(best_t, t_max)

                # ---- surface normal (forward-identical) ---------------
                lx = l_ox + l_dx * t
                ly = l_oy + l_dy * t
                lz = l_oz + l_dz * t
                one = jnp.ones(shape, jnp.float32)
                zero = jnp.zeros(shape, jnp.float32)
                dist = lx * lx + lz * lz
                top = (dist < 1.0) & (ly >= w_max_y - eps)
                bot = (dist < 1.0) & (ly <= w_min_y + eps)
                cyl_nx = jnp.where(top | bot, zero, lx)
                cyl_ny = jnp.where(top, one, jnp.where(bot, -one, zero))
                cyl_nz = jnp.where(top | bot, zero, lz)
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
                nx, ny, nz = _mat12_vec(invt, nlx, nly, nlz)
                nx, ny, nz = _normalize(nx, ny, nz)
                ex, ey, ez = -dx, -dy, -dz
                flip = _dot(ex, ey, ez, nx, ny, nz) < 0.0
                nx = jnp.where(flip, -nx, nx)
                ny = jnp.where(flip, -ny, ny)
                nz = jnp.where(flip, -nz, nz)

                # ---- texture color (forward-identical to _make_kernel's
                # tex_groups loop — the replay contract) + UV tape: the
                # backward pass recomputes the bilinear one-hot weights
                # from (u, v) to scatter dS/dtexel ---------------------
                if tex_groups:
                    unify = (pk._unified_staged()
                             and len(staged_groups) >= 2)
                    sel_u = jnp.zeros(shape, jnp.float32)
                    sel_v = jnp.zeros(shape, jnp.float32)
                    if unify:
                        sbv = jnp.zeros(shape, jnp.float32)
                        swv = jnp.ones(shape, jnp.float32)
                        shv = jnp.ones(shape, jnp.float32)
                        s_act = jnp.zeros(shape, jnp.bool_)
                    for (slots, desc, tw, th, sx, sy, tcode) \
                            in tex_groups:
                        msk = functools.reduce(
                            jnp.logical_or,
                            [win_f == float(s) for s in slots])
                        if tcode == PLANE:
                            tu = lx * sx
                            tv = lz * sy
                        elif tcode == SPHERE:
                            tu, tv = pk._spherical_uv(lx, ly, lz)
                        else:  # BOX (cube-cross)
                            tu, tv = pk._cube_uv(lx, ly, lz)
                        sel_u = jnp.where(msk, tu, sel_u)
                        sel_v = jnp.where(msk, tv, sel_v)
                        if unify and (slots, desc, tw, th, sx, sy,
                                      tcode) in staged_groups:
                            # round 5: merged one-matmul fetch for all
                            # staged groups (same as the primal
                            # megakernel — the replay contract)
                            _, d_base, d_w, d_h = desc
                            sbv = jnp.where(msk, float(d_base), sbv)
                            swv = jnp.where(msk, float(d_w), swv)
                            shv = jnp.where(msk, float(d_h), shv)
                            s_act = s_act | msk
                            continue
                        tcr, tcg, tcb = pk._sample_tex(
                            tex_ref, desc, tw, th, tu, tv)
                        col_r = jnp.where(msk, tcr, col_r)
                        col_g = jnp.where(msk, tcg, col_g)
                        col_b = jnp.where(msk, tcb, col_b)
                    if unify:
                        tcr, tcg, tcb = pk._sample_staged_unified(
                            tex_ref, sbv, swv, shv, sel_u, sel_v,
                            s_act)
                        col_r = jnp.where(s_act, tcr, col_r)
                        col_g = jnp.where(s_act, tcg, col_g)
                        col_b = jnp.where(s_act, tcb, col_b)
                    t_u[pl.ds(b, 1)] = sel_u[None]
                    t_v[pl.ds(b, 1)] = sel_v[None]

                # ---- material roulette (forward-identical: SAME draw
                # ids AND the same coherent row-sharing mode as
                # _make_kernel — the replay contract) -------------------
                _udraw = (_uniform_row if _coherent_sampling()
                          else _uniform)
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
                    _schlick(ex, ey, ez, nx, ny, nz, jnp.float32(1.0),
                             refr),
                    _schlick(ex, ey, ez, nx, ny, nz, refr,
                             jnp.float32(1.0)),
                )
                do_refract = solid & (sch < u_schl)
                rf_o = _refract(ex, ey, ez, nx, ny, nz, jnp.float32(1.0),
                                refr)
                rf_i = _refract(ex, ey, ez, nx, ny, nz, refr,
                                jnp.float32(1.0))
                rfx = jnp.where(outside, rf_o[0], rf_i[0])
                rfy = jnp.where(outside, rf_o[1], rf_i[1])
                rfz = jnp.where(outside, rf_o[2], rf_i[2])
                solid_reflect = solid & ~do_refract
                diffuse = (~do_reflect) & (~thin) & (~solid)

                rand1 = 2.0 * math.pi * u1
                rand2s = jnp.sqrt(u2)
                pick = jnp.abs(nx) > 0.1
                axx = jnp.where(pick, zero, one)
                axy = jnp.where(pick, one, zero)
                ux = axy * nz
                uy = -(axx * nz)
                uz = axx * ny - axy * nx
                ux, uy, uz = _normalize(ux, uy, uz)
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

                rec = alive & hit_ok
                no_refr = rec & ~is_refraction
                is_light = emi_r > 0.0
                direct = no_refr & is_light & (n_hits == 0)
                upd = no_refr & ~is_light

                # ---- tape write (the whole point of this kernel) ------
                # tape layout: rgb tapes are flat (3*max_b, S, L) with
                # channel-major index 3*b + ch (mixed dynamic+static
                # indexing on 4-D scratch is fragile in Mosaic)
                bsl = pl.ds(b, 1)
                b3 = b * 3
                t_win[bsl] = jnp.where(rec, win_f, -1.0)[None]
                t_cos[bsl] = cos[None]
                t_c[pl.ds(b3, 1)] = col_r[None]
                t_c[pl.ds(b3 + 1, 1)] = col_g[None]
                t_c[pl.ds(b3 + 2, 1)] = col_b[None]
                t_e[pl.ds(b3, 1)] = emi_r[None]
                t_e[pl.ds(b3 + 1, 1)] = emi_g[None]
                t_e[pl.ds(b3 + 2, 1)] = emi_b[None]
                t_m[pl.ds(b3, 1)] = mask_r[None]
                t_m[pl.ds(b3 + 1, 1)] = mask_g[None]
                t_m[pl.ds(b3 + 2, 1)] = mask_b[None]
                t_flags[bsl] = (
                    no_refr.astype(jnp.float32)          # contrib: 1
                    + upd.astype(jnp.float32) * 2.0      # mask upd: 2
                    + direct.astype(jnp.float32) * 4.0   # direct:   4
                )[None]
                if tri_grads:
                    t_wtri[bsl] = jnp.where(rec, wtri, -1.0)[None]

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
                        n_hits, eff, mask_r, mask_g, mask_b)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz, alive_i,
                  inside_i, n_hits, eff, mask_r, mask_g, mask_b)
            jax.lax.while_loop(bounce_cond, bounce_body, st)

            # ---- per-sample backward over the tape --------------------
            # D: a direct light hit overwrote S -> only that color grad
            flags = [t_flags[bb] for bb in range(max_b)]
            direct_any = jnp.zeros(shape, jnp.bool_)
            for bb in range(max_b):
                direct_any = direct_any | (flags[bb] >= 4.0)

            T_r = jnp.zeros(shape, jnp.float32)
            T_g = jnp.zeros(shape, jnp.float32)
            T_b = jnp.zeros(shape, jnp.float32)
            for bb in reversed(range(max_b)):
                # valid flag combos: 0, 1 (contrib only: light hit),
                # 3 (contrib+upd: diffuse/reflect), 5 (contrib+direct)
                f = flags[bb]
                contrib = f >= 1.0
                updf = f == 3.0
                directf = f >= 4.0
                cosb = t_cos[bb]
                cr = t_c[3 * bb]; cg = t_c[3 * bb + 1]; cb = t_c[3 * bb + 2]
                er = t_e[3 * bb]; eg = t_e[3 * bb + 1]; eb = t_e[3 * bb + 2]
                mr = t_m[3 * bb]; mg = t_m[3 * bb + 1]; mb = t_m[3 * bb + 2]
                win = t_win[bb]

                zero = jnp.zeros(shape, jnp.float32)
                g_cr = jnp.where(
                    direct_any,
                    jnp.where(directf, cot_r, zero),
                    jnp.where(updf, cot_r * cosb * mr * T_r, zero))
                g_cg = jnp.where(
                    direct_any,
                    jnp.where(directf, cot_g, zero),
                    jnp.where(updf, cot_g * cosb * mg * T_g, zero))
                g_cb = jnp.where(
                    direct_any,
                    jnp.where(directf, cot_b, zero),
                    jnp.where(updf, cot_b * cosb * mb * T_b, zero))
                no_d = ~direct_any & contrib
                g_er = jnp.where(no_d, cot_r * mr, zero)
                g_eg = jnp.where(no_d, cot_g * mg, zero)
                g_eb = jnp.where(no_d, cot_b * mb, zero)

                if tri_grads:
                    # same dS/dc as the object branch, keyed by the
                    # winning triangle slot
                    wt = t_wtri[bb]
                    tri_upd = updf & (wt >= 0.0) & ~direct_any
                    tg_r = jnp.where(
                        tri_upd, cot_r * cosb * mr * T_r, zero)
                    tg_g = jnp.where(
                        tri_upd, cot_g * cosb * mg * T_g, zero)
                    tg_b = jnp.where(
                        tri_upd, cot_b * cosb * mb * T_b, zero)
                    if onehot_tri:
                        # round 5: on-core one-hot MXU scatter into the
                        # [128, 3*nw] slot atlas — no HBM tape, no XLA
                        # segment-sum, no spp-per-launch cap
                        _scatter_slots(tri_out, jnp.where(
                            tri_upd, wt, -1.0), tg_r, tg_g, tg_b,
                            nw_tri)
                    else:
                        # legacy HBM tape + XLA segment-sum: plane
                        # index = sample*max_b + bounce (bb static, n
                        # the dynamic fori sample — dynamic
                        # sublane-offset stores into the 3-D
                        # (spp*max_b[*3], S, L) output blocks)
                        pb = n * max_b + bb
                        tslot_out[pl.ds(pb, 1)] = wt[None]
                        tgrad_out[pl.ds(pb * 3, 1)] = tg_r[None]
                        tgrad_out[pl.ds(pb * 3 + 1, 1)] = tg_g[None]
                        tgrad_out[pl.ds(pb * 3 + 2, 1)] = tg_b[None]

                # dS/dtexel: same per-bounce dS/dc as the object branch,
                # scattered into the atlas by the taped UV's bilinear
                # one-hot weights (staged textures only — proc texels
                # are programs, not parameters; bake to a staged image
                # to train them)
                if tex_grads and staged_groups:
                    u_bb = t_u[bb]
                    v_bb = t_v[bb]
                    if pk._unified_staged() and len(staged_groups) >= 2:
                        # one merged scatter for every staged group
                        # (transposed one-matmul fetch; dispatch-bound
                        # path, docs/PERFORMANCE.md)
                        sbv = jnp.zeros(shape, jnp.float32)
                        swv = jnp.ones(shape, jnp.float32)
                        shv = jnp.ones(shape, jnp.float32)
                        mt_any = jnp.zeros(shape, jnp.float32)
                        for (slots, desc, *_r) in staged_groups:
                            mt = functools.reduce(
                                jnp.logical_or,
                                [win == float(s) for s in slots])
                            _, d_base, d_w, d_h = desc
                            sbv = jnp.where(mt, float(d_base), sbv)
                            swv = jnp.where(mt, float(d_w), swv)
                            shv = jnp.where(mt, float(d_h), shv)
                            mt_any = jnp.where(mt, 1.0, mt_any)
                        _scatter_staged_unified(
                            tex_out, sbv, swv, shv, u_bb, v_bb,
                            g_cr * mt_any, g_cg * mt_any,
                            g_cb * mt_any)
                    else:
                        for (slots, desc, *_r) in staged_groups:
                            mt = functools.reduce(
                                jnp.logical_or,
                                [win == float(s) for s in slots]
                            ).astype(jnp.float32)
                            _scatter_staged(tex_out, desc, u_bb, v_bb,
                                            g_cr * mt, g_cg * mt,
                                            g_cb * mt)

                for j in range(n_obj):
                    mobj = win == float(j)
                    base = j * 6
                    if j not in tex_slots:
                        # textured objects: the texel overwrites the
                        # object color in the forward, so their
                        # OBJECT-color gradient is exactly zero
                        g_acc[base + 0] += jnp.where(mobj, g_cr, zero)
                        g_acc[base + 1] += jnp.where(mobj, g_cg, zero)
                        g_acc[base + 2] += jnp.where(mobj, g_cb, zero)
                    g_acc[base + 3] += jnp.where(mobj, g_er, zero)
                    g_acc[base + 4] += jnp.where(mobj, g_eg, zero)
                    g_acc[base + 5] += jnp.where(mobj, g_eb, zero)

                # select, not multiply-by-flag: tape slots at bounces
                # the loop never reached are UNINITIALIZED scratch
                # (NaN in interpret mode, arbitrary leftovers on
                # hardware) and 0 * NaN would poison the recurrence
                sc_r = jnp.where(updf, cr * cosb, 1.0)
                sc_g = jnp.where(updf, cg * cosb, 1.0)
                sc_b = jnp.where(updf, cb * cosb, 1.0)
                T_r = jnp.where(contrib, er, 0.0) + sc_r * T_r
                T_g = jnp.where(contrib, eg, 0.0) + sc_g * T_g
                T_b = jnp.where(contrib, eb, 0.0) + sc_b * T_b
            return carry

        jax.lax.fori_loop(0, spp, sample_body, jnp.int32(0))

        # ---- reduce per-object accumulators into the [8, 128] output --
        row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out = jnp.zeros((8, 128), jnp.float32)
        for j in range(n_obj):
            for c in range(6):
                s = jnp.sum(g_acc[j * 6 + c])
                out = out + jnp.where((row_i == c) & (col_i == j), s, 0.0)
        gout_ref[0] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("meta", "cfg", "spp", "total_samples", "tile",
                     "tri_grads", "tex_grads", "interpret", "tri_mode"),
)
def grad_tiles(
    seed: jnp.ndarray,          # i32 [2]: (prng seed, sample base)
    cam_vec: jnp.ndarray,
    obj_table: jnp.ndarray,
    node_table: jnp.ndarray,
    tri_table: jnp.ndarray,
    px: jnp.ndarray,            # [T*S, L] i32
    py: jnp.ndarray,
    cot_r: jnp.ndarray,         # [T*S, L] f32 cotangent of summed output
    cot_g: jnp.ndarray,
    cot_b: jnp.ndarray,
    meta: SceneMeta = None,
    cfg: RenderConfig = None,
    spp: int = 1,
    total_samples: int = 1,
    tile: Tuple[int, int] = (8, 512),
    tri_grads: bool = False,
    tex_grads: bool = False,
    interpret: bool = False,
    tex: jnp.ndarray = None,    # [128, Ltot] staged atlas (tex_grads)
    tri_mode: str = "onehot",
):
    """Backward pass of trace_tiles w.r.t. (color, emission). Returns
    (gcol [No, 3], gemi [No, 3]) summed over all tiles and samples;
    with `tri_grads` additionally gtri [n_slots, 3] — per-triangle
    color gradients, accumulated on-core by the one-hot MXU slot
    scatter (tri_mode="onehot", round 5 — no HBM tape, no spp cap) or
    scatter-added here via jax.ops.segment_sum over the kernel's
    per-bounce slot/value HBM tape (tri_mode="tape", the round-2b
    path, kept as the measured baseline); with `tex_grads`
    additionally gtex [128, Ltot] — per-texel gradients of the staged
    atlas, accumulated on-core (_scatter_staged) and tile-summed."""
    S, L = tile
    n_tiles = px.shape[0] // S
    n_obj = meta.n_objects
    max_b = cfg.max_bounces
    onehot_tri = tri_grads and tri_mode == "onehot"
    nw_tri = -(-meta.n_tri_slots // 128) if tri_grads else 0
    if tex_grads:
        assert not tri_grads, \
            "tex_grads and tri_grads are separate paths (combine by " \
            "alternating steps if both parameter sets must train)"
        assert tex is not None and pk.staged_lanes(meta) > 0, \
            "tex_grads needs a staged-texture scene and its atlas"
        ltot = tex.shape[1]
    if tri_grads and not onehot_tri:
        # the per-(sample, bounce) tape lives in the output VMEM block
        # while a tile is in flight: 4 planes (slot + rgb) x spp x max_b
        # x S x L x 4 B. Cap the per-launch budget so the block fits
        # comfortably (~4 MB at (8, 512), spp=8, max_b=5); accumulate
        # more samples across launches.
        tape_mb = spp * max_b * 4 * S * L * 4 / 2**20
        assert tape_mb <= 6.0, (
            f"tri tape block {tape_mb:.1f} MB exceeds the VMEM budget; "
            f"lower spp per launch (accumulate across calls)")
    kernel = _make_grad_kernel(meta, cfg, spp, total_samples, tile,
                               tri_grads=tri_grads, tex_grads=tex_grads,
                               tri_mode=tri_mode)

    bspec = pl.BlockSpec((S, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32)]
    if tex_grads:
        # per-tile atlas-gradient accumulator block; XLA sums over tiles
        out_specs.append(
            pl.BlockSpec((1, 128, ltot), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, 128, ltot), jnp.float32))
    if onehot_tri:
        # per-tile [128, 3*nw] slot-atlas accumulator; XLA sums tiles
        out_specs.append(
            pl.BlockSpec((1, 128, 3 * nw_tri), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, 128, 3 * nw_tri),
                                 jnp.float32))
    elif tri_grads:
        # 3-D plane-major tapes (mixed dynamic+static indexing on 4-D
        # refs is fragile in Mosaic): tile i owns plane rows
        # [i*spp*max_b, (i+1)*spp*max_b) — index_map is in block units
        out_specs += [
            pl.BlockSpec((spp * max_b, S, L), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * max_b * 3, S, L),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_tiles * spp * max_b, S, L),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * spp * max_b * 3, S, L),
                                 jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((max_b, S, L), jnp.float32),      # win
        pltpu.VMEM((max_b, S, L), jnp.float32),      # cos
        pltpu.VMEM((max_b * 3, S, L), jnp.float32),  # color tape
        pltpu.VMEM((max_b * 3, S, L), jnp.float32),  # emission tape
        pltpu.VMEM((max_b * 3, S, L), jnp.float32),  # mask tape
        pltpu.VMEM((max_b, S, L), jnp.float32),      # flags
        pltpu.VMEM((n_obj * 6, S, L), jnp.float32),  # per-obj accum
    ]
    if tri_grads:
        scratch.append(pltpu.VMEM((max_b, S, L), jnp.float32))  # wtri
    if tex_grads:
        scratch.append(pltpu.VMEM((max_b, S, L), jnp.float32))  # u tape
        scratch.append(pltpu.VMEM((max_b, S, L), jnp.float32))  # v tape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),   # objects
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # staged atlas
             if tex_grads else []) + [
            bspec, bspec,                            # px py
            bspec, bspec, bspec,                     # cotangents
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    # interpret mode: software PRNG (same draw-id stream as the
    # forward megakernel — see pallas_kernel._uniform)
    prev = pk._SW_PRNG
    pk._SW_PRNG = bool(interpret)
    try:
        args = (seed, cam_vec, obj_table, node_table, tri_table) + (
            (tex,) if tex_grads else ()) + (px, py, cot_r, cot_g, cot_b)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    finally:
        pk._SW_PRNG = prev
    gt = outs[0]
    g = gt.sum(axis=0)                       # [8, 128]
    gcol = g[0:3, :n_obj].T                  # [No, 3]
    gemi = g[3:6, :n_obj].T
    if tex_grads:
        gtex = outs[1].sum(axis=0)           # [128, Ltot]
        return gcol, gemi, gtex
    if not tri_grads:
        return gcol, gemi

    if onehot_tri:
        # decode the slot atlas: slot s = window*128 + row, so
        # [128, nw].T.reshape(-1)[s] = atlas[s % 128, s // 128]
        atlas = outs[1].sum(axis=0)          # [128, 3*nw]
        n_slots = meta.n_tri_slots
        chans = [atlas[:, c * nw_tri:(c + 1) * nw_tri].T.reshape(-1)
                 [:n_slots] for c in range(3)]
        return gcol, gemi, jnp.stack(chans, axis=1)

    # XLA-side scatter-add of the per-(sample, ray, bounce) tri tape
    tslot, tgrad = outs[1], outs[2]
    n_slots = tri_table.shape[0] * pk._TRI_SLOTS_PER_ROW
    idx = tslot.reshape(-1).astype(jnp.int32)
    valid = (idx >= 0) & (idx < n_slots)
    idx = jnp.where(valid, idx, n_slots)     # overflow bucket, dropped
    gv = tgrad.reshape(n_tiles * spp * max_b, 3, S, L)
    chans = []
    for c in range(3):
        gc = jnp.where(valid, gv[:, c].reshape(-1), 0.0)
        chans.append(jax.ops.segment_sum(
            gc, idx, num_segments=n_slots + 1)[:n_slots])
    return gcol, gemi, jnp.stack(chans, axis=1)


@functools.lru_cache(maxsize=None)
def make_diff_render(meta: SceneMeta, cfg: RenderConfig, spp: int,
                     total_samples: int, tile: Tuple[int, int],
                     interpret: bool = False):
    """custom_vjp megakernel render: differentiable in (color, emission).

    Returns fn(color [No,3], emission [No,3], seed [2] i32, cam_vec,
    obj_table, nodes, tris, px, py) -> (r, g, b) per-slot radiance SUMS
    (same contract as trace_tiles; caller divides by total spp).
    obj_table carries the scene geometry; its color/emission columns are
    OVERWRITTEN from the differentiable inputs.
    """
    assert pk.traversal_mode(meta) == "classic", \
        "differentiable megakernel replay is classic-traversal only " \
        "(tables are classic layout); unset PT_TRAVERSAL"
    assert not cfg.nee, \
        "differentiable megakernel does not replay NEE shadow draws " \
        "(train with nee=False or via the wavefront AD path)"
    assert not meta.textured_types and not meta.has_normal_maps, \
        "differentiable megakernel does not replay texture programs " \
        "(train textures via the wavefront AD path, diff/grad.py)"
    n = meta.n_objects
    assemble = functools.partial(_assemble_obj, n=n)

    @jax.custom_vjp
    def render(color, emission, seed, cam_vec, obj_table, nodes, tris,
               px, py):
        obj = assemble(obj_table, color, emission)
        return pk.trace_tiles(
            seed, cam_vec, obj, nodes, tris, px, py, meta=meta, cfg=cfg,
            spp=spp, total_samples=total_samples, tile=tile,
            interpret=interpret)

    def fwd(color, emission, seed, cam_vec, obj_table, nodes, tris, px,
            py):
        out = render(color, emission, seed, cam_vec, obj_table, nodes,
                     tris, px, py)
        res = (color, emission, seed, cam_vec, obj_table, nodes, tris,
               px, py)
        return out, res

    def bwd(res, cots):
        color, emission, seed, cam_vec, obj_table, nodes, tris, px, py \
            = res
        cot_r, cot_g, cot_b = cots
        obj = assemble(obj_table, color, emission)
        gcol, gemi = grad_tiles(
            seed, cam_vec, obj, nodes, tris, px, py,
            cot_r, cot_g, cot_b,
            meta=meta, cfg=cfg, spp=spp, total_samples=total_samples,
            tile=tile, interpret=interpret)
        # pad gradients back to the (possibly padded) param shapes
        gc = jnp.zeros_like(color).at[:n].set(gcol.astype(color.dtype))
        ge = jnp.zeros_like(emission).at[:n].set(
            gemi.astype(emission.dtype))
        return (gc, ge, None, None, None, None, None, None, None)

    render.defvjp(fwd, bwd)
    return render


def _assemble_obj(obj_table: jnp.ndarray, color: jnp.ndarray,
                  emission: jnp.ndarray, n: int) -> jnp.ndarray:
    """Overwrite the object table's color/emission columns (24:30 of the
    build_scene_table layout) from the differentiable [>=n, 3] params."""
    return jnp.concatenate([
        obj_table[:, 0:24],
        color[:n].astype(jnp.float32),
        emission[:n].astype(jnp.float32),
        obj_table[:, 30:40],
    ], axis=1)


def _assemble_tri(tri_table: jnp.ndarray,
                  tri_color: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the per-slot color columns (offset 21:24 of each
    24-float slot record, build_mesh_tables layout) of a classic
    triangle table from a differentiable [n_slots, 3] parameter."""
    rows = tri_table.shape[0]
    k = pk._TRI_SLOTS_PER_ROW
    stride = pk._TRI_STRIDE
    t3 = tri_table.reshape(rows, k, stride)
    col = tri_color.astype(jnp.float32).reshape(rows, k, 3)
    return jnp.concatenate([t3[:, :, :21], col], axis=2).reshape(
        rows, k * stride)


@functools.lru_cache(maxsize=None)
def make_diff_render_tri(meta: SceneMeta, cfg: RenderConfig,
                         total_samples: int, tile: Tuple[int, int],
                         interpret: bool = False, spp: int = 1):
    """custom_vjp megakernel render differentiable in (object color,
    object emission, per-triangle color).

    Same contract as make_diff_render plus a tri_color [n_slots, 3]
    input (n_slots = tri-pool slots = SceneArrays.tri_color rows,
    alignment padding included — padded slots never win a hit, so
    their gradients are exactly zero). `spp` samples per kernel launch
    (the backward's per-triangle tape streams one plane per
    (sample, bounce) to HBM; the VMEM output-block budget caps spp per
    launch — see grad_tiles); accumulate more samples by calling in a
    loop (scan) over seeds — gradients add through AD as usual. The
    tri table must be in CLASSIC layout (the grad kernel's replay
    walks _packet_traverse).

    Returns fn(color [No,3], emission [No,3], tri_color [Ns,3],
    seed [2] i32, cam_vec, obj_table, nodes, tris, px, py)
    -> (r, g, b) per-slot radiance sums."""
    import dataclasses

    assert pk.traversal_mode(meta) == "classic", \
        "differentiable megakernel replay is classic-traversal only " \
        "(tables are classic layout); unset PT_TRAVERSAL"
    assert not cfg.nee, \
        "differentiable megakernel does not replay NEE shadow draws " \
        "(train with nee=False or via the wavefront AD path)"
    assert not meta.textured_types and not meta.has_normal_maps, \
        "differentiable megakernel does not replay texture programs " \
        "(train textures via the wavefront AD path, diff/grad.py)"
    n = meta.n_objects
    # uniform-color elision must be OFF in both the primal and the
    # replay: the differentiable colors vary even when the packed
    # scene's are uniform
    meta_nd = dataclasses.replace(meta, tri_uniform_color=None)
    assemble = functools.partial(_assemble_obj, n=n)

    @jax.custom_vjp
    def render(color, emission, tri_color, seed, cam_vec, obj_table,
               nodes, tris, px, py):
        obj = assemble(obj_table, color, emission)
        tri = _assemble_tri(tris, tri_color)
        return pk.trace_tiles(
            seed, cam_vec, obj, nodes, tri, px, py, meta=meta_nd,
            cfg=cfg, spp=spp, total_samples=total_samples, tile=tile,
            interpret=interpret)

    def fwd(color, emission, tri_color, seed, cam_vec, obj_table,
            nodes, tris, px, py):
        out = render(color, emission, tri_color, seed, cam_vec,
                     obj_table, nodes, tris, px, py)
        res = (color, emission, tri_color, seed, cam_vec, obj_table,
               nodes, tris, px, py)
        return out, res

    def bwd(res, cots):
        (color, emission, tri_color, seed, cam_vec, obj_table, nodes,
         tris, px, py) = res
        cot_r, cot_g, cot_b = cots
        obj = assemble(obj_table, color, emission)
        tri = _assemble_tri(tris, tri_color)
        import os

        gcol, gemi, gtri = grad_tiles(
            seed, cam_vec, obj, nodes, tri, px, py,
            cot_r, cot_g, cot_b,
            meta=meta_nd, cfg=cfg, spp=spp, total_samples=total_samples,
            tile=tile, tri_grads=True, interpret=interpret,
            tri_mode=os.environ.get("PT_TRI_GRAD", "onehot"))
        gc = jnp.zeros_like(color).at[:n].set(gcol.astype(color.dtype))
        ge = jnp.zeros_like(emission).at[:n].set(
            gemi.astype(emission.dtype))
        gt = gtri[:tri_color.shape[0]].astype(tri_color.dtype)
        return (gc, ge, gt, None, None, None, None, None, None, None)

    render.defvjp(fwd, bwd)
    return render


@functools.lru_cache(maxsize=None)
def make_diff_render_tex(meta: SceneMeta, cfg: RenderConfig, spp: int,
                         total_samples: int, tile: Tuple[int, int],
                         interpret: bool = False):
    """custom_vjp megakernel render differentiable in (object color,
    object emission, STAGED TEXTURE ATLAS) — texel color gradients on
    the fast path (VERDICT r4 ask #5; the north star names
    material/texture/emission gradients, BASELINE.json).

    The estimator is linear in each texel given the trajectory (the
    bilinear fetch is linear algebra over the atlas and the mask/accum
    recurrence matches object color, tracer.cl:1116-1176), so the
    backward pass replays the trajectory, tapes the winning UV per
    bounce, and scatters dS/dc through the transposed one-hot fetch
    into a per-tile atlas accumulator (_scatter_staged) — no HBM tape,
    no XLA gathers. Procedural textures in the same scene replay for
    color parity but carry no gradient (their texels are programs, not
    parameters — bake to a staged image to train them).

    Returns fn(color [No,3], emission [No,3], tex [128,Ltot] staged
    atlas, seed [2] i32, cam_vec, obj_table, nodes, tris, px, py)
    -> (r, g, b) per-slot radiance sums (caller divides by spp).
    """
    assert pk.traversal_mode(meta) == "classic", \
        "differentiable megakernel replay is classic-traversal only"
    assert not cfg.nee, \
        "differentiable megakernel does not replay NEE shadow draws"
    assert pk.staged_lanes(meta) > 0, \
        "tex gradients need VMEM-staged file textures " \
        "(pack._stage_file_textures; over-cap images mip-stage)"
    assert not meta.has_normal_maps, \
        "normal-map textures redirect rays (non-linear in texels); " \
        "train them via the wavefront AD path"
    n = meta.n_objects
    assemble = functools.partial(_assemble_obj, n=n)

    @jax.custom_vjp
    def render(color, emission, tex, seed, cam_vec, obj_table, nodes,
               tris, px, py):
        obj = assemble(obj_table, color, emission)
        return pk.trace_tiles(
            seed, cam_vec, obj, nodes, tris, px, py, meta=meta, cfg=cfg,
            spp=spp, total_samples=total_samples, tile=tile,
            interpret=interpret, tex=tex)

    def fwd(color, emission, tex, seed, cam_vec, obj_table, nodes,
            tris, px, py):
        out = render(color, emission, tex, seed, cam_vec, obj_table,
                     nodes, tris, px, py)
        res = (color, emission, tex, seed, cam_vec, obj_table, nodes,
               tris, px, py)
        return out, res

    def bwd(res, cots):
        (color, emission, tex, seed, cam_vec, obj_table, nodes, tris,
         px, py) = res
        cot_r, cot_g, cot_b = cots
        obj = assemble(obj_table, color, emission)
        gcol, gemi, gtex = grad_tiles(
            seed, cam_vec, obj, nodes, tris, px, py,
            cot_r, cot_g, cot_b,
            meta=meta, cfg=cfg, spp=spp, total_samples=total_samples,
            tile=tile, tex_grads=True, interpret=interpret,
            tex=tex.astype(jnp.float32))
        gc = jnp.zeros_like(color).at[:n].set(gcol.astype(color.dtype))
        ge = jnp.zeros_like(emission).at[:n].set(
            gemi.astype(emission.dtype))
        return (gc, ge, gtex.astype(tex.dtype), None, None, None, None,
                None, None, None)

    render.defvjp(fwd, bwd)
    return render
