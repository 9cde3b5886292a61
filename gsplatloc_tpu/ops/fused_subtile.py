"""Sub-tile fused tracking rasterizer: (16, 32) pixel sub-tiles.

Same math and gating as ops/fused_tracking.py (in-kernel projection of a
frozen scene, pose-only backward), but each Gaussian slot is evaluated
against P=512 pixels instead of P=2048. Real RGB-D splats cover ~9 px, so
the (C, P) pair evaluation is ~99.5% wasted work at (16, 128) tiles; column
sub-tiling cuts it 4x for ~9% more slots (splats crossing a 32-px column
boundary bin twice, exactly like tile binning — ops/binning.py with
tile_w=32).

Mosaic-safe layout (an earlier (8, 128)-tile experiment hit a 16x slowdown
at (C, 1024) shapes, and output blocks below (8, 128) are rejected):

  * The kernel grid stays one step per (16, 128) MACRO tile; the 4 sub-tile
    segments are walked by an in-kernel fori_loop. Sub-tile s of macro tile
    t is subtile id 4t+s — contiguous in the row-major (16, 32) tile order,
    so `meta` is just the tile_w=32 binning offsets.
  * Per-sub-tile results are (1, 512) rows flattened r*32+c. They are NOT
    reshaped in-kernel (a (1,512)->(16,32) relayout is exactly the
    unsupported shape-cast class); instead each sub-walk DMAs an (8, 512)
    scratch block to a flat HBM output at column offset (4t+s)*512 — always
    512-aligned, the same VMEM->HBM column-window protocol as the
    contribution probe. The (H, W) image is recovered by a cheap XLA
    reshape/transpose outside the kernel (unscramble_image).
  * The backward's four pixel inputs (fwd depth/alpha totals + both
    cotangents) ride ONE (8, M) scrambled array in the same layout — a
    single (8, 512) DMA per sub-walk replaces four (16, 128) blocked loads.

Reference parity: same alpha gating, transmittance early-out, and pose
gradient as the full-tile fused path (validated against it and the dense
oracle in tests/test_fused_subtile.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, bin_and_sort
from .fused_tracking import (
    _fused_cols,
    _pose_chain,
    _project_slots,
    cam_vector,
)
from .rasterize_pallas import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    NUM_REC_ROWS,
    T_EPS,
    F32,
    _dotf,
    _interpret,
    _scan_add,
    _scan_mul,
)

SUB_W = 16
N_SUB = TILE_W // SUB_W  # sub-tiles per macro tile
P_SUB = TILE_H * SUB_W  # 512 pixels per sub-tile


def _sub_pixel_xy(ti, tj, s):
    """Pixel-center coords (1, P_SUB) of sub-tile s, flattened r*SUB_W+c."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, P_SUB), 1)
    row = (flat // SUB_W).astype(F32)
    col = (flat % SUB_W).astype(F32)
    y = row + ti.astype(F32) * TILE_H + 0.5
    x = col + (tj * TILE_W + s * SUB_W).astype(F32) + 0.5
    return x, y


def _sub_alpha(cols, px, py, slot0, lo, hi):
    """Gated alpha at P_SUB (same gates as fused_tracking._fused_alpha)."""
    dx = px - cols["u"]  # (C, P_SUB)
    dy = py - cols["v"]
    sigma = (0.5 * (cols["ca"] * dx * dx + cols["cc"] * dy * dy)
             + cols["cb"] * dx * dy)
    alpha = jnp.minimum(cols["opa"] * jnp.exp(-sigma), ALPHA_MAX)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + slot0
    in_seg = (rows >= lo) & (rows < hi)
    ok = (in_seg & (cols["ok"] > 0.0) & (sigma >= 0.0)
          & (alpha >= ALPHA_MIN))
    return jnp.where(ok, alpha, 0.0), dx, dy


def _subtile_fwd_kernel(meta, cam, records_hbm, out_hbm, cd_out,
                        rec_scr, out_scr, sem, osem, *, near, far):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    cam_v = cam

    def _out_copy(s, slot):
        st_ = t * N_SUB + s
        return pltpu.make_async_copy(
            out_scr.at[slot],
            out_hbm.at[:, pl.ds(pl.multiple_of(st_ * P_SUB, P_SUB), P_SUB)],
            osem.at[slot],
        )

    def sub_walk(s, _):
        st = t * N_SUB + s
        start = meta[1 + st]
        end = meta[2 + st]
        base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        n_chunks = pl.cdiv(end - base, CHUNK)
        px, py = _sub_pixel_xy(ti + meta[0], tj, s)

        def _copy(cidx, slot):
            return pltpu.make_async_copy(
                records_hbm.at[:, pl.ds(base + cidx * CHUNK, CHUNK)],
                rec_scr.at[slot], sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            _copy(0, 0).start()

        def chunk_cond(carry):
            cidx, t_cur, _acc = carry
            return (cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)

        def chunk_body(carry):
            cidx, t_cur, acc = carry
            slot = jax.lax.rem(cidx, 2)
            _copy(cidx + 1, 1 - slot).start()
            _copy(cidx, slot).wait()
            chunk_col = base + cidx * CHUNK
            rec = rec_scr[slot]
            pr = _project_slots(rec, cam_v)
            cols = _fused_cols(pr, rec, near, far)
            alpha, _dx, _dy = _sub_alpha(cols, px, py, chunk_col, start, end)
            one_minus = 1.0 - alpha
            incl = _scan_mul(one_minus, P_SUB)
            excl = jnp.concatenate(
                [jnp.ones((1, P_SUB), F32), incl[:-1]], axis=0
            )
            live = (t_cur * incl) > T_EPS
            w = jnp.where(live, t_cur * excl * alpha, 0.0)
            ch2 = jnp.concatenate(
                [pr["qz"], jnp.ones((1, CHUNK), F32)], axis=0
            )
            acc = acc + _dotf(ch2, w, (((1,), (0,))))  # (2, P_SUB)
            return cidx + 1, t_cur * incl[CHUNK - 1:CHUNK], acc

        c_done, _t, acc = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), jnp.ones((1, P_SUB), F32),
             jnp.zeros((2, P_SUB), F32)),
        )

        @pl.when(c_done > 0)
        def _():
            _copy(c_done, jax.lax.rem(c_done, 2)).wait()

        # double-buffered out store: wait for the walk-(s-2) DMA that used
        # this buffer, write, start — the store overlaps the next sub-walk's
        # chunk loop instead of blocking (N_SUB serial waits/tile otherwise)
        slot_o = jax.lax.rem(s, 2)

        @pl.when(s >= 2)
        def _():
            _out_copy(s - 2, slot_o).wait()

        out_scr[slot_o] = jnp.concatenate(
            [acc, jnp.zeros((6, P_SUB), F32)], axis=0
        )
        _out_copy(s, slot_o).start()
        cd_out[st] = c_done
        return 0

    jax.lax.fori_loop(0, N_SUB, sub_walk, 0)
    # drain in-flight stores before the grid step ends (scratch is reused
    # by the next macro tile)
    for s_tail in range(max(N_SUB - 2, 0), N_SUB):
        _out_copy(s_tail, s_tail % 2).wait()


def _subtile_bwd_kernel(meta, cam, records_hbm, sin_hbm,
                        dcam_out, rec_scr, sin_scr, sem, ssem, *, near, far):
    """Pose backward over the 4 sub-tile segments of one macro tile.

    sin_hbm (8, M_out) scrambled pixel rows: 0 depth_acc, 1 alpha (forward
    totals), 2 gd, 3 ga (cotangents)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    cam_v = cam
    fx, fy = cam_v[0], cam_v[1]

    def _sin_copy(s, slot):
        st_ = t * N_SUB + s
        return pltpu.make_async_copy(
            sin_hbm.at[:, pl.ds(pl.multiple_of(st_ * P_SUB, P_SUB), P_SUB)],
            sin_scr.at[slot], ssem.at[slot],
        )

    # prefetch sub-tile 0's pixel rows; walk s starts s+1's load before
    # its chunk loop so the (8, P_SUB) read hides behind compute
    _sin_copy(0, 0).start()

    def sub_walk(s, dacc_in):
        st = t * N_SUB + s
        start = meta[1 + st]
        end = meta[2 + st]
        base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        n_chunks = pl.cdiv(end - base, CHUNK)
        px, py = _sub_pixel_xy(ti + meta[0], tj, s)

        slot_s = jax.lax.rem(s, 2)

        @pl.when(s + 1 < N_SUB)
        def _():
            _sin_copy(s + 1, 1 - slot_s).start()

        _sin_copy(s, slot_s).wait()
        sblk = sin_scr[slot_s]
        td = sblk[0:1, :]
        ta = sblk[1:2, :]
        g_d = sblk[2:3, :]
        g_a = sblk[3:4, :]
        g_tot = g_d * td + g_a * ta

        # tile-LOCAL monomial basis (sub-tile origin: fp32 conditioning)
        x0 = (tj * TILE_W + s * SUB_W).astype(F32)
        y0 = ((ti + meta[0]) * TILE_H).astype(F32)
        xl = px - x0
        yl = py - y0
        mono = jnp.concatenate(
            [jnp.ones((1, P_SUB), F32), xl, yl, xl * xl, xl * yl, yl * yl],
            axis=0,
        )  # (6, P_SUB)

        def _copy(cidx, slot):
            return pltpu.make_async_copy(
                records_hbm.at[:, pl.ds(base + cidx * CHUNK, CHUNK)],
                rec_scr.at[slot], sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            _copy(0, 0).start()

        def live_cond(carry):
            cidx, t_cur, _run, _acc = carry
            return (cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)

        def live_body(carry):
            cidx, t_in, wdw_run, dacc = carry
            slot = jax.lax.rem(cidx, 2)
            _copy(cidx + 1, 1 - slot).start()
            _copy(cidx, slot).wait()
            chunk_col = base + cidx * CHUNK
            rec = rec_scr[slot]
            pr = _project_slots(rec, cam_v)
            cols = _fused_cols(pr, rec, near, far)
            alpha, dx, dy = _sub_alpha(cols, px, py, chunk_col, start, end)
            one_minus = 1.0 - alpha
            incl = _scan_mul(one_minus, P_SUB)
            excl = jnp.concatenate(
                [jnp.ones((1, P_SUB), F32), incl[:-1]], axis=0
            )
            t_prefix = t_in * excl
            live = (t_in * incl) > T_EPS
            w = jnp.where(live, t_prefix * alpha, 0.0)
            t_next = t_in * incl[CHUNK - 1:CHUNK]

            phi = g_d * cols["qz"] + g_a
            wdw = w * phi
            s_incl = _scan_add(wdw, P_SUB) + wdw_run
            suffix = g_tot - s_incl
            inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_MAX)
            d_alpha = t_prefix * phi - suffix * inv_om
            d_alpha = jnp.where(live & (alpha > 0.0), d_alpha, 0.0)
            d_alpha = jnp.where(alpha >= ALPHA_MAX, 0.0, d_alpha)
            d_sigma = d_alpha * (-alpha)

            stacked = jnp.concatenate([d_sigma, w * g_d], axis=0)
            mom = _dotf(stacked, mono, (((1,), (1,)))).T  # (6, 2C)
            dacc = dacc + _pose_chain(
                pr,
                mom[0:1, :CHUNK], mom[1:2, :CHUNK], mom[2:3, :CHUNK],
                mom[3:4, :CHUNK], mom[4:5, :CHUNK], mom[5:6, :CHUNK],
                mom[0:1, CHUNK:], x0, y0, fx, fy,
            )
            wdw_sum = _dotf(jnp.ones((1, CHUNK), F32), wdw, (((1,), (0,))))
            return cidx + 1, t_next, wdw_run + wdw_sum, dacc

        c_done, _t, _run, dacc = jax.lax.while_loop(
            live_cond, live_body,
            (jnp.int32(0), jnp.ones((1, P_SUB), F32),
             jnp.zeros((1, P_SUB), F32), dacc_in),
        )

        @pl.when(c_done > 0)
        def _():
            _copy(c_done, jax.lax.rem(c_done, 2)).wait()

        return dacc

    dacc = jax.lax.fori_loop(
        0, N_SUB, sub_walk, jnp.zeros((1, 16), F32)
    )
    for i_ in range(16):
        dcam_out[t * 16 + i_] = dacc[0, i_]


def scramble_image(img, n_ty, n_tx):
    """(hp, wp) image -> flat sub-tile-major layout (n_ty*n_tx*N_SUB*P_SUB,).
    Element [((ty*n_tx+tx)*4+s)*512 + r*32+c] = img[ty*16+r, tx*128+s*32+c]."""
    return (
        img.reshape(n_ty, TILE_H, n_tx, N_SUB, SUB_W)
        .transpose(0, 2, 3, 1, 4)
        .reshape(-1)
    )


def unscramble_image(flat, n_ty, n_tx):
    """Inverse of scramble_image: flat sub-tile-major -> (hp, wp)."""
    return (
        flat.reshape(n_ty, n_tx, N_SUB, TILE_H, SUB_W)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n_ty * TILE_H, n_tx * TILE_W)
    )


def build_subtile_slot_buffer(scene, viewmat, K, width: int, height: int,
                              near: float, far: float, big_budget: int = 64):
    """Like fused_tracking.build_slot_buffer but binned at (16, 32) sub-tile
    granularity. The binning width is padded to the macro-tile grid so the
    sub-tile count is exactly N_SUB * n_tx_macro per row (tiles past the
    true width get empty segments). big_budget: exact full-footprint binning
    for the top-B biggest splats (ops/binning.py)."""
    from .projection import project_gaussians, quat_scale_to_cov3d

    n_tx = -(-width // TILE_W)
    proj = project_gaussians(
        scene.means, scene.quats, scene.scales, viewmat, K, width, height,
        near, far,
    )
    binning = bin_and_sort(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        n_tx * TILE_W, height,
        tile_h=TILE_H, tile_w=SUB_W, chunk=CHUNK, needs_inv_perm=False,
        big_budget=big_budget,
    )
    cov3d = quat_scale_to_cov3d(scene.quats, scene.scales)
    rows = [
        scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
        cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
        cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2],
        scene.opacities, proj.depth,
    ]
    records = jnp.stack(
        rows + [jnp.zeros_like(proj.depth)] * (NUM_REC_ROWS - len(rows)),
        axis=1,
    )
    slot3d = jnp.take(records, binning.pair_gauss, axis=0).T  # (16, M_pad)
    slot3d = jax.lax.stop_gradient(slot3d)
    meta = jnp.concatenate([jnp.zeros((1,), jnp.int32), binning.tile_starts])
    return slot3d, meta, binning


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def subtile_render(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    """Depth+alpha render from a sub-tile slot buffer, differentiable w.r.t.
    the cam vector ONLY. Returns (depth_acc (hp, wp), alpha (hp, wp))."""
    out, _cd = _subtile_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad,
                                 near, far)
    return (unscramble_image(out[0], n_ty, n_tx),
            unscramble_image(out[1], n_ty, n_tx))


def _subtile_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    m_out = n_ty * n_tx * N_SUB * P_SUB
    kernel = functools.partial(_subtile_fwd_kernel, near=near, far=far)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, m_out), jnp.float32),
            jax.ShapeDtypeStruct((n_ty * n_tx * N_SUB,), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((2, 8, P_SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(meta, cam, slot3d)


def _subtile_vjp_fwd(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    out, _cd = _subtile_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad,
                                 near, far)
    primal = (unscramble_image(out[0], n_ty, n_tx),
              unscramble_image(out[1], n_ty, n_tx))
    return primal, (slot3d, meta, cam, out)


def _subtile_vjp_bwd(n_ty, n_tx, m_pad, near, far, res, cot):
    slot3d, meta, cam, out = res
    gd, ga = cot
    sin = jnp.concatenate(
        [
            out[0:2],
            scramble_image(gd, n_ty, n_tx)[None, :],
            scramble_image(ga, n_ty, n_tx)[None, :],
            jnp.zeros((4, out.shape[1]), F32),
        ],
        axis=0,
    )  # (8, M_out)
    kernel = functools.partial(_subtile_bwd_kernel, near=near, far=far)
    dcam_flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_ty * n_tx * 16,), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((2, NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((2, 8, P_SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(meta, cam, slot3d, sin)
    d = jnp.sum(dcam_flat.reshape(-1, 16), axis=0)
    d_cam = jnp.concatenate([jnp.zeros((4,), F32), d[:12],
                             jnp.zeros((2,), F32)])
    return jnp.zeros_like(slot3d), None, d_cam


subtile_render.defvjp(_subtile_vjp_fwd, _subtile_vjp_bwd)


def render_tracking_depth_subtile(viewmat, K, width: int, height: int,
                                  slot3d, meta, near: float = 1e-2,
                                  far: float = 1e10, mesh=None):
    """Sub-tile counterpart of fused_tracking.render_tracking_depth.

    With a ("tiles",) mesh, macro-tile rows shard across devices and the
    pose gradient all-reduces automatically (parallel/sharded.py)."""
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    m_pad = slot3d.shape[1]
    cam = cam_vector(viewmat, K, width, height)
    if mesh is None:
        d_acc, alpha = subtile_render(
            slot3d, meta, cam, n_ty, n_tx, m_pad, near, far
        )
    else:
        from ..parallel.sharded import sharded_subtile_render

        d = mesh.shape["tiles"]
        n_ty_pad = -(-n_ty // d) * d
        starts = meta[1:]
        extra = (n_ty_pad - n_ty) * n_tx * N_SUB
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[-1], (extra,))]
        )
        d_acc, alpha = sharded_subtile_render(
            slot3d, starts, cam, n_ty_pad, n_tx, mesh, near, far
        )
    d_acc = d_acc[:height, :width]
    alpha = alpha[:height, :width]
    depth = d_acc / jnp.maximum(alpha, 1e-10)
    return depth, alpha
