"""Pallas TPU tile rasterizer: forward + analytic backward compositing.

TPU-native replacement for gsplat's CUDA rasterize_to_pixels fwd/bwd kernels
(consumed by the reference at src/my_gsplat/model.py:195-213; math spec
/root/reference/docs/main.md:148-212). Design:

  * Pixel tile = (16, 128) — one fp32 VMEM tile pair, full 128-lane VPU rows.
  * Per-tile Gaussian work lists come from ops/binning.py (sorted slots);
    the kernel walks its [start, end) segment of the GLOBAL sorted record
    buffer in fixed-size chunks, DMA'd HBM -> VMEM inside the kernel.
  * Front-to-back alpha compositing with gsplat gating parity: alpha floor
    1/255, ceiling 0.999, sigma >= 0, contribution gated by T_next > 1e-4.
  * Early-out: a tile stops fetching chunks once every pixel's transmittance
    is exhausted (opacity~1 depth scenes terminate after the first surface
    layer — the big win over the dense oracle).
  * Backward = same front-to-back walk, replaying transmittance and prefix
    sums, emitting per-SLOT gradients (each (gaussian, tile) slot owns a
    private column of the grad buffer — no atomics, unlike CUDA gsplat).
    Slot grads are scatter-added back to per-Gaussian grads by the autodiff
    transpose of the JAX-side gather (ops/rasterize.py), and the projection
    backward is plain JAX autodiff.

Record layout (R=16 rows x M columns, fp32; lane-major so one chunk is a
(16, CHUNK) VMEM block):
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
  5 depth, 6 opacity, 7 red, 8 green, 9 blue, 10..15 padding.
Gradient layout mirrors it: rows 0..9 are d/d(same field).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W

NUM_REC_ROWS = 16
CHUNK = 128
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4


def _interpret() -> bool:
    # Run compiled on the TPU (platform may report "tpu" or the axon plugin
    # name); interpret everywhere else (CPU tests / virtual-device meshes).
    return jax.devices()[0].platform == "cpu"


def _pixel_grid(ti, tj):
    # Mosaic requires integer iota; cast to f32 after.
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + ti.astype(jnp.float32) * TILE_H
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + tj.astype(jnp.float32) * TILE_W
        + 0.5
    )
    return px, py


def _alpha_at(scratch, j, px, py):
    """Evaluate one record's gated alpha over the pixel tile."""
    mx = scratch[0, j]
    my = scratch[1, j]
    ca = scratch[2, j]
    cb = scratch[3, j]
    cc = scratch[4, j]
    opa = scratch[6, j]
    dx = px - mx
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(opa * jnp.exp(-sigma), ALPHA_MAX)
    alpha = jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha, dx, dy, sigma


def _fwd_kernel(meta, records_hbm, r_out, g_out, b_out, d_out, a_out,
                scratch, sem):
    # meta[0] = global tile-row offset of this shard (0 single-device);
    # meta[1:] = tile_starts for the local grid.
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    # Mosaic requires provably 128-aligned HBM slice offsets: walk the
    # aligned window [base, end) and mask the unaligned head.
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_grid(ti + meta[0], tj)

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ones = jnp.ones((TILE_H, TILE_W), jnp.float32)

    def chunk_cond(carry):
        c, T, _accs = carry
        return (c < n_chunks) & (jnp.max(T) > T_EPS)

    def chunk_body(carry):
        c, T, accs = carry
        dma = pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(base + c * CHUNK, CHUNK)], scratch, sem
        )
        dma.start()
        dma.wait()
        lo = start - (base + c * CHUNK)  # mask head of first chunk
        hi = end - (base + c * CHUNK)

        def g_body(j, inner):
            T, (ar, ag, ab, ad, aa) = inner
            alpha, _dx, _dy, _sig = _alpha_at(scratch, j, px, py)
            alpha = jnp.where((j >= lo) & (j < hi), alpha, 0.0)
            t_next = T * (1.0 - alpha)
            w = jnp.where(t_next > T_EPS, T * alpha, 0.0)
            ar = ar + w * scratch[7, j]
            ag = ag + w * scratch[8, j]
            ab = ab + w * scratch[9, j]
            ad = ad + w * scratch[5, j]
            aa = aa + w
            return t_next, (ar, ag, ab, ad, aa)

        T, accs = jax.lax.fori_loop(0, CHUNK, g_body, (T, accs))
        return c + 1, T, accs

    _c, _T, (ar, ag, ab, ad, aa) = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), ones, (zeros,) * 5)
    )
    r_out[:, :] = ar
    g_out[:, :] = ag
    b_out[:, :] = ab
    d_out[:, :] = ad
    a_out[:, :] = aa


def _bwd_kernel(meta, records_hbm,
                tr, tg, tb, td, ta,  # forward totals per pixel
                gr, gg, gb, gd, ga,  # cotangents per pixel
                grad_out_hbm, scratch, gscr, state, sem, gsem):
    """Per-slot gradients, front-to-back replay.

    Every chunk of this tile's segment is WRITTEN (zeros once transmittance
    is exhausted) so the output buffer needs no pre-initialization; a tile's
    ceil-spill into the next segment is rewritten by the next (ascending)
    grid step — TPU pallas grids execute sequentially. Columns past the last
    real pair are masked to zero by the caller.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_grid(ti + meta[0], tj)

    c_tot_r = tr[:, :]
    c_tot_g = tg[:, :]
    c_tot_b = tb[:, :]
    c_tot_d = td[:, :]
    a_tot = ta[:, :]
    g_r = gr[:, :]
    g_g = gg[:, :]
    g_b = gb[:, :]
    g_d = gd[:, :]
    g_a = ga[:, :]

    # state rows: 0=T, 1..4=prefix rgbd, 5=prefix alpha  — lives in scratch so
    # the compute phase can be predicated off once the tile is exhausted.
    state[0] = jnp.ones((TILE_H, TILE_W), jnp.float32)
    for s in range(1, 6):
        state[s] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def chunk_body(c, _):
        chunk_col = base + c * CHUNK
        lo = start - chunk_col
        hi = end - chunk_col
        # The first chunk's head columns [base, start) belong to the PREVIOUS
        # tile's segment (already written, ascending grid order): read-modify-
        # write that chunk instead of zero-filling it.
        rmw = (c == 0) & (lo > 0)

        @pl.when(rmw)
        def _():
            dma_in = pltpu.make_async_copy(
                grad_out_hbm.at[:, pl.ds(chunk_col, CHUNK)], gscr, gsem
            )
            dma_in.start()
            dma_in.wait()

        @pl.when(jnp.logical_not(rmw))
        def _():
            # SMEM only takes scalar stores: zero the 10 live rows on the
            # scalar core (rows 10..15 are record padding; their cotangents
            # are dropped by the stack transpose in rasterize_pallas).
            def zero_col(jj, _):
                for rr in range(10):
                    gscr[rr, jj] = 0.0
                return 0

            jax.lax.fori_loop(0, CHUNK, zero_col, 0)

        alive = jnp.max(state[0]) > T_EPS

        @pl.when(alive)
        def _():
            dma = pltpu.make_async_copy(
                records_hbm.at[:, pl.ds(chunk_col, CHUNK)], scratch, sem
            )
            dma.start()
            dma.wait()

            def g_body(j, inner):
                T, sr, sg, sb, sd, sa = inner
                alpha, dx, dy, sigma = _alpha_at(scratch, j, px, py)
                in_seg = (j >= lo) & (j < hi)
                alpha = jnp.where(in_seg, alpha, 0.0)
                opa = scratch[6, j]
                col_r = scratch[7, j]
                col_g = scratch[8, j]
                col_b = scratch[9, j]
                dep = scratch[5, j]

                t_next = T * (1.0 - alpha)
                live = t_next > T_EPS
                w = jnp.where(live, T * alpha, 0.0)
                sr = sr + w * col_r
                sg = sg + w * col_g
                sb = sb + w * col_b
                sd = sd + w * dep
                sa = sa + w

                # dL/d(channel value) = sum_pix w * g_c
                d_col_r = jnp.sum(w * g_r)
                d_col_g = jnp.sum(w * g_g)
                d_col_b = jnp.sum(w * g_b)
                d_dep = jnp.sum(w * g_d)

                # dL/d(alpha): direct T*c_j term minus suffix correction
                inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
                d_alpha = (
                    g_r * (T * col_r - (c_tot_r - sr) * inv_om)
                    + g_g * (T * col_g - (c_tot_g - sg) * inv_om)
                    + g_b * (T * col_b - (c_tot_b - sb) * inv_om)
                    + g_d * (T * dep - (c_tot_d - sd) * inv_om)
                    + g_a * (T - (a_tot - sa) * inv_om)
                )
                d_alpha = jnp.where(live & (alpha > 0.0), d_alpha, 0.0)

                # alpha = min(o*exp(-sigma), 0.999): capped branch has 0 grad
                e_neg = jnp.exp(-sigma)
                capped = (opa * e_neg) > ALPHA_MAX
                d_alpha_eff = jnp.where(capped, 0.0, d_alpha)
                d_opa = jnp.sum(d_alpha_eff * e_neg)
                d_sigma = d_alpha_eff * (-alpha)
                # sigma = 0.5(a dx^2 + c dy^2) + b dx dy ; d(pix-mean) = -1
                cav = scratch[2, j]
                cbv = scratch[3, j]
                ccv = scratch[4, j]
                d_mx = -jnp.sum(d_sigma * (cav * dx + cbv * dy))
                d_my = -jnp.sum(d_sigma * (ccv * dy + cbv * dx))
                d_ca = jnp.sum(d_sigma * 0.5 * dx * dx)
                d_cb = jnp.sum(d_sigma * dx * dy)
                d_cc = jnp.sum(d_sigma * 0.5 * dy * dy)

                # guard: out-of-segment columns (c==0 head) hold the
                # previous tile's grads — don't touch them
                @pl.when(in_seg)
                def _():
                    gscr[0, j] = d_mx
                    gscr[1, j] = d_my
                    gscr[2, j] = d_ca
                    gscr[3, j] = d_cb
                    gscr[4, j] = d_cc
                    gscr[5, j] = d_dep
                    gscr[6, j] = d_opa
                    gscr[7, j] = d_col_r
                    gscr[8, j] = d_col_g
                    gscr[9, j] = d_col_b

                return t_next, sr, sg, sb, sd, sa

            init = (state[0], state[1], state[2], state[3], state[4], state[5])
            out = jax.lax.fori_loop(0, CHUNK, g_body, init)
            for s in range(6):
                state[s] = out[s]

        out_dma = pltpu.make_async_copy(
            gscr, grad_out_hbm.at[:, pl.ds(chunk_col, CHUNK)], gsem
        )
        out_dma.start()
        out_dma.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _pad_to_tiles(h: int, w: int):
    return -(-h // TILE_H) * TILE_H, -(-w // TILE_W) * TILE_W


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles(sorted_records, meta, n_ty, n_tx, m_pad):
    """Composite sorted slot records into tiled images.

    sorted_records: (16, M_pad) fp32 (layout in module docstring).
    meta: (n_ty*n_tx + 2,) int32 = [tile_row_offset, *tile_starts] — the
      offset is the shard's first global tile row (0 when unsharded), letting
      shard_map hand each device a contiguous band of tile rows.
    Returns (r, g, b, depth_acc, alpha), each (n_ty*TILE_H, n_tx*TILE_W)
    covering the LOCAL tile band. Gradients flow to sorted_records
    (slot-wise; no atomics needed).
    """
    return _composite_fwd_impl(sorted_records, meta, n_ty, n_tx, m_pad)


def _composite_fwd_impl(sorted_records, meta, n_ty, n_tx, m_pad):
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    out_shape = [jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))
        ] * 5,
        scratch_shapes=[
            pltpu.SMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(meta, sorted_records)


def _composite_fwd(sorted_records, meta, n_ty, n_tx, m_pad):
    outs = _composite_fwd_impl(sorted_records, meta, n_ty, n_tx, m_pad)
    return outs, (sorted_records, meta, outs)


def _composite_bwd(n_ty, n_tx, m_pad, res, cotangents):
    sorted_records, meta, outs = res
    gr, gg, gb, gd, ga = cotangents
    grad_records = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_REC_ROWS, m_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))] * 10,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            grid=(n_ty, n_tx),
            scratch_shapes=[
                pltpu.SMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.SMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((6, TILE_H, TILE_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_interpret(),
    )(
        meta, sorted_records,
        outs[0], outs[1], outs[2], outs[3], outs[4],
        gr, gg, gb, gd, ga,
    )
    # Mask to this shard's own column range: columns before the first local
    # tile belong to another shard's buffer (RMW head reads garbage there on
    # device boundaries), columns past the last real pair are never owned.
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    grad_records = jnp.where(
        (cols >= meta[1]) & (cols < meta[-1]), grad_records, 0.0
    )
    return grad_records, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def rasterize_pallas(
    mean2d: jnp.ndarray,  # (N, 2)
    conic: jnp.ndarray,  # (N, 3)
    depth: jnp.ndarray,  # (N,)
    opacity: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,  # (N, C) C in {0, 3}
    valid: jnp.ndarray,  # (N,) bool
    radius: jnp.ndarray,  # (N,) int32
    width: int,
    height: int,
    exact_sort: bool = False,
    mesh=None,
):
    """Tile-binned Pallas render. Returns (image (H, W, C+1), alpha (H, W));
    the last image channel is UNNORMALIZED accumulated depth (caller divides
    by alpha — shared with the oracle path in ops/rasterize.py).
    """
    from .binning import bin_and_sort

    n = mean2d.shape[0]
    binning = bin_and_sort(
        mean2d, radius, depth, valid, width, height,
        tile_h=TILE_H, tile_w=TILE_W, chunk=CHUNK, exact_sort=exact_sort,
    )
    if colors.shape[1] == 0:
        colors3 = jnp.zeros((n, 3), mean2d.dtype)
    else:
        colors3 = colors

    rows = [
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        depth, opacity,
        colors3[:, 0], colors3[:, 1], colors3[:, 2],
    ]
    records = jnp.stack(
        rows + [jnp.zeros_like(depth)] * (NUM_REC_ROWS - len(rows)), axis=0
    )  # (16, N)
    sorted_records = jnp.take(records, binning.pair_gauss, axis=1)
    m_pad = sorted_records.shape[1]

    if mesh is None:
        meta = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), binning.tile_starts]
        )
        r, g, b, d_acc, alpha = composite_tiles(
            sorted_records, meta, binning.n_tiles_y, binning.n_tiles_x, m_pad
        )
    else:
        from ..parallel.sharded import sharded_composite

        d = mesh.shape["tiles"]
        n_ty = -(-binning.n_tiles_y // d) * d  # pad tile rows to mesh size
        extra = n_ty * binning.n_tiles_x - (binning.n_tiles_y * binning.n_tiles_x)
        tile_starts = jnp.concatenate(
            [binning.tile_starts,
             jnp.broadcast_to(binning.tile_starts[-1], (extra,))]
        )  # padded rows are empty tiles
        r, g, b, d_acc, alpha = sharded_composite(
            sorted_records, tile_starts, n_ty, binning.n_tiles_x, mesh
        )
    if colors.shape[1] == 0:
        image = d_acc[:height, :width, None]
    else:
        image = jnp.stack(
            [r[:height, :width], g[:height, :width], b[:height, :width],
             d_acc[:height, :width]],
            axis=-1,
        )
    return image, alpha[:height, :width]
