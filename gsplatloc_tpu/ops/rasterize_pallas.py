"""Pallas TPU tile rasterizer: blocked VPU/MXU forward + analytic backward.

TPU-native replacement for gsplat's CUDA rasterize_to_pixels fwd/bwd kernels
(consumed by the reference at src/my_gsplat/model.py:195-213; math spec
/root/reference/docs/main.md:148-212). Design (not a CUDA translation):

  * A chunk of C=128 depth-sorted Gaussians is evaluated against all P=2048
    tile pixels at once: dx/dy are (C, P) outer differences (direct form --
    an expanded bilinear basis loses ~1e-3 of sigma to fp32 cancellation
    near splat centers, which the sigma>=0 cull gate amplifies into dropped
    splats); sigma/alpha are a handful of (C, P) VPU ops with per-Gaussian
    (C, 1) broadcasts.
  * Front-to-back transmittance = cumulative product along the sorted-
    Gaussian (sublane) axis -- log2(C) doubling steps (Hillis-Steele).
  * Channel accumulation and channel gradients are MXU contractions over C;
    conic/mean gradients are lane-axis moment reductions of d_sigma; the
    suffix term of d_alpha collapses to ONE running cumsum via
    Phi = sum_ch c_ch * cotangent_ch.
  * Record buffer is (16, M_pad) fp32 (field rows x slot columns): HBM
    stays dense, chunks DMA as (16, 128) blocks and transpose in-register
    to the (C, 16) record matrix (Mosaic supports the transpose relayout;
    an (M, 16) row layout would be lane-padded 16->128 by TPU tiling = 8x
    HBM waste, and in-register reshapes between the two are unsupported).
    The buffer is built by per-field 1-D gathers -- no big XLA transpose.
  * The forward emits a per-tile chunks-done count; the backward walks only
    the chunks the forward touched (transmittance early-out) and unwritten
    slot columns are masked OUTSIDE the kernel from that coverage -- no
    dead-chunk zero-writing (which cost ~50 ms/frame at 816k Gaussians).
  * Backward emits per-SLOT gradients -- each (gaussian, tile) slot owns a
    private column, no atomics (CUDA gsplat needs them). Slots fold back to
    per-Gaussian gradients by an INVERSE-PERMUTATION row gather
    (ops/binning.py) + a KMAX-way sum: the general scatter-add that the
    gather transpose would emit costs ~370 ms on v5e; the permutation
    gather is bandwidth-bound.

Gating parity with gsplat: alpha floor 1/255, ceiling 0.999, sigma >= 0,
contribution gated by T_next > 1e-4.

Record fields (16 fp32 per slot): 0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b,
4 conic_c, 5 depth, 6 opacity, 7 red, 8 green, 9 blue, 10..15 padding.
Gradients mirror fields 0..9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W

NUM_REC_ROWS = 16
# 128-slot chunks. CHUNK=256 looks better on paper (the Hillis-Steele scans
# cost log2(C)/C per pair: 8/256 vs 7/128) but measured 7% SLOWER on v5e
# (83.3 vs 77.6 ms/step at the 816k bench) — larger live (C, P) arrays cost
# more in VMEM pressure/relayout than the scan saves.
CHUNK = 128
P = TILE_H * TILE_W  # pixels per tile, flattened on the lane axis
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4
F32 = jnp.float32


def _interpret() -> bool:
    # Compiled on the TPU (platform may report "tpu" or a TPU-plugin name
    # like "axon" — unknown names are assumed TPU-like and compiled);
    # interpreted on the known non-TPU backends (CPU tests / virtual-device
    # meshes / GPU, where Mosaic kernels cannot lower).
    return jax.devices()[0].platform.lower() in (
        "cpu", "gpu", "cuda", "rocm", "metal")


def _dotf(a, b, dims, precision=jax.lax.Precision.HIGHEST):
    """f32-accurate MXU contraction. TPU f32 dots default to ONE bf16 pass
    (8 mantissa bits); CPU dots are true f32, so CPU tests cannot see the
    difference. Measured on-chip (round-1 parity FAIL, runs/tpu_session_r1c):
    the sub-tile sigma polynomial contraction (terms up to ~1e3 recombining
    to O(1)) came back with O(1) absolute sigma error — alpha gates flipped,
    fwd depth off by 1.8, pose grads up to 10x — and the full-tile moment
    matmul (monomials up to 128^2) carried up to ~14% error on cancelling
    gradient elements. Every contraction through this helper is
    correctness-sensitive (sigma, payload accumulation, cotangent
    projections, pixel-moment reductions), so pin true f32; the MXU FLOPs
    here are k <= 256 with tiny output tiles, far below the per-chunk VPU
    scan cost."""
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=F32,
                               precision=precision)


def _pixel_xy(ti, tj):
    """Pixel-center coordinates (1, P) for the tile, flattened row-major."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row = (flat // TILE_W).astype(F32)
    col = (flat % TILE_W).astype(F32)
    y = row + ti.astype(F32) * TILE_H + 0.5
    x = col + tj.astype(F32) * TILE_W + 0.5
    return x, y


def _alphas(rec_t, x, y, slot0, lo, hi):
    """Gated alpha for one chunk from the (C, 16) record matrix.

    Returns (alpha (C, P), in_seg (C, 1), dx (C, P), dy (C, P)).
    """
    mx = rec_t[:, 0:1]
    my = rec_t[:, 1:2]
    ca = rec_t[:, 2:3]
    cb = rec_t[:, 3:4]
    cc = rec_t[:, 4:5]
    opa = rec_t[:, 6:7]
    dx = x - mx  # (C, P)
    dy = y - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(opa * jnp.exp(-sigma), ALPHA_MAX)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + slot0
    in_seg = (rows >= lo) & (rows < hi)  # (C, 1)
    ok = in_seg & (sigma >= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(ok, alpha, 0.0), in_seg, dx, dy


def _scan_mul(x, p=P):
    """Inclusive cumulative product along axis 0 (C sublanes), Hillis-Steele.

    NOTE: a triangular-matrix MXU formulation (cumsum as (C, C) @ (C, P)
    at HIGHEST precision, cumprod via exp(cumsum(log))) measured WORSE on
    v5e: fwd 16.0 -> 20.2 ms, bwd 22.3 -> 31.7 ms at the 816k bench — the
    x6 bf16 passes + log/exp transcendentals cost more than the 7 serial
    sublane-shifted multiplies they replace. Keep Hillis-Steele."""
    k = 1
    while k < CHUNK:
        x = x * jnp.concatenate([jnp.ones((k, p), F32), x[:-k]], axis=0)
        k *= 2
    return x


def _scan_add(x, p=P):
    """Inclusive cumulative sum along axis 0 (see _scan_mul note)."""
    k = 1
    while k < CHUNK:
        x = x + jnp.concatenate([jnp.zeros((k, p), F32), x[:-k]], axis=0)
        k *= 2
    return x


def _channels_t(rec_t):
    """(C, 5): [r, g, b, depth, 1] payload columns."""
    return jnp.concatenate(
        [rec_t[:, 7:10], rec_t[:, 5:6], jnp.ones((CHUNK, 1), F32)], axis=1
    )


def _fwd_kernel(meta, records_hbm, r_out, g_out, b_out, d_out, a_out, cd_out,
                rec_scr, sem):
    # meta[0] = global tile-row offset of this shard; meta[1:] = tile_starts.
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_xy(ti + meta[0], tj)

    def chunk_cond(carry):
        c, t_cur, _acc = carry
        return (c < n_chunks) & (jnp.max(t_cur) > T_EPS)

    def chunk_body(carry):
        c, t_cur, acc = carry
        chunk_col = base + c * CHUNK
        dma = pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(chunk_col, CHUNK)], rec_scr, sem
        )
        dma.start()
        dma.wait()
        rec_t = rec_scr[:, :].T  # (C, 16)
        alpha, _seg, _dx, _dy = _alphas(rec_t, px, py, chunk_col, start, end)
        one_minus = 1.0 - alpha
        incl = _scan_mul(one_minus)
        excl = jnp.concatenate([jnp.ones((1, P), F32), incl[:-1]], axis=0)
        live = (t_cur * incl) > T_EPS
        w = jnp.where(live, t_cur * excl * alpha, 0.0)
        acc = acc + _dotf(_channels_t(rec_t), w, (((0,), (0,))))  # (5, P)
        return c + 1, t_cur * incl[CHUNK - 1:CHUNK], acc

    c_done, _t, acc = jax.lax.while_loop(
        chunk_cond, chunk_body,
        (jnp.int32(0), jnp.ones((1, P), F32), jnp.zeros((5, P), F32)),
    )
    r_out[:, :] = acc[0].reshape(TILE_H, TILE_W)
    g_out[:, :] = acc[1].reshape(TILE_H, TILE_W)
    b_out[:, :] = acc[2].reshape(TILE_H, TILE_W)
    d_out[:, :] = acc[3].reshape(TILE_H, TILE_W)
    a_out[:, :] = acc[4].reshape(TILE_H, TILE_W)
    cd_out[t] = c_done  # SMEM scalar store


def _bwd_kernel(meta, records_hbm,
                tr, tg, tb, td, ta,  # forward totals per pixel
                gr, gg, gb, gd, ga,  # cotangents per pixel
                grad_out_hbm, rec_scr, gscr, sem, gsem):
    """Per-slot gradients, front-to-back replay.

    Walks exactly the chunks the forward touched (same transmittance
    early-out); columns the walk never writes are masked to zero by the
    caller from the forward's coverage map. The first chunk's head columns
    belong to the previous tile (ascending sequential grid) and are
    read-modify-written.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_xy(ti + meta[0], tj)

    def flat(x):
        return x[:, :].reshape(1, P)

    gcot = jnp.concatenate([flat(gr), flat(gg), flat(gb), flat(gd), flat(ga)], 0)
    tot = jnp.concatenate([flat(tr), flat(tg), flat(tb), flat(td), flat(ta)], 0)
    # G_tot[p] = sum_ch gcot*total -- all-Gaussian Phi-weighted mass
    g_tot = jnp.sum(gcot * tot, axis=0, keepdims=True)  # (1, P) (5 rows only)

    # tile-local monomial basis [1, x, y, x^2, xy, y^2]: every pixel-moment
    # reduction sum_p f * dx^i dy^j collapses into ONE (2C, P) @ (P, 6) MXU
    # contraction (tile-local coords keep the expansion's fp32 cancellation
    # ~3e-4 relative; global coords would lose ~5 digits — see the fused
    # kernel, ops/fused_tracking.py)
    x0 = (tj * TILE_W).astype(F32)
    y0 = ((ti + meta[0]) * TILE_H).astype(F32)
    xl = px - x0
    yl = py - y0
    mono = jnp.concatenate(
        [jnp.ones((1, P), F32), xl, yl, xl * xl, xl * yl, yl * yl], axis=0
    )  # (6, P)

    def live_cond(carry):
        c, t_cur, _run = carry
        return (c < n_chunks) & (jnp.max(t_cur) > T_EPS)

    def live_body(carry):
        c, t_in, wdw_run = carry
        chunk_col = base + c * CHUNK
        lo = start - chunk_col
        rmw = (c == 0) & (lo > 0)

        # head columns of the first chunk belong to the previous tile -- RMW
        @pl.when(rmw)
        def _():
            dma_in = pltpu.make_async_copy(
                grad_out_hbm.at[:, pl.ds(chunk_col, CHUNK)], gscr, gsem
            )
            dma_in.start()
            dma_in.wait()

        @pl.when(jnp.logical_not(rmw))
        def _():
            gscr[:, :] = jnp.zeros((NUM_REC_ROWS, CHUNK), F32)

        dma = pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(chunk_col, CHUNK)], rec_scr, sem
        )
        dma.start()
        dma.wait()
        rec_t = rec_scr[:, :].T  # (C, 16)
        alpha, in_seg, dx, dy = _alphas(rec_t, px, py, chunk_col, start, end)
        one_minus = 1.0 - alpha
        incl = _scan_mul(one_minus)
        excl = jnp.concatenate([jnp.ones((1, P), F32), incl[:-1]], axis=0)
        t_prefix = t_in * excl  # T before each gaussian
        live = (t_in * incl) > T_EPS
        w = jnp.where(live, t_prefix * alpha, 0.0)
        t_next = t_in * incl[CHUNK - 1:CHUNK]

        ch_t = _channels_t(rec_t)  # (C, 5)
        # Phi[g,p] = sum_ch c[g,ch] gcot[ch,p]
        phi = _dotf(ch_t, gcot, (((1,), (0,))))  # (C, P)
        wdw = w * phi
        s_incl = _scan_add(wdw) + wdw_run  # tile-global inclusive prefix
        suffix = g_tot - s_incl  # sum_{k>g} w_k Phi_k
        inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_MAX)
        d_alpha = t_prefix * phi - suffix * inv_om
        d_alpha = jnp.where(live & (alpha > 0.0), d_alpha, 0.0)
        # ceiling gate: alpha = min(o*exp(-sigma), 0.999)
        d_alpha = jnp.where(alpha >= ALPHA_MAX, 0.0, d_alpha)
        d_sigma = d_alpha * (-alpha)  # d(alpha)/d(sigma) = -alpha (uncapped)

        # d_channels (C, 5) = w @ gcot^T (MXU)
        dch = _dotf(w, gcot, (((1,), (1,))))  # (C, 5)

        # per-gaussian pixel moments: one stacked MXU contraction against the
        # tile-local monomial basis (dsx = d_sigma*(x - mx) etc. expand
        # exactly into these moments), then (C, 1) column recombination
        av = rec_t[:, 2:3]
        bv = rec_t[:, 3:4]
        cv = rec_t[:, 4:5]
        opa = jnp.maximum(rec_t[:, 6:7], 1e-12)
        stacked = jnp.concatenate([d_sigma, d_alpha * alpha], axis=0)
        mom = _dotf(stacked, mono, (((1,), (1,))))  # (2C, 6)
        m0 = mom[0:CHUNK, 0:1]
        m_x = mom[0:CHUNK, 1:2]
        m_y = mom[0:CHUNK, 2:3]
        m_xx = mom[0:CHUNK, 3:4]
        m_xy = mom[0:CHUNK, 4:5]
        m_yy = mom[0:CHUNK, 5:6]
        u_l = rec_t[:, 0:1] - x0
        v_l = rec_t[:, 1:2] - y0
        s1 = m_x - u_l * m0
        s2 = m_y - v_l * m0
        d_a = 0.5 * (m_xx - 2.0 * u_l * m_x + u_l * u_l * m0)
        d_b = m_xy - u_l * m_y - v_l * m_x + u_l * v_l * m0
        d_c = 0.5 * (m_yy - 2.0 * v_l * m_y + v_l * v_l * m0)
        d_mx = -(av * s1 + bv * s2)
        d_my = -(cv * s2 + bv * s1)
        # d(alpha)/d(opa) = alpha/opa (uncapped; gates already in d_alpha)
        d_opa = mom[CHUNK:, 0:1] / opa

        gcols = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c,
             dch[:, 3:4], d_opa, dch[:, 0:1], dch[:, 1:2], dch[:, 2:3],
             jnp.zeros((CHUNK, NUM_REC_ROWS - 10), F32)],
            axis=1,
        )  # (C, 16)
        # head columns keep the RMW'd previous-tile values
        merged = jnp.where(in_seg, gcols, gscr[:, :].T)
        gscr[:, :] = merged.T

        out_dma = pltpu.make_async_copy(
            gscr, grad_out_hbm.at[:, pl.ds(chunk_col, CHUNK)], gsem
        )
        out_dma.start()
        out_dma.wait()
        # running prefix as an MXU matvec (cross-sublane jnp.sum is the #1
        # measured VPU trap — ~150 ms/frame for two per-chunk sums)
        wdw_sum = _dotf(jnp.ones((1, CHUNK), F32), wdw, (((1,), (0,))))
        return c + 1, t_next, wdw_run + wdw_sum

    jax.lax.while_loop(
        live_cond, live_body,
        (jnp.int32(0), jnp.ones((1, P), F32), jnp.zeros((1, P), F32)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles(packed_records, meta, n_ty, n_tx, m_pad):
    """Composite sorted slot records into tiled images.

    packed_records: (16, M_pad) fp32 -- field rows x sorted slot columns
      (see module docstring).
    meta: (n_ty*n_tx + 2,) int32 = [tile_row_offset, *tile_starts] -- the
      offset is the shard's first global tile row (0 when unsharded), letting
      shard_map hand each device a contiguous band of tile rows.
    Returns (r, g, b, depth_acc, alpha), each (n_ty*TILE_H, n_tx*TILE_W)
    covering the LOCAL tile band. Gradients flow to packed_records
    (slot-wise; no atomics needed).
    """
    outs = _composite_fwd_impl(packed_records, meta, n_ty, n_tx, m_pad)
    return tuple(outs[:5])


def _composite_fwd_impl(packed_records, meta, n_ty, n_tx, m_pad):
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    out_shape = [jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 5 + [
        jax.ShapeDtypeStruct((n_ty * n_tx,), jnp.int32)  # chunks done
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(meta, packed_records)


def _composite_fwd(packed_records, meta, n_ty, n_tx, m_pad):
    outs = _composite_fwd_impl(packed_records, meta, n_ty, n_tx, m_pad)
    return tuple(outs[:5]), (packed_records, meta, outs)


def _composite_bwd(n_ty, n_tx, m_pad, res, cotangents):
    packed_records, meta, outs = res
    chunks_done = outs[5]
    gr, gg, gb, gd, ga = cotangents
    grad_packed = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_REC_ROWS, m_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))] * 10,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            grid=(n_ty, n_tx),
            scratch_shapes=[
                pltpu.VMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((NUM_REC_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_interpret(),
    )(
        meta, packed_records,
        outs[0], outs[1], outs[2], outs[3], outs[4],
        gr, gg, gb, gd, ga,
    )
    # Mask to what the walk actually wrote: this shard's column range AND
    # within each tile's forward coverage (slots past the transmittance
    # early-out have zero gradient but hold unwritten-HBM garbage).
    starts = meta[1:]
    base_t = (starts[:-1] // CHUNK) * CHUNK
    cov_end = base_t + chunks_done.reshape(-1) * CHUNK
    cols = jnp.arange(m_pad, dtype=jnp.int32)
    tile_of_col = jnp.clip(
        jnp.searchsorted(starts, cols, side="right") - 1, 0,
        starts.shape[0] - 2,
    )
    live = (
        (cols >= starts[0]) & (cols < starts[-1]) & (cols < cov_end[tile_of_col])
    )
    grad_packed = jnp.where(live[None, :], grad_packed, 0.0)
    return grad_packed, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_slots(records, pair_gauss, inv_perm, kmax):
    """Gather per-Gaussian records (N, 16) into the sorted slot buffer
    (16, M_pad): one contiguous 64-byte row gather + one transpose (separate
    1-D per-field gathers cost ~16x more on TPU). The backward is an
    INVERSE-PERMUTATION row gather + a kmax-way sum -- bandwidth-bound,
    instead of the ~370 ms serialized scatter-add XLA emits for the gather
    transpose at this scale."""
    return jnp.take(records, pair_gauss, axis=0).T  # (16, M_pad)


def _gather_fwd(records, pair_gauss, inv_perm, kmax):
    out = gather_slots(records, pair_gauss, inv_perm, kmax)
    return out, (records.shape[0], pair_gauss, inv_perm)


def _gather_bwd(kmax, res, cot):
    n, pair_gauss, inv_perm = res
    per_pair = jnp.take(cot.T, inv_perm, axis=0)  # (M, 16) in pair order
    return per_pair.reshape(n, kmax, NUM_REC_ROWS).sum(axis=1), None, None


gather_slots.defvjp(_gather_fwd, _gather_bwd)


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
    by alpha -- shared with the oracle path in ops/rasterize.py).
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
        rows + [jnp.zeros_like(depth)] * (NUM_REC_ROWS - len(rows)), axis=1
    )  # (N, 16)
    kmax = binning.inv_perm.shape[0] // n
    packed = gather_slots(records, binning.pair_gauss, binning.inv_perm, kmax)
    m_pad = packed.shape[1]

    if mesh is None:
        meta = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), binning.tile_starts]
        )
        r, g, b, d_acc, alpha = composite_tiles(
            packed, meta, binning.n_tiles_y, binning.n_tiles_x, m_pad
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
            packed, tile_starts, n_ty, binning.n_tiles_x, mesh
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
