"""Phase-split sub-tile tracking rasterizer: (16, 16) pixel sub-tiles.

Same math and gating as ops/fused_tracking.py (pose-only backward over a
frozen scene), re-pipelined so the Pallas kernels run ONLY the work that is
per-(slot, pixel) — the per-slot (1, C) row algebra that dominated the
in-kernel version (~20 ms/step of ~34k chunk iterations x ~230 VPU row ops,
docs/PERFORMANCE.md) moves into two fused XLA passes over the whole slot
buffer:

  1. PROJECT (XLA, once per step): `_project_slots` over the full (8, M)
     slot buffer -> an (8, M) buffer [u, v, ca, cb, cc, qz, opa, ok]. The
     kernels DMA 8 rows per chunk instead of 16 and do zero projection math.
  2. COMPOSITE fwd / REPLAY bwd (Pallas): dense (C, P) alpha evaluation,
     transmittance scans, and the monomial moment matmul. The backward
     kernel EMITS the 7 per-slot pixel moments (6 of d_sigma + the direct
     depth term) to an (8, M) HBM buffer instead of running the pose chain
     per chunk.
  3. CHAIN (XLA, once per step): recompute projection intermediates and run
     `_pose_chain` over all M slots at once (it is linear in the moments),
     reducing to the 12 pose partials. Slot sub-tile origins — the EXACT
     tile-local monomial frame the kernel binned moments in — are
     reconstructed per chunk from the segment offsets (chunk-aligned
     segments make the origin constant per chunk).

Correctness requires segment-EXCLUSIVE moment chunks: binning pads every
segment to a CHUNK multiple (ops/binning.py pad_to_chunks; dead slots point
at a zero-opacity dummy record, so their alpha and moments are exactly 0).
Chunks skipped by the transmittance early-out are zero-filled (their true
pose gradient is 0 within T_EPS — same argument as the early-out itself),
and the chain masks slots outside [meta[1], meta[-1]) (the unwalked static
tail, and on the sharded path the other devices' segment ranges).

Sub-tile layout (Mosaic-safe, see git history for the in-kernel-projection
(16, 32) version):

  * kernel grid = one step per (16, 128) MACRO tile; the N_SUB sub-tile
    segments are walked by an in-kernel fori_loop; sub-tile s of macro tile
    t is segment t*N_SUB+s — contiguous in the row-major (16, SUB_W) tile
    order, so `meta` is just the (padded) tile_w=SUB_W binning offsets.
  * per-sub-tile pixels are (1, P_SUB) rows flattened r*SUB_W+c, DMA'd as
    (8, P_SUB) blocks to a flat HBM image at column offset st*P_SUB
    (always P_SUB-aligned); (H, W) is recovered by unscramble_image.
  * the backward's four pixel inputs (fwd depth/alpha totals + cotangents)
    ride ONE (8, M_out) scrambled array in the same layout.

Reference parity: same alpha gating, transmittance early-out, and pose
gradient as the full-tile fused path (validated against it and the dense
oracle in tests/test_fused_subtile.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, bin_and_sort
from .fused_tracking import (
    _pose_chain,
    _project8_rows,
    _project_slots,
    cam_vector,
)
from .fused_tracking import NUM_ISO_ROWS
from .rasterize_pallas import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    T_EPS,
    F32,
    _dotf,
    _interpret,
    _scan_add,
    _scan_mul,
)

# Sub-tile width (pixels). 16 is the measured default; 8 halves the
# per-pixel pair evaluations again at the cost of kx=3 slot emission
# (a 2r<=16 px footprint can straddle three 8 px columns) and ~45% more
# sort/gather work per rebuild — env knob for perf experiments.
SUB_W = int(os.environ.get("GSPLATLOC_SUB_W", "16"))
if SUB_W not in (8, 16, 32, 64, 128):
    # must divide TILE_W (or segment ids silently desync from the binning
    # columns) and keep P_SUB 128-lane aligned; < 8 also breaks the kx
    # footprint cover for clamped 2r = 16 px splats
    raise ValueError(f"GSPLATLOC_SUB_W={SUB_W} unsupported "
                     "(one of 8, 16, 32, 64, 128)")
KX_SUB = 2 if SUB_W >= 16 else 3  # horizontal slots: tile_w*(kx-1)/2 >= r
# Sub-tile height (pixels). 16 spans the full macro tile (the measured
# round-1 default); 8 HALVES the slot-pixel pair evaluations (each slot
# meets 128 px instead of 256) at the cost of the vertical footprint
# cover: ky=3 emission (+50% sort/gather M) keeps the 8 px radius clamp,
# GSPLATLOC_KY=2 keeps M flat but clamps footprints at 4 px.
SUB_H = int(os.environ.get("GSPLATLOC_SUB_H", "16"))
if SUB_H not in (8, 16) or TILE_H % SUB_H:
    raise ValueError(f"GSPLATLOC_SUB_H={SUB_H} unsupported (8 or 16)")
KY_SUB = 2 if SUB_H >= 16 else int(os.environ.get("GSPLATLOC_KY", "3"))
N_SUB_X = TILE_W // SUB_W
N_SUB_Y = TILE_H // SUB_H
N_SUB = N_SUB_Y * N_SUB_X  # sub-tiles per macro tile
P_SUB = SUB_H * SUB_W  # pixels per sub-tile
if P_SUB % 128:
    raise ValueError(f"P_SUB={P_SUB} must be 128-lane aligned")
NUM_PROJ_ROWS = 8  # [u, v, ca, cb, cc, qz, opa, ok]
CB = 8192  # lane-block width of the project/chain phase kernels
# project/chain phase implementation. Standalone (dispatch-subtracted)
# timings suggested the XLA forms beat the Pallas kernels under iso
# records, but the IN-LOOP A/B at the 816k bench says otherwise: whole
# tracking step 44.5 ms/step with Pallas phases vs 47.4 with XLA
# (runs/tpu_session_r2a/bench_momswap_*.log — standalone medians carry
# +/-7 ms relay-dispatch noise; trust the amortized loop). Default pallas.
_PHASE_IMPL = os.environ.get("GSPLATLOC_PHASE_IMPL", "pallas")
ENC_Y = 4096.0  # mom row 7 origin packing: enc = ty*4096 + (tj*N_SUB+s)


def _sub_mono():
    """Tile-LOCAL monomial basis (6, P_SUB) [1, x, y, x^2, xy, y^2] at the
    sub-tile pixel centers, flattened r*SUB_W+c. Local coords are
    (col + 0.5, row + 0.5) — identical for every sub-tile, and fp-exact
    equal to (px - x0, py - y0) for the global pixel centers px/py and the
    sub-tile origin x0/y0 (all integers < 2^24), which is what the chain
    pass assumes when it converts moments back with u_l = u - x0."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, P_SUB), 1)
    yl = (flat // SUB_W).astype(F32) + 0.5
    xl = (flat % SUB_W).astype(F32) + 0.5
    return jnp.concatenate(
        [jnp.ones((1, P_SUB), F32), xl, yl, xl * xl, xl * yl, yl * yl],
        axis=0,
    )


# Scan implementation knobs (perf experiments, scripts/perf_scan.py):
# the two inclusive scans along the 128-slot sublane axis dominate the
# per-pair VPU cost (7 Hillis-Steele rounds each). "mxu" runs the cumsum
# as one lower-triangular HIGH-precision (bf16x3 ~ f32) MXU pass;
# "mxulog" runs the cumprod as exp(cumsum(log)). Defaults: measured forms.
_SCAN_ADD = os.environ.get("GSPLATLOC_SCAN_ADD", "hillis")
_SCAN_MUL = os.environ.get("GSPLATLOC_SCAN_MUL", "hillis")


def _make_tri():
    """Lower-triangular ones (CHUNK, CHUNK), built once per kernel call and
    kept VMEM-resident across the chunk loops. None when unused."""
    if _SCAN_ADD == "hillis" and _SCAN_MUL == "hillis":
        return None
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r >= c).astype(F32)


def _tri_dot(tri, x):
    return jax.lax.dot_general(
        tri, x, dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST,
    )


def _scan_add_k(x, tri):
    if _SCAN_ADD == "mxu":
        return _tri_dot(tri, x)
    return _scan_add(x, P_SUB)


def _scan_mul_k(x, tri):
    if _SCAN_MUL == "mxulog":
        return jnp.exp(_tri_dot(tri, jnp.log(jnp.maximum(x, 1e-30))))
    return _scan_mul(x, P_SUB)


# fp-noise slack for the (analytically >= 0) MXU-expanded sigma: the
# expansion recombines terms up to ~1e3 in magnitude for contributing
# pairs, so sigma == 0 at a splat center can come back as a few 1e-4
# negative. The original `sigma >= 0` gate only guards broken conics
# (det <= 0), which _project8 already folds into opa via `ok`.
SIG_EPS = 1e-2


def _coeff_mat(rec8, x0, y0):
    """(8, C) pre-projected chunk -> (C, 8) per-slot columns: 0-5 the
    TILE-LOCAL sigma polynomial coefficients [c0, cx, cy, cxx, cxy, cyy],
    6 qz, 7 the validity-folded opacity (opa * ok).

    sigma = 0.5*(ca*dx^2 + cc*dy^2) + cb*dx*dy with dx = px - u expands
    exactly into a quadratic in the tile-local pixel coords
    (xl, yl) = (px - x0, py - y0) (global coords would lose ~5 of 7 fp32
    digits to cancellation — same argument as the backward moment basis):
    with ul = u - x0, vl = v - y0,
      c0  = 0.5*(ca*ul^2 + cc*vl^2) + cb*ul*vl
      cx  = -(ca*ul + cb*vl),  cy = -(cc*vl + cb*ul)
      cxx = 0.5*ca,  cxy = cb,  cyy = 0.5*cc.
    A dozen (1, C) row ops per chunk; the per-(slot, pixel) quadratic then
    becomes ONE MXU contraction against the monomial basis instead of ~11
    VPU ops per pair (docs/PERFORMANCE.md)."""
    u, v = rec8[0:1, :], rec8[1:2, :]
    ca, cb, cc = rec8[2:3, :], rec8[3:4, :], rec8[4:5, :]
    ul = u - x0
    vl = v - y0
    c0 = 0.5 * (ca * ul * ul + cc * vl * vl) + cb * ul * vl
    cx = -(ca * ul + cb * vl)
    cy = -(cc * vl + cb * ul)
    mat = jnp.concatenate(
        [c0, cx, cy, 0.5 * ca, cb, 0.5 * cc, rec8[5:6, :],
         rec8[6:7, :] * rec8[7:8, :]],
        axis=0,
    )  # (8, C)
    return mat.T  # (C, 8)


def _sub_alpha(mat, mono):
    """Gated alpha at P_SUB: sigma as VPU broadcast-fma of the (C, 1)
    coefficient columns against the (1, P_SUB) monomial rows.

    NOT a matmul: sigma needs true f32 (terms up to ~1e3 recombining to
    O(1) — the round-1 parity FAIL was this contraction at the TPU's
    default one-pass bf16), and a (C, 6) @ (6, P) dot runs the MXU at
    6/128 utilization x 6 passes for f32 emulation (measured +9 ms/step
    at the 816k bench). Six broadcasted fmas are VPU-native f32 and cost
    ~the same as the full-tile path's direct dx/dy form.
    Segment-membership gating is structural (padded segments own whole
    chunks; dead slots have opa = 0)."""
    sigma = (mat[:, 0:1]
             + mat[:, 1:2] * mono[1:2] + mat[:, 2:3] * mono[2:3]
             + mat[:, 3:4] * mono[3:4] + mat[:, 4:5] * mono[4:5]
             + mat[:, 5:6] * mono[5:6])  # (C, P_SUB)
    alpha = jnp.minimum(mat[:, 7:8] * jnp.exp(-sigma), ALPHA_MAX)
    ok = (sigma >= -SIG_EPS) & (alpha >= ALPHA_MIN)
    return jnp.where(ok, alpha, 0.0)


def _seg_id(ti_global, tj, n_tx, s):
    """Global-ROW-MAJOR sub-tile segment id for sub-walk s of macro tile
    (ti, tj): sub-tile rows interleave across macro columns when
    N_SUB_Y > 1, so ids are ordered by (sub-row, sub-col) over the image —
    a band of macro-tile rows still owns a contiguous id range (the
    sharded-path requirement). For N_SUB_Y == 1 this reduces to the
    round-1 layout t*N_SUB + s."""
    ry = s // N_SUB_X
    cx = jax.lax.rem(s, N_SUB_X)
    return (ti_global * N_SUB_Y + ry) * (n_tx * N_SUB_X) + tj * N_SUB_X + cx


def _sub_origin(ti_global, tj, s):
    """(x0, y0) pixel origin of sub-walk s's tile-local monomial frame."""
    ry = s // N_SUB_X
    cx = jax.lax.rem(s, N_SUB_X)
    x0 = ((tj * N_SUB_X + cx) * SUB_W).astype(F32)
    y0 = ((ti_global * N_SUB_Y + ry) * SUB_H).astype(F32)
    return x0, y0


def _subtile_fwd_kernel(meta, proj_hbm, out_hbm, cd_out,
                        rec_scr, out_scr, sem, osem):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj

    def _out_copy(s, slot):
        st_ = _seg_id(ti, tj, n_tx, s)
        return pltpu.make_async_copy(
            out_scr.at[slot],
            out_hbm.at[:, pl.ds(pl.multiple_of(st_ * P_SUB, P_SUB), P_SUB)],
            osem.at[slot],
        )

    mono = _sub_mono()  # (6, P_SUB), sub-tile independent
    tri = _make_tri()

    def sub_walk(s, _):
        st = _seg_id(ti, tj, n_tx, s)
        start = meta[1 + st]
        end = meta[2 + st]
        base = pl.multiple_of(start, CHUNK)
        n_chunks = (end - start) // CHUNK
        x0, y0 = _sub_origin(ti + meta[0], tj, s)

        def _copy(cidx, slot):
            return pltpu.make_async_copy(
                proj_hbm.at[:, pl.ds(base + cidx * CHUNK, CHUNK)],
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
            rec = rec_scr[slot]
            alpha = _sub_alpha(_coeff_mat(rec, x0, y0), mono)
            one_minus = 1.0 - alpha
            incl = _scan_mul_k(one_minus, tri)
            excl = jnp.concatenate(
                [jnp.ones((1, P_SUB), F32), incl[:-1]], axis=0
            )
            live = (t_cur * incl) > T_EPS
            w = jnp.where(live, t_cur * excl * alpha, 0.0)
            ch2 = jnp.concatenate(
                [rec[5:6, :], jnp.ones((1, CHUNK), F32)], axis=0
            )  # [qz, 1]
            acc = acc + _dotf(ch2, w, (((1,), (0,))), precision=jax.lax.Precision.HIGHEST)  # (2, P_SUB)
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
        # this buffer, write, start — overlaps the next sub-walk's chunks
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


def _subtile_bwd_kernel(meta, proj_hbm, sin_hbm, mom_hbm,
                        rec_scr, sin_scr, mom_scr, sem, ssem, msem):
    """Alpha replay + per-slot pixel moments over the N_SUB segments of one
    macro tile. No projection, no pose chain — those are XLA phases.

    sin_hbm (8, M_out) scrambled pixel rows: 0 depth_acc, 1 alpha (forward
    totals), 2 gd, 3 ga (cotangents). mom_hbm (8, M_slots): rows 0-5 the
    tile-local monomial moments of d_sigma [1, x, y, x^2, xy, y^2], row 6
    the direct depth term sum_p w*g_d, row 7 zero."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj

    def _sin_copy(s, slot):
        st_ = _seg_id(ti, tj, n_tx, s)
        return pltpu.make_async_copy(
            sin_hbm.at[:, pl.ds(pl.multiple_of(st_ * P_SUB, P_SUB), P_SUB)],
            sin_scr.at[slot], ssem.at[slot],
        )

    # prefetch sub-tile 0's pixel rows; walk s starts s+1's load before
    # its chunk loop so the (8, P_SUB) read hides behind compute
    _sin_copy(0, 0).start()

    mono = _sub_mono()  # (6, P_SUB), sub-tile independent
    tri = _make_tri()

    def sub_walk(s, _):
        st = _seg_id(ti, tj, n_tx, s)
        start = meta[1 + st]
        end = meta[2 + st]
        base = pl.multiple_of(start, CHUNK)
        n_chunks = (end - start) // CHUNK

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

        # sub-tile origin of the tile-LOCAL frame (fp32 conditioning) —
        # MUST match the per-chunk x0/y0 the chain pass reconstructs from
        # the segment offsets (_chain_xla). `mono` (hoisted above) is this
        # frame's monomial basis, shared by the alpha-replay MXU
        # contraction and the moment emission.
        x0, y0 = _sub_origin(ti + meta[0], tj, s)

        def _copy(cidx, slot):
            return pltpu.make_async_copy(
                proj_hbm.at[:, pl.ds(base + cidx * CHUNK, CHUNK)],
                rec_scr.at[slot], sem.at[slot],
            )

        def _mom_copy(cidx, slot):
            return pltpu.make_async_copy(
                mom_scr.at[slot],
                mom_hbm.at[:, pl.ds(pl.multiple_of(base + cidx * CHUNK,
                                                   CHUNK), CHUNK)],
                msem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            _copy(0, 0).start()

        def live_cond(carry):
            cidx, t_cur, _run = carry
            return (cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)

        def live_body(carry):
            cidx, t_in, wdw_run = carry
            slot = jax.lax.rem(cidx, 2)
            _copy(cidx + 1, 1 - slot).start()
            _copy(cidx, slot).wait()
            rec = rec_scr[slot]
            mat = _coeff_mat(rec, x0, y0)
            alpha = _sub_alpha(mat, mono)
            one_minus = 1.0 - alpha
            incl = _scan_mul_k(one_minus, tri)
            excl = jnp.concatenate(
                [jnp.ones((1, P_SUB), F32), incl[:-1]], axis=0
            )
            t_prefix = t_in * excl
            live = (t_in * incl) > T_EPS
            w = jnp.where(live, t_prefix * alpha, 0.0)
            t_next = t_in * incl[CHUNK - 1:CHUNK]

            phi = g_d * mat[:, 6:7] + g_a
            wdw = w * phi
            s_incl = _scan_add_k(wdw, tri) + wdw_run
            suffix = g_tot - s_incl
            inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_MAX)
            d_alpha = t_prefix * phi - suffix * inv_om
            d_alpha = jnp.where(live & (alpha > 0.0), d_alpha, 0.0)
            d_alpha = jnp.where(alpha >= ALPHA_MAX, 0.0, d_alpha)
            d_sigma = d_alpha * (-alpha)

            stacked = jnp.concatenate([d_sigma, w * g_d], axis=0)
            # (6, 2C) with mono as LHS: the 6-wide dim lands on SUBLANES
            # (6/8 occupancy) instead of lanes (6/128) — ~16x fewer MXU
            # passes than (2C, P) @ (P, 6) for the same f32 products
            momt = _dotf(mono, stacked, (((1,), (1,))),
                         precision=jax.lax.Precision.HIGHEST)  # (6, 2C)

            # ring-buffered moment store (uniform cidx indexing with the
            # zero-fill loop below; drained per walk)
            @pl.when(cidx >= 2)
            def _():
                _mom_copy(cidx - 2, slot).wait()

            # row 7 carries the sub-tile origin the moments are binned
            # in, packed as sub_row*ENC_Y + sub_col (exact in f32): the
            # chain kernel decodes it per slot instead of reconstructing
            # the chunk -> segment map. Zero-filled chunks need no origin
            # — the chain is linear in the (zero) moments.
            enc = (((ti + meta[0]) * N_SUB_Y + s // N_SUB_X)
                   * jnp.int32(ENC_Y)
                   + tj * N_SUB_X + jax.lax.rem(s, N_SUB_X)).astype(F32)
            mom_scr[slot] = jnp.concatenate(
                [momt[:, :CHUNK], momt[0:1, CHUNK:],
                 jnp.zeros((1, CHUNK), F32) + enc],
                axis=0,
            )
            _mom_copy(cidx, slot).start()

            wdw_sum = _dotf(jnp.ones((1, CHUNK), F32), wdw, (((1,), (0,))),
                            precision=jax.lax.Precision.HIGHEST)
            return cidx + 1, t_next, wdw_run + wdw_sum

        c_done, _t, _run = jax.lax.while_loop(
            live_cond, live_body,
            (jnp.int32(0), jnp.ones((1, P_SUB), F32),
             jnp.zeros((1, P_SUB), F32)),
        )

        @pl.when(c_done > 0)
        def _():
            _copy(c_done, jax.lax.rem(c_done, 2)).wait()

        # zero-fill chunks skipped by the transmittance early-out: their
        # true pose gradient is 0 within T_EPS (the early-out argument),
        # and the chain pass must not read uninitialized HBM
        def zero_body(cidx, _):
            slot = jax.lax.rem(cidx, 2)

            @pl.when(cidx >= 2)
            def _():
                _mom_copy(cidx - 2, slot).wait()

            mom_scr[slot] = jnp.zeros((NUM_PROJ_ROWS, CHUNK), F32)
            _mom_copy(cidx, slot).start()
            return 0

        jax.lax.fori_loop(c_done, n_chunks, zero_body, 0)

        # drain this walk's in-flight moment stores (the next walk writes
        # mom_scr[0] at its cidx=0 without a ring wait)
        @pl.when(n_chunks >= 2)
        def _():
            _mom_copy(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

        @pl.when(n_chunks >= 1)
        def _():
            _mom_copy(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

        return 0

    jax.lax.fori_loop(0, N_SUB, sub_walk, 0)


def scramble_image(img, n_ty, n_tx):
    """(hp, wp) image -> flat sub-tile-major layout (n_ty*n_tx*N_SUB*P_SUB,).
    Global-ROW-MAJOR sub-tile order (matches _seg_id): element
    [(gy*n_gx + gx)*P_SUB + r*SUB_W + c] = img[gy*SUB_H+r, gx*SUB_W+c]."""
    n_gy, n_gx = n_ty * N_SUB_Y, n_tx * N_SUB_X
    return (
        img.reshape(n_gy, SUB_H, n_gx, SUB_W)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )


def unscramble_image(flat, n_ty, n_tx):
    """Inverse of scramble_image: flat sub-tile-major -> (hp, wp)."""
    n_gy, n_gx = n_ty * N_SUB_Y, n_tx * N_SUB_X
    return (
        flat.reshape(n_gy, n_gx, SUB_H, SUB_W)
        .transpose(0, 2, 1, 3)
        .reshape(n_gy * SUB_H, n_gx * SUB_W)
    )


def build_subtile_slot_buffer(scene, viewmat, K, width: int, height: int,
                              near: float, far: float, big_budget: int = 64):
    """Like fused_tracking.build_slot_buffer but binned at (16, SUB_W)
    sub-tile granularity with CHUNK-ALIGNED segments (pad_to_chunks): dead
    padding slots point at an appended zero-opacity dummy record, so their
    alpha and moments are exactly 0. big_budget: exact full-footprint
    binning for the top-B biggest splats (ops/binning.py). Assumes the
    isotropic-scene contract (fused_tracking module docstring)."""
    from .projection import project_gaussians

    n_tx = -(-width // TILE_W)
    proj = project_gaussians(
        scene.means, scene.quats, scene.scales, viewmat, K, width, height,
        near, far,
    )
    # bin over the PADDED image extent so the sub-tile grid matches the
    # kernel grid exactly (n_ty macro rows x N_SUB_Y; with SUB_H < TILE_H
    # the raw height would round to a different sub-row count)
    n_ty = -(-height // TILE_H)
    binning = bin_and_sort(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        n_tx * TILE_W, n_ty * TILE_H,
        tile_h=SUB_H, tile_w=SUB_W, ky=KY_SUB, kx=KX_SUB, chunk=CHUNK,
        needs_inv_perm=False,
        big_budget=big_budget, pad_to_chunks=True, pad_align=CB,
    )
    records = jnp.stack(
        [
            scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
            scene.scales[:, 0] * scene.scales[:, 0], scene.opacities,
        ]
        + [jnp.zeros_like(proj.depth)] * (NUM_ISO_ROWS - 5),
        axis=1,
    )  # (N, 8)
    # dummy record N for dead padding slots: opacity 0 -> alpha gated off
    records = jnp.concatenate(
        [records, jnp.zeros((1, NUM_ISO_ROWS), F32)], axis=0
    )
    slot3d = jnp.take(records, binning.pair_gauss, axis=0).T  # (8, Mp)

    slot3d = jax.lax.stop_gradient(slot3d)
    meta = jnp.concatenate([jnp.zeros((1,), jnp.int32), binning.tile_starts])
    return slot3d, meta, binning


def _project8(slot3d, cam, near, far):
    """XLA projection phase: (8, M) iso slot buffer -> (8, M) kernel rows
    [u, v, ca, cb, cc, qz, opa, ok] (fused_tracking._project8_rows — the
    same packing/gate as the in-kernel fused path). One fused elementwise
    pass; the dummy record (all zeros) projects to opa = 0 with finite
    conics."""
    return _project8_rows(_project_slots(slot3d, cam), near, far)


def _chain_xla(slot3d, mom, cam, meta, n_tx):
    """XLA pose-chain phase: per-slot moments -> (1, 16) pose partial row
    [dR(9), dt(3), 0, 0, 0, 0]. `_pose_chain` is linear in the moments, so
    masking the moment rows to [meta[1], meta[-1]) (the walked slot range —
    excludes the static tail and, sharded, other devices' segments) masks
    the contributions exactly; where() also kills NaN bit patterns from
    uninitialized HBM.

    Per-slot sub-tile origins (x0, y0) — the tile-local monomial frame the
    bwd kernel binned moments in — are reconstructed here from the segment
    offsets: segments are CHUNK-aligned (pad_to_chunks), so the origin is
    constant per chunk and one searchsorted over chunk starts recovers the
    chunk -> segment map. meta = [row_offset, starts...] (absolute slot
    offsets; on the sharded path a device's slice of the global starts)."""
    mp = slot3d.shape[1]
    n_chunks = mp // CHUNK
    n_seg = meta.shape[0] - 2
    cstart = jax.lax.iota(jnp.int32, n_chunks) * CHUNK
    seg = jnp.clip(
        jnp.searchsorted(meta[2:], cstart, side="right"), 0, n_seg - 1
    )
    n_gx = n_tx * N_SUB_X
    x0c = ((seg % n_gx) * SUB_W).astype(F32)
    y0c = ((meta[0] * N_SUB_Y + seg // n_gx) * SUB_H).astype(F32)
    x0 = jnp.broadcast_to(x0c[:, None], (n_chunks, CHUNK)).reshape(1, -1)
    y0 = jnp.broadcast_to(y0c[:, None], (n_chunks, CHUNK)).reshape(1, -1)
    idx = jax.lax.iota(jnp.int32, mp)
    mask = (idx >= meta[1]) & (idx < meta[-1])
    momz = jnp.where(mask[None, :], mom, 0.0)
    pr = _project_slots(slot3d, cam)
    return _pose_chain(
        pr,
        momz[0:1], momz[1:2], momz[2:3], momz[3:4], momz[4:5], momz[5:6],
        momz[6:7],
        x0, y0, cam[0], cam[1],
    )


def _project8_kernel(cam, slot_ref, out_ref, *, near, far):
    rec = slot_ref[...]
    out_ref[...] = _project8_rows(_project_slots(rec, cam), near, far)


def _project8_pallas(slot3d, cam, near, far):
    """Pallas form of `_project8`: one streamed pass over (CB,)-lane blocks
    with the projection intermediates VMEM-resident. Was the fast form for
    16-row general records (XLA materialized ~40 (1, M) intermediates,
    5.6 ms vs 0.6 at M=3.9M); with 8-row iso records the XLA form fuses
    better and wins (see _PHASE_IMPL) — kept for perf experiments."""
    mp = slot3d.shape[1]
    if mp % CB or _PHASE_IMPL == "xla":
        return _project8(slot3d, cam, near, far)
    kernel = functools.partial(_project8_kernel, near=near, far=far)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_PROJ_ROWS, mp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // CB,),
            in_specs=[
                pl.BlockSpec((slot3d.shape[0], CB), lambda i, *_: (0, i))
            ],
            out_specs=pl.BlockSpec((NUM_PROJ_ROWS, CB), lambda i, *_: (0, i)),
        ),
        interpret=_interpret(),
    )(cam, slot3d)


def _chain_kernel(limits, cam, slot_ref, mom_ref, out_ref):
    i = pl.program_id(0)
    rec = slot_ref[...]
    momb = mom_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CB), 1) + i * CB
    mask = (lane >= limits[0]) & (lane < limits[1])
    momz = jnp.where(mask, momb, 0.0)
    # decode the sub-tile origin packed in row 7 (see _subtile_bwd_kernel)
    enc = momz[7:8, :]
    ty = jnp.floor(enc * (1.0 / ENC_Y))
    x0 = (enc - ENC_Y * ty) * SUB_W
    y0 = ty * SUB_H
    pr = _project_slots(rec, cam)
    d = _pose_chain(
        pr, momz[0:1], momz[1:2], momz[2:3], momz[3:4], momz[4:5],
        momz[5:6], momz[6:7], x0, y0, cam[0], cam[1],
    )

    @pl.when(i == 0)
    def _():
        for j in range(16):
            out_ref[j] = 0.0

    for j in range(16):
        out_ref[j] = out_ref[j] + d[0, j]


def _chain_pallas(slot3d, mom, cam, limits, meta, n_tx):
    """Pallas form of `_chain_xla`: recompute projection intermediates and
    run the moment -> pose chain in VMEM over (CB,)-lane blocks, scalar-
    accumulating the (16,) partial in SMEM across sequential grid steps.
    The walk-range mask rides `limits` = [meta[1], meta[-1]); the monomial
    origin rides mom row 7 (packed by the backward kernel), so no
    chunk -> segment reconstruction is needed (sharded path included).
    With 8-row iso records the XLA form wins (see _PHASE_IMPL)."""
    mp = slot3d.shape[1]
    if mp % CB or _PHASE_IMPL == "xla":
        return _chain_xla(slot3d, mom, cam, meta, n_tx)
    out = pl.pallas_call(
        _chain_kernel,
        out_shape=jax.ShapeDtypeStruct((16,), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # limits, cam
            grid=(mp // CB,),
            in_specs=[
                pl.BlockSpec((slot3d.shape[0], CB), lambda i, *_: (0, i)),
                pl.BlockSpec((NUM_PROJ_ROWS, CB), lambda i, *_: (0, i)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(limits, cam, slot3d, mom)
    return out.reshape(1, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def subtile_render(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    """Depth+alpha render from a sub-tile slot buffer, differentiable w.r.t.
    the cam vector ONLY. Returns (depth_acc (hp, wp), alpha (hp, wp))."""
    proj8 = _project8_pallas(slot3d, cam, near, far)
    out, _cd = _subtile_fwd_impl(proj8, meta, n_ty, n_tx)
    return (unscramble_image(out[0], n_ty, n_tx),
            unscramble_image(out[1], n_ty, n_tx))


def _subtile_fwd_impl(proj8, meta, n_ty, n_tx):
    m_out = n_ty * n_tx * N_SUB * P_SUB
    return pl.pallas_call(
        _subtile_fwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, m_out), jnp.float32),
            jax.ShapeDtypeStruct((n_ty * n_tx * N_SUB,), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NUM_PROJ_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((2, 8, P_SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(meta, proj8)


def _subtile_vjp_fwd(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    proj8 = _project8_pallas(slot3d, cam, near, far)
    out, _cd = _subtile_fwd_impl(proj8, meta, n_ty, n_tx)
    primal = (unscramble_image(out[0], n_ty, n_tx),
              unscramble_image(out[1], n_ty, n_tx))
    return primal, (slot3d, proj8, meta, cam, out)


def _subtile_vjp_bwd(n_ty, n_tx, m_pad, near, far, res, cot):
    slot3d, proj8, meta, cam, out = res
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
    mom = pl.pallas_call(
        _subtile_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_PROJ_ROWS, slot3d.shape[1]),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, NUM_PROJ_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((2, 8, P_SUB), jnp.float32),
                pltpu.VMEM((2, NUM_PROJ_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(meta, proj8, sin)
    limits = jnp.stack([meta[1], meta[-1]]).astype(jnp.int32)
    d = _chain_pallas(slot3d, mom, cam, limits, meta, n_tx)
    d_cam = jnp.concatenate([jnp.zeros((4,), F32), d[0, :12],
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
