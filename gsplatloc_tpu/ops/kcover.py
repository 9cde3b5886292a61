"""K-cover tracking renderer: per-pixel top-K splat lists, plain-XLA steps.

The sub-tile kernels evaluate every depth-sorted slot against every pixel
of its sub-tile — ~0.43G slot-pixel pairs/step at the 816k bench, a VPU
bound (docs/PERFORMANCE.md speed-of-light model) — yet with opacity-1
scenes each pixel's transmittance saturates after ~2-3 covering splats.
Between rebuilds the pose moves < resort_motion_px (the same staleness
budget the binning already rides), so the SET of splats covering a pixel
is as static as the tile assignment. This module exploits that:

  1. SELECT (Pallas, once per rebuild): walk the depth-sorted sub-tile
     segments exactly like the forward kernel, but emit for every pixel
     the slot-buffer COLUMN INDICES of its first K alpha hits
     (alpha >= ALPHA_MIN; liveness gated at block granularity — see
     _kcover_select_kernel for why that equals true-contributor order up
     to a <= T_EPS post-death tail), in front-to-back order.
  2. GATHER (XLA, once per rebuild): pre-gather those K records per pixel
     into a dense (NREC_KC=5, K, M_out) buffer — no gathers remain in
     the step.
  3. RENDER (every step): project the K records per pixel with the
     CURRENT pose, evaluate alpha at the pixel center, and
     alpha-composite over the K axis. ~K*Npix pairs/step instead of
     0.43G. Differentiable w.r.t. the cam vector through a hand-written
     VJP (cumsum-suffix compositing backward, _kcover_cv_bwd). On chip
     the step runs as a fused Pallas fwd/bwd kernel pair that streams
     the cover buffer once per pass ((5, K, CB) blocks, everything
     VMEM-resident — _kcover_step_*); the plain-XLA form is the oracle
     (render_kcover_ref) and the CPU/odd-size fallback.

Truncation error: after the K-th cover the residual transmittance is
< (1 - ALPHA_MIN)^K at worst and ~0 for opaque scenes; splats that newly
ENTER a pixel's cover mid-segment are picked up at the next rebuild (the
binning's existing staleness class, bounded by the motion gate).

Single-chip path (the ("tiles",) mesh keeps the sub-tile kernels).
Reference parity: same projection, gating, and compositing math as
ops/fused_subtile.py, validated against it in tests/test_kcover.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_subtile import (
    N_SUB,
    N_SUB_X,
    N_SUB_Y,
    P_SUB,
    SIG_EPS,
    SUB_H,
    SUB_W,
    _coeff_mat,
    _seg_id,
    _sub_alpha,
    _sub_mono,
    _sub_origin,
)
from .fused_tracking import _project8_rows, _project_slots
from .rasterize_pallas import (
    ALPHA_MAX,
    ALPHA_MIN,
    F32,
    T_EPS,
    _interpret,
)

# cover-record rows: [x, y, z, s2, opa] — the slot buffer's 3 padding rows
# are NOT replicated into the cover buffer (iso contract, fused_tracking
# docstring). At K=16/880k px this is 282 MB instead of 451: the cover
# stream is the per-step HBM frontier, so the 37% cut rides every fwd AND
# bwd pass (and the select kernel's output DMA).
NREC_KC = 5

# Select-walk block width, decoupled from the step/sub-tile CHUNK (128).
# 256 is the round-5 in-loop winner (c_sel 40.3 -> 35.3 ms, repeatable,
# runs/tpu_session_r5c): vs 512 it halves the absolute-alignment block
# overhang (~CB wasted positions per ~483-slot segment) and makes the
# per-group extraction range skips actually fire (a 512 block spanning a
# whole segment has rank range 1..K — nothing to skip); vs 128 it stays
# clear of the per-block fixed costs (in-kernel projection row algebra,
# DMA setup — cb128/kg8 measured 38.7 in the same session). Blocks are
# ABSOLUTELY aligned (floor(start/CB_SEL)*CB_SEL): segments are
# arbitrary-offset (unpadded layout), so a block can overhang both
# segment ends — an in-segment lane mask zeroes alpha outside
# [start, end). Must divide the buffer pad alignment
# (fused_subtile.CB = 8192).
CB_SEL = int(os.environ.get("GSPLATLOC_KCOVER_SEL_CB", "256"))
if 8192 % CB_SEL or CB_SEL & (CB_SEL - 1):
    raise ValueError(f"CB_SEL={CB_SEL} must be a power of two dividing 8192")

# extraction group width: ks per scalar-cond + batched-dot group in the
# records-select kernel (must divide... no — any value works; tail
# groups shrink). 4 balances branch elimination against wasted
# mask-build work when only part of a group's rank range is present.
SEL_KGROUP = int(os.environ.get("GSPLATLOC_SEL_KGROUP", "4"))
if SEL_KGROUP < 1:
    raise ValueError("GSPLATLOC_SEL_KGROUP must be >= 1")

# rank-scan implementation in the select kernels: "hs" = Hillis-Steele
# (log2(CB_SEL) VPU rounds over (C, P)); "mxu" = one lower-triangular
# (C, C) @ (C, P) bf16 single-pass dot — contrib and the tri matrix are
# {0, 1} (exactly representable in bf16) and the MXU accumulates in f32,
# so the counts are EXACT integers, bitwise-equal to the scan's.
# Round-2 measured triangular-matmul scans WORSE at f32 HIGHEST (3-6
# passes); bf16 single-pass is a different regime — in-loop A/B knob.
SEL_SCAN = os.environ.get("GSPLATLOC_SEL_SCAN", "hs")
if SEL_SCAN not in ("hs", "mxu"):
    raise ValueError("GSPLATLOC_SEL_SCAN must be 'hs' or 'mxu'")

# extraction-dot LHS sublane count: 6 = [found; 5 record rows] (the
# minimal form); 8 pads two zero rows so the MXU operand is a full
# 8-sublane vreg tile — probes whether Mosaic pads 6-row operands to
# something coarser than 8 (the extraction dot's output has only
# 6 live sublanes of the MXU's 128 either way).
SEL_ROWS = int(os.environ.get("GSPLATLOC_SEL_ROWS", "6"))
if SEL_ROWS not in (6, 8):
    raise ValueError("GSPLATLOC_SEL_ROWS must be 6 or 8")

# TIMING PROBE ONLY — compile the records-select kernel WITHOUT the
# per-k extraction (emits zero records; results are WRONG). Output shape
# and walk depth are identical, so standalone select timing with vs
# without this flag isolates the extraction's share of the 44.5 ms
# on-chip select (scripts/perf_select_split.py). Never set in product:
# a leaked env var would silently zero every K-cover result, so the flag
# HARD-FAILS at import unless the probe confirms intent with a second
# var (ADVICE r4) — perf_select_split.py sets both in its child env.
_SEL_NOEXTRACT = os.environ.get("GSPLATLOC_SEL_NOEXTRACT", "0") == "1"
if _SEL_NOEXTRACT and os.environ.get(
        "GSPLATLOC_SEL_NOEXTRACT_PROBE", "0") != "1":
    raise RuntimeError(
        "GSPLATLOC_SEL_NOEXTRACT=1 compiles a select kernel that emits "
        "ZERO records (timing probe only — every K-cover result would be "
        "wrong). Set GSPLATLOC_SEL_NOEXTRACT_PROBE=1 as well to confirm "
        "this is a deliberate probe run, or unset the flag."
    )


def _tree_prod_sel(x):
    """Product along axis 0 (CB_SEL sublanes) by split-halving: ~2 full
    blocks of multiplies total (256+128+...+1 rows) vs the ~9 full-block
    rounds an inclusive Hillis-Steele scan costs. CB_SEL is a power of
    two (validated at import), so the halves always align. Returns
    (1, P). NOTE: the split-halving REORDERS the f32 product vs the walk
    kernels' Hillis-Steele scan, so the select's t_cur carry is
    rounding-EQUIVALENT to the walk's, not bitwise — a pixel whose T sits
    within an ulp of T_EPS at a block boundary can classify live in one
    kernel and dead in the other (absorbed by the post-death-tail
    argument + the step live gate; do not write a bitwise
    select-vs-walk-carry assertion against this)."""
    n = x.shape[0]
    while n > 1:
        n //= 2
        x = x[:n] * x[n:2 * n]
    return x


def _scan_add_sel(x):
    """Inclusive cumsum along axis 0 (CB_SEL sublanes), Hillis-Steele."""
    k = 1
    while k < CB_SEL:
        x = x + jnp.concatenate(
            [jnp.zeros((k, x.shape[1]), F32), x[:-k]], axis=0)
        k *= 2
    return x


def _sel_walk_bounds(start, end):
    """Absolute block index range [b0, b0 + n) covering [start, end);
    n == 0 for empty segments. Consumed blocks never overrun the buffer:
    the buffer length is a multiple of CB_SEL (pad_align 8192)."""
    b0 = start // CB_SEL
    n = jnp.where(end > start, (end + CB_SEL - 1) // CB_SEL - b0, 0)
    return b0 * CB_SEL, n


def _kcover_select_kernel(meta, proj_hbm, idx_hbm,
                          rec_scr, idx_scr, sem, isem, *, k_cover,
                          dummy_col):
    """Per-pixel first-K contributing slot indices, front-to-back.

    Same walk/gating as the sub-tile forward kernel. Per CB_SEL block,
    each contributing (slot, pixel) pair gets a per-pixel RANK (prior
    count + inclusive cumsum of the contribution mask along the slot
    axis); the k-th cover's column index is extracted with a
    (2, C) @ (C, P) MXU matvec per k ([ones; col+1] against the rank-k
    mask — the +1 disambiguates column 0 from "not found"). Two
    latency levers (the walk is sequential-iteration bound): CB_SEL
    blocks are 4x the step CHUNK, and each rank-k matvec is wrapped in
    a lax.cond on the scalar bound (min prior count < k+1 <= max
    inclusive count) — a block whose rank range can't reach k skips
    that k's mask build + matvec entirely."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)

    mono = _sub_mono()
    m_pad = proj_hbm.shape[1]

    def sub_walk(s, _):
        st = _seg_id(ti, tj, n_tx, s)
        start = meta[1 + st]
        end = meta[2 + st]
        base, n_chunks = _sel_walk_bounds(start, end)
        base = pl.multiple_of(base, CB_SEL)
        x0, y0 = _sub_origin(ti + meta[0], tj, s)

        def _copy(cidx, slot):
            # clamp: the one-past-last prefetch must stay in bounds; a
            # clamped block is never consumed (the loop exits first)
            ofs = jnp.minimum(base + cidx * CB_SEL, m_pad - CB_SEL)
            return pltpu.make_async_copy(
                proj_hbm.at[:, pl.ds(pl.multiple_of(ofs, CB_SEL), CB_SEL)],
                rec_scr.at[slot], sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            _copy(0, 0).start()

        def chunk_cond(carry):
            cidx, t_cur, cnt, _idx = carry
            return ((cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)
                    & (jnp.min(cnt) < float(k_cover)))

        def chunk_body(carry):
            cidx, t_cur, cnt, idxr = carry
            slot = jax.lax.rem(cidx, 2)
            _copy(cidx + 1, 1 - slot).start()
            _copy(cidx, slot).wait()
            pos = (jax.lax.broadcasted_iota(jnp.int32, (CB_SEL, 1), 0)
                   + (base + cidx * CB_SEL))
            inseg = ((pos >= start) & (pos < end)).astype(F32)
            alpha = _sub_alpha(
                _coeff_mat(rec_scr[slot], x0, y0), mono) * inseg
            # ALPHA-ONLY selection (round 4): liveness is gated at BLOCK
            # granularity (t_cur = block-entry transmittance) instead of
            # per-slot via an in-block cumprod scan. Transmittance is
            # monotone decreasing along depth order, so every true
            # contributor (alpha hit with T_incl > T_EPS) precedes every
            # post-death alpha hit — alpha-hit rank == true-contributor
            # rank for all true contributors, and the only drift is
            # post-death records admitted into the K-list TAIL. The step
            # render composites those at t_excl <= T_EPS (total extra
            # weight <= T_EPS, telescoping) — inside the documented
            # (1-ALPHA_MIN)^K truncation class. Saves the ~9-round
            # Hillis-Steele cumprod per block (the block-boundary update
            # below is a ~2-block tree product) AND terminates the walk
            # earlier (post-death hits fill cnt toward K).
            contrib = jnp.where(t_cur > T_EPS,
                                (alpha > 0.0).astype(F32), 0.0)
            rank = _scan_add_sel(contrib) + cnt  # (C, P) 1-based
            col1 = (jax.lax.broadcasted_iota(jnp.int32, (1, CB_SEL), 1)
                    + (base + cidx * CB_SEL + 1)).astype(F32)  # col + 1
            sel = jnp.concatenate([jnp.ones((1, CB_SEL), F32), col1],
                                  axis=0)
            # row-mask `where` instead of idxr.at[k].set(...): sliced
            # updates lower to a scatter primitive Mosaic can't compile
            rowk = jax.lax.broadcasted_iota(jnp.int32, (k_cover, 1), 0)
            cnt_min = jnp.min(cnt)
            last = rank[CB_SEL - 1:CB_SEL]
            cnt_max = jnp.max(last)
            for k in range(k_cover):
                def _take(ops, _k=k):
                    sel_, rank_, contrib_, idxr_ = ops
                    mask = jnp.where(rank_ == float(_k + 1), contrib_, 0.0)
                    got = jax.lax.dot_general(
                        sel_, mask,
                        dimension_numbers=((((1,), (0,))), ((), ())),
                        preferred_element_type=F32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (2, P): [found, col+1]
                    hit = (rowk == _k) & (got[0:1] > 0.0)
                    return jnp.where(hit, got[1:2] - 1.0, idxr_)

                idxr = jax.lax.cond(
                    (cnt_min < float(k + 1)) & (float(k + 1) <= cnt_max),
                    _take, lambda ops: ops[3], (sel, rank, contrib, idxr))
            return (cidx + 1, t_cur * _tree_prod_sel(1.0 - alpha), last,
                    idxr)

        # uncovered-pixel dummy: ONE PAST the padded buffer (static), so
        # the gather path's explicitly appended all-zero column is hit —
        # never a live record, even when the last segment exactly fills
        # the CHUNK-aligned buffer (meta[-1] could then be a live column)
        dummy = jnp.float32(dummy_col)
        c_done, _t, _c, idxr = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), jnp.ones((1, P_SUB), F32),
             jnp.zeros((1, P_SUB), F32),
             jnp.zeros((k_cover, P_SUB), F32) + dummy),
        )

        @pl.when(c_done > 0)
        def _():
            _copy(c_done, jax.lax.rem(c_done, 2)).wait()

        idx_scr[...] = idxr
        out = pltpu.make_async_copy(
            idx_scr,
            idx_hbm.at[:, pl.ds(pl.multiple_of(st * P_SUB, P_SUB), P_SUB)],
            isem,
        )
        out.start()
        out.wait()
        return 0

    jax.lax.fori_loop(0, N_SUB, sub_walk, 0)


def _kcover_select_records_kernel(meta, cam, slot_hbm, out_hbm,
                                  srec_scr, out_scr,
                                  ssem, osem, *, k_cover, near, far,
                                  scan_impl=None, sel_rows=None):
    """Like _kcover_select_kernel, but emits the 3D SLOT RECORDS of each
    pixel's first K covers directly — no post-kernel (K*M_out, NREC) XLA
    row-gather (measured the dominant select cost at bench scale). The
    rank-k cover's record is extracted with a (6, C) @ (C, P) MXU matvec
    ([ones; the 5 live slot rows] against the rank-k mask — exact: the
    mask has at most one 1 per pixel column and bf16x3 passes reassemble
    f32 exactly for x*1.0). Dummy (uncovered) entries are all-zero
    records (opa 0 -> alpha 0 in the step render). Same CB_SEL blocking
    + per-k scalar skip as _kcover_select_kernel (see its docstring).

    Round 5: the kernel streams ONLY slot3d and projects each block
    IN-KERNEL (_project_slots + _project8_rows on (1, C) rows — the same
    functions the proj8 prepass ran, so the gate math is unchanged).
    This removes the per-fire _project8_pallas prepass (a full (8, M_pad)
    elementwise pass + 126 MB HBM write at bench scale) AND halves the
    walk's chunk DMA stream (one buffer instead of proj8 + slot3d). The
    projection row algebra is ~80 VPU ops per slot — ~0.2 ms over a full
    bench walk, noise next to the masks it replaces. Per-slot projection
    cost per WALKED slot is identical to before (the prepass projected
    every slot; the walk touches a subset, so in-kernel is strictly
    less projection work)."""
    scan_impl = SEL_SCAN if scan_impl is None else scan_impl
    sel_rows = SEL_ROWS if sel_rows is None else sel_rows
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)

    mono = _sub_mono()
    m_pad = slot_hbm.shape[1]
    if scan_impl == "mxu":
        # lower-triangular ones (incl. diagonal): rank = tri @ contrib
        tri = (jax.lax.broadcasted_iota(jnp.int32, (CB_SEL, CB_SEL), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (CB_SEL, CB_SEL), 1)
               ).astype(F32)

    def sub_walk(s, _):
        st = _seg_id(ti, tj, n_tx, s)
        start = meta[1 + st]
        end = meta[2 + st]
        base, n_chunks = _sel_walk_bounds(start, end)
        base = pl.multiple_of(base, CB_SEL)
        x0, y0 = _sub_origin(ti + meta[0], tj, s)

        def _scopy(cidx, slot):
            ofs = jnp.minimum(base + cidx * CB_SEL, m_pad - CB_SEL)
            return pltpu.make_async_copy(
                slot_hbm.at[:, pl.ds(pl.multiple_of(ofs, CB_SEL), CB_SEL)],
                srec_scr.at[slot], ssem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            _scopy(0, 0).start()

        def chunk_cond(carry):
            cidx, t_cur, cnt = carry[0], carry[1], carry[2]
            return ((cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)
                    & (jnp.min(cnt) < float(k_cover)))

        def chunk_body(carry):
            cidx, t_cur, cnt = carry[0], carry[1], carry[2]
            recs = carry[3]
            slot = jax.lax.rem(cidx, 2)
            _scopy(cidx + 1, 1 - slot).start()
            _scopy(cidx, slot).wait()
            srec = srec_scr[slot]
            # in-kernel projection: identical functions to the old
            # _project8_pallas prepass (shared gate definition)
            p8 = _project8_rows(_project_slots(srec, cam), near, far)
            pos = (jax.lax.broadcasted_iota(jnp.int32, (CB_SEL, 1), 0)
                   + (base + cidx * CB_SEL))
            inseg = ((pos >= start) & (pos < end)).astype(F32)
            alpha = _sub_alpha(_coeff_mat(p8, x0, y0), mono) * inseg
            # alpha-only selection with block-granular liveness — see
            # _kcover_select_kernel for the equivalence argument
            contrib = jnp.where(t_cur > T_EPS,
                                (alpha > 0.0).astype(F32), 0.0)
            if scan_impl == "mxu":
                # bf16 single-pass is EXACT here: {0,1} operands, f32
                # accumulation -> bitwise-equal integer counts
                rank = jax.lax.dot_general(
                    tri, contrib,
                    dimension_numbers=((((1,), (0,))), ((), ())),
                    preferred_element_type=F32,
                ) + cnt
            else:
                rank = _scan_add_sel(contrib) + cnt  # (C, P) 1-based
            # rank gated AT contribution points only: contrib is {0,1}
            # and rank is meaningful only where contrib=1, so
            # (rank_at == k+1) == (rank == k+1 & contrib) with one
            # compare instead of compare+select per k below
            rank_at = rank * contrib
            sel = jnp.concatenate(
                [jnp.ones((1, CB_SEL), F32), srec[:NREC_KC]]
                + ([jnp.zeros((2, CB_SEL), F32)] if sel_rows == 8 else []),
                axis=0,
            )  # (6 or 8, C): [found-counter; 5 record rows; (pad)]
            cnt_min = jnp.min(cnt)
            last = rank[CB_SEL - 1:CB_SEL]
            cnt_max = jnp.max(last)
            new_recs = list(recs)
            # GROUPED batched extraction (round 4; the split probe
            # measured extraction at 28 of the kernel's 44.5 ms device
            # time): ks are processed in groups of SEL_KGROUP under ONE
            # scalar cond per group, and the group's rank-k masks are
            # concatenated along lanes so ONE (6, C) @ (C, G*P) MXU dot
            # extracts all G records — 4x fewer Mosaic branches and dot
            # setups than the per-k form at identical per-column f32
            # math (the records-vs-gather test stays bitwise). A group
            # whose rank range [cnt_min+1, cnt_max] can't be reached is
            # skipped whole, same skip class as before.
            if not _SEL_NOEXTRACT:
                for g0 in range(0, k_cover, SEL_KGROUP):
                    ks = range(g0, min(g0 + SEL_KGROUP, k_cover))

                    def _take_g(ops, _ks=tuple(ks)):
                        sel_, rank_at_, recg = ops
                        masks = jnp.concatenate(
                            [(rank_at_ == float(_k + 1)).astype(F32)
                             for _k in _ks],
                            axis=1,
                        )  # (C, G*P)
                        got = jax.lax.dot_general(
                            sel_, masks,
                            dimension_numbers=((((1,), (0,))), ((), ())),
                            preferred_element_type=F32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (6, G*P)
                        out = []
                        for j, _k in enumerate(_ks):
                            blk = got[:, j * P_SUB:(j + 1) * P_SUB]
                            out.append(jnp.where(blk[0:1] > 0.0,
                                                 blk[1:1 + NREC_KC],
                                                 recg[j]))
                        return tuple(out)

                    group_recs = jax.lax.cond(
                        (cnt_min < float(ks[-1] + 1))
                        & (float(ks[0] + 1) <= cnt_max),
                        _take_g, lambda ops: ops[2],
                        (sel, rank_at,
                         tuple(recs[_k] for _k in ks)))
                    for j, _k in enumerate(ks):
                        new_recs[_k] = group_recs[j]
            return (cidx + 1, t_cur * _tree_prod_sel(1.0 - alpha), last,
                    tuple(new_recs))

        zero_rec = jnp.zeros((NREC_KC, P_SUB), F32)
        out = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), jnp.ones((1, P_SUB), F32),
             jnp.zeros((1, P_SUB), F32),
             tuple(zero_rec for _ in range(k_cover))),
        )
        c_done, recs = out[0], out[3]

        @pl.when(c_done > 0)
        def _():
            _scopy(c_done, jax.lax.rem(c_done, 2)).wait()

        for k in range(k_cover):
            out_scr[k * NREC_KC:(k + 1) * NREC_KC, :] = recs[k]
        odma = pltpu.make_async_copy(
            out_scr,
            out_hbm.at[:, pl.ds(pl.multiple_of(st * P_SUB, P_SUB), P_SUB)],
            osem,
        )
        odma.start()
        odma.wait()
        return 0

    jax.lax.fori_loop(0, N_SUB, sub_walk, 0)


def select_kcover_records(slot3d, meta, cam, n_ty: int, n_tx: int,
                          k_cover: int, near: float, far: float,
                          scan_impl: str | None = None,
                          sel_rows: int | None = None):
    """(NREC_KC, k_cover, M_out) f32: each pixel's first-K cover slot
    RECORDS (scrambled sub-tile-major pixel layout; uncovered = zero
    record). Projects in-kernel from slot3d with `cam` (no proj8 input —
    round 5). Requires k_cover * NREC_KC % 8 == 0 (sublane-aligned output
    DMA — K = 8/16/24/...); build_kcover_buffer falls back to the gather
    path otherwise."""
    m_out = n_ty * n_tx * N_SUB * P_SUB
    if (k_cover * NREC_KC) % 8:
        raise ValueError(f"records path needs k_cover*{NREC_KC} % 8 == 0, "
                         f"got k_cover={k_cover}")
    kernel = functools.partial(_kcover_select_records_kernel,
                               k_cover=k_cover, near=near, far=far,
                               scan_impl=scan_impl, sel_rows=sel_rows)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_cover * NREC_KC, m_out),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, CB_SEL), jnp.float32),
                pltpu.VMEM((k_cover * NREC_KC, P_SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_interpret(),
    )(meta, cam.astype(F32), slot3d)
    # rows are (k, r) block-major; the step render wants (NREC, K, M_out)
    return out.reshape(k_cover, NREC_KC, m_out).transpose(1, 0, 2)


def select_kcover(proj8, meta, n_ty: int, n_tx: int, k_cover: int):
    """(K, M_out) f32 slot-column indices of each pixel's first K covers
    (scrambled sub-tile-major pixel layout; dummy = M_pad, one past the
    buffer — consumers must gather from a zero-column-appended array)."""
    m_out = n_ty * n_tx * N_SUB * P_SUB
    kernel = functools.partial(_kcover_select_kernel, k_cover=k_cover,
                               dummy_col=float(proj8.shape[1]))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_cover, m_out), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, CB_SEL), jnp.float32),
                pltpu.VMEM((k_cover, P_SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_interpret(),
    )(meta, proj8)


def build_kcover_buffer(slot3d, meta, cam, n_ty: int, n_tx: int,
                        near: float, far: float, k_cover: int = 8,
                        via: str = "records", mesh=None):
    """Rebuild-time: each pixel's K cover records as a dense
    (NREC_KC, K, M_out) buffer (the 5 live iso record rows; the step
    loop reads it with zero gathers). via="records": the select kernel
    streams slot3d and emits the records directly. via="gather": the
    kernel emits column indices and XLA row-gathers the records (~(K *
    M_out, 5) gather — the slower original, kept as a cross-check
    oracle and the fallback when K*5 isn't sublane-aligned). With a
    ("tiles",) mesh the selection runs per macro-tile-row band and the
    buffer comes back pixel-sharded (n_ty padded to the mesh size)."""
    from .fused_subtile import _project8_pallas

    if mesh is not None:
        from ..parallel.sharded import sharded_kcover_build

        d = mesh.shape["tiles"]
        n_ty_pad = -(-n_ty // d) * d
        starts = meta[1:]
        extra = (n_ty_pad - n_ty) * n_tx * N_SUB
        if extra > 0:
            starts = jnp.concatenate(
                [starts, jnp.broadcast_to(starts[-1], (extra,))]
            )
        kbuf = sharded_kcover_build(
            slot3d, starts, cam, n_ty_pad, n_tx, mesh, near, far, k_cover
        )
        return jax.lax.stop_gradient(kbuf)

    if via == "records" and (k_cover * NREC_KC) % 8 == 0:
        kbuf = select_kcover_records(slot3d, meta, cam, n_ty, n_tx,
                                     k_cover, near, far)
    else:
        proj8 = _project8_pallas(slot3d, cam, near, far)
        idx = select_kcover(proj8, meta, n_ty, n_tx, k_cover)  # (K, M_out)
        idx_i = idx.astype(jnp.int32)
        # dummy index == M_pad: append an explicit all-zero column so
        # uncovered pixels gather a dead record (opa 0) by construction
        src = jnp.concatenate(
            [slot3d[:NREC_KC],
             jnp.zeros((NREC_KC, 1), slot3d.dtype)], axis=1
        )
        recs = jnp.take(src.T, idx_i.reshape(-1), axis=0)  # (K*M_out, 5)
        m_out = idx.shape[1]
        kbuf = recs.T.reshape(NREC_KC, k_cover, m_out)
    return jax.lax.stop_gradient(kbuf)


def build_kcover_slot_buffer(scene, viewmat, K, width: int, height: int,
                             near: float, far: float, big_budget: int = 64,
                             slot_budget: float = 0.7):
    """Rebuild-time slot buffer for the K-COVER path: the depth-sorted
    sub-tile work list WITHOUT chunk padding, truncated to a live-slot
    budget. Returns (slot3d (8, B_pad), meta, overflow_flag).

    Why this exists (round 5, VERDICT r4 next #2 — the 75 ms rebuild
    fire): the K-cover path's only slot consumers are the select kernels,
    which already mask membership per-slot ([start, end) lane masks on
    absolutely-aligned CB_SEL blocks), so the chunk-aligned padded layout
    `build_subtile_slot_buffer` produces — required by the sub-tile walk
    kernels' segment-exclusive moment chunks — buys nothing here. Three
    rebuild terms fall out vs the padded builder (round-4 on-chip
    profile, docs/PERFORMANCE.md):

      * the pad_to_chunks chunk-fill (a 30720-sub-gather vmapped
        dynamic_slice pass, 24.0 ms) is GONE — the sorted order IS the
        layout;
      * the general `project_gaussians` with its two batched (N,3,3)
        einsums (10.7 ms) becomes `project_iso_binning`'s elementwise
        scalar algebra (the scene is isotropic by the fused-path
        contract);
      * the record row-gather (19.4 ms at M_pad=3.93M) and every
        downstream per-slot pass shrink by the budget: ~51% of emitted
        slots are DEAD at the bench scene (a 1-3 px splat overlaps ~1.45
        of its KY*KX=4 emitted tiles) and sort to the tail (tile id =
        n_tiles), so keeping a `slot_budget` fraction of the sorted
        prefix drops them without touching any live segment.

    slot_budget: fraction of emitted slots kept (1.0 = everything). The
    kept prefix is padded to a CB-aligned static length; per-segment
    starts are clamped to it. overflow_flag (device bool) is True iff the
    LIVE count exceeded the kept prefix — then the highest-id sub-tiles
    lost cover slots and the caller must surface it
    (opt/tracking.py PairResult.slot_overflow; the default 0.7 leaves
    ~35% headroom over the bench scene's 0.51 live fraction).

    The selected cover records are IDENTICAL to the padded builder's
    (same sorted live slots, same segment membership; only dead/padding
    slots — which contribute exactly 0 — and block groupings differ, so
    per-pixel cover records match bitwise while block-boundary
    transmittance carries differ within rounding — _tree_prod_sel note).
    """
    from .binning import TILE_H, TILE_W, bin_and_sort
    from .fused_subtile import CB, KX_SUB, KY_SUB, SUB_H, SUB_W
    from .fused_tracking import NUM_ISO_ROWS
    from .projection import project_iso_binning
    from .rasterize_pallas import CHUNK

    n_tx = -(-width // TILE_W)
    n_ty = -(-height // TILE_H)
    proj = project_iso_binning(
        scene.means, scene.scales[:, 0] * scene.scales[:, 0],
        viewmat, K, width, height, near, far,
    )
    binning = bin_and_sort(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        n_tx * TILE_W, n_ty * TILE_H,
        tile_h=SUB_H, tile_w=SUB_W, ky=KY_SUB, kx=KX_SUB, chunk=CHUNK,
        needs_inv_perm=False, big_budget=big_budget,
        pad_to_chunks=False,
    )
    m_emit = binning.num_pairs  # static
    budget = m_emit if slot_budget >= 1.0 else int(m_emit * slot_budget)
    b_pad = -(-max(budget, CB) // CB) * CB  # static, CB_SEL-aligned
    sg = binning.pair_gauss  # (m_pad,) sorted gauss idx (+ zero padding)
    if b_pad <= sg.shape[0]:
        sg_b = sg[:b_pad]
    else:
        sg_b = jnp.pad(sg, (0, b_pad - sg.shape[0]),
                       constant_values=scene.means.shape[0])
    records = jnp.stack(
        [
            scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
            scene.scales[:, 0] * scene.scales[:, 0], scene.opacities,
        ]
        + [jnp.zeros_like(proj.depth)] * (NUM_ISO_ROWS - 5),
        axis=1,
    )  # (N, 8)
    records = jnp.concatenate(
        [records, jnp.zeros((1, NUM_ISO_ROWS), F32)], axis=0
    )  # + dummy row N for any out-of-range padding index
    slot3d = jnp.take(records, sg_b, axis=0).T  # (8, b_pad)
    slot3d = jax.lax.stop_gradient(slot3d)
    # positions >= min(b_pad, m_emit) hold pad/dead content — clamp every
    # segment bound there so no walk consumes them (live starts <= m_emit
    # always, so the clamp only truncates on genuine overflow)
    clamp_at = min(b_pad, m_emit)
    starts = jnp.minimum(binning.tile_starts, clamp_at)
    overflow = binning.tile_starts[-1] > clamp_at
    meta = jnp.concatenate([jnp.zeros((1,), jnp.int32), starts])
    return slot3d, meta, overflow


def _pixel_centers(n_ty: int, n_tx: int, m_out: int, row0_px=0.0):
    """(1, M_out) px/py pixel-center rows in the scrambled flat layout.
    row0_px (may be traced): global y of this band's first pixel row —
    nonzero when a device renders a macro-tile-row band of a sharded
    image (parallel/sharded.py)."""
    f = jax.lax.iota(jnp.int32, m_out)
    st = f // P_SUB
    within = f % P_SUB
    n_gx = n_tx * N_SUB_X
    gy = st // n_gx
    gx = st % n_gx
    r = within // SUB_W
    c = within % SUB_W
    px = (gx * SUB_W + c).astype(F32) + 0.5
    py = (gy * SUB_H + r).astype(F32) + 0.5 + row0_px
    return px, py


def _kcover_fwd_pieces(kbuf, cam, n_ty: int, n_tx: int,
                       near: float, far: float, row0_px):
    """Shared forward math: projection + per-(k, pixel) alpha + exclusive
    transmittance. Returns (pr, alpha_raw, alpha, ok, t_excl, w, qz)."""
    nrec, k_cover, m_out = kbuf.shape
    rec = kbuf.reshape(nrec, k_cover * m_out)
    pr = _project_slots(rec, cam)
    p8 = _project8_rows(pr, near, far)
    u, v, ca, cb, cc, qz, opa, okr = [
        p8[i].reshape(k_cover, m_out) for i in range(8)
    ]
    px, py = _pixel_centers(n_ty, n_tx, m_out, row0_px)
    dx = px - u
    dy = py - v
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha_raw = opa * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    # -SIG_EPS, not 0: the SELECT kernel gates with the MXU-expanded sigma
    # polynomial at sigma >= -SIG_EPS (_sub_alpha); the render must share
    # that gate definition or a selected record can be dropped pixel-flip-
    # wise at zero staleness (direct-eval sigma is analytically >= 0 for
    # valid conics, so the slack only ever admits what select admitted).
    ok = (sigma >= -SIG_EPS) & (alpha >= ALPHA_MIN) & (okr > 0.0)
    alpha = jnp.where(ok, alpha, 0.0)

    # front-to-back compositing over the K axis (selection order == depth
    # order), vectorized: exclusive transmittance = shifted cumprod
    t_excl = jnp.concatenate(
        [jnp.ones((1, m_out), F32),
         jnp.cumprod(1.0 - alpha[:-1], axis=0)], axis=0,
    )
    # the walk kernels' (and reference CUDA's) termination semantic: the
    # slot whose INCLUSIVE transmittance crosses T_EPS is excluded
    # entirely (its t_excl can be large — dropping this gate was a
    # measured 0.09 alpha error on boundary pixels). T itself still
    # decays through the excluded slot, exactly like the walk's carry.
    live = (t_excl * (1.0 - alpha)) > T_EPS
    w = jnp.where(live, t_excl * alpha, 0.0)  # (K, M_out)
    return pr, alpha_raw, alpha, ok, live, t_excl, w, qz, px, py


def render_kcover_ref(kbuf, cam, n_ty: int, n_tx: int,
                      near: float, far: float, row0_px=0.0):
    """Autodiff-oracle form of the K-cover render (plain jnp backward);
    the custom-VJP product path is validated against this in
    tests/test_kcover.py."""
    from .fused_subtile import unscramble_image

    _pr, _ar, _al, _ok, _lv, _te, w, qz, _px, _py = _kcover_fwd_pieces(
        kbuf, cam, n_ty, n_tx, near, far, row0_px)
    dacc = jnp.sum(w * qz, axis=0)
    aacc = jnp.sum(w, axis=0)
    return (unscramble_image(dacc, n_ty, n_tx),
            unscramble_image(aacc, n_ty, n_tx))


# ---------------------------------------------------------------------------
# Fused Pallas step kernels — THE shipped per-step path on chip
# (render_kcover dispatches here whenever the kernels can lower): the
# per-step render (and its backward) as ONE streamed pass over the cover
# buffer — projection, alpha, K-axis compositing (and, in the backward,
# the compositing adjoint + pose chain) all VMEM-resident per (8, K, CB)
# block. The XLA forms above are the autodiff oracle (render_kcover_ref)
# and the fallback for CPU meshes / CB-unaligned sizes; parity between the
# two is tested in tests/test_kcover.py and gated on chip by
# ops/parity.py kcover_parity.
# ---------------------------------------------------------------------------

# lanes per step-kernel block (multiple of P_SUB; env knob for perf
# experiments — the kbuf block is (NREC_KC=5, K, CB_STEP) f32,
# double-buffered by the grid pipeline, so VMEM use is ~ 2*5*K*CB*4
# bytes ~= 2.6 MB at 4096/K=16). Validated like CB_SEL: a non-multiple
# of P_SUB would silently route every auto render to the slow XLA path
# at bench scale. 4096 is the round-5 floor-sweep winner (fire-free
# in-loop floor 3.89/3.42/3.20/3.11 ms at 512/1024/2048/4096 — fewer
# grid iterations amortize the per-block fixed costs; 8192 does not
# divide the bench m_out=880640 so auto would silently fall back to
# XLA there — runs/tpu_session_r5d/floor_sweep.log).
CB_STEP = int(os.environ.get("GSPLATLOC_KCOVER_CB", "4096"))
if CB_STEP % P_SUB or CB_STEP & (CB_STEP - 1):
    raise ValueError(
        f"CB_STEP={CB_STEP} must be a power of two multiple of P_SUB "
        f"({P_SUB})")


def _scan_rows_mul(x, n_rows, n_cols):
    """Inclusive cumprod along axis 0 (K sublanes), Hillis-Steele."""
    k = 1
    while k < n_rows:
        x = x * jnp.concatenate([jnp.ones((k, n_cols), F32), x[:-k]], axis=0)
        k *= 2
    return x


def _scan_rows_add(x, n_rows, n_cols):
    k = 1
    while k < n_rows:
        x = x + jnp.concatenate([jnp.zeros((k, n_cols), F32), x[:-k]],
                                axis=0)
        k *= 2
    return x


def _step_common(scal, blk, i, *, n_tx, near, far, k_cover):
    """Shared fwd math on one (5, K, CB) block: projection (reusing the
    shape-generic _project_parts), per-(k, pixel) alpha with the p8
    gates, exclusive transmittance over K. Pixel coords are derived from
    the block's global flat offset (the scrambled sub-tile-major
    layout, as _pixel_centers)."""
    from .fused_tracking import _project_parts

    pr = _project_parts(blk[0], blk[1], blk[2], blk[3], blk[4], scal)
    qz = pr["qz"]
    ok_r = pr["det_ok"] & (qz > near) & (qz < far)

    f = (jax.lax.broadcasted_iota(jnp.int32, (1, CB_STEP), 1)
         + i * CB_STEP)
    st = f // P_SUB
    within = f - st * P_SUB
    n_gx = n_tx * N_SUB_X
    gy = st // n_gx
    gx = st - gy * n_gx
    r = within // SUB_W
    c = within - r * SUB_W
    px = (gx * SUB_W + c).astype(F32) + 0.5
    py = (gy * SUB_H + r).astype(F32) + 0.5 + scal[18]  # + row0_px

    dx = px - pr["u"]
    dy = py - pr["v"]
    sigma = (0.5 * (pr["ca"] * dx * dx + pr["cc"] * dy * dy)
             + pr["cb"] * dx * dy)
    alpha_raw = pr["opa"] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    # same -SIG_EPS gate as _kcover_fwd_pieces (and the select kernel)
    ok = (sigma >= -SIG_EPS) & (alpha >= ALPHA_MIN) & ok_r
    alpha = jnp.where(ok, alpha, 0.0)

    incl = _scan_rows_mul(1.0 - alpha, k_cover, CB_STEP)
    t_excl = jnp.concatenate(
        [jnp.ones((1, CB_STEP), F32), incl[:-1]], axis=0
    )
    # same boundary-slot exclusion as _kcover_fwd_pieces (the walk
    # kernels' T_EPS termination semantic)
    live = (t_excl * (1.0 - alpha)) > T_EPS
    w = jnp.where(live, t_excl * alpha, 0.0)
    return pr, alpha_raw, alpha, ok, live, t_excl, w, qz, px, py


def _kcover_step_fwd_kernel(scal, kb_ref, out_ref, *, n_tx, near, far,
                            k_cover):
    from .rasterize_pallas import _dotf

    i = pl.program_id(0)
    blk = kb_ref[...]
    _pr, _ar, _al, _ok, _lv, _te, w, qz, _px, _py = _step_common(
        scal, blk, i, n_tx=n_tx, near=near, far=far, k_cover=k_cover)
    ones_k = jnp.ones((1, k_cover), F32)
    dacc = _dotf(ones_k, w * qz, (((1,), (0,))))  # (1, CB)
    aacc = _dotf(ones_k, w, (((1,), (0,))))
    out_ref[...] = jnp.concatenate(
        [dacc, aacc, jnp.zeros((6, CB_STEP), F32)], axis=0
    )


def _kcover_step_bwd_kernel(scal, kb_ref, sin_ref, dcam_ref, *, n_tx,
                            near, far, k_cover):
    from .fused_tracking import _pose_chain
    from .rasterize_pallas import _dotf

    i = pl.program_id(0)
    blk = kb_ref[...]
    pr, alpha_raw, alpha, ok, live, t_excl, w, qz, px, py = _step_common(
        scal, blk, i, n_tx=n_tx, near=near, far=far, k_cover=k_cover)
    sin = sin_ref[...]
    g_d = sin[0:1, :]
    g_a = sin[1:2, :]

    phi = g_d * qz + g_a
    wdw = w * phi  # w is live-gated, so the suffix term is too
    s_incl = _scan_rows_add(wdw, k_cover, CB_STEP)
    suffix = s_incl[k_cover - 1:k_cover, :] - s_incl
    inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
    d_alpha = jnp.where(live, t_excl * phi, 0.0) - suffix * inv_om
    d_alpha = jnp.where(ok & (alpha_raw < ALPHA_MAX), d_alpha, 0.0)
    d_sigma = d_alpha * (-alpha)
    qz_bar = w * g_d

    zero = jnp.zeros((k_cover, CB_STEP), F32)
    maps = _pose_chain(
        pr, d_sigma, zero, zero, zero, zero, zero, qz_bar,
        px, py, scal[0], scal[1], reduce=False,
    )  # 12 (K, CB) partial maps [dR(9), dt(3)]
    ones_k = jnp.ones((1, k_cover), F32)
    rows = jnp.concatenate(
        [_dotf(ones_k, m + zero, (((1,), (0,)))) for m in maps],
        axis=0,
    )  # (12, CB)
    tot = _dotf(rows, jnp.ones((CB_STEP, 1), F32),
                (((1,), (0,))))  # (12, 1)

    @pl.when(i == 0)
    def _():
        for j in range(16):
            dcam_ref[j] = 0.0

    for j in range(12):
        dcam_ref[j] = dcam_ref[j] + tot[j, 0]


def _step_scal(cam, row0_px):
    return jnp.concatenate(
        [cam.astype(F32), jnp.asarray(row0_px, F32).reshape(1)]
    )


def _kcover_step_fwd_pallas(kbuf, cam, near, far, row0_px, n_tx):
    nrec, k_cover, m_out = kbuf.shape
    kernel = functools.partial(_kcover_step_fwd_kernel, n_tx=n_tx,
                               near=near, far=far, k_cover=k_cover)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, m_out), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_out // CB_STEP,),
            in_specs=[pl.BlockSpec((nrec, k_cover, CB_STEP),
                                   lambda i, *_: (0, 0, i))],
            out_specs=pl.BlockSpec((8, CB_STEP), lambda i, *_: (0, i)),
        ),
        interpret=_interpret(),
    )(_step_scal(cam, row0_px), kbuf)
    return out[0], out[1]


def _kcover_step_bwd_pallas(kbuf, cam, near, far, row0_px, n_tx,
                            gd_flat, ga_flat):
    nrec, k_cover, m_out = kbuf.shape
    sin = jnp.concatenate(
        [gd_flat[None, :], ga_flat[None, :],
         jnp.zeros((6, m_out), F32)], axis=0
    )
    kernel = functools.partial(_kcover_step_bwd_kernel, n_tx=n_tx,
                               near=near, far=far, k_cover=k_cover)
    d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16,), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_out // CB_STEP,),
            in_specs=[
                pl.BlockSpec((nrec, k_cover, CB_STEP),
                             lambda i, *_: (0, 0, i)),
                pl.BlockSpec((8, CB_STEP), lambda i, *_: (0, i)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(_step_scal(cam, row0_px), kbuf, sin)
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _render_kcover_cv(kbuf, cam, n_ty, n_tx, near, far, row0_px):
    return render_kcover_ref(kbuf, cam, n_ty, n_tx, near, far, row0_px)


def _kcover_cv_fwd(kbuf, cam, n_ty, n_tx, near, far, row0_px):
    primal = render_kcover_ref(kbuf, cam, n_ty, n_tx, near, far, row0_px)
    return primal, (kbuf, cam, row0_px)


def _kcover_cv_bwd(n_ty, n_tx, near, far, res, cot):
    """Hand-written backward to the cam vector: recompute the (cheap)
    forward, run the standard alpha-compositing backward over the K axis,
    and chain d_sigma / the direct depth term to the pose with ONE
    `_pose_chain` call. Each record instance touches exactly one pixel,
    so its moment frame is that pixel itself (x0=px, y0=py): the only
    nonzero moment is m0 = d_sigma — cancellation-free by construction
    (the tile-local-coords lesson, ops/fused_tracking.py). Saves no
    (K, M_out) primal residuals; autodiff of the same chain measured
    ~28 ms/step vs ~3 fwd at the 816k bench (perf_kcover3.log).

    dR convention: like the sub-tile kernels, the raw dR rows carry a
    manifold-normal component (the generic M = R S R^T term the
    iso-folded projection constant-folds away); the quat -> R VJP — the
    only consumer — projects it out, so quat/trans gradients match plain
    autodiff to 2e-8 in f64 (tests/test_kcover.py)."""
    from ..ops.fused_tracking import _pose_chain
    from .fused_subtile import scramble_image

    kbuf, cam, row0_px = res
    gd_img, ga_img = cot
    _, k_cover, m_out = kbuf.shape
    g_d = scramble_image(gd_img, n_ty, n_tx)[None, :]  # (1, M_out)
    g_a = scramble_image(ga_img, n_ty, n_tx)[None, :]

    pr, alpha_raw, alpha, ok, live, t_excl, w, qz, px, py = (
        _kcover_fwd_pieces(kbuf, cam, n_ty, n_tx, near, far, row0_px))

    # alpha-compositing backward (same form as the sub-tile bwd kernel):
    # d_alpha_k = live_k * t_excl_k * phi_k
    #            - (sum_{j>k} phi_j w_j) / (1 - alpha_k)
    # (w is live-gated, so the suffix term carries the gate; the direct
    # term is masked explicitly — the gate itself is piecewise constant)
    phi = g_d * qz + g_a  # w_bar
    wdw = w * phi
    s_incl = jnp.cumsum(wdw, axis=0)
    suffix = s_incl[-1:, :] - s_incl
    inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
    d_alpha = jnp.where(live, t_excl * phi, 0.0) - suffix * inv_om
    d_alpha = jnp.where(ok & (alpha_raw < ALPHA_MAX), d_alpha, 0.0)
    d_sigma = d_alpha * (-alpha)
    qz_bar = w * g_d

    km = k_cover * m_out
    zero = jnp.zeros((1, km), F32)
    d = _pose_chain(
        pr,
        d_sigma.reshape(1, km), zero, zero, zero, zero, zero,
        qz_bar.reshape(1, km),
        jnp.broadcast_to(px, (k_cover, m_out)).reshape(1, km),
        jnp.broadcast_to(py, (k_cover, m_out)).reshape(1, km),
        cam[0], cam[1],
    )
    d_cam = jnp.concatenate(
        [jnp.zeros((4,), F32), d[0, :12], jnp.zeros((2,), F32)]
    )
    return jnp.zeros_like(kbuf), d_cam, jnp.float32(0.0)


_render_kcover_cv.defvjp(_kcover_cv_fwd, _kcover_cv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _render_kcover_pl(kbuf, cam, n_ty, n_tx, near, far, row0_px):
    """Pallas-step form of the K-cover render: ONE streamed kernel pass
    per direction over the cover buffer (fwd: _kcover_step_fwd_kernel;
    bwd: recompute + compositing adjoint + pose chain, emitting the 12
    pose scalars directly — _kcover_step_bwd_kernel). Same math and
    gates as render_kcover_ref / _kcover_cv_bwd (the oracles)."""
    from .fused_subtile import unscramble_image

    dacc, aacc = _kcover_step_fwd_pallas(kbuf, cam, near, far, row0_px,
                                         n_tx)
    return (unscramble_image(dacc, n_ty, n_tx),
            unscramble_image(aacc, n_ty, n_tx))


def _kcover_pl_fwd(kbuf, cam, n_ty, n_tx, near, far, row0_px):
    primal = _render_kcover_pl(kbuf, cam, n_ty, n_tx, near, far, row0_px)
    return primal, (kbuf, cam, row0_px)


def _kcover_pl_bwd(n_ty, n_tx, near, far, res, cot):
    from .fused_subtile import scramble_image

    kbuf, cam, row0_px = res
    gd_img, ga_img = cot
    g_d = scramble_image(gd_img, n_ty, n_tx)
    g_a = scramble_image(ga_img, n_ty, n_tx)
    d = _kcover_step_bwd_pallas(kbuf, cam, near, far, row0_px, n_tx,
                                g_d, g_a)
    d_cam = jnp.concatenate(
        [jnp.zeros((4,), F32), d[:12], jnp.zeros((2,), F32)]
    )
    return jnp.zeros_like(kbuf), d_cam, jnp.float32(0.0)


_render_kcover_pl.defvjp(_kcover_pl_fwd, _kcover_pl_bwd)

# step implementation: "auto" ships the Pallas kernels on real TPUs and
# the XLA form where Mosaic can't lower (CPU tests / virtual meshes);
# "xla" / "pallas" force one (pallas + interpret mode = the CPU parity
# tests' path).
_STEP_IMPL = os.environ.get("GSPLATLOC_KCOVER_STEP", "auto")


def render_kcover(kbuf, cam, n_ty: int, n_tx: int,
                  near: float, far: float, row0_px=0.0, impl=None):
    """Depth+alpha render from a K-cover buffer, differentiable w.r.t.
    the cam vector (hand-written VJP — see _kcover_cv_bwd). Returns
    (depth_acc (hp, wp), alpha (hp, wp)).

    impl None -> _STEP_IMPL: the fused Pallas step kernels whenever they
    can lower (compiled on TPU, interpreted elsewhere only if forced),
    else the plain-XLA custom-VJP form."""
    explicit = impl is not None
    impl = _STEP_IMPL if impl is None else impl
    m_out = kbuf.shape[2]
    if impl == "auto":
        impl = "pallas" if (not _interpret()
                            and m_out % CB_STEP == 0) else "xla"
    if impl == "pallas":
        if m_out % CB_STEP:
            # silent fallback is reserved for impl="auto": a parity test
            # that FORCES pallas must not vacuously compare XLA vs XLA
            # when CB_STEP is changed via the env knob (ADVICE r3)
            if explicit or _STEP_IMPL == "pallas":
                raise ValueError(
                    f"impl='pallas' requested but m_out={m_out} is not a "
                    f"multiple of CB_STEP={CB_STEP}")
        else:
            return _render_kcover_pl(kbuf, cam, n_ty, n_tx, near, far,
                                     jnp.asarray(row0_px, F32))
    return _render_kcover_cv(kbuf, cam, n_ty, n_tx, near, far,
                             jnp.asarray(row0_px, F32))


def render_tracking_depth_kcover(viewmat, K, width: int, height: int,
                                 kbuf, near: float = 1e-2,
                                 far: float = 1e10, mesh=None):
    """K-cover counterpart of render_tracking_depth_subtile (normalized
    depth + alpha, cropped to (height, width)). With a ("tiles",) mesh,
    kbuf must be the pixel-sharded buffer from build_kcover_buffer(mesh=)
    (macro-tile-row bands; n_ty padded to the mesh size)."""
    from .binning import TILE_H, TILE_W
    from .fused_tracking import cam_vector

    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    cam = cam_vector(viewmat, K, width, height)
    if mesh is None:
        d_acc, alpha = render_kcover(kbuf, cam, n_ty, n_tx, near, far)
    else:
        from ..parallel.sharded import sharded_kcover_render

        d = mesh.shape["tiles"]
        n_ty_pad = -(-n_ty // d) * d
        d_acc, alpha = sharded_kcover_render(
            kbuf, cam, n_ty_pad, n_tx, mesh, near, far
        )
    d_acc = d_acc[:height, :width]
    alpha = alpha[:height, :width]
    depth = d_acc / jnp.maximum(alpha, 1e-10)
    return depth, alpha
