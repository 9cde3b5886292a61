"""Fused pose-tracking rasterizer: in-kernel projection, pose-only backward.

The tracking hot loop (opt/tracking.py) optimizes ONLY the camera pose of a
FROZEN Gaussian scene (reference semantics: src/my_gsplat/model.py — no
Gaussian optimization, only the camera receives gradients). That specializes
the general rasterizer three ways, each a large TPU win:

  1. The world-space covariance R_q S S^T R_q^T of every Gaussian is
     POSE-INDEPENDENT — precomputed once per scene.
  2. Between Adam steps the pose moves ~1e-4 rad, so tile assignment and
     depth ORDER are effectively static: the slot list (binning + sort +
     gather, ~75 ms/step in the general path) is rebuilt only every
     `resort_every` steps; the slot buffer stores 3D data and the kernel
     projects each slot itself with the CURRENT pose (exact positions, a few
     (C,1)-column ops per chunk — culling/order staleness only).
  3. The backward needs d(loss)/d(viewmat) — a 12-scalar reduction — not
     per-slot gradients: the kernel accumulates per-tile partials into an
     SMEM output and the chain to quat/translation runs in plain autodiff.
     No slot-gradient buffer, no inverse-permutation gather, no scatter.

Slot record fields (8 fp32, buffer layout (8, M_pad)): 0 px, 1 py, 2 pz
(world mean), 3 s2 (ISOTROPIC world variance — the scene contract below),
4 opacity, 5..7 padding. The tracking loss is depth-only (trainer :126-150)
so no color fields.

ISOTROPIC-SCENE CONTRACT: the fused tracking path assumes identity
quaternions and isotropic scales — exactly what GSModel always builds
(reference src/my_gsplat/model.py:155-175: identity quats, kNN isotropic
scales) and what scene_from_point_cloud produces. The world covariance is
then s^2*I, pose-independent AND rotation-invariant, so one variance row
replaces the nine general cov rows: the slot buffer halves (the rebuild's
(M, 16) record row-gather was ~19 ms of the 38 ms rebuild at the 816k
bench — the single biggest rebuild term), the per-step projection/chain
phases read half the HBM bytes, and ~30 row ops of M = R S R^T algebra
fold into constants. General (anisotropic) scenes use backend="pallas".

Validation: forward + pose grads are tested against the general Pallas path
and the dense oracle (tests/test_fused_tracking.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, bin_and_sort
from .rasterize_pallas import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    P,
    T_EPS,
    F32,
    _dotf,
    _interpret,
    _pixel_xy,
    _scan_add,
    _scan_mul,
)

NUM_ISO_ROWS = 8  # [x, y, z, s2, opa, pad, pad, pad]

EPS2D = 0.3
N_CAM = 18  # camera scalar vector: [fx, fy, cx, cy, R(9), t(3), W, H]


def _project_slots(rec, cam):
    """Per-slot projection with the CURRENT pose, computed entirely in
    (1, C) ROW space — per-Gaussian scalar algebra on single-vreg rows;
    only the handful of quantities that meet the (C, P) pixel arrays get
    transposed to (C, 1) columns afterwards.

    cam: (N_CAM,) scalars [fx, fy, cx, cy, R00..R22 (row major), t, W, H].
    rec: the (8, C) isotropic record block [x, y, z, s2, opa, pad...] (the
    isotropic-scene contract, module docstring). Returns dict of (1, C)
    rows. With S = s2*I the camera-frame covariance M = R S R^T = s2*I
    identically — the six m-entries and the 3x3 M = R S R^T recombination
    fold away; the off-diagonal entries stay in the dict as literal 0.0 so
    `_pose_chain` (which is generic in M and S) constant-folds them.
    """
    return _project_parts(rec[0:1, :], rec[1:2, :], rec[2:3, :],
                          rec[3:4, :], rec[4:5, :], cam)


def _project_parts(x, y, z, s2, opa, cam):
    """Shape-generic body of `_project_slots`: x/y/z/s2/opa may be any
    broadcast-compatible arrays ((1, C) rows on the phase paths, (K, CB)
    planes inside the K-cover step kernels)."""
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    r = [cam[4 + i] for i in range(9)]
    t0, t1, t2 = cam[13], cam[14], cam[15]

    qx = r[0] * x + r[1] * y + r[2] * z + t0
    qy = r[3] * x + r[4] * y + r[5] * z + t1
    qz = r[6] * x + r[7] * y + r[8] * z + t2
    zs = jnp.where(jnp.abs(qz) < 1e-8, 1e-8, qz)
    iz = 1.0 / zs
    u = fx * qx * iz + cx
    v = fy * qy * iz + cy

    # EWA jacobian with FoV clamp (matches ops/projection.py)
    lim_x = 1.3 * 0.5 * cam[16] / fx
    lim_y = 1.3 * 0.5 * cam[17] / fy
    txc = zs * jnp.clip(qx * iz, -lim_x, lim_x)
    tyc = zs * jnp.clip(qy * iz, -lim_y, lim_y)
    iz2 = iz * iz
    j00 = fx * iz
    j02 = -fx * txc * iz2
    j11 = fy * iz
    j12 = -fy * tyc * iz2

    # cov2d = J (s2*I) J^T + EPS2D*I
    a = s2 * (j00 * j00 + j02 * j02) + EPS2D
    b = s2 * (j02 * j12)
    c = s2 * (j11 * j11 + j12 * j12) + EPS2D
    det = a * c - b * b
    det_s = jnp.where(det == 0.0, 1e-12, det)
    inv_det = 1.0 / det_s
    ca = c * inv_det
    cb = -b * inv_det
    cc = a * inv_det

    return dict(
        qx=qx, qy=qy, qz=qz, zs=zs, iz=iz, u=u, v=v,
        m00=s2, m01=0.0, m02=0.0, m11=s2, m12=0.0, m22=s2,
        j00=j00, j02=j02, j11=j11, j12=j12, txc=txc, tyc=tyc,
        a=a, b=b, c=c, inv_det=inv_det, ca=ca, cb=cb, cc=cc,
        det_ok=(det > 0.0),
        x=x, y=y, z=z, opa=opa,
        s=(s2, 0.0, 0.0, s2, 0.0, s2),
        r=r, fx=fx, fy=fy,
        lim_ok_x=(jnp.abs(qx * iz) < lim_x),
        lim_ok_y=(jnp.abs(qy * iz) < lim_y),
    )


def _project8_rows(pr, near, far):
    """THE canonical 8-row kernel-facing packing of the projection phase:
    [u, v, ca, cb, cc, qz, opa, ok] as an (8, C) stack. Shared by the
    in-kernel fused path (via _fused_cols) and the phase-split XLA/Pallas
    project phases (ops/fused_subtile.py) so the validity gate can never
    diverge between them."""
    ok_row = (
        pr["det_ok"] & (pr["qz"] > near) & (pr["qz"] < far)
    ).astype(F32)
    return jnp.concatenate(
        [pr["u"], pr["v"], pr["ca"], pr["cb"], pr["cc"], pr["qz"],
         pr["opa"], ok_row],
        axis=0,
    )


def _fused_cols(pr, near, far):
    """Transpose the row-space projection outputs that feed (C, P) math —
    batched into ONE (8, C) -> (C, 8) transpose."""
    mat = _project8_rows(pr, near, far).T  # (C, 8)
    return dict(
        u=mat[:, 0:1], v=mat[:, 1:2],
        ca=mat[:, 2:3], cb=mat[:, 3:4], cc=mat[:, 4:5],
        qz=mat[:, 5:6], opa=mat[:, 6:7], ok=mat[:, 7:8],
    )


def _fused_alpha(cols, px, py, slot0, lo, hi):
    """Gated alpha from the column-space projection. Returns (alpha, dx, dy)."""
    dx = px - cols["u"]  # (C, P)
    dy = py - cols["v"]
    sigma = (0.5 * (cols["ca"] * dx * dx + cols["cc"] * dy * dy)
             + cols["cb"] * dx * dy)
    alpha = jnp.minimum(cols["opa"] * jnp.exp(-sigma), ALPHA_MAX)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + slot0
    in_seg = (rows >= lo) & (rows < hi)
    ok = (in_seg & (cols["ok"] > 0.0) & (sigma >= 0.0)
          & (alpha >= ALPHA_MIN))
    return jnp.where(ok, alpha, 0.0), dx, dy


def _fused_fwd_kernel(meta, cam, records_hbm, d_out, a_out, cd_out,
                      rec_scr, sem, *, near, far):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_xy(ti + meta[0], tj)
    cam_v = cam  # SMEM ref: scalar reads only

    # double-buffered record DMA: chunk c+1 streams into the other buffer
    # slot while chunk c computes. The speculative prefetch is always in
    # bounds (binning pads M by one extra chunk past every tile end) and is
    # drained after the loop (early-out may leave one copy in flight).
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
        cols = _fused_cols(pr, near, far)
        alpha, _dx, _dy = _fused_alpha(cols, px, py, chunk_col, start, end)
        one_minus = 1.0 - alpha
        incl = _scan_mul(one_minus)
        excl = jnp.concatenate([jnp.ones((1, P), F32), incl[:-1]], axis=0)
        live = (t_cur * incl) > T_EPS
        w = jnp.where(live, t_cur * excl * alpha, 0.0)
        # depth accumulation + alpha: 2-channel payload [z, 1] contracted
        # over C on the MXU (cross-sublane jnp.sum is slow)
        ch2 = jnp.concatenate([pr["qz"], jnp.ones((1, CHUNK), F32)], axis=0)
        acc = acc + _dotf(ch2, w, (((1,), (0,))), precision=jax.lax.Precision.HIGHEST)  # (2, P)
        return cidx + 1, t_cur * incl[CHUNK - 1:CHUNK], acc

    c_done, _t, acc = jax.lax.while_loop(
        chunk_cond, chunk_body,
        (jnp.int32(0), jnp.ones((1, P), F32), jnp.zeros((2, P), F32)),
    )

    # drain the in-flight speculative prefetch (body c starts copy c+1)
    @pl.when(c_done > 0)
    def _():
        _copy(c_done, jax.lax.rem(c_done, 2)).wait()

    d_out[:, :] = acc[0].reshape(TILE_H, TILE_W)
    a_out[:, :] = acc[1].reshape(TILE_H, TILE_W)
    cd_out[t] = c_done


def _pose_chain(pr, m0, m_x, m_y, m_xx, m_xy, m_yy, d_z_direct,
                x0, y0, fx, fy, reduce=True):
    """Row-space chain from the tile-local pixel moments of d_sigma (and the
    direct depth term) to the per-chunk pose partial delta (1, 16):
    dR (9), dt (3), 4 zeros. P-independent — shared by the full-tile and
    sub-tile backward kernels. All args are (1, C) rows except the scalars
    x0/y0/fx/fy."""
    u_l = pr["u"] - x0
    v_l = pr["v"] - y0
    s1 = m_x - u_l * m0
    s2 = m_y - v_l * m0
    d_ca = 0.5 * (m_xx - 2.0 * u_l * m_x + u_l * u_l * m0)
    d_cb = m_xy - u_l * m_y - v_l * m_x + u_l * v_l * m0
    d_cc = 0.5 * (m_yy - 2.0 * v_l * m_y + v_l * v_l * m0)
    d_u = -(pr["ca"] * s1 + pr["cb"] * s2)
    d_v = -(pr["cc"] * s2 + pr["cb"] * s1)

    # conic -> cov2d(a, b, c): conic = [c, -b, a]/det, det = ac - b^2
    a_, b_, c_ = pr["a"], pr["b"], pr["c"]
    idet = pr["inv_det"]
    # d det contributions
    d_idet = d_ca * c_ + d_cb * (-b_) + d_cc * a_
    d_det = -d_idet * idet * idet
    d_a = d_cc * idet + d_det * c_
    d_b = -d_cb * idet - 2.0 * d_det * b_
    d_c = d_ca * idet + d_det * a_

    # cov2d(a,b,c) <- (j00, j02, j11, j12, M)
    j00, j02, j11, j12 = pr["j00"], pr["j02"], pr["j11"], pr["j12"]
    m00, m01, m02 = pr["m00"], pr["m01"], pr["m02"]
    m11, m12, m22 = pr["m11"], pr["m12"], pr["m22"]
    # a = j00^2 m00 + 2 j00 j02 m02 + j02^2 m22
    # b = j00 j11 m01 + j00 j12 m02 + j02 j11 m12 + j02 j12 m22
    # c = j11^2 m11 + 2 j11 j12 m12 + j12^2 m22
    d_m00 = d_a * j00 * j00
    d_m01 = d_b * j00 * j11
    d_m02 = d_a * 2.0 * j00 * j02 + d_b * j00 * j12
    d_m11 = d_c * j11 * j11
    d_m12 = d_b * j02 * j11 + d_c * 2.0 * j11 * j12
    d_m22 = d_a * j02 * j02 + d_b * j02 * j12 + d_c * j12 * j12
    d_j00 = d_a * (2.0 * j00 * m00 + 2.0 * j02 * m02) + d_b * (j11 * m01 + j12 * m02)
    d_j02 = d_a * (2.0 * j00 * m02 + 2.0 * j02 * m22) + d_b * (j11 * m12 + j12 * m22)
    d_j11 = d_c * (2.0 * j11 * m11 + 2.0 * j12 * m12) + d_b * (j00 * m01 + j02 * m12)
    d_j12 = d_c * (2.0 * j11 * m12 + 2.0 * j12 * m22) + d_b * (j00 * m02 + j02 * m22)

    # u = fx qx iz + cx ; v = fy qy iz + cy
    iz = pr["iz"]
    iz2 = iz * iz
    qx, qy, qz = pr["qx"], pr["qy"], pr["zs"]
    d_qx = d_u * fx * iz
    d_qy = d_v * fy * iz
    d_qz = -(d_u * fx * qx + d_v * fy * qy) * iz2 + d_z_direct
    # j00 = fx iz ; j02 = -fx txc iz^2 ; txc = qz*clip(qx/qz) -> if
    # unclamped txc = qx (d txc/d qx = 1, d txc/d qz = 0); clamped:
    # txc = +-lim*qz (d/dqz = +-lim = txc/qz)
    okx = pr["lim_ok_x"]
    oky = pr["lim_ok_y"]
    txc, tyc = pr["txc"], pr["tyc"]
    iz3 = iz2 * iz
    d_qz = d_qz - d_j00 * fx * iz2 - d_j11 * fy * iz2
    d_qz = d_qz + d_j02 * fx * (2.0 * txc * iz3) + d_j12 * fy * (2.0 * tyc * iz3)
    d_txc = -d_j02 * fx * iz2
    d_tyc = -d_j12 * fy * iz2
    d_qx = d_qx + jnp.where(okx, d_txc, 0.0)
    d_qz = d_qz + jnp.where(okx, 0.0, d_txc * txc * iz)
    d_qy = d_qy + jnp.where(oky, d_tyc, 0.0)
    d_qz = d_qz + jnp.where(oky, 0.0, d_tyc * tyc * iz)

    # M = R S R^T: dR = (G + G^T) R S with G = dM (sym packing: off-diag
    # entries get the off-diag grads once; G_ii = d_mii, G_ij = d_mij
    # -> (G + G^T) has diag 2*d_mii and off-diagonals d_mij — verified vs
    # autodiff in tests):
    g00, g01, g02 = d_m00, d_m01, d_m02
    g11, g12, g22 = d_m11, d_m12, d_m22
    r_ = pr["r"]
    s00, s01, s02, s11, s12, s22 = pr["s"]
    rs = [
        (r_[0] * s00 + r_[1] * s01 + r_[2] * s02,
         r_[0] * s01 + r_[1] * s11 + r_[2] * s12,
         r_[0] * s02 + r_[1] * s12 + r_[2] * s22),
        (r_[3] * s00 + r_[4] * s01 + r_[5] * s02,
         r_[3] * s01 + r_[4] * s11 + r_[5] * s12,
         r_[3] * s02 + r_[4] * s12 + r_[5] * s22),
        (r_[6] * s00 + r_[7] * s01 + r_[8] * s02,
         r_[6] * s01 + r_[7] * s11 + r_[8] * s12,
         r_[6] * s02 + r_[7] * s12 + r_[8] * s22),
    ]
    g_mat = [
        [2.0 * g00, g01, g02],
        [g01, 2.0 * g11, g12],
        [g02, g12, 2.0 * g22],
    ]
    d_r = [[None] * 3 for _ in range(3)]
    for i_ in range(3):
        for k_ in range(3):
            acc_ = 0.0
            for j_ in range(3):
                acc_ = acc_ + g_mat[i_][j_] * rs[j_][k_]
            d_r[i_][k_] = acc_

    # q = R p + t: dR_ik += d_q_i * p_k ; dt_i += d_q_i
    xw, yw, zw = pr["x"], pr["y"], pr["z"]
    d_q = [d_qx, d_qy, d_qz]
    pw = [xw, yw, zw]
    for i_ in range(3):
        for k_ in range(3):
            d_r[i_][k_] = d_r[i_][k_] + d_q[i_] * pw[k_]

    if not reduce:
        # per-slot partial maps [dR(9) row-major, dt(3)] — the K-cover
        # step kernel reduces them with MXU contractions (jnp.sum is a
        # cross-sublane reduction, the #1 in-kernel Pallas trap)
        return [d_r[i_][k_] for i_ in range(3) for k_ in range(3)] + d_q

    # reduce over slots -> (1,1) scalars, pack as a (1, 16) delta row
    parts = []
    for i_ in range(3):
        for k_ in range(3):
            parts.append(jnp.sum(d_r[i_][k_]))
    for i_ in range(3):
        parts.append(jnp.sum(d_q[i_]))
    parts.append(jnp.float32(0.0))
    parts.append(jnp.float32(0.0))
    parts.append(jnp.float32(0.0))
    parts.append(jnp.float32(0.0))
    return jnp.stack(parts).reshape(1, 16)


def _fused_bwd_kernel(meta, cam, records_hbm,
                      td, ta,  # forward totals
                      gd, ga,  # cotangents
                      dcam_out, rec_scr, sem, *, near, far):
    """Pose-gradient backward: per-tile 12-scalar partial (dR(9), dt(3))."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_xy(ti + meta[0], tj)
    cam_v = cam  # SMEM ref: scalar reads only
    fx, fy = cam_v[0], cam_v[1]

    # Moment-reduction basis: all pixel reductions of the form
    # sum_p d_sigma * dx^i * dy^j (i+j <= 2) collapse into ONE MXU
    # contraction against TILE-LOCAL monomials [1, x, y, x^2, xy, y^2]
    # (global pixel coords would lose ~5 of 7 fp32 digits to cancellation
    # when the expansion recombines; tile-local keeps it at ~3e-4 relative,
    # far inside the pose-grad tolerance). One (2C, P) @ (P, 6) matmul
    # replaces seven (C, P) @ (P, 1) matvecs and the per-pair dsx/dsy
    # products.
    x0 = (tj * TILE_W).astype(F32)
    y0 = ((ti + meta[0]) * TILE_H).astype(F32)
    xl = px - x0  # (1, P) in [0.5, TILE_W)
    yl = py - y0
    mono = jnp.concatenate(
        [jnp.ones((1, P), F32), xl, yl, xl * xl, xl * yl, yl * yl], axis=0
    )  # (6, P)

    g_d = gd[:, :].reshape(1, P)
    g_a = ga[:, :].reshape(1, P)
    # G_tot = gd*D_tot + ga*A_tot
    g_tot = (g_d * td[:, :].reshape(1, P) + g_a * ta[:, :].reshape(1, P))

    # double-buffered record DMA (same protocol as the forward kernel)
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
        cols = _fused_cols(pr, near, far)
        alpha, dx, dy = _fused_alpha(cols, px, py, chunk_col, start, end)
        one_minus = 1.0 - alpha
        incl = _scan_mul(one_minus)
        excl = jnp.concatenate([jnp.ones((1, P), F32), incl[:-1]], axis=0)
        t_prefix = t_in * excl
        live = (t_in * incl) > T_EPS
        w = jnp.where(live, t_prefix * alpha, 0.0)
        t_next = t_in * incl[CHUNK - 1:CHUNK]

        # Phi = gd * z + ga  (depth + alpha channels)
        phi = g_d * cols["qz"] + g_a  # (C, P) via broadcast
        wdw = w * phi
        s_incl = _scan_add(wdw) + wdw_run
        suffix = g_tot - s_incl
        inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_MAX)
        d_alpha = t_prefix * phi - suffix * inv_om
        d_alpha = jnp.where(live & (alpha > 0.0), d_alpha, 0.0)
        d_alpha = jnp.where(alpha >= ALPHA_MAX, 0.0, d_alpha)
        d_sigma = d_alpha * (-alpha)

        # pixel-moment reductions: one stacked MXU contraction against the
        # tile-local monomial basis, then (1, C) row-space recombination
        # (dsx = d_sigma*(x - u) etc. expand exactly into these moments)
        stacked = jnp.concatenate([d_sigma, w * g_d], axis=0)  # (2C, P)
        # mono as LHS: 6-wide output dim on sublanes, not lanes (see
        # fused_subtile.py — ~16x fewer MXU passes, same f32 products)
        mom = _dotf(mono, stacked, (((1,), (1,))),
                    precision=jax.lax.Precision.HIGHEST)  # (6, 2C)
        m0 = mom[0:1, :CHUNK]
        m_x = mom[1:2, :CHUNK]
        m_y = mom[2:3, :CHUNK]
        m_xx = mom[3:4, :CHUNK]
        m_xy = mom[4:5, :CHUNK]
        m_yy = mom[5:6, :CHUNK]
        d_z_direct = mom[0:1, CHUNK:]  # ones-column of the w*g_d block
        dacc = dacc + _pose_chain(
            pr, m0, m_x, m_y, m_xx, m_xy, m_yy, d_z_direct, x0, y0, fx, fy
        )
        wdw_sum = _dotf(jnp.ones((1, CHUNK), F32), wdw, (((1,), (0,))),
                        precision=jax.lax.Precision.HIGHEST)
        return cidx + 1, t_next, wdw_run + wdw_sum, dacc

    c_done, _t, _run, dacc = jax.lax.while_loop(
        live_cond, live_body,
        (jnp.int32(0), jnp.ones((1, P), F32), jnp.zeros((1, P), F32),
         jnp.zeros((1, 16), F32)),
    )

    @pl.when(c_done > 0)
    def _():
        _copy(c_done, jax.lax.rem(c_done, 2)).wait()

    for i_ in range(16):
        dcam_out[t * 16 + i_] = dacc[0, i_]


def _fused_probe_kernel(meta, cam, records_hbm, contrib_out, cd_out,
                        rec_scr, cscr, sem, csem, *, near, far):
    """Per-slot contribution probe: contrib[col] = 1 iff the slot is REACHED
    with live transmittance and has any footprint (alpha > 0 and
    t_prefix > T_EPS at some pixel). Slots failing this have zero forward
    weight, zero gradient, AND no effect on any live pixel's transmittance
    (if t_prefix <= T_EPS at a pixel, every later slot stays below T_EPS
    there whether or not this slot is removed), so compacting them away is
    exact at the probe pose. Contrib rides the slot-column layout; the first
    chunk's head columns belong to the previous tile and are RMW-merged
    (sequential ascending grid, same protocol as the general backward)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_tx = pl.num_programs(1)
    t = ti * n_tx + tj
    start = meta[1 + t]
    end = meta[2 + t]
    base = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    n_chunks = pl.cdiv(end - base, CHUNK)
    px, py = _pixel_xy(ti + meta[0], tj)
    cam_v = cam

    def chunk_cond(carry):
        cidx, t_cur = carry
        return (cidx < n_chunks) & (jnp.max(t_cur) > T_EPS)

    def chunk_body(carry):
        cidx, t_cur = carry
        chunk_col = base + cidx * CHUNK
        dma = pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(chunk_col, CHUNK)], rec_scr, sem
        )
        dma.start()
        dma.wait()
        rec = rec_scr[:, :]
        pr = _project_slots(rec, cam_v)
        cols = _fused_cols(pr, near, far)
        alpha, _dx, _dy = _fused_alpha(cols, px, py, chunk_col, start, end)
        one_minus = 1.0 - alpha
        incl = _scan_mul(one_minus)
        excl = jnp.concatenate([jnp.ones((1, P), F32), incl[:-1]], axis=0)
        t_prefix = t_cur * excl
        reach = (alpha > 0.0) & (t_prefix > T_EPS)
        keep = jnp.max(reach.astype(F32), axis=1, keepdims=True).T  # (1, C)

        lo = start - chunk_col
        rmw = (cidx == 0) & (lo > 0)

        @pl.when(rmw)
        def _():
            din = pltpu.make_async_copy(
                contrib_out.at[:, pl.ds(chunk_col, CHUNK)], cscr, csem
            )
            din.start()
            din.wait()

        @pl.when(jnp.logical_not(rmw))
        def _():
            cscr[:, :] = jnp.zeros((8, CHUNK), F32)

        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)
                   + chunk_col)
        in_seg_row = (col_ids >= start) & (col_ids < end)
        cscr[:, :] = jnp.where(in_seg_row, jnp.broadcast_to(keep, (8, CHUNK)),
                               cscr[:, :])
        dout = pltpu.make_async_copy(
            cscr, contrib_out.at[:, pl.ds(chunk_col, CHUNK)], csem
        )
        dout.start()
        dout.wait()
        return cidx + 1, t_cur * incl[CHUNK - 1:CHUNK]

    c_done, _t = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), jnp.ones((1, P), F32))
    )
    cd_out[t] = c_done


def fused_probe(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    """Run the contribution probe. Returns (contrib (m_pad,) f32, chunks_done
    (n_tiles,) int32). Columns beyond a tile's walked coverage hold garbage —
    compact_slot_buffer masks them from chunks_done."""
    kernel = functools.partial(_fused_probe_kernel, near=near, far=far)
    contrib, cd = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_ty * n_tx,), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((NUM_ISO_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((8, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_interpret(),
    )(meta, cam, slot3d)
    return contrib[0], cd


def compact_slot_buffer(slot3d, meta, contrib, chunks_done):
    """Pack contributing slot columns to the front of each tile's segment.

    The buffer keeps its padded size (static shapes); only the tile offsets
    shrink, so the render kernels walk far fewer chunks. Kept columns keep
    their tile-major depth order: the single-uint32 key (drop_bit << 31 | col)
    is unique, so an unstable sort yields [kept cols in original order |
    dropped cols]. New offsets are an exclusive cumsum of the keep mask.
    """
    m_pad = slot3d.shape[1]
    starts = meta[1:]
    n_tiles = starts.shape[0] - 1
    base_t = (starts[:-1] // CHUNK) * CHUNK
    cov_end = base_t + chunks_done * CHUNK
    cols = jnp.arange(m_pad, dtype=jnp.int32)
    tile_of_col = jnp.clip(
        jnp.searchsorted(starts, cols, side="right") - 1, 0, n_tiles - 1
    )
    live = (
        (cols >= starts[0]) & (cols < starts[n_tiles])
        & (cols < cov_end[tile_of_col]) & (contrib > 0.0)
    )
    key = ((1 - live.astype(jnp.uint32)) << 31) | cols.astype(jnp.uint32)
    _, perm = jax.lax.sort((key, cols), num_keys=1)
    compacted = jnp.take(slot3d.T, perm, axis=0).T  # row gather (fast path)
    ks = jnp.cumsum(live.astype(jnp.int32))
    ks_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), ks])
    new_starts = ks_excl[starts]
    return compacted, jnp.concatenate([meta[0:1], new_starts])


def cam_vector(viewmat, K, width, height):
    """Pack the camera into the (18,) scalar vector the kernels consume.
    Differentiable w.r.t. viewmat (autodiff chains d_cam back through it)."""
    return jnp.concatenate([
        jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
        viewmat[:3, :3].reshape(-1),
        viewmat[:3, 3],
        jnp.array([float(width), float(height)], F32),
    ]).astype(F32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_render(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    """Depth+alpha render of a slot-ordered frozen scene, differentiable
    w.r.t. the cam vector ONLY. Returns (depth_acc (H,W), alpha (H,W))."""
    outs = _fused_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far)
    return outs[0], outs[1]


def _fused_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    kernel = functools.partial(_fused_fwd_kernel, near=near, far=far)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_ty * n_tx,), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, cam
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NUM_ISO_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(meta, cam, slot3d)


def _fused_vjp_fwd(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far):
    outs = _fused_fwd_impl(slot3d, meta, cam, n_ty, n_tx, m_pad, near, far)
    return (outs[0], outs[1]), (slot3d, meta, cam, outs)


def _fused_vjp_bwd(n_ty, n_tx, m_pad, near, far, res, cot):
    slot3d, meta, cam, outs = res
    gd, ga = cot
    kernel = functools.partial(_fused_bwd_kernel, near=near, far=far)
    dcam_flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_ty * n_tx * 16,), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((2, NUM_ISO_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=_interpret(),
    )(
        meta, cam, slot3d,
        outs[0], outs[1], gd, ga,
    )
    d = jnp.sum(dcam_flat.reshape(-1, 16), axis=0)
    # d_cam layout: fx/fy/cx/cy get no grads (pose-only), R gets d[:9],
    # t gets d[9:12], W/H none.
    d_cam = jnp.concatenate([jnp.zeros((4,), F32), d[:12],
                             jnp.zeros((2,), F32)])
    return jnp.zeros_like(slot3d), None, d_cam


fused_render.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def build_slot_buffer(scene, viewmat, K, width: int, height: int,
                      near: float, far: float, big_budget: int = 64):
    """Project with the given pose, bin/sort, and gather the POSE-INDEPENDENT
    3D slot buffer (8, M_pad) + meta. Rebuilt every `resort_every` steps.
    big_budget: exact full-footprint binning for the top-B biggest splats
    (ops/binning.py). Assumes the isotropic-scene contract (module
    docstring): world cov = scales[:, 0]^2 * I, quats ignored."""
    from .projection import project_gaussians

    proj = project_gaussians(
        scene.means, scene.quats, scene.scales, viewmat, K, width, height,
        near, far,
    )
    binning = bin_and_sort(
        proj.mean2d, proj.radius, proj.depth, proj.valid, width, height,
        tile_h=TILE_H, tile_w=TILE_W, chunk=CHUNK, needs_inv_perm=False,
        big_budget=big_budget,
    )
    records = jnp.stack(
        [
            scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
            scene.scales[:, 0] * scene.scales[:, 0], scene.opacities,
        ]
        + [jnp.zeros_like(proj.depth)] * (NUM_ISO_ROWS - 5),
        axis=1,
    )  # (N, 8)
    slot3d = jnp.take(records, binning.pair_gauss, axis=0).T  # (8, M_pad)
    slot3d = jax.lax.stop_gradient(slot3d)
    meta = jnp.concatenate([jnp.zeros((1,), jnp.int32), binning.tile_starts])
    return slot3d, meta, binning


def render_tracking_depth(viewmat, K, width: int, height: int,
                          slot3d, meta, near: float = 1e-2,
                          far: float = 1e10, mesh=None):
    """Expected-depth render from a prebuilt slot buffer; differentiable
    w.r.t. viewmat. Returns (depth (H,W), alpha (H,W)).

    With a ("tiles",) mesh, tile rows shard across devices and the pose
    gradient all-reduces automatically (parallel/sharded.py)."""
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    m_pad = slot3d.shape[1]
    cam = cam_vector(viewmat, K, width, height)
    if mesh is None:
        d_acc, alpha = fused_render(
            slot3d, meta, cam, n_ty, n_tx, m_pad, near, far
        )
    else:
        from ..parallel.sharded import sharded_fused_render

        d = mesh.shape["tiles"]
        n_ty_pad = -(-n_ty // d) * d
        tile_starts = meta[1:]
        extra = n_ty_pad * n_tx - (n_ty * n_tx)
        tile_starts = jnp.concatenate(
            [tile_starts, jnp.broadcast_to(tile_starts[-1], (extra,))]
        )
        d_acc, alpha = sharded_fused_render(
            slot3d, tile_starts, cam, n_ty_pad, n_tx, mesh, near, far
        )
    d_acc = d_acc[:height, :width]
    alpha = alpha[:height, :width]
    depth = d_acc / jnp.maximum(alpha, 1e-10)
    return depth, alpha
