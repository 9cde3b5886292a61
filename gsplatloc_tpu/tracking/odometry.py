"""Dense hybrid RGB-D odometry (multi-scale photometric + geometric GN).

TPU-native equivalent of the reference's Open3D HYBRID path
(o3d.t.pipelines.odometry.rgbd_odometry_multi_scale with Method.Hybrid,
src/component/tracker.py:211-252; Park et al. 2017 "Colored Point Cloud
Registration Revisited" energy): estimates T_target_source between two RGB-D
frames by Gauss-Newton on per-pixel photometric (intensity) + geometric
(depth) residuals over an image pyramid. Unlike the point-cloud ICP family
this is a dense image-space method — all (H, W) vector math, fully jitted,
one device computation per pyramid level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.lie import se3_exp


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling (H and W must be even; crop if not)."""
    h, w = img.shape[:2]
    img = img[: h - h % 2, : w - w % 2]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                   + img[0::2, 1::2] + img[1::2, 1::2])


def _downsample_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """2x2 pooling of depth, averaging only valid (>0) pixels."""
    h, w = depth.shape
    depth = depth[: h - h % 2, : w - w % 2]
    stack = jnp.stack([depth[0::2, 0::2], depth[1::2, 0::2],
                       depth[0::2, 1::2], depth[1::2, 1::2]])
    valid = (stack > 0).astype(depth.dtype)
    s = jnp.sum(stack * valid, axis=0)
    c = jnp.sum(valid, axis=0)
    return jnp.where(c > 0, s / jnp.maximum(c, 1), 0.0)


def _gradients(img: jnp.ndarray):
    """Central-difference gradients (gx, gy) with zero borders."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _masked_gradients(img: jnp.ndarray, valid: jnp.ndarray):
    """Central-difference gradients zeroed where either neighbor is invalid
    (a depth hole next to a 3 m surface otherwise reads as a ~1.5 m/px
    gradient and pulls the GN normal equations at every depth edge)."""
    gx, gy = _gradients(img)
    vx = jnp.zeros_like(valid).at[:, 1:-1].set(
        valid[:, 2:] & valid[:, :-2])
    vy = jnp.zeros_like(valid).at[1:-1, :].set(
        valid[2:, :] & valid[:-2, :])
    return jnp.where(vx, gx, 0.0), jnp.where(vy, gy, 0.0)


def _bilinear_valid(img: jnp.ndarray, valid: jnp.ndarray,
                    u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear sample gated on ALL FOUR corners being valid: blending an
    invalid (0) depth corner into the sample biases it low (e.g. a 0.05
    weight at 3 m depth is a 0.15 m error that still passes the
    depth_diff_max gate) — Open3D's hybrid odometry rejects such samples
    outright. Returns (values, in_bounds_and_all_corners_valid)."""
    val, inb = _bilinear(img, u, v)
    vf = valid.astype(img.dtype)
    cmin, _ = _bilinear(vf, u, v)
    return val, inb & (cmin >= 1.0 - 1e-6)


def _bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear sample img at (u, v); returns (values, in_bounds_mask)."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    inb = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)
    i00 = img[v0c, u0c]
    i01 = img[v0c, u0c + 1]
    i10 = img[v0c + 1, u0c]
    i11 = img[v0c + 1, u0c + 1]
    val = (i00 * (1 - fu) * (1 - fv) + i01 * fu * (1 - fv)
           + i10 * (1 - fu) * fv + i11 * fu * fv)
    return val, inb


@partial(jax.jit, static_argnames=("iterations",))
def _gn_level(intensity_s, depth_s, intensity_t, depth_t, K, T0,
              iterations: int, sigma: float, max_depth: float,
              depth_diff_max: float):
    h, w = depth_s.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    us, vs = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    valid_s = (depth_s > 0) & (depth_s < max_depth)
    xs = (us - cx) / fx * depth_s
    ys = (vs - cy) / fy * depth_s

    valid_t = (depth_t > 0) & (depth_t < max_depth)
    gtx, gty = _gradients(intensity_t)
    gdx, gdy = _masked_gradients(depth_t, valid_t)

    sq_i = jnp.sqrt(sigma)
    sq_d = jnp.sqrt(1.0 - sigma)

    def gn_step(_, T):
        R = T[:3, :3]
        t = T[:3, 3]
        px = R[0, 0] * xs + R[0, 1] * ys + R[0, 2] * depth_s + t[0]
        py = R[1, 0] * xs + R[1, 1] * ys + R[1, 2] * depth_s + t[1]
        pz = R[2, 0] * xs + R[2, 1] * ys + R[2, 2] * depth_s + t[2]
        pz_safe = jnp.maximum(pz, 1e-6)
        u = fx * px / pz_safe + cx
        v = fy * py / pz_safe + cy

        it_samp, inb1 = _bilinear(intensity_t, u, v)
        dt_samp, dt_ok = _bilinear_valid(depth_t, valid_t, u, v)
        gix, inb2 = _bilinear(gtx, u, v)
        giy, _ = _bilinear(gty, u, v)
        gdx_s, _ = _bilinear(gdx, u, v)
        gdy_s, _ = _bilinear(gdy, u, v)

        r_i = it_samp - intensity_s
        r_d = dt_samp - pz
        ok = (valid_s & inb1 & inb2 & (pz > 0)
              & dt_ok & (dt_samp > 0) & (jnp.abs(r_d) < depth_diff_max))
        okf = ok.astype(jnp.float32)

        # d u / d p' and d p' / d xi = [-[p']x | I]
        iz = 1.0 / pz_safe
        du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * px * iz * iz], -1)
        dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * py * iz * iz], -1)
        # rows of dp'/dxi for a 3-vector q: dq/dw = -[q]x ; dq/dv = I
        # J_geom for p'_z: e_z^T dp'/dxi = [-(e_z x p')^T?, ...] computed below
        def chain(gu, gv):
            # (H, W, 3) gradient w.r.t. p'
            gp = gu[..., None] * du + gv[..., None] * dv
            # w.r.t. xi: rotational part = p' x gp (since d p'/dw = -[p']x,
            # g^T (-[p']x) = (p' x g)^T), translational part = gp
            px_ = jnp.stack([px, py, pz], -1)
            rot = jnp.cross(px_, gp)
            return jnp.concatenate([rot, gp], axis=-1)  # (H, W, 6)

        J_i = sq_i * chain(gix, giy)
        # geometric: d r_d/dxi = chain(grad depth_t) - d p'_z/dxi
        ez_rot = jnp.stack([py, -px, jnp.zeros_like(px)], -1)  # p' x e_z
        dz_dxi = jnp.concatenate(
            [ez_rot, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                      px.shape + (3,))], axis=-1)
        J_d = sq_d * (chain(gdx_s, gdy_s) - dz_dxi)
        r_iw = sq_i * r_i
        r_dw = sq_d * r_d

        Jw_i = J_i * okf[..., None]
        Jw_d = J_d * okf[..., None]
        Jf_i = Jw_i.reshape(-1, 6)
        Jf_d = Jw_d.reshape(-1, 6)
        H6 = (jnp.matmul(Jf_i.T, Jf_i, precision=jax.lax.Precision.HIGHEST)
              + jnp.matmul(Jf_d.T, Jf_d, precision=jax.lax.Precision.HIGHEST))
        g6 = (Jf_i.T @ (r_iw * okf).ravel() + Jf_d.T @ (r_dw * okf).ravel())
        H6 = H6 + 1e-6 * jnp.eye(6)
        dx = -jnp.linalg.solve(H6, g6)
        return se3_exp(dx) @ T

    return jax.lax.fori_loop(0, iterations, gn_step, T0)


def rgbd_odometry_multi_scale(
    src_rgb,  # (H, W, 3) in [0,1]
    src_depth,  # (H, W) meters
    tgt_rgb,
    tgt_depth,
    K,  # (3, 3)
    init_T=None,  # (4, 4) T_target_source
    levels: int = 3,
    iterations=(10, 10, 10),  # coarse->fine
    sigma: float = 0.5,
    max_depth: float = 100.0,
    depth_diff_max: float = 0.3,
):
    """Estimate T_target_source (maps source-frame points into the target
    camera frame). Coarse-to-fine over `levels` pyramid levels."""
    import numpy as np

    i_s = jnp.mean(jnp.asarray(src_rgb, jnp.float32), axis=-1)
    i_t = jnp.mean(jnp.asarray(tgt_rgb, jnp.float32), axis=-1)
    d_s = jnp.asarray(src_depth, jnp.float32)
    d_t = jnp.asarray(tgt_depth, jnp.float32)
    K = jnp.asarray(K, jnp.float32)

    pyr = [(i_s, d_s, i_t, d_t, K)]
    for _ in range(levels - 1):
        i_s = _downsample2(i_s)
        i_t = _downsample2(i_t)
        d_s = _downsample_depth(d_s)
        d_t = _downsample_depth(d_t)
        K = K.at[:2, :].multiply(0.5)
        pyr.append((i_s, d_s, i_t, d_t, K))

    T = jnp.asarray(init_T if init_T is not None else np.eye(4), jnp.float32)
    for lvl in reversed(range(levels)):  # coarse -> fine
        i_s, d_s, i_t, d_t, K_l = pyr[lvl]
        # iterations is documented coarse->fine: entry 0 applies to the
        # COARSEST level (pyr[levels-1], processed first)
        T = _gn_level(i_s, d_s, i_t, d_t, K_l, T,
                      int(iterations[levels - 1 - lvl]), sigma, max_depth,
                      depth_diff_max)
    return np.asarray(T)
