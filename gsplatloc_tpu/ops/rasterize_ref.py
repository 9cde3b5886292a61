"""Dense oracle rasterizer (pure jnp, autodiff-able) — the correctness anchor.

Evaluates EVERY projected Gaussian at every pixel with exact front-to-back
alpha compositing, reproducing gsplat's per-pixel loop semantics
(alpha floor 1/255, ceiling 0.999, transmittance stop at 1e-4; consumed by the
reference at src/my_gsplat/model.py:195-213). O(N * H * W) — intended for
toy-scale golden tests and as the autodiff reference for the Pallas kernels'
custom VJP, not for production rendering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4


def composite_pixels(
    pix_xy: jnp.ndarray,  # (P, 2) pixel centers
    mean2d: jnp.ndarray,  # (N, 2) depth-ascending order
    conic: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    channels: jnp.ndarray,  # (N, C) per-Gaussian channel payload (rgb, z, ...)
    valid: jnp.ndarray,  # (N,) bool
):
    """Front-to-back compositing of sorted Gaussians over a block of pixels.

    Returns (out (P, C) accumulated channels, alpha (P,)).
    """
    dx = pix_xy[:, None, 0] - mean2d[None, :, 0]  # (P, N)
    dy = pix_xy[:, None, 1] - mean2d[None, :, 1]
    sigma = 0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) + (
        conic[None, :, 1] * dx * dy
    )
    alpha = opacity[None, :] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN) & valid[None, :], alpha, 0.0)

    # T_prev[n] = prod_{m<n}(1-alpha_m); P_incl[n] = T_prev[n]*(1-alpha_n).
    one_minus = 1.0 - alpha
    p_incl = jnp.cumprod(one_minus, axis=1)  # (P, N)
    t_prev = jnp.concatenate(
        [jnp.ones_like(p_incl[:, :1]), p_incl[:, :-1]], axis=1
    )  # prod over m < n
    # gsplat stops BEFORE accumulating the Gaussian that would push T <= 1e-4.
    live = p_incl > T_EPS
    w = jnp.where(live, t_prev * alpha, 0.0)  # (P, N)
    out = jnp.matmul(w, channels, precision=jax.lax.Precision.HIGHEST)  # (P, C)
    return out, jnp.sum(w, axis=1)


def rasterize_reference(
    mean2d: jnp.ndarray,  # (N, 2)
    conic: jnp.ndarray,  # (N, 3)
    depth: jnp.ndarray,  # (N,) camera z (sort key AND the ED channel)
    opacity: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,  # (N, C_rgb) evaluated colors (may be empty C_rgb=0)
    valid: jnp.ndarray,  # (N,) bool
    width: int,
    height: int,
    row_block: int = 16,
):
    """Dense oracle render. Returns (image (H, W, C_rgb+1), alpha (H, W)).

    The last channel of `image` is the UNNORMALIZED accumulated depth; the
    caller divides by clamp(alpha, 1e-10) for gsplat 'ED' parity (that division
    lives in ops.rasterize.render so oracle and Pallas share it).
    """
    n = mean2d.shape[0]
    sort_depth = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    mean2d_s = mean2d[order]
    conic_s = conic[order]
    opacity_s = opacity[order]
    valid_s = valid[order]
    channels_s = jnp.concatenate([colors, depth[:, None]], axis=-1)[order]  # (N, C)

    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)

    pad_h = -(-height // row_block) * row_block
    ys_pad = jnp.pad(ys, (0, pad_h - height))

    def render_rows(y_blk):  # (row_block,)
        gx, gy = jnp.meshgrid(xs, y_blk)  # (rb, W)
        pix = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (rb*W, 2)
        out, al = composite_pixels(pix, mean2d_s, conic_s, opacity_s, channels_s, valid_s)
        return out.reshape(y_blk.shape[0], width, -1), al.reshape(y_blk.shape[0], width)

    outs, alphas = jax.lax.map(render_rows, ys_pad.reshape(-1, row_block))
    image = outs.reshape(pad_h, width, -1)[:height]
    alpha = alphas.reshape(pad_h, width)[:height]
    return image, alpha
