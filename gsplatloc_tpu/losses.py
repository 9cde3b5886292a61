"""Tracking losses (pure JAX).

Parity with reference src/my_gsplat/loss.py and the trainer's weighting
(src/my_gsplat/gs_trainer_total.py:104-150):
  total = depth_lambda * L1(depth) + (1 - depth_lambda - normal_lambda) *
          L1(sobel edges), with zero-rendered-depth pixels masked by
          MULTIPLYING both images by the (stop-gradient) mask and averaging
          over ALL pixels (torch F.l1_loss 'mean' semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops.camera import depth_to_normal
from .ops.filters import sobel_magnitude


def _reduce(diff: jnp.ndarray, loss_type: str) -> jnp.ndarray:
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_type == "mse":
        return jnp.mean(diff * diff)
    raise ValueError(f"invalid loss type {loss_type}")


def depth_loss(depth_a: jnp.ndarray, depth_b: jnp.ndarray, loss_type: str = "l1"):
    """Mean |a-b| (or squared) over all pixels (reference loss.py:10-30)."""
    return _reduce(depth_a - depth_b, loss_type)


def silhouette_loss(depth_a: jnp.ndarray, depth_b: jnp.ndarray, loss_type: str = "l1"):
    """Sobel-edge distance between (H, W) depth images (reference loss.py:33-59)."""
    return _reduce(sobel_magnitude(depth_a) - sobel_magnitude(depth_b), loss_type)


def normal_consistency_loss(
    depth_real: jnp.ndarray,
    depth_rendered: jnp.ndarray,
    K: jnp.ndarray,
    loss_type: str = "cosine",
):
    """Normal-map consistency (reference loss.py:62-101).

    cosine: 1 - mean cosine similarity along dim=1 (the reference computes
    cosine over the W axis of (H, W, 3) maps — kept for parity).
    """
    n_real = depth_to_normal(depth_real, K)
    n_rend = depth_to_normal(depth_rendered, K)
    if loss_type == "cosine":
        num = jnp.sum(n_real * n_rend, axis=1)
        den = jnp.linalg.norm(n_real, axis=1) * jnp.linalg.norm(n_rend, axis=1)
        return 1.0 - jnp.mean(num / jnp.maximum(den, 1e-8))
    return _reduce(n_real - n_rend, loss_type)


class TrackingLoss(NamedTuple):
    total: jnp.ndarray
    depth: jnp.ndarray
    silhouette: jnp.ndarray


def tracking_loss(
    rendered_depth: jnp.ndarray,  # (H, W)
    gt_depth: jnp.ndarray,  # (H, W)
    depth_lambda: float = 0.8,
    normal_lambda: float = 0.0,
    loss_type: str = "l1",
) -> TrackingLoss:
    """The trainer's masked depth + silhouette objective
    (gs_trainer_total.py:109-150). The mask (rendered depth != 0) is a
    stop-gradient factor applied to BOTH images before the losses.
    """
    mask = jax.lax.stop_gradient((rendered_depth != 0.0).astype(rendered_depth.dtype))
    d = rendered_depth * mask
    g = gt_depth * mask
    dl = depth_loss(d, g, loss_type)
    sil_w = 1.0 - depth_lambda - normal_lambda
    # static zero weight (any non-tracer numeric — python float, numpy
    # scalar): skip the Sobel stencils entirely (XLA does not DCE
    # mul-by-0.0 for floats — NaN semantics); the timing A/B knob for the
    # loss stage and the depth-only product config. NOTE: in this branch
    # the silhouette DIAGNOSTIC is reported as 0.0, not the true
    # silhouette value — depth-only runs don't pay for an unused metric.
    skip_sobel = (not isinstance(sil_w, jax.core.Tracer)
                  and float(sil_w) == 0.0)
    if skip_sobel:
        sl = jnp.zeros_like(dl)
    else:
        sl = silhouette_loss(d, g, loss_type)
    total = dl * depth_lambda + sl * sil_w
    return TrackingLoss(total=total, depth=dl, silhouette=sl)
