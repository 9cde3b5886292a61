"""Public rasterization API — the gsplat.rasterization equivalent.

`rasterize(...)` mirrors the call surface the reference uses
(src/my_gsplat/model.py:195-213, src/my_gsplat/geometry.py:117-132):
means/quats/scales/opacities/SH colors + viewmat/K/width/height with
render_mode in {"RGB", "RGB+ED", "ED"} — returning (render (H, W, C),
alpha (H, W)). Differentiable w.r.t. the viewmat (pose gradients) and all
Gaussian parameters.

Backends:
  * "reference": dense pure-jnp oracle (exact, O(N*H*W), toy scale).
  * "pallas":    tile-binned Pallas TPU kernels with a custom VJP (production).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import project_gaussians
from .rasterize_ref import rasterize_reference
from .sh import eval_sh

ED_ALPHA_EPS = 1e-10


def _view_dirs(means: jnp.ndarray, viewmat: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian view directions mean - campos (campos = -R^T t)."""
    R = viewmat[:3, :3]
    campos = -R.T @ viewmat[:3, 3]
    return means - campos


@partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "render_mode", "backend",
                     "mesh", "antialiased"),
)
def rasterize(
    means: jnp.ndarray,  # (N, 3)
    quats: jnp.ndarray,  # (N, 4) wxyz
    scales: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,  # (N, K, 3) SH coeffs (sh_degree given) or (N, 3) raw
    viewmat: jnp.ndarray,  # (4, 4) world->camera
    K: jnp.ndarray,  # (3, 3)
    width: int,
    height: int,
    sh_degree: int | None = 1,
    near_plane: float = 1e-2,
    far_plane: float = 1e10,
    render_mode: str = "RGB+ED",
    backend: str = "reference",
    mesh=None,
    antialiased: bool = False,
):
    """Render one camera. Returns (render, alpha).

    render channels: RGB -> 3; RGB+ED -> 4 (rgb + alpha-normalized expected
    depth); ED -> 1. gsplat parity: ED channel = depth_acc / clamp(alpha,1e-10).
    antialiased=True applies gsplat's antialiased-mode opacity compensation
    (the reference always runs classic, GsConfig.antialiased=False).
    """
    if render_mode not in ("RGB", "RGB+ED", "ED"):
        raise ValueError(f"unsupported render_mode {render_mode}")

    proj = project_gaussians(
        means, quats, scales, viewmat, K, width, height, near_plane,
        far_plane, antialiased=antialiased,
    )
    if antialiased:
        opacities = opacities * proj.opacity_comp

    if render_mode == "ED":
        rgb = jnp.zeros((means.shape[0], 0), means.dtype)
    elif sh_degree is not None:
        rgb = eval_sh(sh_degree, colors, _view_dirs(means, viewmat))
    else:
        rgb = colors

    if backend == "reference":
        image, alpha = rasterize_reference(
            proj.mean2d, proj.conic, proj.depth, opacities, rgb, proj.valid,
            width, height,
        )
    elif backend == "pallas":
        from .rasterize_pallas import rasterize_pallas

        image, alpha = rasterize_pallas(
            proj.mean2d, proj.conic, proj.depth, opacities, rgb, proj.valid,
            proj.radius, width, height, mesh=mesh,
        )
    else:
        raise ValueError(f"unknown backend {backend}")

    # Last channel is accumulated depth -> normalize to expected depth.
    ed = image[..., -1:] / jnp.maximum(alpha[..., None], ED_ALPHA_EPS)
    if render_mode == "ED":
        render = ed
    elif render_mode == "RGB+ED":
        render = jnp.concatenate([image[..., :-1], ed], axis=-1)
    else:
        render = image[..., :-1]
    return render, alpha
