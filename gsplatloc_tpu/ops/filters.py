"""Image filters (pure JAX): Sobel edges, SSIM/PSNR image metrics.

Replaces the reference's kornia.filters.sobel (used by the silhouette loss,
src/my_gsplat/loss.py:33-59) and torchmetrics SSIM/PSNR (src/data/base.py:45-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Normalized Sobel kernels (kornia normalized=True divides by sum(|k|) = 8).
_SOBEL_X = (
    jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32) / 8.0
)
_SOBEL_Y = _SOBEL_X.T


def _conv2d_same_replicate(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate (H, W) image with a 3x3 kernel, replicate padding."""
    padded = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    out = jax.lax.conv_general_dilated(
        padded[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # fp32 accumulation: the TPU default (bf16 inputs to the MXU) costs
        # ~7e-4 relative error, visible in edge-loss parity tests.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


def sobel_magnitude(img: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(H, W) -> (H, W) Sobel gradient magnitude.

    Matches kornia.filters.sobel(normalized=True, eps=1e-6): normalized kernels,
    replicate padding, sqrt(gx^2 + gy^2 + eps).

    Implemented as a shift-add stencil, NOT lax.conv: a 1-channel 3x3 conv is
    degenerate for the TPU MXU and lowers pathologically (~20 ms per conv at
    680x1200 — the tracking loss differentiates several, which dominated the
    whole pose-optimization step at ~170 ms). The stencil is a handful of
    fused VPU adds; values are identical f32 math.
    """
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    dxc = p[:, 2:] - p[:, :-2]  # (H+2, W) central x-difference
    gx = (dxc[:-2] + 2.0 * dxc[1:-1] + dxc[2:]) * 0.125
    dyc = p[2:, :] - p[:-2, :]  # (H, W+2) central y-difference
    gy = (dyc[:, :-2] + 2.0 * dyc[:, 1:-1] + dyc[:, 2:]) * 0.125
    return jnp.sqrt(gx * gx + gy * gy + eps)


def _sobel_magnitude_conv(img: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Reference conv-based Sobel (kept for parity tests)."""
    gx = _conv2d_same_replicate(img, _SOBEL_X)
    gy = _conv2d_same_replicate(img, _SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (torchmetrics PSNR parity)."""
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-20))


def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) or (H, W) image pair.

    Gaussian-weighted SSIM (torchmetrics StructuralSimilarityIndexMeasure
    defaults: 11x11 gaussian, sigma 1.5, k1=0.01, k2=0.03).
    """
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel1d(kernel_size, sigma)

    def blur(x):  # separable gaussian over H and W of (H, W, C)
        x = jnp.apply_along_axis(lambda v: jnp.convolve(v, kern, mode="valid"), 0, x)
        x = jnp.apply_along_axis(lambda v: jnp.convolve(v, kern, mode="valid"), 1, x)
        return x

    mu_a, mu_b = blur(a), blur(b)
    mu_aa, mu_bb, mu_ab = blur(a * a), blur(b * b), blur(a * b)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
