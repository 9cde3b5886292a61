"""Headless visualization: RGB-D comparison panels, trajectory plots,
depth colormaps.

Replaces the reference's visualization layer (src/component/visualize.py and
WandbLogger.plot_rgbd, src/eval/logger.py:119-242) with matplotlib-Agg
figures written to disk (no GUI, no wandb requirement).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def depth_to_colormap(depth: np.ndarray, cmap: str = "viridis"):
    """(H, W) depth -> (H, W, 3) uint8 colormap image
    (reference visualize.py depth_to_colormap)."""
    plt = _mpl()
    d = np.asarray(depth, np.float64)
    valid = d > 0
    lo = d[valid].min() if valid.any() else 0.0
    hi = d[valid].max() if valid.any() else 1.0
    norm = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    rgba = plt.get_cmap(cmap)(norm)
    rgba[~valid] = 0
    return (rgba[..., :3] * 255).astype(np.uint8)


def plot_rgbd_panel(
    depth_gt: np.ndarray,
    depth_rendered: np.ndarray,
    out_path: str | Path,
    rgb_gt: np.ndarray | None = None,
    rgb_rendered: np.ndarray | None = None,
    title: str = "",
):
    """GT vs rendered depth (+ optional RGB) comparison grid with diff and
    silhouette-edge diff (reference logger.plot_rgbd, 3x3 grid)."""
    from ..ops.filters import sobel_magnitude
    import jax.numpy as jnp

    plt = _mpl()
    d_gt = np.asarray(depth_gt)
    d_r = np.asarray(depth_rendered)
    e_gt = np.asarray(sobel_magnitude(jnp.asarray(d_gt)))
    e_r = np.asarray(sobel_magnitude(jnp.asarray(d_r)))
    sil = np.abs(e_gt - e_r)  # == eval.metrics.silhouette_diff
    rows = 3 if rgb_gt is not None else 2
    fig, axes = plt.subplots(rows, 3, figsize=(12, 3.2 * rows))
    axes = np.atleast_2d(axes)
    for ax in axes.ravel():
        ax.axis("off")
    axes[0, 0].imshow(d_gt, cmap="viridis")
    axes[0, 0].set_title("depth GT")
    axes[0, 1].imshow(d_r, cmap="viridis")
    axes[0, 1].set_title("depth rendered")
    im = axes[0, 2].imshow(np.abs(d_gt - d_r), cmap="magma")
    axes[0, 2].set_title("|depth diff|")
    fig.colorbar(im, ax=axes[0, 2], fraction=0.04)
    axes[1, 0].imshow(e_gt, cmap="gray")
    axes[1, 0].set_title("edges GT")
    axes[1, 1].imshow(e_r, cmap="gray")
    axes[1, 1].set_title("edges rendered")
    axes[1, 2].imshow(sil, cmap="magma")
    axes[1, 2].set_title("silhouette diff")
    if rgb_gt is not None:
        axes[2, 0].imshow(np.clip(np.asarray(rgb_gt), 0, 1))
        axes[2, 0].set_title("rgb GT")
        if rgb_rendered is not None:
            axes[2, 1].imshow(np.clip(np.asarray(rgb_rendered), 0, 1))
            axes[2, 1].set_title("rgb rendered")
            axes[2, 2].imshow(
                np.abs(np.asarray(rgb_gt) - np.asarray(rgb_rendered)).mean(-1),
                cmap="magma",
            )
            axes[2, 2].set_title("|rgb diff|")
    if title:
        fig.suptitle(title)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_trajectory(
    poses_est: np.ndarray,  # (F, 4, 4)
    out_path: str | Path,
    poses_gt: np.ndarray | None = None,
    axes_xy: tuple[int, int] = (0, 2),
):
    """2D top-down trajectory plot (reference PcdVisualizer._update_2d_plot)."""
    plt = _mpl()
    a, b = axes_xy
    fig, ax = plt.subplots(figsize=(6, 6))
    est = np.asarray(poses_est)
    ax.plot(est[:, a, 3], est[:, b, 3], "b-", label="estimated")
    if poses_gt is not None:
        gt = np.asarray(poses_gt)
        ax.plot(gt[:, a, 3], gt[:, b, 3], "g--", label="ground truth")
    ax.set_xlabel("xyz"[a])
    ax.set_ylabel("xyz"[b])
    ax.legend()
    ax.set_aspect("equal")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_bar(labels, values, out_path: str | Path, title: str = "",
             ylabel: str = ""):
    """Bar chart of per-scene/per-method scalars (reference
    WandbLogger.plot_bar, src/eval/logger.py:244-256)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(max(4, 0.8 * len(labels)), 3.6))
    ax.bar(range(len(labels)), np.asarray(values, np.float64))
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels([str(l) for l in labels], rotation=45, ha="right")
    if ylabel:
        ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    ax.grid(alpha=0.3, axis="y")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_error_series(series: dict, out_path: str | Path):
    """Per-frame eT/eR curves (reference visualize_trajectory + wandb
    scalar panels)."""
    plt = _mpl()
    fig, axes = plt.subplots(1, len(series), figsize=(5 * len(series), 3.2))
    if len(series) == 1:
        axes = [axes]
    for ax, (name, values) in zip(axes, series.items()):
        ax.plot(values)
        ax.set_title(name)
        ax.set_xlabel("frame")
        ax.grid(alpha=0.3)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return out_path
