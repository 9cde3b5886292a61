"""Multi-chip sharding of the rasterizer: tiles over devices, pose grads
all-reduced.

The reference is strictly single-GPU (SURVEY.md §2.3); this is the new
scale-out capability of the TPU build. Design (scaling-book style):

  * mesh: 1-D ("tiles",) — pixel-tile ROWS of the rasterized image are
    sharded across devices; each device composites a contiguous band of tile
    rows with `ops.rasterize_pallas.composite_tiles` (shard_map).
  * the sorted slot/record buffers are replicated (projection + binning +
    sort are cheap relative to compositing and run under GSPMD); the
    transpose of that replication in the backward is an automatic psum —
    i.e. the 7-dim pose gradient is all-reduced over ICI with no hand-written
    collectives.
  * the loss on the (row-sharded) rendered image is plain jnp — GSPMD
    partitions the Sobel convolution with halo exchange automatically.

This composes with jit/grad: `optimize_pose(..., mesh=mesh)` runs the entire
early-stopped tracking loop SPMD across the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_tile_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("tiles",))


def sharded_composite(
    packed_records: jnp.ndarray,  # (16, M_pad) slot buffer, replicated
    tile_starts: jnp.ndarray,  # (n_ty*n_tx + 1,) int32, replicated
    n_ty: int,
    n_tx: int,
    mesh: Mesh,
):
    """Tile-row-sharded version of ops.rasterize_pallas.composite_tiles.

    n_ty must be a multiple of mesh.shape['tiles'] (pad the tile grid).
    Returns the same 5 full-image arrays, row-sharded across the mesh.
    """
    from ..ops.rasterize_pallas import composite_tiles

    d = mesh.shape["tiles"]
    if n_ty % d != 0:
        raise ValueError(f"n_ty={n_ty} not divisible by mesh size {d}")
    rows_per = n_ty // d
    seg = rows_per * n_tx
    m_pad = packed_records.shape[1]

    # per-device meta rows: [row_offset, starts[d*seg : (d+1)*seg + 1]]
    idx = jnp.arange(d, dtype=jnp.int32)[:, None] * seg + jnp.arange(
        seg + 1, dtype=jnp.int32
    )[None, :]
    starts_slices = tile_starts[idx]  # (D, seg+1)
    row_offs = (jnp.arange(d, dtype=jnp.int32) * rows_per)[:, None]
    metas = jnp.concatenate([row_offs, starts_slices], axis=1)  # (D, seg+2)

    def per_device(records, meta):
        return composite_tiles(records, meta[0], rows_per, n_tx, m_pad)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("tiles")),
        out_specs=(P("tiles", None),) * 5,
        check_vma=False,
    )(packed_records, metas)


def sharded_fused_render(
    slot3d: jnp.ndarray,  # (16, M_pad) 3D slot buffer, replicated
    tile_starts: jnp.ndarray,  # (n_ty*n_tx + 1,) int32, replicated
    cam: jnp.ndarray,  # (18,) camera scalar vector (differentiable)
    n_ty: int,
    n_tx: int,
    mesh: Mesh,
    near: float,
    far: float,
):
    """Tile-row-sharded fused tracking render (ops/fused_tracking.py).

    The slot buffer and cam vector are replicated; each device renders its
    band of tile rows and computes its tiles' pose-gradient partials — the
    transpose of cam's replication psums the 12-dim pose gradient over ICI.
    Returns (depth_acc, alpha), row-sharded.
    """
    from ..ops.fused_tracking import fused_render

    d = mesh.shape["tiles"]
    if n_ty % d != 0:
        raise ValueError(f"n_ty={n_ty} not divisible by mesh size {d}")
    rows_per = n_ty // d
    seg = rows_per * n_tx
    m_pad = slot3d.shape[1]

    idx = jnp.arange(d, dtype=jnp.int32)[:, None] * seg + jnp.arange(
        seg + 1, dtype=jnp.int32
    )[None, :]
    starts_slices = tile_starts[idx]
    row_offs = (jnp.arange(d, dtype=jnp.int32) * rows_per)[:, None]
    metas = jnp.concatenate([row_offs, starts_slices], axis=1)

    def per_device(slot, meta, cam_v):
        return fused_render(slot, meta[0], cam_v, rows_per, n_tx, m_pad,
                            near, far)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("tiles"), P()),
        out_specs=(P("tiles", None), P("tiles", None)),
        check_vma=False,
    )(slot3d, metas, cam)


def sharded_subtile_render(
    slot3d: jnp.ndarray,  # (16, M_pad) 3D slot buffer, replicated
    subtile_starts: jnp.ndarray,  # (n_ty*n_tx*N_SUB + 1,) int32, replicated
    cam: jnp.ndarray,  # (18,) camera scalar vector (differentiable)
    n_ty: int,
    n_tx: int,
    mesh: Mesh,
    near: float,
    far: float,
):
    """Tile-row-sharded sub-tile tracking render (ops/fused_subtile.py).

    Same protocol as sharded_fused_render — the sub-tile ids are row-major
    within each (16, 128) macro tile, so a band of macro-tile rows owns a
    contiguous slice of the sub-tile segment-offset array. Each device's
    pose-gradient partial psums automatically through cam's replication
    transpose. Returns (depth_acc, alpha), row-sharded."""
    from ..ops.fused_subtile import N_SUB, subtile_render

    d = mesh.shape["tiles"]
    if n_ty % d != 0:
        raise ValueError(f"n_ty={n_ty} not divisible by mesh size {d}")
    rows_per = n_ty // d
    seg = rows_per * n_tx * N_SUB
    m_pad = slot3d.shape[1]

    idx = jnp.arange(d, dtype=jnp.int32)[:, None] * seg + jnp.arange(
        seg + 1, dtype=jnp.int32
    )[None, :]
    starts_slices = subtile_starts[idx]  # (D, seg+1)
    row_offs = (jnp.arange(d, dtype=jnp.int32) * rows_per)[:, None]
    metas = jnp.concatenate([row_offs, starts_slices], axis=1)

    def per_device(slot, meta, cam_v):
        return subtile_render(slot, meta[0], cam_v, rows_per, n_tx, m_pad,
                              near, far)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("tiles"), P()),
        out_specs=(P("tiles", None), P("tiles", None)),
        check_vma=False,
    )(slot3d, metas, cam)


def _band_metas(starts: jnp.ndarray, d: int, seg: int, rows_per: int):
    """Per-device [row_offset, starts-slice] meta rows (the shared
    protocol of the sharded fused/sub-tile/K-cover wrappers)."""
    idx = jnp.arange(d, dtype=jnp.int32)[:, None] * seg + jnp.arange(
        seg + 1, dtype=jnp.int32
    )[None, :]
    starts_slices = starts[idx]  # (D, seg+1)
    row_offs = (jnp.arange(d, dtype=jnp.int32) * rows_per)[:, None]
    return jnp.concatenate([row_offs, starts_slices], axis=1)


def sharded_kcover_build(
    slot3d: jnp.ndarray,  # (8, M_pad) 3D slot buffer, replicated
    subtile_starts: jnp.ndarray,  # (n_ty*n_tx*N_SUB + 1,) int32, replicated
    cam: jnp.ndarray,  # (N_CAM,) camera scalar vector (selection pose)
    n_ty: int,
    n_tx: int,
    mesh: Mesh,
    near: float,
    far: float,
    k_cover: int,
):
    """Tile-row-sharded K-cover selection (ops/kcover.py): each device
    walks its band's sub-tile segments and emits its pixels' first-K
    cover records. Returns (NREC_KC=5, K, m_out) with the PIXEL axis sharded
    over the mesh (the scrambled flat layout is sub-tile-row-major, so a
    band owns a contiguous pixel slice)."""
    from ..ops.fused_subtile import N_SUB, _project8_pallas
    from ..ops.kcover import (
        NREC_KC, select_kcover, select_kcover_records,
    )

    d = mesh.shape["tiles"]
    if n_ty % d != 0:
        raise ValueError(f"n_ty={n_ty} not divisible by mesh size {d}")
    rows_per = n_ty // d
    metas = _band_metas(subtile_starts, d, rows_per * n_tx * N_SUB, rows_per)

    def per_device(slot, meta, cam_v):
        if (k_cover * NREC_KC) % 8 == 0:
            # in-kernel projection (round 5) — no proj8 prepass
            return select_kcover_records(slot, meta[0], cam_v, rows_per,
                                         n_tx, k_cover, near, far)
        # mirror the single-chip build_kcover_buffer fallback for
        # sublane-unaligned K (e.g. kcover=4/12): index select + gather
        # from a zero-column-appended record array, so the same config
        # behaves identically with and without a mesh (ADVICE r3)
        proj8 = _project8_pallas(slot, cam_v, near, far)
        idx = select_kcover(proj8, meta[0], rows_per, n_tx, k_cover)
        src = jnp.concatenate(
            [slot[:NREC_KC], jnp.zeros((NREC_KC, 1), slot.dtype)], axis=1
        )
        recs = jnp.take(src.T, idx.astype(jnp.int32).reshape(-1), axis=0)
        return recs.T.reshape(NREC_KC, k_cover, idx.shape[1])

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("tiles"), P()),
        out_specs=P(None, None, "tiles"),
        check_vma=False,
    )(slot3d, metas, cam)


def sharded_kcover_render(
    kbuf: jnp.ndarray,  # (NREC_KC=5, K, m_out) cover records, pixel-sharded
    cam: jnp.ndarray,  # (N_CAM,) camera scalar vector (differentiable)
    n_ty: int,
    n_tx: int,
    mesh: Mesh,
    near: float,
    far: float,
):
    """Per-step K-cover render over the pixel-sharded cover buffer: each
    device projects/composites its band's pixels against the replicated
    cam vector — the replication transpose psums the pose gradient over
    ICI. Returns (depth_acc, alpha), row-sharded."""
    from ..ops.binning import TILE_H
    from ..ops.kcover import render_kcover

    d = mesh.shape["tiles"]
    if n_ty % d != 0:
        raise ValueError(f"n_ty={n_ty} not divisible by mesh size {d}")
    rows_per = n_ty // d
    row0s = (jnp.arange(d, dtype=jnp.int32) * rows_per * TILE_H).astype(
        jnp.float32)[:, None]  # (D, 1) global first-pixel-row per band

    def per_device(kb, r0, cam_v):
        return render_kcover(kb, cam_v, rows_per, n_tx, near, far,
                             row0_px=r0[0, 0])

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, None, "tiles"), P("tiles", None), P()),
        out_specs=(P("tiles", None), P("tiles", None)),
        check_vma=False,
    )(kbuf, row0s, cam)
