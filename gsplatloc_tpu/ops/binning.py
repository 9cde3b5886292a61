"""Tile binning + depth sort for the Pallas rasterizer (pure JAX / XLA).

TPU-native replacement for gsplat's atomics + radix-sort tile binning: every
Gaussian emits a STATIC number of (tile, depth) slots (KY x KX — enough to
cover its clamped screen radius), the slot list is sorted once by a packed
(tile, depth) key (single uint32 radix-friendly sort on device), and per-tile
segment offsets come from a binary search. Static shapes throughout — no
host round-trips, jit/vmap-safe, resorted every optimization step (the pose
moves, so depth order changes, exactly like the reference's per-step CUDA
sort at src/my_gsplat/model.py:195-213).

Workload note: with the reference's scale-init quirk (ops/knn.py) and the
0.3 px EWA dilation, real RGB-D scenes project to ~1-3 px radius splats, so
KY=KX=2 slots with the implied radius clamp (TILE_H*(KY-1)/2 = 8 px) lose
nothing; configs with bigger Gaussians should raise KY/KX (cost: sort length
M=N*KY*KX; the fused tracking path amortizes the sort over resort_every
steps anyway). NOTE: an (8, 128) tile halves slot-pixel pair evaluations on
paper but measured 16x SLOWER on v5e (Mosaic pathology at (C, 1024) shapes)
and its backward overflowed the remote compile service — keep (16, 128).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE_H = 16
TILE_W = 128


class Binning(NamedTuple):
    pair_gauss: jnp.ndarray  # (M_pad,) int32 gaussian index per sorted slot
    tile_starts: jnp.ndarray  # (n_tiles + 1,) int32 segment offsets
    inv_perm: jnp.ndarray | None  # (M,) sorted position of pair g*K+k
    n_tiles_y: int
    n_tiles_x: int
    num_pairs: int  # M (before padding)


def radius_clamp(tile_h: int, ky: int) -> int:
    """Max radius (px) for which a KY-slot column is guaranteed to cover the
    vertical tile span: ceil(2r/TILE_H) <= KY-1  <=  r <= TILE_H*(KY-1)/2."""
    return (tile_h * (ky - 1)) // 2


def bin_and_sort(
    mean2d: jnp.ndarray,  # (N, 2)
    radius: jnp.ndarray,  # (N,) int32 (0 = culled)
    depth: jnp.ndarray,  # (N,) camera z (positive for visible)
    valid: jnp.ndarray,  # (N,) bool
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    ky: int = 2,
    kx: int = 2,
    chunk: int = 128,
    exact_sort: bool = False,
    needs_inv_perm: bool = True,
    big_budget: int = 0,
    pad_to_chunks: bool = False,
    pad_align: int = 128,
) -> Binning:
    """Build the depth-sorted per-tile work list.

    exact_sort=True uses a two-key lexicographic sort (exact f32 depth order,
    for oracle-parity tests); the default packs (tile, quantized depth) into
    one uint32 — ties within ~2^-(depth_bits) relative depth are ordered
    arbitrarily, invisible in practice and ~2x faster to sort.

    needs_inv_perm=False (the fused tracking rebuild, which never folds
    slot gradients back per Gaussian) drops the pair-index array from the
    sort payload and skips the inverse-permutation scatter — the rebuild
    runs every resort_every steps, so this is on the tracking hot path.

    big_budget > 0 handles BIG splats exactly: the radius clamp truncates a
    splat's footprint to the KY x KX tile box, and the visible truncation
    granularity then depends on tile size (a (16,128) tile "accidentally"
    keeps up to 128 px of an over-clamp footprint, a (16,32) sub-tile only
    32 px). Real RGB-D scenes produce a handful of huge splats (the
    reference's kNN scale-init quirk at depth discontinuities: neighbors
    are far -> large isotropic scale; gsplat's CUDA binning covers their
    full footprint with dynamic slot counts). The top `big_budget` splats
    by radius are removed from the clamped path and emitted into EVERY
    tile their full (grid-clipped) box covers — exact for up to
    `big_budget` big splats, graceful clamped fallback beyond. Adds
    big_budget * n_tiles slots to the sort (~3% at the 816k bench).
    Tracking-path only: incompatible with needs_inv_perm (the general
    backward's pair->Gaussian gradient fold assumes KY*KX slots/Gaussian).

    pad_to_chunks=True rounds every tile segment up to a multiple of
    `chunk` by inserting DEAD slots (pair_gauss = N, pointing one past the
    real records — callers append a zero-opacity dummy record row). Every
    segment then starts chunk-aligned, so per-chunk kernel outputs (the
    phase-split moment buffer) are segment-exclusive: no two segments share
    a boundary chunk and chunk writes never clobber a neighbour's lanes.
    The returned pair_gauss has STATIC length m_round + chunk*n_tiles +
    chunk (worst-case padding); the used prefix is tile_starts[-1].
    """
    n = mean2d.shape[0]
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    n_tiles = n_ty * n_tx

    r = jnp.minimum(radius, radius_clamp(tile_h, ky)).astype(jnp.float32)
    ok0 = valid & (radius > 0)

    big_tiles = big_gauss = None
    if big_budget:
        if needs_inv_perm:
            raise NotImplementedError(
                "big_budget needs needs_inv_perm=False (tracking path)"
            )
        b = min(big_budget, n)
        clamp_r = radius_clamp(tile_h, ky)
        rv, ri = jax.lax.top_k(radius, b)  # invalid splats have radius 0
        is_sel = jnp.zeros((n,), bool).at[ri].set(
            rv > clamp_r, unique_indices=True, mode="promise_in_bounds"
        )
        ok0 = ok0 & ~is_sel
        rb = rv.astype(jnp.float32)
        xb, yb = mean2d[ri, 0], mean2d[ri, 1]
        tx0b = jnp.clip(jnp.floor((xb - rb) / tile_w), 0, n_tx - 1)
        tx1b = jnp.clip(jnp.floor((xb + rb) / tile_w), 0, n_tx - 1)
        ty0b = jnp.clip(jnp.floor((yb - rb) / tile_h), 0, n_ty - 1)
        ty1b = jnp.clip(jnp.floor((yb + rb) / tile_h), 0, n_ty - 1)
        t_all = jnp.arange(n_tiles, dtype=jnp.int32)
        ty_t = (t_all // n_tx).astype(jnp.float32)
        tx_t = (t_all % n_tx).astype(jnp.float32)
        ok_bt = (
            ((rv > clamp_r) & valid[ri])[:, None]
            & (tx_t[None, :] >= tx0b[:, None])
            & (tx_t[None, :] <= tx1b[:, None])
            & (ty_t[None, :] >= ty0b[:, None])
            & (ty_t[None, :] <= ty1b[:, None])
        )  # (B, n_tiles)
        big_tiles = jnp.where(ok_bt, t_all[None, :], n_tiles).reshape(-1)
        big_gauss = jnp.broadcast_to(ri[:, None], ok_bt.shape).reshape(-1)
    x, y = mean2d[:, 0], mean2d[:, 1]
    tx0 = jnp.floor((x - r) / tile_w).astype(jnp.int32)
    tx1 = jnp.floor((x + r) / tile_w).astype(jnp.int32)
    ty0 = jnp.floor((y - r) / tile_h).astype(jnp.int32)
    ty1 = jnp.floor((y + r) / tile_h).astype(jnp.int32)
    tx0c = jnp.clip(tx0, 0, n_tx - 1)
    ty0c = jnp.clip(ty0, 0, n_ty - 1)
    tx1c = jnp.clip(tx1, 0, n_tx - 1)
    ty1c = jnp.clip(ty1, 0, n_ty - 1)

    tiles = []
    for k in range(ky * kx):
        dy, dx = k // kx, k % kx
        ty = ty0c + dy
        tx = tx0c + dx
        ok = ok0 & (ty <= ty1c) & (tx <= tx1c)
        tiles.append(jnp.where(ok, ty * n_tx + tx, n_tiles))
    # slots stay (N, ky*kx)-shaped until ONE final reshape: per-Gaussian
    # quantities (depth key bits, gauss index) broadcast along the slot
    # axis instead of being gathered through a flat (M,) gauss_idx — a
    # 3.4M-element gather costs ~10-20 ms on v5e where the broadcast is a
    # fused stream (docs/PERFORMANCE.md gather trap; measured in the
    # 66 ms rebuild breakdown).
    kk = ky * kx
    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, kk)
    ).reshape(-1)
    if exact_sort:
        tile_ids = jnp.stack(tiles, axis=1).reshape(-1)  # (M,) int32
        depth_m = jnp.broadcast_to(depth[:, None], (n, kk)).reshape(-1)
        if big_tiles is not None:
            tile_ids = jnp.concatenate([tile_ids, big_tiles])
            gauss_idx = jnp.concatenate([gauss_idx, big_gauss])
            depth_m = jnp.concatenate([depth_m, depth[big_gauss]])
        m = tile_ids.shape[0]
        payload = [gauss_idx]
        if needs_inv_perm:
            payload.append(jnp.arange(m, dtype=jnp.int32))
        sorted_tile, _, sorted_gauss, *rest = jax.lax.sort(
            (tile_ids, depth_m, *payload), num_keys=2
        )
    else:
        tile_bits = max(int(n_tiles + 1).bit_length(), 1)
        db = 32 - tile_bits
        dq_g = (
            jax.lax.bitcast_convert_type(
                jnp.maximum(depth, 0.0), jnp.uint32
            )
            >> (31 - db)
        ).astype(jnp.uint32)  # (N,) quantized depth bits, per Gaussian
        key = (
            (jnp.stack(tiles, axis=1).astype(jnp.uint32) << db)
            | dq_g[:, None]
        ).reshape(-1)  # (M,)
        if big_tiles is not None:
            big_key = (big_tiles.astype(jnp.uint32) << db) | dq_g[big_gauss]
            key = jnp.concatenate([key, big_key])
            gauss_idx = jnp.concatenate([gauss_idx, big_gauss])
        m = key.shape[0]
        payload = [gauss_idx]
        if needs_inv_perm:
            payload.append(jnp.arange(m, dtype=jnp.int32))
        sorted_key, sorted_gauss, *rest = jax.lax.sort(
            (key, *payload), num_keys=1
        )
        sorted_tile = (sorted_key >> db).astype(jnp.int32)

    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    if needs_inv_perm:
        # inverse permutation: pair p -> its sorted slot position. A
        # permutation scatter (unique indices) lowers to a parallel store,
        # unlike the general scatter-add the gather transpose would
        # otherwise emit in the backward (~370 ms at 3.3M slots on v5e).
        inv_perm = jnp.zeros((m,), jnp.int32).at[rest[0]].set(
            jnp.arange(m, dtype=jnp.int32), unique_indices=True,
            indices_are_sorted=False, mode="promise_in_bounds",
        )
    else:
        inv_perm = None

    if pad_to_chunks:
        if needs_inv_perm:
            raise NotImplementedError(
                "pad_to_chunks needs needs_inv_perm=False (tracking path)"
            )
        # chunk-align every segment: padded starts by cumsum of rounded
        # lengths, then each padded CHUNK is filled from a CONTIGUOUS
        # 128-run of the sorted slots (segments are chunk-aligned in the
        # padded layout, so a chunk's sources are consecutive). One
        # searchsorted over the chunk starts gives each chunk's segment;
        # a vmapped dynamic_slice then lowers to one gather of contiguous
        # 512 B slices — the fast gather shape. (XLA TPU alternatives
        # measured at 3.4-3.9M: scatter ~61 ms, elementwise 1-D gather
        # ~31 ms, this form is the row-gather class.) Dead gaps (past a
        # segment's real length) and the garbage tail past starts_p[-1]
        # (culled big-splat emissions) read the dummy record n.
        seg_len = tile_starts[1:] - tile_starts[:-1]
        seg_len_p = ((seg_len + chunk - 1) // chunk) * chunk
        starts_p = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(seg_len_p, dtype=jnp.int32)]
        )
        m_round = (-(-m // chunk)) * chunk
        # pad_align (a multiple of chunk, e.g. the lane-block width of the
        # phase kernels) rounds the STATIC buffer length; the extra tail is
        # dead (reads the dummy record n)
        raw = m_round + chunk * n_tiles + chunk
        mp_static = (-(-raw // pad_align)) * pad_align
        n_chunks_p = mp_static // chunk
        cstart = jnp.arange(n_chunks_p, dtype=jnp.int32) * chunk
        seg_c = jnp.clip(
            jnp.searchsorted(starts_p[1:], cstart, side="right"),
            0, n_tiles - 1,
        )
        off0 = cstart - starts_p[seg_c]  # >= 0 by searchsorted
        rstart = tile_starts[seg_c] + off0  # chunk's first source slot
        lane = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        dead = (off0[:, None] + lane) >= seg_len[seg_c][:, None]
        # pad the source by one chunk of dummy indices: a live chunk's
        # rstart can reach m - 1 (rstart + chunk > m), and dynamic_slice
        # would CLAMP the start to m - chunk, shifting every lane's source
        # (the dead mask assumes no shift — live lanes would read wrong
        # Gaussians). Fully-dead tail chunks may still clamp; their rows
        # are all dead-masked to n.
        sg_pad = jnp.concatenate(
            [sorted_gauss, jnp.full((chunk,), n, sorted_gauss.dtype)]
        )
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice(sg_pad, (s,), (chunk,))
        )(rstart)  # (n_chunks_p, chunk)
        padded = jnp.where(dead, n, rows).reshape(-1)
        return Binning(
            pair_gauss=padded,
            tile_starts=starts_p,
            inv_perm=None,
            n_tiles_y=n_ty,
            n_tiles_x=n_tx,
            num_pairs=m,
        )

    # pad so the kernel's fixed-size chunk DMAs never run off the end
    m_pad = (-(-m // chunk)) * chunk + chunk
    sorted_gauss = jnp.pad(sorted_gauss, (0, m_pad - m))
    return Binning(
        pair_gauss=sorted_gauss,
        tile_starts=tile_starts,
        inv_perm=inv_perm,
        n_tiles_y=n_ty,
        n_tiles_x=n_tx,
        num_pairs=m,
    )
