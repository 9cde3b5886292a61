"""Direct invariants for ops/binning.bin_and_sort (covered transitively by
the kernel parity tests; these pin the work-list contract itself).

Checked against a brute-force footprint oracle:
  * coverage — every (gaussian, tile) pair whose CLAMPED footprint box
    overlaps the tile appears exactly once in that tile's segment,
  * depth order within each segment (quantized-key monotonicity),
  * pad_to_chunks — segments start chunk-aligned, dead slots point at the
    dummy record index n, real slots fill each segment's prefix.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsplatloc_tpu.ops.binning import bin_and_sort, radius_clamp


def _random_splats(rng, n, width, height):
    mean2d = jnp.asarray(
        np.stack([rng.uniform(-10, width + 10, n),
                  rng.uniform(-10, height + 10, n)], axis=1), jnp.float32)
    radius = jnp.asarray(rng.integers(0, 7, n), jnp.int32)
    depth = jnp.asarray(rng.uniform(0.1, 5.0, n), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    return mean2d, radius, depth, valid


def _oracle_pairs(mean2d, radius, depth, valid, width, height,
                  tile_h, tile_w, ky, kx):
    """All (g, tile) pairs the clamped-footprint contract must emit."""
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    clamp = radius_clamp(tile_h, ky)
    out = set()
    for g in range(mean2d.shape[0]):
        if not bool(valid[g]) or int(radius[g]) <= 0:
            continue
        r = min(int(radius[g]), clamp)
        x, y = float(mean2d[g, 0]), float(mean2d[g, 1])
        tx0 = int(np.floor((x - r) / tile_w))
        tx1 = int(np.floor((x + r) / tile_w))
        ty0 = int(np.floor((y - r) / tile_h))
        ty1 = int(np.floor((y + r) / tile_h))
        # the emission walks ky x kx slots from the clipped top-left corner
        for dy in range(ky):
            for dx in range(kx):
                ty = min(max(ty0, 0), n_ty - 1) + dy
                tx = min(max(tx0, 0), n_tx - 1) + dx
                if ty <= min(max(ty1, 0), n_ty - 1) and \
                        tx <= min(max(tx1, 0), n_tx - 1):
                    out.add((g, ty * n_tx + tx))
    return out


@pytest.mark.parametrize("kx,tile_w", [(2, 16), (3, 8)])
def test_bin_and_sort_pad_to_chunks_invariants(kx, tile_w):
    rng = np.random.default_rng(5)
    width, height, tile_h, ky, chunk = 64, 48, 16, 2, 128
    n = 400
    mean2d, radius, depth, valid = _random_splats(rng, n, width, height)
    b = bin_and_sort(mean2d, radius, depth, valid, width, height,
                     tile_h=tile_h, tile_w=tile_w, ky=ky, kx=kx, chunk=chunk,
                     needs_inv_perm=False, pad_to_chunks=True)
    n_tiles = b.n_tiles_y * b.n_tiles_x
    starts = np.asarray(b.tile_starts)
    pair = np.asarray(b.pair_gauss)
    d = np.asarray(depth)

    assert np.all(starts % chunk == 0)  # chunk-aligned segments
    assert starts[-1] <= pair.shape[0]

    got = set()
    for t in range(n_tiles):
        seg = pair[starts[t]:starts[t + 1]]
        live = seg[seg < n]
        dead = seg[seg >= n]
        # dead padding points at the dummy record and fills the tail
        assert np.all(dead == n)
        assert live.shape[0] == 0 or np.all(seg[:live.shape[0]] < n)
        # depth order within the segment (quantized key: allow ties)
        if live.shape[0] > 1:
            dl = d[live]
            assert np.all(np.diff(dl) >= -1e-6 * np.abs(dl[:-1]))
        for g in live:
            got.add((int(g), t))

    want = _oracle_pairs(mean2d, radius, depth, valid, width, height,
                         tile_h, tile_w, ky, kx)
    assert got == want


@pytest.mark.parametrize("kx,tile_w", [(2, 16), (3, 8)])
def test_bin_and_sort_pad_short_culled_tail(kx, tile_w):
    """Regression: when the sorted array's culled tail is shorter than one
    chunk (here: every splat valid and fully in-bounds, so the tail is
    empty), the padded-chunk gather's dynamic_slice used to CLAMP at the
    array end and shift live lanes onto wrong Gaussians."""
    rng = np.random.default_rng(11)
    width, height, tile_h, ky, chunk = 64, 64, 16, 2, 128
    n = 70
    mean2d = jnp.asarray(
        np.stack([rng.uniform(12, width - 12, n),
                  rng.uniform(12, height - 12, n)], axis=1), jnp.float32)
    radius = jnp.full((n,), 8, jnp.int32)
    depth = jnp.asarray(rng.uniform(0.1, 5.0, n), jnp.float32)
    valid = jnp.ones((n,), bool)
    b = bin_and_sort(mean2d, radius, depth, valid, width, height,
                     tile_h=tile_h, tile_w=tile_w, ky=ky, kx=kx, chunk=chunk,
                     needs_inv_perm=False, pad_to_chunks=True, big_budget=0)
    n_tiles = b.n_tiles_y * b.n_tiles_x
    starts = np.asarray(b.tile_starts)
    pair = np.asarray(b.pair_gauss)

    got = set()
    for t in range(n_tiles):
        seg = pair[starts[t]:starts[t + 1]]
        for g in seg[seg < n]:
            got.add((int(g), t))
    want = _oracle_pairs(mean2d, radius, depth, valid, width, height,
                         tile_h, tile_w, ky, kx)
    assert got == want
