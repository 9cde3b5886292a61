"""Component timing for the phase-split sub-tile path at bench scale.

Honest per-call host reads; prints the measured null-dispatch overhead so
each component time can be read as (median - overhead). One compile each.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    NUM_PROJ_ROWS, N_SUB, build_subtile_slot_buffer, _chain_pallas,
    _chain_xla, _project8, _project8_pallas,
    render_tracking_depth_subtile, subtile_render,
)
from gsplatloc_tpu.ops.fused_tracking import cam_vector
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.ops.binning import TILE_H, TILE_W


def timed(f, args_list, warm=1, label=""):
    for a in args_list[:warm]:
        float(jnp.asarray(jax.tree.leaves(f(*a))[0]).ravel()[0])
    ts = []
    for a in args_list[warm:]:
        t0 = time.time()
        float(jnp.asarray(jax.tree.leaves(f(*a))[0]).ravel()[0])
        ts.append(time.time() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{label}: {med:.2f} ms/call (n={len(ts)})", flush=True)
    return med


def main():
    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    jax.block_until_ready(scene)

    # null dispatch overhead
    null = jax.jit(lambda x: x + 1.0)
    overhead = timed(null, [(jnp.ones(()),)] * 8, warm=2, label="null")

    vms = [invert_se3(jnp.eye(4) + 1e-5 * i) for i in range(6)]
    build = jax.jit(lambda vm: build_subtile_slot_buffer(
        scene, vm, K, W, H, 1e-2, 1e10)[0])
    timed(build, [(v,) for v in vms], warm=1, label="rebuild (full)")

    # rebuild sub-steps: binning with/without the pad scatter
    from gsplatloc_tpu.ops.binning import bin_and_sort
    from gsplatloc_tpu.ops.projection import project_gaussians

    from gsplatloc_tpu.ops.fused_subtile import KX_SUB, SUB_W

    def _bin(vm, pad):
        proj = project_gaussians(scene.means, scene.quats, scene.scales,
                                 vm, K, W, H, 1e-2, 1e10)
        b = bin_and_sort(proj.mean2d, proj.radius, proj.depth, proj.valid,
                         n_tx_s * 128, H, tile_h=TILE_H, tile_w=SUB_W,
                         kx=KX_SUB, chunk=128, needs_inv_perm=False,
                         big_budget=64, pad_to_chunks=pad)
        return b.pair_gauss

    n_tx_s = -(-W // TILE_W)
    bin_np = jax.jit(lambda vm: _bin(vm, False))
    timed(bin_np, [(v,) for v in vms], warm=1, label="bin (no pad)")
    bin_p = jax.jit(lambda vm: _bin(vm, True))
    timed(bin_p, [(v,) for v in vms], warm=1, label="bin (pad_to_chunks)")

    slot3d, meta, _ = build_subtile_slot_buffer(
        scene, jnp.eye(4), K, W, H, 1e-2, 1e10)
    slot3d = jax.block_until_ready(slot3d)
    mp = slot3d.shape[1]
    n_ty = -(-H // TILE_H)
    n_tx = -(-W // TILE_W)
    print(f"M slots = {mp} ({mp / 816000:.2f} /gaussian), "
          f"chunks = {mp // 128}", flush=True)

    cams = [cam_vector(v, K, W, H) for v in vms]
    # NOTE: slot3d rides as a jit ARGUMENT everywhere below — a closure
    # capture embeds it as an HLO literal, and at SUB_W=8 the 16-row
    # buffer (398 MB) blew the remote-compile body limit (HTTP 413,
    # runs/tpu_session_r1c/perf_subtile_w8.log)
    proj = jax.jit(lambda s, c: _project8(s, c, 1e-2, 1e10))
    timed(proj, [(slot3d, c) for c in cams], warm=1, label="project8 (XLA)")
    projp = jax.jit(lambda s, c: _project8_pallas(s, c, 1e-2, 1e10))
    timed(projp, [(slot3d, c) for c in cams], warm=1,
          label="project8 (Pallas)")

    mom = jnp.ones((NUM_PROJ_ROWS, mp), jnp.float32) * 1e-6
    chain = jax.jit(lambda s, m, c: _chain_xla(s, m, c, meta, n_tx))
    timed(chain, [(slot3d, mom, c) for c in cams], warm=1,
          label="chain (XLA)")
    limits = jnp.stack([meta[1], meta[-1]]).astype(jnp.int32)
    chainp = jax.jit(
        lambda s, m, c: _chain_pallas(s, m, c, limits, meta, n_tx)
    )
    timed(chainp, [(slot3d, mom, c) for c in cams], warm=1,
          label="chain (Pallas)")

    fwd = jax.jit(lambda s, c: subtile_render(
        s, meta, c, n_ty, n_tx, mp, 1e-2, 1e10)[0])
    timed(fwd, [(slot3d, c) for c in cams], warm=1,
          label="fwd (proj+kernel+unscr)")

    # walked-chunk stats: the true pair-evaluation count (the early-out
    # makes it much smaller than slots x P_SUB)
    from gsplatloc_tpu.ops.fused_subtile import _subtile_fwd_impl, P_SUB

    _, cd = jax.jit(lambda s, c: _subtile_fwd_impl(
        _project8_pallas(s, c, 1e-2, 1e10), meta, n_ty, n_tx))(
            slot3d, cams[0])
    cd = np.asarray(cd)
    from gsplatloc_tpu.ops.rasterize_pallas import CHUNK as _CK
    print(f"chunks walked: total {cd.sum()} mean/sub-tile {cd.mean():.2f} "
          f"max {cd.max()}; pair evals {cd.sum() * _CK * P_SUB / 1e9:.2f}G",
          flush=True)

    # isolated bwd kernel (moment emission only, no chain)
    from gsplatloc_tpu.ops.fused_subtile import (
        _project8_pallas as _p8, _subtile_bwd_kernel, P_SUB,
    )
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gsplatloc_tpu.ops.rasterize_pallas import CHUNK, _interpret

    m_out = n_ty * n_tx * N_SUB * P_SUB
    sin = jnp.ones((8, m_out), jnp.float32) * 0.1

    def bwdk(s, c):
        proj8 = _p8(s, c, 1e-2, 1e10)
        return pl.pallas_call(
            _subtile_bwd_kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_PROJ_ROWS, mp), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_ty, n_tx),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((2, NUM_PROJ_ROWS, CHUNK), jnp.float32),
                    pltpu.VMEM((2, 8, P_SUB), jnp.float32),
                    pltpu.VMEM((2, NUM_PROJ_ROWS, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            interpret=_interpret(),
        )(meta, proj8, sin)

    timed(jax.jit(bwdk), [(slot3d, c) for c in cams], warm=1,
          label="bwd kernel (proj+moments)")

    target = jax.block_until_ready(
        render_tracking_depth_subtile(jnp.eye(4), K, W, H, slot3d, meta)[0]
    ) * 1.02

    def loss(s, c):
        d, a = subtile_render(s, meta, c, n_ty, n_tx, mp, 1e-2, 1e10)
        d = d[:H, :W]
        a = a[:H, :W]
        return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

    vg = jax.jit(jax.value_and_grad(loss, argnums=1))
    timed(vg, [(slot3d, c) for c in cams], warm=1,
          label="fwd+bwd (full vjp)")
    print(f"(subtract ~{overhead:.1f} ms dispatch overhead from each)",
          flush=True)


if __name__ == "__main__":
    main()
