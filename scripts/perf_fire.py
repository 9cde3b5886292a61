"""Per-FIRE cost breakdown: rebuild (project / bin+sort / record gather)
and cover re-selection (proj8 / select kernel) at bench scale.

VERDICT r2 next #3: with the fused K-cover step at ~2 ms device, the
per-fire rebuild+select (~63 ms, 18 fires / 300 bench steps = ~3.8
ms/step amortized = 38% of wall) is the throughput frontier. This
script splits the fire into its stages so the optimization lands on the
measured top term, and re-times the CB_SEL-blocked + rank-k-skip select
kernel (ops/kcover.py) against the round-2 numbers
(runs/tpu_session_r3b/perf_kcover.log: select 55.1 incl ~25 ms
dispatch).

Honest per-call host reads (axon relay): subtract the printed null.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.binning import TILE_H, TILE_W, bin_and_sort
from gsplatloc_tpu.ops.fused_subtile import (
    CB,
    CHUNK,
    KX_SUB,
    KY_SUB,
    N_SUB,
    NUM_ISO_ROWS,
    P_SUB,
    SUB_H,
    SUB_W,
    _project8_pallas,
    build_subtile_slot_buffer,
)
from gsplatloc_tpu.ops.fused_tracking import cam_vector
from gsplatloc_tpu.ops.kcover import (
    CB_SEL,
    build_kcover_buffer,
    select_kcover,
    select_kcover_records,
)
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.ops.projection import project_gaussians


def timed(f, args_list, warm=1, label=""):
    for a in args_list[:warm]:
        jax.block_until_ready(f(*a))
    ts = []
    for a in args_list[warm:]:
        t0 = time.time()
        jax.block_until_ready(f(*a))
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
    n_ty = -(-H // TILE_H)
    n_tx = -(-W // TILE_W)

    null = jax.jit(lambda x: x + 1.0)
    overhead = timed(null, [(jnp.ones(()),)] * 8, warm=2, label="null")

    vms = [jnp.asarray(invert_se3(jnp.eye(4) + 1e-5 * i)) for i in range(6)]
    cams = [cam_vector(v, K, W, H) for v in vms]

    # ---- rebuild total + stages ----
    reb = jax.jit(lambda vm: build_subtile_slot_buffer(
        scene, vm, K, W, H, 1e-2, 1e10)[0])
    timed(reb, [(v,) for v in vms], warm=1, label="rebuild TOTAL")

    proj = jax.jit(lambda vm: project_gaussians(
        scene.means, scene.quats, scene.scales, vm, K, W, H, 1e-2, 1e10))
    timed(proj, [(v,) for v in vms], warm=1, label="rebuild: project_gaussians")

    p0 = proj(vms[0])
    p0 = jax.block_until_ready(p0)

    def bs(mean2d, radius, depth_, valid):
        b = bin_and_sort(mean2d, radius, depth_, valid,
                         n_tx * TILE_W, n_ty * TILE_H,
                         tile_h=SUB_H, tile_w=SUB_W, ky=KY_SUB, kx=KX_SUB,
                         chunk=CHUNK, needs_inv_perm=False, big_budget=64,
                         pad_to_chunks=True, pad_align=CB)
        return b.pair_gauss, b.tile_starts

    bsj = jax.jit(bs)
    # vary mean2d slightly so nothing is cached/folded
    bs_args = [(p0.mean2d + 1e-4 * i, p0.radius, p0.depth, p0.valid)
               for i in range(6)]
    timed(bsj, bs_args, warm=1, label="rebuild: bin_and_sort")

    pg, _st = jax.block_until_ready(bsj(*bs_args[0]))
    records = jnp.concatenate([
        jnp.stack([scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
                   scene.scales[:, 0] ** 2, scene.opacities]
                  + [jnp.zeros_like(scene.opacities)] * (NUM_ISO_ROWS - 5),
                  axis=1),
        jnp.zeros((1, NUM_ISO_ROWS), jnp.float32)], axis=0)
    take = jax.jit(lambda r, i: jnp.take(r, i, axis=0).T)
    timed(take, [(records + 1e-6 * i, pg) for i in range(6)], warm=1,
          label="rebuild: record row-gather (take.T)")

    # ---- select total + stages (CB_SEL-blocked kernel) ----
    slot3d, meta, _ = build_subtile_slot_buffer(
        scene, vms[0], K, W, H, 1e-2, 1e10)
    slot3d = jax.block_until_ready(slot3d)
    print(f"M slots = {slot3d.shape[1]}, CB_SEL = {CB_SEL}", flush=True)

    p8 = jax.jit(lambda s, c: _project8_pallas(s, c, 1e-2, 1e10))
    timed(p8, [(slot3d, c) for c in cams], warm=1, label="select: proj8")
    proj8 = jax.block_until_ready(p8(slot3d, cams[0]))

    for kc in (16, 8):
        selr = jax.jit(lambda s, c, _k=kc: select_kcover_records(
            s, meta, c, n_ty, n_tx, _k, 1e-2, 1e10))
        timed(selr, [(slot3d, c) for c in cams], warm=1,
              label=f"K={kc} select_kcover_records (in-kernel proj)")

        seli = jax.jit(lambda p, _k=kc: select_kcover(
            p, meta, n_ty, n_tx, _k))
        timed(seli, [(proj8 + 0 * i,) for i in range(6)], warm=1,
              label=f"K={kc} select_kcover index kernel")

        bld = jax.jit(lambda s, c, _k=kc: build_kcover_buffer(
            s, meta, c, n_ty, n_tx, 1e-2, 1e10, k_cover=_k, via="records"))
        timed(bld, [(slot3d, c) for c in cams], warm=1,
              label=f"K={kc} build_kcover_buffer TOTAL (records select)")

    print(f"(subtract ~{overhead:.1f} ms dispatch overhead from each)",
          flush=True)


if __name__ == "__main__":
    main()
