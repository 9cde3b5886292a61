"""Tile-band occupancy balance at bench scale (SURVEY §7 hard part 6,
VERDICT r4 next #8).

The ("tiles",) mesh is a STATIC contiguous split of macro-tile rows
(parallel/sharded.py): device d walks rows [d*rows_per, (d+1)*rows_per).
Whether that suffices is a DATA question — per-band slot counts under the
shard — not a hardware one, so this measures the real binning output
(exactly the arrays the sharded walk consumes) on any backend and prints
max/mean (ideal = 1.0) per mesh size for several scene classes:

  * bench       — the bench.py headline scene (box room, 6 spheres)
  * cluttered   — room0-fixture-class clutter (60 spheres)
  * dense0      — the conditioning fixture (400 spheres + 150 cuboids)

Decision rule from the VERDICT: max/mean > ~1.2 on real content ->
implement balanced assignment; else document and close. The tail band of
a non-divisible row count (43 rows at 1200x680) is padded — its deficit
is a pad artifact, so the table separates full bands from the tail.

Usage: python scripts/band_occupancy.py [out_md]
"""

import os
import sys

import numpy as np

# honor JAX_PLATFORMS=cpu in-process (the axon sitecustomize force-sets
# jax_platforms past the env var; binning output is device-independent)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def measure(scene, K, W, H):
    import jax.numpy as jnp

    from gsplatloc_tpu.ops.binning import TILE_H, TILE_W, bin_and_sort
    from gsplatloc_tpu.ops.fused_subtile import (
        CB, KX_SUB, KY_SUB, N_SUB, SUB_H, SUB_W,
    )
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.ops.projection import project_iso_binning

    vm = invert_se3(jnp.eye(4))
    n_tx = -(-W // TILE_W)
    n_ty = -(-H // TILE_H)
    proj = project_iso_binning(
        scene.means, scene.scales[:, 0] * scene.scales[:, 0],
        vm, K, W, H,
    )
    binning = bin_and_sort(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        n_tx * TILE_W, n_ty * TILE_H,
        tile_h=SUB_H, tile_w=SUB_W, ky=KY_SUB, kx=KX_SUB,
        needs_inv_perm=False, big_budget=64, pad_to_chunks=False,
    )
    starts = np.asarray(binning.tile_starts)
    rows = []
    for d in (2, 4, 8):
        n_ty_pad = -(-n_ty // d) * d
        rows_per = n_ty_pad // d
        seg = rows_per * n_tx * N_SUB
        # per-band slot counts over the (replicated-starts-padded) grid
        s = np.concatenate(
            [starts, np.full(n_ty_pad * n_tx * N_SUB + 1 - len(starts),
                             starts[-1], starts.dtype)]
        )
        counts = np.array(
            [s[(b + 1) * seg] - s[b * seg] for b in range(d)], np.float64
        )
        full = counts[:-1] if n_ty_pad != n_ty else counts
        mean = counts.mean()
        rows.append(
            dict(d=d, counts=counts.astype(int).tolist(),
                 max_over_mean=float(counts.max() / mean),
                 max_over_mean_full=float(full.max() / max(full.mean(), 1)),
                 tail_pad_rows=n_ty_pad - n_ty)
        )
    return rows


def main():
    import jax
    import jax.numpy as jnp

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera

    out_md = sys.argv[1] if len(sys.argv) > 1 else None
    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    K = jnp.asarray(K_np)
    lines = ["| scene | D | per-band slots | max/mean | max/mean (full bands) |",
             "|---|---|---|---|---|"]
    for name, kw in (("bench", dict()),
                     ("cluttered", dict(clutter=60)),
                     ("dense0", dict(clutter=400, boxes=150))):
        rgb, depth = box_room_frame(np.eye(4), K_np, H, W, **kw)
        pts = camera.depth_to_points(jnp.asarray(depth), K)
        scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                       grid_shape=(H, W))
        jax.block_until_ready(scene)
        for r in measure(scene, K, W, H):
            print(f"[band_occupancy] {name} D={r['d']}: counts={r['counts']}"
                  f" max/mean={r['max_over_mean']:.3f}"
                  f" (full bands {r['max_over_mean_full']:.3f},"
                  f" tail pad rows {r['tail_pad_rows']})", flush=True)
            lines.append(
                f"| {name} | {r['d']} | {r['counts']} "
                f"| {r['max_over_mean']:.3f} | {r['max_over_mean_full']:.3f} |")
    table = "\n".join(lines)
    print(table)
    if out_md:
        with open(out_md, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
