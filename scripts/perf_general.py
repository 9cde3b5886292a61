"""General-rasterizer throughput: Mpix/s fwd+bwd on the CURRENT device
(VERDICT r4 next #3 second half — BASELINE.json's first-named metric was
previously measured only for the tracking specialization).

Workload: the full gsplat-API surface — 300k ANISOTROPIC Gaussians
(random quats, per-axis scales), RGB+ED render at 1200x680, gradients to
viewmat AND every Gaussian param (means/quats/scales/opacities/SH) via
the Pallas general path (ops/rasterize_pallas.py). The measurement
amortizes the ~29 ms relay dispatch by running ITERS value_and_grad
steps inside ONE lax.scan dispatch and reading a host value at the end
(the bench.py methodology).

Usage: python scripts/perf_general.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.rasterize import rasterize

    H, W, n = 680, 1200, 300_000
    rng = np.random.default_rng(5)
    pts, rgb = random_gaussian_cloud(rng, n)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scene = scene._replace(
        scales=jnp.asarray(
            rng.uniform(0.004, 0.012, (n, 3)).astype(np.float32)),
        quats=jnp.asarray(q),
        opacities=jnp.full((n,), 0.8, jnp.float32),
    )
    K = camera.intrinsics_matrix(600.0, 600.0, W / 2 - 0.5, H / 2 - 0.5)
    jax.block_until_ready(scene)

    def loss(means, quats, scales, opas, sh, vm):
        r, a = rasterize(means, quats, scales, opas, sh, vm, K, W, H,
                         sh_degree=1, render_mode="RGB+ED",
                         backend="pallas")
        return jnp.mean(r ** 2) + 0.05 * jnp.mean(a)

    grad6 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))

    @jax.jit
    def run(args):
        means, quats, scales, opas, sh, vm0 = args

        def step(carry, i):
            # vary the viewmat per iteration so nothing is CSE'd/folded
            vm = vm0.at[0, 3].add(1e-5 * i.astype(jnp.float32))
            v, g = grad6(means, quats, scales, opas, sh, vm)
            return carry + v + g[5][0, 0], None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(iters))
        return acc

    args = (scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, jnp.eye(4))
    acc = run(args)
    float(acc)  # compile + warm
    t0 = time.time()
    acc = run(args)
    float(acc)  # honest completion (relay block_until_ready lies)
    dt = time.time() - t0
    ms = dt / iters * 1e3
    mpix = H * W * iters / dt / 1e6
    print(f"[perf_general] {n} anisotropic gaussians, {W}x{H} RGB+ED, "
          f"grads to viewmat+all params: {ms:.1f} ms/fwd+bwd = "
          f"{mpix:.1f} Mpix/s ({iters} iters in one dispatch)", flush=True)


if __name__ == "__main__":
    main()
