"""Headline benchmark: differentiable rasterization fwd+bwd throughput at the
reference workload scale (816k Gaussians from a 1200x680 RGB-D frame — the
Replica configuration, SURVEY.md §6), measured as Mpix/s through a full
pose-gradient step (render + masked depth/Sobel loss + grad to quat/trans).

Prints ONE JSON line. vs_baseline compares against an estimated 30 Mpix/s
fwd+bwd for the reference CUDA stack (gsplat on RTX 4060, ~25-30 ms per
optimization step at 0.816 Mpix; the reference publishes no throughput
numbers — SURVEY.md §6 — so this is a documented engineering estimate).
"""

import json
import sys
import time

BASELINE_MPIX_S = 30.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.losses import tracking_loss
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.models.pose import PoseState
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.ops.rasterize import rasterize

    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(
        pts, jnp.asarray(rgb.reshape(-1, 3)), grid_shape=(H, W)
    )
    jax.block_until_ready(scene)

    @jax.jit
    def fwd(vm):
        r, _ = rasterize(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, vm, K, W, H, sh_degree=1, render_mode="RGB+ED",
            backend="pallas",
        )
        return r

    depth_gt = jax.lax.stop_gradient(fwd(jnp.eye(4))[..., 3])

    @jax.jit
    def pose_step(quat, trans):
        def f(q, t):
            vm = invert_se3(PoseState(quat=q, trans=t).to_c2w())
            r, _ = rasterize(
                scene.means, scene.quats, scene.scales, scene.opacities,
                scene.sh_coeffs, vm, K, W, H, sh_degree=1,
                render_mode="RGB+ED", backend="pallas",
            )
            return tracking_loss(r[..., 3], depth_gt).total
        return jax.value_and_grad(f, argnums=(0, 1))(quat, trans)

    # vary the pose every call AND force a host read per call:
    # block_until_ready under the axon relay returns before remote execution
    # completes, so only a value round-trip gives honest step times.
    quats = [jnp.array([1.0, 1e-4 * i, -5e-5 * i, 0.0]) for i in range(10)]
    trans = jnp.zeros(3)
    float(pose_step(quats[0], trans)[0])  # compile
    float(pose_step(quats[1], trans)[0])  # warm
    times = []
    for q in quats[2:]:
        t0 = time.time()
        loss, _grads = pose_step(q, trans)
        float(loss)
        times.append(time.time() - t0)
    dt = float(np.median(times))

    mpix_s = H * W / dt / 1e6
    print(
        f"[bench] {dt*1e3:.2f} ms/pose-step = {1/dt:.1f} steps/s "
        f"({scene.means.shape[0]} gaussians, {W}x{H})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
