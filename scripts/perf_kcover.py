"""Component timing for the K-cover path at bench scale.

Splits the 49.9 ms/step kcover bench number (vs 44.5 sub-tile,
runs/tpu_session_r2a/bench_kcover2.log) into: select kernel, record
gather, per-step render fwd, per-step vjp — to find where the budget
goes. Honest per-call host reads (axon relay; subtract the printed null
dispatch overhead). One compile each.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.binning import TILE_H, TILE_W
from gsplatloc_tpu.ops.fused_subtile import (
    N_SUB, P_SUB, build_subtile_slot_buffer, _project8_pallas,
)
from gsplatloc_tpu.ops.fused_tracking import cam_vector
from gsplatloc_tpu.ops.kcover import (
    build_kcover_buffer, render_kcover, select_kcover,
)
from gsplatloc_tpu.ops.lie import invert_se3


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

    null = jax.jit(lambda x: x + 1.0)
    overhead = timed(null, [(jnp.ones(()),)] * 8, warm=2, label="null")

    slot3d, meta, _ = build_subtile_slot_buffer(
        scene, jnp.eye(4), K, W, H, 1e-2, 1e10)
    slot3d = jax.block_until_ready(slot3d)
    n_ty = -(-H // TILE_H)
    n_tx = -(-W // TILE_W)
    m_out = n_ty * n_tx * N_SUB * P_SUB
    print(f"M slots = {slot3d.shape[1]}, m_out px = {m_out}", flush=True)

    vms = [invert_se3(jnp.eye(4) + 1e-5 * i) for i in range(6)]
    cams = [cam_vector(v, K, W, H) for v in vms]

    for kc in (16, 8):
        # select kernel alone (indices out)
        def sel(s, c):
            p8 = _project8_pallas(s, c, 1e-2, 1e10)
            return select_kcover(p8, meta, n_ty, n_tx, kc)

        timed(jax.jit(sel), [(slot3d, c) for c in cams], warm=1,
              label=f"K={kc} select kernel (incl proj8)")

        # full build, record-emitting select kernel (the default)
        bld = jax.jit(lambda s, c, _k=kc: build_kcover_buffer(
            s, meta, c, n_ty, n_tx, 1e-2, 1e10, k_cover=_k,
            via="records"))
        timed(bld, [(slot3d, c) for c in cams], warm=1,
              label=f"K={kc} build via records (select+transpose)")

        # full build, index select + XLA row-gather (the original)
        bldg = jax.jit(lambda s, c, _k=kc: build_kcover_buffer(
            s, meta, c, n_ty, n_tx, 1e-2, 1e10, k_cover=_k,
            via="gather"))
        timed(bldg, [(slot3d, c) for c in cams], warm=1,
              label=f"K={kc} build via gather (select+take)")

        kbuf = jax.block_until_ready(bld(slot3d, cams[0]))
        print(f"K={kc} kbuf {kbuf.shape} = "
              f"{kbuf.size * 4 / 1e6:.0f} MB", flush=True)

        # per-step render fwd + vjp, both implementations (pallas = the
        # fused step kernels, xla = the plain custom-VJP oracle)
        target = None
        for impl in ("pallas", "xla"):
            fwd = jax.jit(lambda b, c, _k=kc, _i=impl: render_kcover(
                b, c, n_ty, n_tx, 1e-2, 1e10, impl=_i)[0])
            try:
                timed(fwd, [(kbuf, c) for c in cams], warm=1,
                      label=f"K={kc} render fwd [{impl}]")
            except Exception as e:  # noqa: BLE001
                print(f"K={kc} render fwd [{impl}] FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            if target is None:
                target = jax.block_until_ready(fwd(kbuf, cams[0])) * 1.02

            def loss(b, c, _i=impl):
                d, a = render_kcover(b, c, n_ty, n_tx, 1e-2, 1e10, impl=_i)
                return jnp.mean((d - target) ** 2) + 0.1 * jnp.mean(a)

            vg = jax.jit(jax.value_and_grad(loss, argnums=1))
            timed(vg, [(kbuf, c) for c in cams], warm=1,
                  label=f"K={kc} fwd+bwd (full vjp) [{impl}]")

        # bwd-cost bisection probes (fwd is ~3 ms at K=16 but the full
        # vjp is ~28 — where does the backward spend it?)
        from gsplatloc_tpu.ops.fused_tracking import (
            _project8_rows, _project_slots,
        )

        def proj_only(b, c):
            rec = b.reshape(8, -1)
            p8 = _project8_rows(_project_slots(rec, c), 1e-2, 1e10)
            return jnp.sum(p8[0]) + jnp.sum(p8[1]) + jnp.sum(p8[5])

        vgp = jax.jit(jax.value_and_grad(proj_only, argnums=1))
        timed(vgp, [(kbuf, c) for c in cams], warm=1,
              label=f"K={kc} vjp probe: projection only")

        def no_composite(b, c):
            rec = b.reshape(8, -1)
            p8 = _project8_rows(_project_slots(rec, c), 1e-2, 1e10)
            u, v, qz, opa = p8[0], p8[1], p8[5], p8[6]
            ca, cb, cc2, okr = p8[2], p8[3], p8[4], p8[7]
            m = b.shape[2]
            px, py = jnp.zeros((1,)), jnp.zeros((1,))
            dx = u - 0.5
            dy = v - 0.5
            sigma = 0.5 * (ca * dx * dx + cc2 * dy * dy) + cb * dx * dy
            alpha = jnp.minimum(opa * jnp.exp(-sigma), 0.999)
            alpha = jnp.where((sigma >= 0.0) & (okr > 0.0), alpha, 0.0)
            return jnp.sum(alpha * qz)

        vgn = jax.jit(jax.value_and_grad(no_composite, argnums=1))
        timed(vgn, [(kbuf, c) for c in cams], warm=1,
              label=f"K={kc} vjp probe: proj+alpha, no cumprod")

    print(f"(subtract ~{overhead:.1f} ms dispatch overhead from each)",
          flush=True)


if __name__ == "__main__":
    main()
