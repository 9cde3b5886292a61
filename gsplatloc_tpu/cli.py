"""Command-line entry points.

Parity with reference src/GsplatLoc_eval.py (gsplat tracking eval over
datasets/rooms) and src/icps_eval.py (classical ICP baseline sweep), emitting
the res.json results format + markdown tables (docs/table_markdown.py).

Usage:
  python -m gsplatloc_tpu.cli track --dataset Replica --rooms room0 room1 \
      --num-iters 2000 --run-dir runs/track
  python -m gsplatloc_tpu.cli track --dataset Synthetic --frames 40
  python -m gsplatloc_tpu.cli icp --dataset Replica --all
  python -m gsplatloc_tpu.cli tables --res runs/res.json --dataset Replica
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _room_list(args, all_rooms):
    if getattr(args, "all", False):
        return all_rooms
    rooms = list(args.rooms or [])
    # reference GsplatLoc_eval.py --room-range/--office-range: inclusive index
    # ranges over Replica's room*/office* scenes
    rr = getattr(args, "room_range", None)
    if rr:
        rooms += [f"room{i}" for i in range(rr[0], rr[1] + 1)]
    orng = getattr(args, "office_range", None)
    if orng:
        rooms += [f"office{i}" for i in range(orng[0], orng[1] + 1)]
    return rooms or all_rooms[:1]


def cmd_track(args):
    from .data.datasets import Replica, TUM
    from .eval.logger import write_res_json
    from .eval.metrics import set_random_seed
    from .opt.tracking import TrackingConfig
    from .tracking.runner import SequenceRunner

    set_random_seed(getattr(args, "seed", 42))

    cfg = TrackingConfig(max_steps=args.num_iters, patience=200,
                         warmup_steps=100, kcover=args.kcover,
                         coast_after_steps=args.coast_after_steps,
                         select_motion_px=args.select_gate,
                         resort_motion_px=args.resort_gate)
    all_rooms = (Replica.ROOMS if args.dataset == "Replica"
                 else TUM.SCENES if args.dataset == "TUM" else [""])
    rooms = _room_list(args, all_rooms)
    if getattr(args, "host_shard", False):
        # multi-host pods: each process takes its room subset (scene-level
        # DP; parallel/distributed.py). No-op single-process.
        from .parallel import shard_scenes

        rooms = shard_scenes(rooms)
    results = {args.dataset: {}}
    run_root = Path(args.run_dir)
    for room in rooms:
        kwargs = {}
        if args.dataset == "Synthetic":
            kwargs = dict(n_frames=args.frames, height=args.height,
                          width=args.width,
                          seed=getattr(args, "seed", 42))
        elif args.data_root:
            kwargs = dict(root=args.data_root)
        runner = SequenceRunner(
            data_set=args.dataset, scene_name=room, normalize=True,
            config=cfg, backend=args.backend,
            run_dir=run_root / (room or "synthetic"),
            max_pairs=args.max_pairs, algorithm=args.algorithm,
            panel_every=args.panel_every, pcd_every=args.pcd_every,
            knn_method=args.knn,
            **kwargs,
        )
        res = runner.train(progress=not args.quiet,
                           prefetch=not args.no_prefetch)
        results[args.dataset][room or "synthetic"] = {
            args.algorithm: {"eT": res.eT, "eR": res.eR}
        }
        print(f"{args.dataset}/{room}: ATE-RMSE {res.ate_rmse*100:.5f} cm  "
              f"AAE-RMSE {res.aae_rmse:.5f} deg  "
              f"({res.pose_steps_per_s:.0f} pose-steps/s)")
    write_res_json(results, run_root / "res.json")
    print(f"wrote {run_root/'res.json'}")


def cmd_icp(args):
    from .data.datasets import Replica, TUM, SyntheticBoxRoom
    from .tracking.icp import run_icp_sweep

    if args.dataset == "Replica":
        rooms = _room_list(args, Replica.ROOMS)

        def factory(scene):
            return Replica(scene, root=args.data_root or "datasets/Replica")
    elif args.dataset == "TUM":
        rooms = _room_list(args, TUM.SCENES)

        def factory(scene):
            return TUM(scene, root=args.data_root or "datasets/TUM")
    else:
        rooms = ["synthetic"]

        def factory(scene):
            return SyntheticBoxRoom(n_frames=args.frames, height=args.height,
                                    width=args.width)

    res = run_icp_sweep(
        factory, rooms, methods=args.methods, run_root=args.run_dir,
        max_images=args.max_pairs,
    )
    for (scene, method), out in res.items():
        print(f"{scene}/{method}: ATE-RMSE {out['ate_rmse']*100:.5f} cm  "
              f"AAE-RMSE {out['aae_rmse']:.5f} deg")


def cmd_render(args):
    """Novel-view fly-through: build a frozen Gaussian scene from one RGB-D
    frame and render RGB+ED along a generated camera path (the reference
    ships the multinerf path generators in src/data/traj.py but never wires
    them to a renderer; here they drive the Pallas rasterizer)."""
    import jax.numpy as jnp
    import numpy as np

    from .data import traj
    from .data.datasets import get_dataset
    from .eval.visualize import depth_to_colormap, _mpl
    from .models.gaussians import scene_from_point_cloud
    from .ops import camera
    from .ops.lie import invert_se3, transform_points
    from .ops.rasterize import rasterize

    kwargs = {}
    if args.dataset == "Synthetic":
        kwargs = dict(n_frames=max(args.frame + 8, 12), height=args.height,
                      width=args.width)
    elif args.data_root:
        kwargs = dict(root=args.data_root)
    ds = get_dataset(args.dataset, args.scene, **kwargs)
    frame = ds[args.frame]
    h, w = frame.hw
    K = jnp.asarray(frame.K, jnp.float32)
    pts_cam = camera.depth_to_points(jnp.asarray(frame.depth, jnp.float32), K)
    pts = transform_points(jnp.asarray(frame.c2w, jnp.float32), pts_cam)
    rgbs = jnp.asarray(frame.rgb.reshape(-1, 3), jnp.float32) / 255.0
    scene = scene_from_point_cloud(pts, rgbs, grid_shape=(h, w))

    # camera path from the dataset's GT poses around the scene frame; the
    # path generators need >= 2 poses (focus_point_fn is singular for one
    # camera), so extend the window BACKWARD when --frame is near the end
    ctx_end = min(len(ds), args.frame + 16)
    ctx_start = args.frame if ctx_end - args.frame >= 2 else max(
        0, ctx_end - 2)
    poses = np.stack([np.asarray(ds[i].c2w)
                      for i in range(ctx_start, ctx_end)])
    if poses.shape[0] < 2:  # single-frame dataset: jitter a second pose
        p2 = poses[0].copy()
        p2[:3, 3] += 0.05
        poses = np.stack([poses[0], p2])
    if args.path == "ellipse_z":
        path = traj.generate_ellipse_path_z(poses, n_frames=args.n_views)
    elif args.path == "ellipse_y":
        path = traj.generate_ellipse_path_y(poses, n_frames=args.n_views)
    else:
        # keep keyframe orientations: look-at-neighbor re-aims along the
        # motion direction, which is degenerate for near-static
        # (tracking-style) trajectories
        path = traj.generate_interpolated_path(
            poses, max(args.n_views // max(len(poses) - 1, 1), 1),
            look_at_neighbor=False,
        )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    plt = _mpl()
    for i, c2w in enumerate(path):
        c2w4 = np.eye(4, dtype=np.float32)
        c2w4[: c2w.shape[0]] = c2w
        render, alpha = rasterize(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, invert_se3(jnp.asarray(c2w4)), K, w, h,
            sh_degree=1, render_mode="RGB+ED", backend=args.backend,
        )
        render = np.asarray(render)
        rgb = np.clip(render[..., :3], 0, 1)
        panel = np.concatenate(
            [(rgb * 255).astype(np.uint8), depth_to_colormap(render[..., 3])],
            axis=1,
        )
        plt.imsave(out_dir / f"view_{i:04d}.png", panel)
    print(f"wrote {len(path)} views to {out_dir}")


def cmd_tables(args):
    from .eval.logger import (
        aggregate_runs, results_markdown_table, write_res_json,
    )

    if not args.runs and not args.res:
        raise SystemExit("tables: provide --res or --runs")
    if args.runs:
        # reference load_history parity: reduce all runs under a tree
        # (incl. multi-host --host-shard room shards) to one res.json
        results = aggregate_runs(args.runs)
        res = write_res_json(results, Path(args.runs) / "res.json")
        print(f"aggregated {sum(len(r) for d in results.values() for r in d.values())} "
              f"runs -> {Path(args.runs)/'res.json'}\n")
    else:
        res = json.loads(Path(args.res).read_text())
    print(f"## {args.dataset} — ATE RMSE [cm]\n")
    print(results_markdown_table(res, args.dataset, "ate_rmse", 100.0))
    print(f"\n## {args.dataset} — AAE RMSE [deg]\n")
    print(results_markdown_table(res, args.dataset, "aae_rmse", 1.0))
    # per-scene throughput (only when every run carried the runner's
    # final pose_steps_per_s summary row — VERDICT r4 next #7)
    if all("steps_per_s" in a for r in res.get(args.dataset, {}).values()
           for a in r.values()):
        print(f"\n## {args.dataset} — pose-opt steps/s (e2e wall)\n")
        print(results_markdown_table(res, args.dataset, "steps_per_s", 1.0))


def build_parser():
    ap = argparse.ArgumentParser(prog="gsplatloc_tpu")
    ap.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the JAX platform IN-PROCESS (site TPU plugins can "
             "override the JAX_PLATFORMS env var, so an env-only override "
             "still initializes the TPU backend — and hangs if it is "
             "unreachable)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("track", help="gsplat pose-tracking eval")
    t.add_argument("--dataset", default="Synthetic",
                   choices=["Replica", "TUM", "Synthetic"])
    t.add_argument("--rooms", nargs="*", default=None)
    t.add_argument("--all", action="store_true")
    t.add_argument("--room-range", nargs=2, type=int, default=None,
                   metavar=("START", "END"))
    t.add_argument("--office-range", nargs=2, type=int, default=None,
                   metavar=("START", "END"))
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--num-iters", type=int, default=2000)
    t.add_argument("--max-pairs", type=int, default=1998)
    # "fused" is the product hot path (frozen-scene tracking kernels,
    # SequenceRunner's default); "pallas" is the general rasterizer
    # (~12x slower at the bench scale, docs/PERFORMANCE.md)
    t.add_argument("--backend", default="fused")
    t.add_argument("--algorithm", default="gsplatloc_tpu")
    t.add_argument("--kcover", type=int, default=16,
                   help="fused backend: per-pixel K-cover rendering with "
                        "K covers (ops/kcover.py; 0 = sub-tile kernels). "
                        "16 = the product default behind the headline "
                        "bench (kept in lockstep with TrackingConfig by a "
                        "pinning test)")
    # literal 2.0, not TrackingConfig().select_motion_px: build_parser must
    # not import jax (the --platform override must run before any jax
    # init); lockstep with TrackingConfig is pinned by
    # test_product_config_pinned
    t.add_argument("--select-gate", type=float, default=2.0,
                   help="kcover selection staleness gate in px of bounded "
                        "screen motion (select_motion_px): tighter = more "
                        "accurate + more re-selects; the accuracy-vs-speed "
                        "knob (runs/tpu_session_r3a/kcover_recovery_gates)")
    t.add_argument("--resort-gate", type=float, default=4.0,
                   help="binning-rebuild staleness gate in px of bounded "
                        "screen motion (resort_motion_px): 4 px matches "
                        "the 2 px accuracy class with ~half the rebuild "
                        "fires, validated end-to-end on the fixture "
                        "(runs/tpu_session_r3c/fixture_rb4); 8 px breaks "
                        "depth-order staleness — see TrackingConfig")
    t.add_argument("--coast-after-steps", type=int, default=30,
                   help="loosen the staleness gates 8x after this many "
                        "non-improving steps (opt/tracking.py coast mode; "
                        "0 = coast off — the accuracy A/B knob)")
    t.add_argument("--knn", default="auto",
                   choices=["auto", "grid", "exact", "brute"],
                   help="scale-init kNN: grid-window on device (default) or "
                        "exact native KdTree (small_gicp parity, host "
                        "round-trip)")
    t.add_argument("--panel-every", type=int, default=0,
                   help="write an RGBD comparison panel every N pairs "
                        "(0 = off; reference logs one at early-stop)")
    t.add_argument("--pcd-every", type=int, default=0,
                   help="write a 3D point-cloud inspection PNG (pair cloud "
                        "+ camera frusta) every N pairs (0 = off; headless "
                        "PcdVisualizer parity)")
    t.add_argument("--no-prefetch", action="store_true",
                   help="disable the host prefetch pipeline (strictly "
                        "serial reference loop shape — for debugging/A-B)")
    t.add_argument("--run-dir", default="runs/track")
    t.add_argument("--data-root", default=None,
                   help="dataset root override (e.g. a generated "
                        "Replica-format fixture)")
    t.add_argument("--frames", type=int, default=40)
    t.add_argument("--height", type=int, default=680)
    t.add_argument("--width", type=int, default=1200)
    t.add_argument("--quiet", action="store_true")
    t.add_argument("--host-shard", action="store_true",
                   help="multi-host: this process tracks rooms[i::P] "
                        "(call parallel.initialize() via env or run under "
                        "a pod launcher)")
    t.set_defaults(fn=cmd_track)

    i = sub.add_parser("icp", help="classical ICP baseline sweep")
    i.add_argument("--dataset", default="Synthetic",
                   choices=["Replica", "TUM", "Synthetic"])
    i.add_argument("--rooms", nargs="*", default=None)
    i.add_argument("--all", action="store_true")
    i.add_argument("--methods", nargs="*",
                   default=["ICP", "PLANE_ICP", "GICP"])
    i.add_argument("--max-pairs", type=int, default=2000)
    i.add_argument("--run-dir", default="runs/icp_sweep")
    i.add_argument("--data-root", default=None)
    i.add_argument("--frames", type=int, default=40)
    i.add_argument("--height", type=int, default=240)
    i.add_argument("--width", type=int, default=320)
    i.set_defaults(fn=cmd_icp)

    tb = sub.add_parser("tables", help="res.json -> markdown tables")
    tb.add_argument("--res", default=None)
    tb.add_argument("--runs", default=None,
                    help="aggregate all */metrics.jsonl under this runs/ "
                         "tree into res.json first (load_history parity)")
    tb.add_argument("--dataset", default="Replica")
    tb.set_defaults(fn=cmd_tables)

    r = sub.add_parser("render", help="novel-view fly-through renders")
    r.add_argument("--dataset", default="Synthetic",
                   choices=["Replica", "TUM", "Synthetic"])
    r.add_argument("--scene", default="")
    r.add_argument("--data-root", default=None)
    r.add_argument("--frame", type=int, default=0,
                   help="dataset frame the scene is built from")
    r.add_argument("--path", default="spline",
                   choices=["ellipse_z", "ellipse_y", "spline"],
                   help="spline keeps keyframe orientations (works for any "
                        "trajectory); the ellipse orbits re-aim at the "
                        "focus point and are degenerate for near-static "
                        "(tracking-style) sequences")
    r.add_argument("--n-views", type=int, default=24)
    r.add_argument("--backend", default="pallas")
    r.add_argument("--height", type=int, default=240)
    r.add_argument("--width", type=int, default=320)
    r.add_argument("--out", default="runs/render")
    r.set_defaults(fn=cmd_render)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
