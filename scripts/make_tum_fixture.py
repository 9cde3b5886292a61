"""Generate a TUM-FORMAT fixture sequence (VERDICT r2 missing #1: a
TUM-format fixture exercising the association/undistort path end-to-end).

Writes datasets/TUM_fixture/rgbd_dataset_freiburg1_desk/{cam_params.json,
rgb.txt, depth.txt, groundtruth.txt, rgb/*.png, depth/*.png} in the layout
the TUM loader expects (reference src/data/dataset.py:164-321):

  * rgb/depth/groundtruth streams on DIFFERENT clocks (rgb 30 Hz + jitter,
    depth +15 ms offset, groundtruth 100 Hz) so the max_dt=0.08 timestamp
    association does real work;
  * color frames rendered through a radial distortion model (k1/k2) so the
    loader's cv2.undistort does real work (depth stays pinhole — TUM depth
    is registered, and the reference undistorts only color);
  * crop_edge in cam_params so the edge crop path runs;
  * groundtruth.txt rows "t tx ty tz qx qy qz qw" with a header line
    (loader skiprows=1), poses NOT identity-normalized (the loader does
    that itself).

Evaluated through the untouched product CLI:

  python -m gsplatloc_tpu.cli track --dataset TUM \
      --data-root datasets/TUM_fixture --rooms freiburg1_desk

Usage: python scripts/make_tum_fixture.py [--frames 40]
"""

import argparse
import json
from pathlib import Path

import numpy as np

DIST = [0.04, -0.01, 0.0, 0.0, 0.0]  # k1, k2, p1, p2, k3


def _distort_rgb(rgb, K, dist):
    """Resample the pinhole RGB through the distortion model: output pixel
    (ud, vd) shows the scene along the ray whose DISTORTED projection is
    (ud, vd) — i.e. what a real distorted camera records — so
    cv2.undistort(output, K, dist) recovers ~the pinhole image. The
    normalized distorted->undistorted inversion is a 4-round fixed point
    (plenty at |k1| <= 0.05)."""
    import cv2

    h, w = rgb.shape[:2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    k1, k2 = dist[0], dist[1]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(4):
        r2 = x * x + y * y
        f = 1.0 + k1 * r2 + k2 * r2 * r2
        x, y = xd / f, yd / f
    mapx = (x * fx + cx).astype(np.float32)
    mapy = (y * fy + cy).astype(np.float32)
    return cv2.remap(rgb, mapx, mapy, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REPLICATE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--clutter", type=int, default=40)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--scene", default="freiburg1_desk")
    ap.add_argument("--out", default="datasets/TUM_fixture")
    ap.add_argument("--boxes", type=int, default=0,
                    help="furniture-like cuboid clutter (clutter_boxes)")
    ap.add_argument("--rate", type=float, default=None,
                    help="capture rate in Hz (default 30; stress mode "
                         "defaults to 10 so a dropped/late depth frame is "
                         "GENUINELY unassociatable — at 30 Hz a neighbor "
                         "frame's depth sits 33+15 ms away, inside "
                         "max_dt=0.08, and argmin association would "
                         "silently substitute it instead of skipping)")
    ap.add_argument("--stress", action="store_true",
                    help="association-stress variant (VERDICT r3 next #6): "
                         "~12%% of depth frames DROPPED (no file), ~8%% "
                         "written 120 ms late (> max_dt=0.08 — present but "
                         "unassociatable), and a groundtruth outage window "
                         "(~3 frames with no GT row within max_dt). The "
                         "loader must skip all of these and the surviving "
                         "sequence gets 2-3x inter-frame motion at the "
                         "gaps.")
    args = ap.parse_args()

    import cv2

    from gsplatloc_tpu.data.synthetic import (
        box_room_frame, box_room_trajectory,
    )

    H, W = args.height, args.width
    fx = fy = 520.0 * (W / 640.0)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    scale = 5000.0  # TUM depth convention
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    root = Path(args.out) / f"rgbd_dataset_{args.scene}"
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    (root / "depth").mkdir(parents=True, exist_ok=True)
    (root / "cam_params.json").write_text(json.dumps({
        "camera": {"w": W, "h": H, "fx": fx, "fy": fy, "cx": cx, "cy": cy,
                   "scale": scale, "distortion": DIST, "crop_edge": 8},
    }, indent=2))

    rng = np.random.default_rng(args.seed)
    poses = box_room_trajectory(args.frames, seed=args.seed,
                                speed=args.speed)
    t0 = 1305031452.0  # TUM-style epoch seconds
    rate = args.rate if args.rate is not None else (10.0 if args.stress
                                                    else 30.0)

    drop_depth, late_depth = set(), set()
    gt_gap = None  # (t_lo, t_hi) window with no groundtruth rows
    if args.stress:
        srng = np.random.default_rng(args.seed + 77)
        for i in range(1, args.frames):  # keep frame 0 intact (identity)
            r = srng.random()
            if r < 0.12:
                drop_depth.add(i)
            elif r < 0.20:
                late_depth.add(i)
        g0 = args.frames // 2
        # no GT row within max_dt=0.08 of frames g0..g0+2
        gt_gap = (t0 + g0 / rate - 0.09, t0 + (g0 + 2) / rate + 0.09)
    rgb_lines, dep_lines, gt_lines = [], [], []
    from scipy.spatial.transform import Rotation

    # groundtruth stream at 100 Hz spanning the sequence (loader picks the
    # nearest-in-time row per frame)
    n_gt = int(args.frames / rate * 100.0) + 10
    for g in range(n_gt):
        tg = t0 - 0.02 + g * (1.0 / 100.0)
        # piecewise-linear interpolation of the `rate` Hz poses onto 100 Hz
        fpos = np.clip((tg - t0) * rate, 0, args.frames - 1)
        i0 = int(np.floor(fpos))
        i1 = min(i0 + 1, args.frames - 1)
        a = fpos - i0
        trans = (1 - a) * poses[i0][:3, 3] + a * poses[i1][:3, 3]
        q0 = Rotation.from_matrix(poses[i0][:3, :3])
        q1 = Rotation.from_matrix(poses[i1][:3, :3])
        q = (q0 * ((q0.inv() * q1) ** a)).as_quat()  # xyzw slerp
        if gt_gap is not None and gt_gap[0] <= tg <= gt_gap[1]:
            continue  # groundtruth outage window (stress mode)
        gt_lines.append(
            f"{tg:.6f} " + " ".join(f"{v:.6f}" for v in trans)
            + " " + " ".join(f"{v:.6f}" for v in q))

    for i, c2w in enumerate(poses):
        t_rgb = t0 + i / rate + float(rng.normal(0, 0.002))
        t_dep = t_rgb + (0.12 if i in late_depth else 0.015)
        rgb, depth = box_room_frame(c2w, K, H, W, clutter=args.clutter,
                                    boxes=args.boxes)
        rgb_d = _distort_rgb((rgb[..., ::-1] * 255).astype(np.uint8), K,
                             DIST)
        cv2.imwrite(str(root / "rgb" / f"{t_rgb:.6f}.png"), rgb_d)
        rgb_lines.append(f"{t_rgb:.6f} rgb/{t_rgb:.6f}.png")
        if i not in drop_depth:
            d16 = np.clip(depth * scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(str(root / "depth" / f"{t_dep:.6f}.png"), d16)
            dep_lines.append(f"{t_dep:.6f} depth/{t_dep:.6f}.png")
        if (i + 1) % 20 == 0:
            print(f"{i+1}/{args.frames} frames", flush=True)

    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text(
        "# timestamp tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
    if args.stress:
        print(f"stress: dropped depth {sorted(drop_depth)}, "
              f"late depth {sorted(late_depth)}, gt outage frames "
              f"~{args.frames//2}-{args.frames//2+2}")
    print(f"wrote {args.frames} frames ({W}x{H}) to {root}")


if __name__ == "__main__":
    main()
