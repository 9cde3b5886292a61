"""Generate Replica-FORMAT fixture sequences at the headline scale
(1200x680) for end-to-end ATE evidence without network access to the real
Replica data (VERDICT r1 #3; r2 missing #1 asks for MULTIPLE scenes with
varied clutter / per-frame motion / depth noise so the tracking gates are
validated off the tuning scene).

Writes datasets/Replica_fixture/{cam_params.json, <room>/{frame*.jpg,
depth*.png, traj.txt}} byte-format-identical to the real dataset layout the
loader expects (reference src/data/dataset.py:78-161: jpg color, 16-bit png
depth / scale 6553.5, traj.txt of row-major 4x4 poses), then evaluated
through the untouched product CLI:

  python -m gsplatloc_tpu.cli track --dataset Replica \
      --data-root datasets/Replica_fixture --all --backend fused

Room catalogue (seeds fixed; room0 keeps the round-2 tuning-scene
parameters so committed evidence stays comparable):

  room0  clutter=60   speed=1.0 (~10 mm/frame)  no depth noise  (tuning)
  room1  clutter=20   speed=3.0 (~30 mm/frame)  no depth noise  (fast/sparse)
  room2  clutter=120  speed=0.35 (~3 mm/frame)  sigma=3 mm      (slow/dense/noisy)
  office0-4 (round 4): furniture-like cuboid clutter (clutter_boxes) in
  varied density/motion/noise combinations — see ROOMS below. With all 8
  rooms the suite is structurally comparable to the reference's Replica
  Table 1 (BASELINE.md). --float-depth writes the no-quantization A/B
  variant (float32 TIFF depth, scale 1.0).

Usage: python scripts/make_replica_fixture.py [--frames 80] [--rooms ...]
"""

import argparse
import json
from pathlib import Path

import numpy as np

ROOMS = {
    # name: (clutter_spheres, speed, depth_noise_sigma_m, seed, boxes)
    # room0-2 keep their round-2/3 parameters so committed evidence stays
    # comparable; office0-4 (round 4) add furniture-like cuboid clutter
    # (planar faces + right-angle depth edges — a different conditioning
    # class from the spheres) with varied motion/noise, making the suite
    # structurally comparable to the reference's 8-scene Replica table
    # (BASELINE.md Table 1; VERDICT r3 next #6).
    "room0": (60, 1.0, 0.0, 3, 0),       # tuning scene
    "room1": (20, 3.0, 0.0, 7, 0),       # fast/sparse (~30 mm/frame)
    "room2": (120, 0.35, 0.003, 11, 0),  # slow/dense/noisy
    "office0": (10, 0.8, 0.0, 17, 25),   # desks+some spheres
    "office1": (0, 1.5, 0.001, 19, 40),  # pure furniture, mild noise
    "office2": (30, 0.5, 0.002, 23, 15), # mixed, slow, noisier
    "office3": (6, 2.0, 0.0, 29, 30),    # sparse + fast motion
    "office4": (20, 1.0, 0.003, 31, 50), # dense furniture + 3 mm noise
    # round 5 (VERDICT r4 next #4): the CONDITIONING-hypothesis scene —
    # real-Replica-class clutter density (~7x room0: depth edges and
    # curvature at all orientations essentially everywhere in view), ZERO
    # injected noise. If the r4 error budget's last step is right ("the
    # reference's lower real-Replica number reflects richer geometry
    # sharpening the basin"), the product config lands ~0.007-0.010 cm
    # here; if not, the residual floor is in the pipeline.
    "dense0": (400, 1.0, 0.0, 37, 150),
    # replication of the conditioning result off dense0's seed/motion
    # (round 5: dense0 measured ATE 0.0030 cm; dense1 checks it is the
    # conditioning class, not one seed's luck — different layout seed
    # AND 1.5x the frame-to-frame motion)
    "dense1": (400, 1.5, 0.0, 41, 150),
}


def write_room(root: Path, name: str, frames: int, H: int, W: int,
               K: np.ndarray, scale: float, clutter: int, speed: float,
               noise: float, seed: int, boxes: int = 0,
               float_depth: bool = False):
    import cv2

    from gsplatloc_tpu.data.synthetic import (
        box_room_frame, box_room_trajectory,
    )

    scene_dir = root / name
    scene_dir.mkdir(parents=True, exist_ok=True)
    poses = box_room_trajectory(frames, seed=seed, speed=speed)
    nrng = np.random.default_rng(seed + 1000)
    lines = []
    for i, c2w in enumerate(poses):
        rgb, depth = box_room_frame(c2w, K, H, W, clutter=clutter,
                                    boxes=boxes)
        if noise > 0:
            # sensor-style additive depth noise BEFORE quantization (the
            # per-pixel point cloud, the kNN scales, and the re-rendered
            # depth GT all inherit it — the full product noise path)
            depth = depth + nrng.normal(0.0, noise, depth.shape).astype(
                np.float32)
        # JPEG round-trip only perturbs SH DC colors (loss is depth-only);
        # depth is quantized to the dataset's uint16 grid like real Replica
        cv2.imwrite(str(scene_dir / f"frame{i:06d}.jpg"),
                    (rgb[..., ::-1] * 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        if float_depth:
            # no-quantization A/B variant: float32 TIFF in meters
            # (scale 1.0), everything else byte-identical — isolates the
            # uint16 depth-quantization term of the accuracy error budget
            cv2.imwrite(str(scene_dir / f"depth{i:06d}.tiff"),
                        depth.astype(np.float32))
        else:
            d16 = np.clip(depth * scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(str(scene_dir / f"depth{i:06d}.png"), d16)
        lines.append(" ".join(f"{v:.9f}" for v in np.asarray(c2w).ravel()))
        if (i + 1) % 20 == 0:
            print(f"{name}: {i+1}/{frames} frames", flush=True)
    (scene_dir / "traj.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {frames} frames ({W}x{H}, clutter={clutter}, "
          f"boxes={boxes}, speed={speed}, noise={noise}, "
          f"float_depth={float_depth}) to {scene_dir}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--height", type=int, default=680)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--rooms", nargs="*", default=list(ROOMS))
    ap.add_argument("--out", default="datasets/Replica_fixture")
    ap.add_argument("--float-depth", action="store_true",
                    help="write float32 TIFF depth (scale 1.0, no uint16 "
                         "quantization) — the accuracy-floor A/B variant; "
                         "default out dir gets a _f32 suffix")
    args = ap.parse_args()

    H, W = args.height, args.width
    fx = fy = 600.0 * (W / 1200.0)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    scale = 1.0 if args.float_depth else 6553.5
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    out = args.out
    if args.float_depth and out == "datasets/Replica_fixture":
        out = "datasets/Replica_fixture_f32"
    root = Path(out)
    root.mkdir(parents=True, exist_ok=True)
    (root / "cam_params.json").write_text(json.dumps({
        "camera": {"w": W, "h": H, "fx": fx, "fy": fy, "cx": cx, "cy": cy,
                   "scale": scale},
    }, indent=2))

    for name in args.rooms:
        clutter, speed, noise, seed, boxes = ROOMS[name]
        write_room(root, name, args.frames, H, W, K, scale, clutter, speed,
                   noise, seed, boxes=boxes, float_depth=args.float_depth)


if __name__ == "__main__":
    main()
