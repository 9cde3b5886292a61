"""Generate a Replica-FORMAT fixture sequence at the headline scale
(1200x680, cluttered geometry) for end-to-end ATE evidence without network
access to the real Replica data (VERDICT r1 #3).

Writes datasets/Replica_fixture/{cam_params.json, room0/{frame*.jpg,
depth*.png, traj.txt}} byte-format-identical to the real dataset layout the
loader expects (reference src/data/dataset.py:78-161: jpg color, 16-bit png
depth / scale 6553.5, traj.txt of row-major 4x4 poses), then evaluated
through the untouched product CLI:

  python -m gsplatloc_tpu.cli track --dataset Replica \
      --data-root datasets/Replica_fixture --rooms room0 --backend fused

Usage: python scripts/make_replica_fixture.py [--frames 80] [--out DIR]
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--height", type=int, default=680)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--clutter", type=int, default=60)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--out", default="datasets/Replica_fixture")
    args = ap.parse_args()

    import cv2

    from gsplatloc_tpu.data.synthetic import (
        box_room_frame, box_room_trajectory,
    )

    H, W = args.height, args.width
    fx = fy = 600.0 * (W / 1200.0)
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    scale = 6553.5
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    root = Path(args.out)
    scene_dir = root / "room0"
    scene_dir.mkdir(parents=True, exist_ok=True)
    (root / "cam_params.json").write_text(json.dumps({
        "camera": {"w": W, "h": H, "fx": fx, "fy": fy, "cx": cx, "cy": cy,
                   "scale": scale},
    }, indent=2))

    poses = box_room_trajectory(args.frames, seed=args.seed, speed=args.speed)
    lines = []
    for i, c2w in enumerate(poses):
        rgb, depth = box_room_frame(c2w, K, H, W, clutter=args.clutter)
        # JPEG round-trip only perturbs SH DC colors (loss is depth-only);
        # depth is quantized to the dataset's uint16 grid like real Replica
        cv2.imwrite(str(scene_dir / f"frame{i:06d}.jpg"),
                    (rgb[..., ::-1] * 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        d16 = np.clip(depth * scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(scene_dir / f"depth{i:06d}.png"), d16)
        lines.append(" ".join(f"{v:.9f}" for v in np.asarray(c2w).ravel()))
        if (i + 1) % 10 == 0:
            print(f"{i+1}/{args.frames} frames", flush=True)
    (scene_dir / "traj.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {args.frames} frames ({W}x{H}, clutter={args.clutter}) "
          f"to {scene_dir}")


if __name__ == "__main__":
    main()
