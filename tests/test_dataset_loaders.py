"""Replica/TUM loader tests against tiny generated on-disk datasets."""

import json

import numpy as np
import pytest

from gsplatloc_tpu.data.datasets import Replica, TUM, get_dataset


@pytest.fixture
def replica_root(tmp_path):
    import cv2

    root = tmp_path / "Replica"
    scene = root / "room0"
    scene.mkdir(parents=True)
    (root / "cam_params.json").write_text(json.dumps({
        "camera": {"w": 32, "h": 24, "fx": 20.0, "fy": 20.0,
                   "cx": 15.5, "cy": 11.5, "scale": 6553.5}
    }))
    rng = np.random.default_rng(0)
    poses = []
    for i in range(3):
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        depth_m = 2.0 + 0.1 * rng.random((24, 32))
        depth_png = (depth_m * 6553.5).astype(np.uint16)
        cv2.imwrite(str(scene / f"frame{i:06d}.jpg"), rgb)
        cv2.imwrite(str(scene / f"depth{i:06d}.png"), depth_png)
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0, 0]
        poses.append(T)
    (scene / "traj.txt").write_text(
        "\n".join(" ".join(str(v) for v in T.ravel()) for T in poses)
    )
    return root


def test_replica_loader(replica_root):
    ds = Replica("room0", root=replica_root)
    assert len(ds) == 3
    assert "Replica dataset: room0" in str(ds)
    f = ds[0]
    assert f.rgb.shape == (24, 32, 3)
    assert f.depth.shape == (24, 32)
    # depth decoded back to meters
    assert 1.9 < f.depth.mean() < 2.2
    np.testing.assert_allclose(ds[2].c2w[:3, 3], [0.02, 0, 0], atol=1e-6)
    # slice + error semantics (reference dataset.py:45-54)
    assert len(ds[0:2]) == 2
    with pytest.raises(ValueError):
        ds[5]
    with pytest.raises(TypeError):
        ds["x"]


@pytest.fixture
def tum_root(tmp_path):
    import cv2

    root = tmp_path / "TUM"
    scene = root / "rgbd_dataset_freiburg1_desk"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "cam_params.json").write_text(json.dumps({
        "camera": {"w": 32, "h": 24, "fx": 20.0, "fy": 20.0,
                   "cx": 15.5, "cy": 11.5, "scale": 5000.0, "crop_edge": 2}
    }))
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    gt_lines = ["# ts tx ty tz qx qy qz qw"]
    for i in range(4):
        ts = 100.0 + i * 0.5
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        depth_png = ((2.0 + 0.1 * rng.random((24, 32))) * 5000).astype(np.uint16)
        cv2.imwrite(str(scene / "rgb" / f"{ts:.6f}.png"), rgb)
        cv2.imwrite(str(scene / "depth" / f"{ts:.6f}.png"), depth_png)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.01*i} 0 0 0 0 0 1")
    # loadtxt skiprows=1 semantics: first line is a header
    (scene / "rgb.txt").write_text("\n".join(["# header"] + rgb_lines[1:]))
    (scene / "depth.txt").write_text("\n".join(["# header"] + depth_lines[1:]))
    (scene / "groundtruth.txt").write_text("\n".join(gt_lines))
    return root


def test_tum_loader(tum_root):
    ds = TUM("freiburg1_desk", root=tum_root, frame_rate=32)
    assert len(ds) == 4
    f = ds[0]
    # crop_edge=2 shrinks both
    assert f.depth.shape == (20, 28)
    assert f.rgb.shape == (20, 28, 3)
    # first pose normalized to identity (reference dataset.py:264-270)
    np.testing.assert_allclose(ds[0].c2w, np.eye(4), atol=1e-6)
    np.testing.assert_allclose(ds[1].c2w[:3, 3], [0.01, 0, 0], atol=1e-6)


def test_get_dataset_factory(replica_root):
    ds = get_dataset("Replica", "room0", root=replica_root)
    assert isinstance(ds, Replica)
    with pytest.raises(ValueError):
        get_dataset("nope", "x")


def test_parser_on_disk_replica(replica_root):
    from gsplatloc_tpu.data.parser import Parser

    parser = Parser(data_set="Replica", name="room0", normalize=True,
                    backend="reference", root=replica_root)
    assert len(parser) == 2
    data = parser[0]
    assert data.tar_points.shape == (24 * 32, 3)
    assert data.src_depth.shape == (24, 32)


def test_synthetic_clutter():
    """clutter adds interior spheres: deterministic, camera-clear, and the
    depth field gains structure (more depth edges than the bare room)."""
    import numpy as np
    from gsplatloc_tpu.data.datasets import get_dataset
    from gsplatloc_tpu.data.synthetic import clutter_spheres

    s = clutter_spheres(32)
    assert s.shape == (32, 4)
    np.testing.assert_array_equal(s, clutter_spheres(32))  # deterministic
    # clear of the trajectory region
    assert (np.linalg.norm(s[:, :3] - [0, 0, -1], axis=1) > s[:, 3]).all()

    bare = get_dataset("Synthetic", "box", n_frames=2, height=60, width=80)
    clut = get_dataset("Synthetic", "box", n_frames=2, height=60, width=80,
                       clutter=32)
    d0 = np.asarray(bare[0].depth)
    d1 = np.asarray(clut[0].depth)
    assert d1.shape == d0.shape and (d1 <= d0 + 1e-6).all()  # spheres occlude
    edges = lambda d: np.abs(np.diff(d, axis=0)).mean()
    assert edges(d1) > edges(d0)


def test_replica_fixture_generator_roundtrip(tmp_path, monkeypatch):
    """The committed fixture generator writes real Replica-format rooms
    (varied clutter/motion/noise) that the untouched loader reads back:
    frame counts, pose round-trip, and the noisy room actually noisy."""
    import sys

    sys.path.insert(0, "scripts")
    import make_replica_fixture as gen

    out = tmp_path / "Replica_fixture"
    monkeypatch.setattr(sys, "argv", [
        "make_replica_fixture.py", "--frames", "3", "--height", "48",
        "--width", "64", "--out", str(out),
    ])
    gen.main()
    for room, (clutter, speed, noise, seed, boxes) in gen.ROOMS.items():
        ds = Replica(room, root=out)
        assert len(ds) == 3
        f = ds[0]
        assert f.depth.shape == (48, 64) and f.rgb.shape == (48, 64, 3)
        assert np.isfinite(f.depth).all() and (f.depth > 0).mean() > 0.9
    # pose round-trip through traj.txt (float64 text, exact to ~1e-9)
    from gsplatloc_tpu.data.synthetic import box_room_trajectory

    poses = box_room_trajectory(3, seed=gen.ROOMS["room1"][3],
                                speed=gen.ROOMS["room1"][1])
    ds1 = Replica("room1", root=out)
    np.testing.assert_allclose(ds1[2].c2w, poses[2], atol=1e-6)
    # room2 carries depth noise on top of the uint16 quantization: its
    # deviation from the clean analytic depth must dominate room0's
    from gsplatloc_tpu.data.synthetic import box_room_frame

    for room, expect_noisy in (("room0", False), ("room2", True)):
        clutter, speed, noise, seed, boxes = gen.ROOMS[room]
        pose = box_room_trajectory(3, seed=seed, speed=speed)[0]
        K = np.asarray(Replica(room, root=out)[0].K, np.float64)
        _, clean = box_room_frame(pose, K, 48, 64, clutter=clutter)
        got = np.asarray(Replica(room, root=out)[0].depth)
        dev = np.abs(got - clean).mean()
        assert (dev > 1e-3) == expect_noisy, (room, dev)
    # office rooms: cuboid furniture actually changes the depth image
    # (office3 is the noise-free office, so the loader round-trip is
    # exact to the uint16 quantization grid)
    clutter, speed, noise, seed, boxes = gen.ROOMS["office3"]
    pose = box_room_trajectory(3, seed=seed, speed=speed)[0]
    K = np.asarray(Replica("office3", root=out)[0].K, np.float64)
    _, no_boxes = box_room_frame(pose, K, 48, 64, clutter=clutter)
    _, with_boxes = box_room_frame(pose, K, 48, 64, clutter=clutter,
                                   boxes=boxes)
    assert (np.abs(with_boxes - no_boxes) > 0.01).mean() > 0.05
    got = np.asarray(Replica("office3", root=out)[0].depth)
    np.testing.assert_allclose(got, with_boxes, atol=2e-3)


def test_replica_fixture_float_depth(tmp_path, monkeypatch):
    """--float-depth writes float32 TIFF depth (scale 1.0) that the
    loader reads back EXACTLY — no uint16 quantization (the accuracy-floor
    A/B variant, VERDICT r3 next #2)."""
    import sys

    sys.path.insert(0, "scripts")
    import make_replica_fixture as gen

    out = tmp_path / "Replica_fixture_f32"
    monkeypatch.setattr(sys, "argv", [
        "make_replica_fixture.py", "--frames", "2", "--height", "48",
        "--width", "64", "--rooms", "room0", "--out", str(out),
        "--float-depth",
    ])
    gen.main()
    import json as _json

    cam = _json.loads((out / "cam_params.json").read_text())["camera"]
    assert cam["scale"] == 1.0
    ds = Replica("room0", root=out)
    assert len(ds) == 2
    from gsplatloc_tpu.data.synthetic import (
        box_room_frame, box_room_trajectory,
    )

    clutter, speed, noise, seed, boxes = gen.ROOMS["room0"]
    pose = box_room_trajectory(2, seed=seed, speed=speed)[0]
    K = np.asarray(ds[0].K, np.float64)
    _, clean = box_room_frame(pose, K, 48, 64, clutter=clutter)
    got = np.asarray(ds[0].depth, np.float32)
    # exact float32 round-trip: error is float32 representation only
    assert np.abs(got - clean.astype(np.float32)).max() < 1e-6
    # while the uint16 path quantizes at 1/6553.5 m granularity
    quant = np.round(clean * 6553.5) / 6553.5
    assert np.abs(quant - clean).max() > 1e-5


def test_tum_fixture_generator_roundtrip(tmp_path, monkeypatch):
    """TUM-format fixture: misaligned-clock association, undistortion, and
    crop all exercised through the untouched loader; loaded poses must
    match the generated trajectory after the loader's first-pose
    normalization (association picks the nearest 100 Hz GT row, ~5 ms
    -> sub-mm at this motion)."""
    import sys

    sys.path.insert(0, "scripts")
    import make_tum_fixture as gen

    out = tmp_path / "TUM_fixture"
    monkeypatch.setattr(sys, "argv", [
        "make_tum_fixture.py", "--frames", "6", "--height", "48",
        "--width", "64", "--clutter", "8", "--out", str(out),
    ])
    gen.main()
    ds = TUM("freiburg1_desk", root=out, frame_rate=32)
    assert len(ds) == 6
    f = ds[0]
    ce = 8  # crop_edge in the generated cam_params
    assert f.depth.shape == (48 - 2 * ce, 64 - 2 * ce)
    np.testing.assert_allclose(ds[0].c2w, np.eye(4), atol=1e-5)

    from gsplatloc_tpu.data.synthetic import box_room_trajectory

    poses = box_room_trajectory(6, seed=5, speed=1.5)
    rel_true = np.linalg.inv(poses[0]) @ poses[4]
    rel_got = np.asarray(ds[4].c2w, np.float64)
    np.testing.assert_allclose(rel_got[:3, 3], rel_true[:3, 3], atol=2e-3)
    # depth matches the analytic render where valid (undistorted rgb is
    # only SH DC data; depth is the tracked signal and stays pinhole)
    from gsplatloc_tpu.data.synthetic import box_room_frame

    K_full = np.array([[gen_fx := 520.0 * (64 / 640.0), 0, 31.5],
                       [0, gen_fx, 23.5], [0, 0, 1]])
    _, clean = box_room_frame(poses[0], K_full, 48, 64, clutter=8)
    got = np.asarray(ds[0].depth)
    np.testing.assert_allclose(got, clean[ce:-ce, ce:-ce], atol=2e-3)


def test_tum_stress_association(tmp_path, monkeypatch):
    """Association edge cases (VERDICT r3 next #6): dropped depth files,
    depth written 120 ms late (> max_dt=0.08), and a groundtruth outage
    window must all be SKIPPED by the loader — at the stress fixture's
    10 Hz spacing no neighbor frame can be silently substituted — and the
    surviving frames must still carry the right (normalized) poses."""
    import sys

    sys.path.insert(0, "scripts")
    import make_tum_fixture as gen

    out = tmp_path / "TUM_stress"
    frames = 24
    monkeypatch.setattr(sys, "argv", [
        "make_tum_fixture.py", "--frames", str(frames), "--height", "48",
        "--width", "64", "--clutter", "8", "--stress",
        "--scene", "freiburg2_xyz", "--out", str(out),
    ])
    gen.main()
    ds = TUM("freiburg2_xyz", root=out, frame_rate=32)
    # stress must actually remove frames, but most survive
    assert frames - 12 <= len(ds) < frames
    np.testing.assert_allclose(ds[0].c2w, np.eye(4), atol=1e-5)

    # map each surviving frame back to its generated index via the rgb
    # timestamp (rate 10 Hz, jitter sigma 2 ms << spacing)
    t0 = 1305031452.0
    surv = [int(round((float(p.stem) - t0) * 10.0))
            for p in ds._color_paths]
    assert surv[0] == 0 and sorted(surv) == surv
    dropped = set(range(frames)) - set(surv)
    assert dropped  # some frames really were unassociatable
    g0 = frames // 2
    # the groundtruth outage window removes frames g0..g0+2
    assert {g0, g0 + 1, g0 + 2} <= dropped

    from gsplatloc_tpu.data.synthetic import box_room_trajectory

    poses = box_room_trajectory(frames, seed=5, speed=1.5)
    k = len(ds) - 1
    rel_true = np.linalg.inv(poses[0]) @ poses[surv[k]]
    rel_got = np.asarray(ds[k].c2w, np.float64)
    np.testing.assert_allclose(rel_got[:3, 3], rel_true[:3, 3], atol=3e-3)
