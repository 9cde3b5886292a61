"""Full-pipeline tests on the synthetic box-room dataset (no files needed):
Parser assembly (world transform + PCA + depth-GT re-render) and the
sequence tracking runner."""

import numpy as np

from gsplatloc_tpu.data.datasets import SyntheticBoxRoom
from gsplatloc_tpu.data.parser import Parser
from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
from gsplatloc_tpu.opt.tracking import TrackingConfig
from gsplatloc_tpu.tracking.runner import SequenceRunner

H, W = 48, 64


def test_synthetic_dataset_frames():
    ds = SyntheticBoxRoom(n_frames=4, height=H, width=W)
    assert len(ds) == 4
    f = ds[0]
    assert f.rgb.shape == (H, W, 3) and f.depth.shape == (H, W)
    assert f.depth.min() > 0.1 and f.depth.max() < 20.0
    assert np.allclose(f.c2w[3], [0, 0, 0, 1])


def test_parser_align_data():
    parser = Parser(
        data_set="Synthetic", name="", normalize=True, backend="reference",
        n_frames=3, height=H, width=W,
    )
    data = parser[0]
    n = H * W
    assert data.tar_points.shape == (n, 3)
    assert data.src_points.shape == (n, 3)
    assert data.src_depth.shape == (H, W)
    assert data.pixels.shape == (H, W, 3)
    # PCA of a rigid transform keeps scale 1
    np.testing.assert_allclose(float(data.pca_factor), 1.0, atol=1e-4)
    # normalized tar pose is still a rotation
    R = np.asarray(data.tar_c2w)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # re-rendered GT depth must be positive nearly everywhere and in range
    d = np.asarray(data.src_depth)
    assert (d > 0).mean() > 0.97
    # tar pose (init) differs from src pose (target) by a small motion
    eT = float(translation_error(data.tar_c2w, data.src_c2w))
    eR = float(rotation_error_deg(data.tar_c2w, data.src_c2w))
    assert 1e-5 < eT < 0.1 and 0.0 < eR < 2.0


def test_sequence_runner_recovers_poses(tmp_path):
    runner = SequenceRunner(
        data_set="Synthetic", scene_name="", normalize=True,
        backend="reference",
        config=TrackingConfig(max_steps=150, patience=40, warmup_steps=20),
        run_dir=tmp_path / "run", max_pairs=2,
        n_frames=3, height=H, width=W, speed=8.0,
    )
    res = runner.train(progress=False)
    assert len(res.eT) == 2
    # baseline: identity alignment (tar pose as estimate) error
    init_eT = []
    for i in range(2):
        d = runner.parser[i]
        init_eT.append(float(translation_error(d.tar_c2w, d.src_c2w)))
    # tracking must beat the no-op baseline clearly
    assert res.ate_rmse < np.sqrt(np.mean(np.square(init_eT))) / 3
    assert (tmp_path / "run" / "metrics.jsonl").exists()


def test_sequence_runner_fused_backend(tmp_path):
    """Runner end-to-end on the fused tracking backend (interpret mode)."""
    runner = SequenceRunner(
        data_set="Synthetic", scene_name="", normalize=True,
        backend="fused",
        config=TrackingConfig(max_steps=60, patience=30, warmup_steps=10,
                              resort_every=20),
        run_dir=tmp_path / "run_fused", max_pairs=1,
        n_frames=2, height=H, width=W, speed=8.0,
    )
    res = runner.train(progress=False)
    assert len(res.eT) == 1
    d = runner.parser[0]
    init_eT = float(translation_error(d.tar_c2w, d.src_c2w))
    assert res.eT[0] < init_eT  # improves over the no-op baseline


def test_prefetch_pipeline_matches_serial(tmp_path):
    """The 3-stage prefetch pipeline (prepare | optimize | collect) must
    produce bitwise-identical results to the strictly serial loop — it
    reorders host work only (tracking/runner.py train)."""
    def run(prefetch, name):
        runner = SequenceRunner(
            data_set="Synthetic", scene_name="", normalize=True,
            backend="reference",
            config=TrackingConfig(max_steps=40, patience=20,
                                  warmup_steps=5),
            run_dir=tmp_path / name, max_pairs=3,
            n_frames=4, height=H, width=W, speed=8.0,
        )
        return runner.train(progress=False, prefetch=prefetch)

    serial = run(False, "serial")
    piped = run(True, "piped")
    assert serial.eT == piped.eT
    assert serial.eR == piped.eR
    assert serial.losses == piped.losses
    assert serial.steps == piped.steps


def test_parser_frame_cache_decodes_once():
    """Parser.frame keeps a 3-frame cache so sequential tracking decodes
    each image exactly once (each frame is read as pair i-1's src and
    pair i's tar)."""
    parser = Parser(data_set="Synthetic", name="", normalize=False,
                    n_frames=5, height=H, width=W)
    calls = []
    orig = parser._data._get_one

    def counting(i):
        calls.append(i)
        return orig(i)

    parser._data._get_one = counting
    for i in range(4):
        parser[i]
    assert sorted(calls) == [0, 1, 2, 3, 4]  # each frame exactly once
