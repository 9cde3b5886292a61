"""Full-sequence pose tracking runner — the reference's eval engine.

Parity with reference Runner.train (src/my_gsplat/gs_trainer_total.py:45-282):
for each frame pair (<= 1998): build the frozen Gaussian scene from the tar
cloud, init the camera at tar's (normalized) GT pose, run the jitted
early-stopped pose optimization (opt/tracking.py), record eT/eR of the
best-loss pose against src's (normalized) GT pose.

TPU-native differences: the entire inner loop is one device computation per
pair; host work is only image IO and bookkeeping. The per-pair scene has
static shape (N = H*W pixels), so every pair reuses ONE compiled executable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.parser import Parser
from ..eval.logger import ExperimentLogger
from ..eval.metrics import rmse, rotation_error_deg, translation_error
from ..models.gaussians import scene_from_point_cloud
from ..opt.tracking import TrackingConfig, optimize_pose


@dataclass
class SequenceResult:
    eT: list = field(default_factory=list)  # meters, per pair
    eR: list = field(default_factory=list)  # degrees, per pair
    losses: list = field(default_factory=list)
    steps: list = field(default_factory=list)
    poses_est: list = field(default_factory=list)  # (4,4) per pair
    wall_s: float = 0.0
    # cumulative per-stage wall clock (seconds over the whole run):
    #   decode / knn / parse / scene — host-side prepare stages (run on
    #     the prefetch worker when prefetch=True, so their sum can exceed
    #     the critical-path time they actually cost);
    #   wait — main-thread time blocked on the prefetch future (the
    #     UN-hidden part of prepare — the pipeline's residual stall);
    #   optimize — main-thread time in the optimize_pose dispatch;
    #   collect — host readout + logging/panels/checkpoints.
    stage_s: dict = field(default_factory=dict)

    @property
    def ate_rmse(self) -> float:
        return rmse(self.eT)

    @property
    def aae_rmse(self) -> float:
        return rmse(self.eR)

    @property
    def pose_steps_per_s(self) -> float:
        return float(np.sum(self.steps) / self.wall_s) if self.wall_s else 0.0


class SequenceRunner:
    """Track a whole RGB-D sequence frame-to-frame."""

    def __init__(
        self,
        data_set: str = "Replica",
        scene_name: str = "room0",
        normalize: bool = True,
        config: TrackingConfig | None = None,
        backend: str = "fused",
        run_dir: str | Path = "runs/default",
        max_pairs: int = 1998,
        algorithm: str = "gsplatloc_tpu",
        panel_every: int = 0,  # if > 0, write an RGBD panel every N pairs
        pcd_every: int = 0,  # if > 0, write a 3D pcd inspection PNG every N
        knn_method: str = "auto",  # scale-init kNN: auto|grid|exact|brute
        **dataset_kwargs,
    ):
        # the depth-GT re-render uses the SAME kernel family as the tracking
        # render (reference parity: one rasterizer for both, dataset.py:
        # 362-372 + model.py:195-213 — shared representation artifacts
        # cancel in the loss)
        cfg = config or TrackingConfig()
        if backend == "fused":
            parser_backend = "subtile" if cfg.subtile else "fused"
        else:
            parser_backend = backend
        # "auto" -> EXACT native-KdTree scale init when the C++ lib loads
        # (the reference always uses exact small_gicp kNN; the grid-window
        # approximation inflates grazing depth-edge scales into image-wide
        # opaque blobs that flatten the loss surface — see
        # data/parser.render_depth_gt). ~0.9 s host-side per 816k cloud,
        # ~6% of pair wall time; applied to BOTH the tracking scene and
        # the parser's depth-GT re-render scene.
        if knn_method == "auto":
            try:
                from ..native import build_library

                build_library()
                knn_method = "exact"
            except Exception:  # noqa: BLE001 — no toolchain: keep grid
                knn_method = "grid"
        self.knn_method = knn_method
        self.parser = Parser(
            data_set=data_set, name=scene_name, normalize=normalize,
            backend=parser_backend, knn_method=knn_method,
            **dataset_kwargs,
        )
        self._parser_backend = parser_backend
        self.config = cfg
        self.backend = backend
        self.max_pairs = max_pairs
        self.panel_every = panel_every
        self.pcd_every = pcd_every
        self.logger = ExperimentLogger(
            run_dir,
            config=dict(
                dataset=data_set, scene=scene_name, normalize=normalize,
                backend=backend, algorithm=algorithm, knn_method=knn_method,
                **self.config._asdict(),
            ),
        )

    def _prepare_pair(self, i: int):
        """All per-pair work that precedes optimize_pose: image decode,
        host exact-kNN, the jitted Parser assembly dispatch, and the scene
        build. Runs on the prefetch worker thread for pair i+1 while pair
        i optimizes on device (the host pieces — ~0.9 s kNN per 816k
        cloud + 2 image decodes — fully overlap; the small device pieces
        just enqueue behind the running optimization)."""
        t0 = time.perf_counter()
        # split the stages the cache makes separable: decode both frames
        # first, then the host kNN, so parser[i] below is dispatch-only
        self.parser.frame(i)
        self.parser.frame(i + 1)
        t1 = time.perf_counter()
        knn_tar = self.parser.knn_for_frame(i)
        self.parser.knn_for_frame(i + 1)
        t2 = time.perf_counter()
        data = self.parser[i]
        t3 = time.perf_counter()
        h, w = data.src_depth.shape
        # scale-init kNN: exact (cached per frame — rigid-invariant,
        # so the raw-cloud dists apply to the normalized tar points)
        # or the O(N) grid-window fallback
        scene = scene_from_point_cloud(
            data.tar_points, data.colors, grid_shape=(h, w),
            knn_sq_dists=knn_tar,
            knn_method=self.knn_method,
        )
        t4 = time.perf_counter()
        stages = {"decode": t1 - t0, "knn": t2 - t1, "parse": t3 - t2,
                  "scene": t4 - t3}
        # observability for the scale-init robust clamp (a documented
        # bit-level-parity deviation, docs/PARITY.md): count the splats it
        # actually capped — 0 on healthy scenes — so an engaged clamp is
        # visible in the run log (ADVICE r4). Host numpy, ~ms at 816k.
        if knn_tar is not None:
            neigh = np.asarray(knn_tar)[:, 1:].astype(np.float64)
            s_raw = np.sqrt(np.mean(neigh**2, axis=-1) + 1e-24)
            cap = np.quantile(s_raw.astype(np.float32), 0.99) * 64.0
            stages["clamped"] = int((s_raw > cap).sum())
        return data, scene, (h, w), stages

    def _collect_pair(self, i, data, out, res: SequenceResult, it,
                      progress: bool, t_start: float, wall_base: float,
                      checkpoint_every: int):
        """Host-side readout + bookkeeping of one optimized pair. ONE
        batched device_get covers every value the host needs; when called
        one pair behind the dispatch pipeline, the transfer overlaps the
        next pair's device execution."""
        from ..utils.checkpoint import save_checkpoint

        h, w = data.src_depth.shape
        best_c2w, src_c2w, best_loss, steps_run, rebuilds, selects, ovf = (
            jax.device_get(
                (out.best_pose.to_c2w(), data.src_c2w, out.best_loss,
                 out.steps_run, out.rebuilds, out.selects,
                 out.slot_overflow)
            )
        )
        if bool(ovf):
            # a truncated cover silently degrades the highest sub-tiles'
            # accuracy — surface it loudly (raise TrackingConfig.slot_budget)
            print(f"[runner] WARNING pair {i}: slot_budget overflow — "
                  f"cover truncated; raise TrackingConfig.slot_budget",
                  flush=True)
            self.logger.log(i, slot_overflow=1)
        eT = float(translation_error(best_c2w, src_c2w))
        eR = float(rotation_error_deg(best_c2w, src_c2w))
        res.eT.append(eT)
        res.eR.append(eR)
        res.losses.append(float(best_loss))
        res.steps.append(int(steps_run))
        res.poses_est.append(np.asarray(best_c2w))
        self.logger.log(
            i, eT=eT, eR=eR, best_loss=float(best_loss),
            steps=int(steps_run), rebuilds=int(rebuilds),
            selects=int(selects),
        )
        if self.panel_every and i % self.panel_every == 0:
            # RGBD comparison panel at the pair's best pose — the
            # reference logs this grid at early-stop (WandbLogger
            # plot_rgbd, src/eval/logger.py:119-242)
            from ..data.parser import render_depth_gt
            from ..eval.visualize import plot_rgbd_panel

            d_best = render_depth_gt(
                data.tar_points, data.colors, self.parser.K,
                jnp.asarray(best_c2w), h, w, grid_shape=(h, w),
                backend=self._parser_backend,
            )
            plot_rgbd_panel(
                np.asarray(data.src_depth), np.asarray(d_best),
                self.logger.run_dir / "panels" / f"pair_{i:05d}.png",
                title=(f"pair {i}: eT={eT*100:.4f}cm eR={eR:.4f}deg "
                       f"steps={int(steps_run)}"),
            )
        if self.pcd_every and i % self.pcd_every == 0:
            # 3D point-cloud inspection: the pair's (normalized) tar cloud
            # + tar/src/est camera frusta, offscreen turntable PNG —
            # headless parity for the reference's PcdVisualizer window
            # (src/component/visualize.py:13-69)
            from ..eval.visualize import visualize_point_cloud

            sub = np.asarray(data.tar_points[::8])
            cols = np.asarray(data.colors[::8])
            visualize_point_cloud(
                sub, self.logger.run_dir / "pcd" / f"pair_{i:05d}.png",
                colors=cols,
                poses={"tar": np.asarray(data.tar_c2w),
                       "src GT": np.asarray(src_c2w),
                       "est": np.asarray(best_c2w)},
                K=np.asarray(self.parser.K), wh=(w, h),
                title=(f"pair {i} (normalized frame): eT={eT*100:.4f}cm "
                       f"eR={eR:.4f}deg"),
            )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            save_checkpoint(
                self.logger.run_dir, i + 1, res.poses_est, res.eT,
                res.eR, res.losses, res.steps,
                extra={"wall_s": wall_base + time.time() - t_start},
            )
        if progress:
            it.set_description(
                f"eT={eT*100:.4f}cm eR={eR:.4f}deg steps={int(steps_run)}"
            )

    def train(self, progress: bool = True, resume: bool = False,
              checkpoint_every: int = 50,
              prefetch: bool = True,
              prefetch_depth: int = 2) -> SequenceResult:
        """Run the sequence. With prefetch=True (default) the host side of
        pair i+1 (image decode, exact kNN, parser dispatch, scene build)
        runs on a background thread while pair i optimizes on device, and
        pair i's host readout is deferred until pair i+1 has been
        dispatched — a 3-stage software pipeline (prepare | optimize |
        collect) over the strictly serial reference loop
        (src/my_gsplat/gs_trainer_total.py:45-51). Results are bitwise
        identical to prefetch=False (tested).

        prefetch_depth (round 5, VERDICT r4 next #6): number of prepare
        submissions kept in flight. Depth 1 leaves the residual stall
        exposed whenever prepare(i+1) runs longer than optimize(i)
        (measured 16.5 s of 250 s wall on the 79-pair f32 run); depth 2
        lets the single worker bank slack from fast pairs — the worker
        still runs prepares strictly in order, so results are unchanged.
        One extra prepared pair stays resident (~200 MB host+device at
        the 816k scale)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..utils.checkpoint import load_checkpoint

        res = SequenceResult()
        start_pair = 0
        # wall time spent in PREVIOUS sessions on the checkpointed pairs —
        # without it, a resumed run divides all pairs' steps by only the
        # current session's wall time, inflating pose_steps_per_s
        wall_base = 0.0
        if resume:
            start_pair, state = load_checkpoint(self.logger.run_dir)
            if state is not None:
                res.poses_est = state["poses_est"]
                res.eT = state["eT"]
                res.eR = state["eR"]
                res.losses = state["losses"]
                res.steps = [int(s) for s in state["steps"]]
                wall_base = float(state.get("wall_s", 0.0))
        t_start = time.time()
        n_pairs = min(len(self.parser), self.max_pairs)
        it = range(start_pair, n_pairs)
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        executor = ThreadPoolExecutor(max_workers=1) if prefetch else None
        depth = max(1, int(prefetch_depth))
        try:
            futs = deque()
            if prefetch:
                for j in range(start_pair,
                               min(start_pair + depth, n_pairs)):
                    futs.append(executor.submit(self._prepare_pair, j))
            pending = None  # (i, data, out): dispatched, not yet read
            acc = res.stage_s
            for i in it:
                tw0 = time.perf_counter()
                if prefetch:
                    data, scene, (h, w), stages = futs.popleft().result()
                    acc["wait"] = acc.get("wait", 0.0) + (
                        time.perf_counter() - tw0)
                    if i + depth < n_pairs:
                        futs.append(
                            executor.submit(self._prepare_pair, i + depth))
                else:
                    data, scene, (h, w), stages = self._prepare_pair(i)
                clamped = stages.pop("clamped", 0)
                if clamped:
                    self.logger.log(i, clamped_scales=int(clamped))
                for k, v in stages.items():
                    acc[k] = acc.get(k, 0.0) + v
                to0 = time.perf_counter()
                out = optimize_pose(
                    scene, data.tar_c2w, data.src_depth, self.parser.K,
                    w, h, config=self.config, backend=self.backend,
                )
                acc["optimize"] = acc.get("optimize", 0.0) + (
                    time.perf_counter() - to0)
                tc0 = time.perf_counter()
                if prefetch:
                    if pending is not None:
                        self._collect_pair(*pending, res, it, progress,
                                           t_start, wall_base,
                                           checkpoint_every)
                    pending = (i, data, out)
                else:  # strictly serial (the reference's loop shape)
                    self._collect_pair(i, data, out, res, it, progress,
                                       t_start, wall_base,
                                       checkpoint_every)
                acc["collect"] = acc.get("collect", 0.0) + (
                    time.perf_counter() - tc0)
            if pending is not None:
                self._collect_pair(*pending, res, it, progress, t_start,
                                   wall_base, checkpoint_every)
        finally:
            if executor is not None:
                executor.shutdown(wait=True)
        res.wall_s = wall_base + time.time() - t_start
        self.logger.log(
            n_pairs,
            ate_rmse=res.ate_rmse, aae_rmse=res.aae_rmse,
            pose_steps_per_s=res.pose_steps_per_s, wall_s=res.wall_s,
            stage_s={k: round(v, 3) for k, v in res.stage_s.items()},
        )
        self.logger.finish()
        return res
