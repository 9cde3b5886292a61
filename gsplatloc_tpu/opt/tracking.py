"""Jitted on-device pose optimization with early stopping.

The reference's per-frame-pair inner loop (src/my_gsplat/gs_trainer_total.py:
79-267: forward render -> masked depth+silhouette loss -> backward -> per-param
Adam -> ExponentialLR -> best-loss/patience early stop) becomes ONE
lax.while_loop under jit: no host round-trips per step, early-stop bookkeeping
lives in the carry. Semantics parity:

  * loss = 0.8*L1(depth*mask) + 0.2*L1(sobel(depth*mask)) with
    mask = (rendered_depth != 0), stop-gradient (trainer :109-150),
  * Adam quat lr 5e-4 / trans lr 1e-3, weight decay 1e-3 (model.py:18-23),
  * lr decay gamma = 0.2^(1/max_steps) per step (trainer :65-72),
  * best tracking starts after step 100; patience 200 on best TOTAL loss;
    the best (lowest-loss) pose is the pair's estimate (trainer :160-263).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..losses import tracking_loss
from ..models.gaussians import GaussianScene
from ..models.pose import PoseState
from ..ops.lie import invert_se3
from .adam import AdamState, adam_init, adam_step, exponential_lr


class TrackingConfig(NamedTuple):
    max_steps: int = 1000
    patience: int = 200
    warmup_steps: int = 100  # best-loss tracking starts AFTER this many steps
    early_stop: bool = True
    depth_lambda: float = 0.8
    normal_lambda: float = 0.0
    quat_lr: float = 5e-4
    trans_lr: float = 1e-3
    quat_wd: float = 1e-3
    trans_wd: float = 1e-3
    lr_decay_total: float = 0.2  # gamma = lr_decay_total ** (1/max_steps)
    sh_degree: int = 1
    near_plane: float = 1e-2
    far_plane: float = 1e10
    # fused backend: rebuild the slot list (binning+sort) every N steps.
    # Between rebuilds tile assignment / depth ORDER are stale while every
    # projected quantity stays exact (pose deltas per Adam step are ~1e-4,
    # so order changes are below the packed sort key's quantization anyway).
    resort_every: int = 10
    # fused backend: if > 0, ALSO require accumulated pose motion since the
    # last rebuild above this many pixels (conservative screen-motion bound:
    # fx * (|dt|/z_nearest + dtheta), z_nearest = nearest visible scene
    # depth at the last rebuild) before resorting. Near a pair's loss floor
    # Adam's scale-invariant updates random-walk the pose at ~lr magnitude
    # on noise gradients (~1 px true screen motion), so a sub-pixel
    # threshold fires a full bin+sort every segment for no visible order
    # change. A few px of binning staleness is far inside the ALPHA_MIN
    # splat boundary slack while genuine convergence motion (>= mm scale)
    # still trips the gate immediately. 0 = cadence only. Default 4 px
    # (selection stays at 2, select_motion_px below): the K-cover recovery
    # sweep put rb_gate=4/select=2 in the same-or-better accuracy class as
    # 2/2 (eT 0.133 vs 0.283, kcover_recovery_gates.log) and the
    # early-stopped product A/B confirmed it end-to-end — ATE 0.01753 vs
    # 0.01749 cm with +30% throughput from half the rebuild fires
    # (runs/tpu_session_r3c/fixture_rb4 vs fixture_default2, back-to-back
    # same session). rb_gate=8 breaks depth-order staleness (eT 1.264) —
    # do not loosen further.
    resort_motion_px: float = 4.0
    # fused backend: after each rebuild, probe per-slot contribution and
    # compact non-contributing slots out of the work list (exact at the
    # rebuild pose — ops/fused_tracking.py compact_slot_buffer; staleness
    # class identical to the depth-order staleness above). Off by default:
    # tracking scenes are built from the neighbouring frame's depth map, so
    # ~94% of slots are some pixel's first cover and the probe+compact cost
    # outweighs the pruning (measured on the 816k-splat bench scene). Enable
    # for heavily occluded scenes. Single-chip only: skipped under a mesh.
    compact: bool = False
    # fused backend: the phase-split (16, 16) sub-tile pipeline
    # (ops/fused_subtile.py) — XLA projects all slots once per step, the
    # Pallas kernels run only the per-(slot, pixel) compositing/replay,
    # and the pose chain runs as one XLA pass over per-slot moments.
    # ~8x fewer slot-pixel pair evaluations than the (16, 128) full-tile
    # path and no per-chunk row algebra. Under a mesh, macro-tile rows
    # shard across devices exactly like the full-tile path
    # (parallel/sharded.py sharded_subtile_render). Incompatible with
    # compact. Default on: measured ~2.9x faster than full-tile
    # (docs/PERFORMANCE.md optimization log) with equal or better
    # convergence on the cluttered 816k recovery check.
    subtile: bool = True
    # fused backend, K > 0: per-pixel K-cover rendering (ops/kcover.py) —
    # each rebuild additionally SELECTS every pixel's first-K covering
    # splats (same gates as the kernels, front-to-back) and pre-gathers
    # their records; the per-step render then composites only K*Npix
    # pairs in plain XLA (autodiff backward, no Pallas in the loop).
    # ~30x fewer pair evals than the sub-tile walk. A frozen cover set is
    # MORE staleness-sensitive than the binning (it drops splats newly
    # entering a pixel's first-K within ~a pixel of motion — measured: eT
    # stalls at 1.5 cm with the 2 px binning gate alone, converges to
    # 0.0016 cm with sub-pixel re-selection), so the selection motion
    # gate rides the INNER loop condition: a segment self-terminates the
    # step accumulated motion since the last selection exceeds
    # select_motion_px (checked every step — ~50 flops on the pose
    # carry, no buffer traffic), and the boundary then re-selects.
    # Converged poses thus run full resort_every-step segments with zero
    # selection overhead while early convergence (~1-2 px motion/step)
    # re-selects within a step of going stale. select_motion_px=0
    # degenerates to re-selection every step. K=16 saturates
    # transmittance on the bench scenes (alpha matches the full walk to
    # ~4e-4); SMALLER K trades away staleness slack, not just tail
    # truncation — measured recovery eT degrades 100x at K=8 and
    # diverges at K=4 (runs/tpu_session_r2a/kcover_accuracy_vs_k.log).
    # Requires subtile; under a ("tiles",) mesh the cover buffer is
    # pixel-sharded (parallel/sharded.py). 0 = off. K=16 is THE product
    # default — the same config bench.py headlines and cli track ships
    # (one config everywhere, pinned by
    # tests/test_cli_and_utils.py::test_product_config_pinned).
    kcover: int = 16
    # COAST MODE: near a pair's loss floor Adam random-walks the pose at
    # ~1-2 px of (conservative) screen-motion bound per step at fx=600,
    # so every staleness gate fires constantly while the loss no longer
    # improves — the bench measured 38 ms rebuilds + 17 ms re-selections
    # every ~2 steps, 3x the step itself. The patience counter already
    # distinguishes the regimes: while converging, improvements keep it
    # ~0 (gates stay tight); once it exceeds coast_after_steps the pose
    # is wandering the floor and both motion gates loosen by
    # coast_gate_factor. best_pose/best_loss bookkeeping is unaffected,
    # and any genuine improvement resets the counter, which immediately
    # re-tightens the gates (the loss landscape stays informative under
    # a stale cover: staleness perturbs gradients ~alpha-tail-deep, far
    # less than the signal of a real descent direction).
    coast_after_steps: int = 30
    coast_gate_factor: float = 8.0
    # The coast counter resets only on RELATIVE improvement >= coast_rtol
    # (a separate counter from the reference-parity early-stop patience,
    # which keeps the strict `loss < best` semantics). Round-4 lesson:
    # with a strict coast reset, the walk-exact live-gated K-cover step
    # kept finding ~1e-5-relative improvements deep into convergence, so
    # coast never engaged and the bench fired 14 rebuilds + 31 selects
    # per 300 steps (was 6 + 18) at UNCHANGED final accuracy — each fire
    # costs 75/49 ms (docs/PERFORMANCE.md round-4 fit). Improvements that
    # matter for the best-pose bookkeeping still register; only the
    # gate-loosening schedule ignores noise-scale descent. 0 = strict.
    coast_rtol: float = 1e-3
    # K=16's ~8 covers of slack absorb ~2 px of selection staleness (the
    # same budget as the binning gate): measured CPU recovery eT at gates
    # 0.25/0.5/1/2 px all within 0.0006-0.0105 cm while 4 px breaks to
    # 1.6 cm (runs/tpu_session_r2a/kcover_gate_sweep.log). Checked every
    # step by the inner loop condition, so selection still fires within
    # one step of the budget being spent.
    select_motion_px: float = 2.0
    # K-cover rebuild slot budget: fraction of emitted binning slots kept
    # after the depth sort (ops/kcover.py build_kcover_slot_buffer). Dead
    # emissions (~49% at the bench scene: a small splat overlaps ~1.45 of
    # its 4 emitted tiles) sort to the tail, so the kept prefix loses
    # nothing until the LIVE count exceeds it — then
    # PairResult.slot_overflow reports the truncation and the budget must
    # be raised (1.0 = keep everything). Shrinks the rebuild fire's
    # row-gather + every downstream per-slot pass proportionally.
    slot_budget: float = 0.7


class PairResult(NamedTuple):
    best_pose: PoseState
    best_loss: jnp.ndarray
    best_depth_loss: jnp.ndarray
    best_silhouette_loss: jnp.ndarray
    final_pose: PoseState
    steps_run: jnp.ndarray  # int32
    # fused backend: slot-list rebuilds that actually fired (motion-gated;
    # each costs a bin+sort at scene scale) — 0 on other backends
    rebuilds: jnp.ndarray | int = 0
    # kcover: cover re-selections that actually fired (each costs one
    # select-kernel walk) — 0 on other paths
    selects: jnp.ndarray | int = 0
    # kcover: True iff any rebuild's live slot count exceeded the
    # config.slot_budget prefix (cover truncated for the highest-id
    # sub-tiles — raise the budget); always False on other paths
    slot_overflow: jnp.ndarray | bool = False


class _Carry(NamedTuple):
    step: jnp.ndarray
    pose: PoseState
    adam_q: AdamState
    adam_t: AdamState
    best_loss: jnp.ndarray
    best_dl: jnp.ndarray
    best_sl: jnp.ndarray
    best_pose: PoseState
    counter: jnp.ndarray
    # steps since the last >= coast_rtol RELATIVE improvement — drives
    # the coast gate-loosening only (early stop uses `counter`)
    coast_counter: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("width", "height", "config", "backend", "mesh"),
)
def optimize_pose(
    scene: GaussianScene,
    init_c2w: jnp.ndarray,  # (4, 4) — tar frame GT pose (trainer :63)
    depth_gt: jnp.ndarray,  # (H, W) re-rendered source depth (Parser :362-372)
    K: jnp.ndarray,  # (3, 3)
    width: int,
    height: int,
    config: TrackingConfig = TrackingConfig(),
    backend: str = "pallas",
    mesh=None,
) -> PairResult:
    """Optimize the camera pose of one frame pair fully on device.

    backend "fused" uses the frozen-scene fused tracking kernel
    (ops/fused_tracking.py): in-kernel projection, pose-only backward,
    slot list rebuilt every config.resort_every steps — the production
    hot path. "pallas"/"reference" use the general rasterizer.
    """
    from ..ops.rasterize import rasterize

    fused = backend == "fused"
    if fused:
        from ..ops.binning import TILE_H, TILE_W
        from ..ops.fused_tracking import (
            build_slot_buffer, cam_vector, compact_slot_buffer, fused_probe,
            render_tracking_depth,
        )

        use_subtile = config.subtile
        use_kcover = config.kcover > 0 and config.subtile
        if use_subtile:
            from ..ops.fused_subtile import (
                build_subtile_slot_buffer, render_tracking_depth_subtile,
            )
        if use_kcover:
            from ..ops.kcover import (
                build_kcover_buffer, build_kcover_slot_buffer,
                render_tracking_depth_kcover,
            )

        do_compact = config.compact and mesh is None and not use_subtile

        def make_slots(viewmat):
            """(slot3d, meta, z_min, overflow). overflow is only ever True
            on the K-cover path (live slots beyond the slot_budget)."""
            ovf = jnp.bool_(False)
            if use_kcover:
                # unpadded exact-segment layout + live-slot budget: the
                # select kernels mask membership per-slot, so the padded
                # chunk-fill layout (and its 24 ms fill pass) is not
                # needed here (ops/kcover.py build_kcover_slot_buffer)
                s3, m3, ovf = build_kcover_slot_buffer(
                    scene, viewmat, K, width, height,
                    config.near_plane, config.far_plane,
                    slot_budget=config.slot_budget,
                )
            elif use_subtile:
                s3, m3, _ = build_subtile_slot_buffer(
                    scene, viewmat, K, width, height,
                    config.near_plane, config.far_plane,
                )
            else:
                s3, m3, _ = build_slot_buffer(
                    scene, viewmat, K, width, height,
                    config.near_plane, config.far_plane,
                )
                if do_compact:
                    contrib, cd = fused_probe(
                        s3, m3, cam_vector(viewmat, K, width, height),
                        -(-height // TILE_H), -(-width // TILE_W),
                        s3.shape[1],
                        config.near_plane, config.far_plane,
                    )
                    s3, m3 = compact_slot_buffer(s3, m3, contrib, cd)
            # nearest visible scene depth at the rebuild pose, for the
            # motion gate's parallax bound (one small matmul over N)
            z = scene.means @ viewmat[:3, :3].T[:, 2] + viewmat[2, 3]
            z_min = jnp.maximum(
                jnp.min(jnp.where(z > config.near_plane, z, jnp.inf)),
                config.near_plane,
            )
            return s3, m3, z_min, ovf

        if use_kcover:
            def make_kbuf(slot3d, slot_meta, pose):
                """Per-pixel K-cover records at `pose` (select + gather —
                cheaper than a binning rebuild; ops/kcover.py)."""
                vm = invert_se3(pose.to_c2w())
                return build_kcover_buffer(
                    slot3d, slot_meta, cam_vector(vm, K, width, height),
                    -(-height // TILE_H), -(-width // TILE_W),
                    config.near_plane, config.far_plane,
                    k_cover=config.kcover, mesh=mesh,
                )

    gamma = config.lr_decay_total ** (1.0 / config.max_steps)

    def loss_fn(quat, trans, slot3d=None, slot_meta=None):
        pose = PoseState(quat=quat, trans=trans)
        viewmat = invert_se3(pose.to_c2w())
        if fused:
            if use_kcover:
                depth, _alpha = render_tracking_depth_kcover(
                    viewmat, K, width, height, slot3d,
                    config.near_plane, config.far_plane, mesh=mesh,
                )
            elif use_subtile:
                depth, _alpha = render_tracking_depth_subtile(
                    viewmat, K, width, height, slot3d, slot_meta,
                    config.near_plane, config.far_plane, mesh=mesh,
                )
            else:
                depth, _alpha = render_tracking_depth(
                    viewmat, K, width, height, slot3d, slot_meta,
                    config.near_plane, config.far_plane, mesh=mesh,
                )
        else:
            render, _alpha = rasterize(
                scene.means,
                scene.quats,
                scene.scales,
                scene.opacities,
                scene.sh_coeffs,
                viewmat,
                K,
                width,
                height,
                sh_degree=config.sh_degree,
                near_plane=config.near_plane,
                far_plane=config.far_plane,
                render_mode="RGB+ED",
                backend=backend,
                mesh=mesh,
            )
            depth = render[..., 3]
        tl = tracking_loss(
            depth, depth_gt, config.depth_lambda, config.normal_lambda
        )
        return tl.total, (tl.depth, tl.silhouette)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    init_pose = PoseState.from_c2w(init_c2w)
    if fused:
        slot0, meta0, zmin0, ovf0 = make_slots(invert_se3(init_c2w))
    inf = jnp.float32(jnp.inf)
    carry0 = _Carry(
        step=jnp.int32(0),
        pose=init_pose,
        adam_q=adam_init(init_pose.quat),
        adam_t=adam_init(init_pose.trans),
        best_loss=inf,
        best_dl=inf,
        best_sl=inf,
        best_pose=init_pose,
        counter=jnp.int32(0),
        coast_counter=jnp.int32(0),
    )

    def cond(carry):
        c = carry[0] if fused else carry
        run = c.step < config.max_steps
        if config.early_stop:
            run = run & (c.counter < config.patience)
        return run

    def body_fused_segment(carry):
        """One resort_every-step segment: at most ONE rebuild cond at the
        boundary, then an inner while_loop that closes over the slot buffer
        as a loop invariant. A per-step lax.cond (even never-taken) forces
        XLA to double-buffer the ~216 MB slot array through the conditional
        every iteration — measured +8.2 ms/step at the 816k bench; hoisting
        it to the segment boundary amortizes that over resort_every steps."""
        if use_kcover:
            (c, slot3d, slot_meta, kbuf, rb_pose, rb_zmin, sel_pose,
             n_rebuilds, n_selects, ovf) = carry
        else:
            c, slot3d, slot_meta, rb_pose, rb_zmin, n_rebuilds = carry
            ovf = jnp.bool_(False)

        # periodic slot-list rebuild (+ contribution compaction) at the
        # current pose
        def rebuild(_):
            s3, m3, z_min, new_ovf = make_slots(invert_se3(c.pose.to_c2w()))
            return s3, m3, c.pose, z_min, ovf | new_ovf

        def moved_px(pose, ref_pose):
            # conservative screen-motion bound of `pose` since `ref_pose`:
            # parallax of the NEAREST visible point (rb_zmin, from the
            # last binning rebuild) plus rotation sweep, with the
            # image-corner sec^2 factor bounding pan/tilt/roll/forward
            dt = jnp.linalg.norm(pose.trans - ref_pose.trans)
            # chord-norm angle: arccos(q.q') has a sqrt(eps_f32) ~ 4.5e-4
            # rad noise floor near identity (~0.27 px at fx=600); the
            # chord form is exact at zero motion
            qn = pose.quat / jnp.linalg.norm(pose.quat)
            qrn = ref_pose.quat / jnp.linalg.norm(ref_pose.quat)
            chord = jnp.minimum(
                jnp.linalg.norm(qn - qrn), jnp.linalg.norm(qn + qrn)
            )
            ang = 2.0 * jnp.arcsin(jnp.clip(0.5 * chord, 0.0, 1.0))
            sec2 = (1.0 + (width / (2.0 * K[0, 0])) ** 2
                    + (height / (2.0 * K[1, 1])) ** 2)
            return K[0, 0] * sec2 * (dt / rb_zmin + ang)

        def moved_px_since(ref_pose):
            return moved_px(c.pose, ref_pose)

        def gate_factor(counter):
            if config.coast_after_steps <= 0:
                return 1.0
            return jnp.where(counter > config.coast_after_steps,
                             config.coast_gate_factor, 1.0)

        do_resort = c.step > 0
        if config.resort_motion_px > 0:
            do_resort = do_resort & (
                moved_px_since(rb_pose)
                > config.resort_motion_px * gate_factor(c.coast_counter)
            )

        slot3d, slot_meta, rb_pose, rb_zmin, ovf = jax.lax.cond(
            do_resort, rebuild,
            lambda _: (slot3d, slot_meta, rb_pose, rb_zmin, ovf), None,
        )
        n_rebuilds = n_rebuilds + do_resort.astype(jnp.int32)

        if use_kcover:
            # the SECOND, tighter gate: re-select each pixel's K-cover
            # records from the (possibly fresh) slot buffer once motion
            # since the last selection exceeds select_motion_px; a binning
            # rebuild always forces re-selection (the cover must be
            # consistent with the fresh depth order)
            # (at c.step == 0 the pre-loop kbuf0 is fresh at init_pose —
            # no re-selection needed; do_resort is False there too)
            do_select = do_resort
            if config.select_motion_px > 0:
                do_select = do_select | (
                    moved_px_since(sel_pose)
                    > config.select_motion_px * gate_factor(c.coast_counter)
                )
            else:
                do_select = do_select | (c.step > 0)

            kbuf, sel_pose = jax.lax.cond(
                do_select,
                lambda _: (make_kbuf(slot3d, slot_meta, c.pose), c.pose),
                lambda _: (kbuf, sel_pose), None,
            )
            n_selects = n_selects + do_select.astype(jnp.int32)

        seg_end = c.step + max(int(config.resort_every), 1)
        seg_start = c.step

        def inner_cond(c2):
            run = (c2.step < seg_end) & (c2.step < config.max_steps)
            if config.early_stop:
                run = run & (c2.counter < config.patience)
            if use_kcover:
                # selection staleness gate INSIDE the loop condition: end
                # the segment the step motion since the last selection
                # exceeds the (coast-scaled) select gate, so the boundary
                # re-selects. The first step of a segment always runs (a
                # fresh selection has zero motion; an unfired one is
                # <= gate).
                run = run & (
                    (c2.step == seg_start)
                    | (moved_px(c2.pose, sel_pose)
                       <= config.select_motion_px * gate_factor(c2.coast_counter))
                )
            return run

        if use_kcover:
            c = jax.lax.while_loop(
                inner_cond, lambda c2: body_inner(c2, kbuf, slot_meta), c
            )
            return (c, slot3d, slot_meta, kbuf, rb_pose, rb_zmin, sel_pose,
                    n_rebuilds, n_selects, ovf)
        c = jax.lax.while_loop(
            inner_cond, lambda c2: body_inner(c2, slot3d, slot_meta), c
        )
        return c, slot3d, slot_meta, rb_pose, rb_zmin, n_rebuilds

    def body(c: _Carry) -> _Carry:
        return body_inner(c, None, None)

    def body_inner(c: _Carry, slot3d, slot_meta) -> _Carry:
        (loss, (dl, sl)), (g_q, g_t) = grad_fn(
            c.pose.quat, c.pose.trans, slot3d, slot_meta
        )

        # best-loss bookkeeping (after warmup, trainer :160-183)
        track = c.step >= config.warmup_steps + 1  # reference: `if step > 100`
        improved = track & (loss < c.best_loss)
        best_loss = jnp.where(improved, loss, c.best_loss)
        best_dl = jnp.where(improved, dl, c.best_dl)
        best_sl = jnp.where(improved, sl, c.best_sl)
        best_pose = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old), c.pose, c.best_pose
        )
        counter = jnp.where(
            track, jnp.where(improved, 0, c.counter + 1), c.counter
        ).astype(jnp.int32)
        # coast counter: resets only on a >= coast_rtol RELATIVE
        # improvement (noise-scale descent keeps the early-stop counter
        # honest but must not hold the staleness gates hot — see
        # TrackingConfig.coast_rtol). inf * (1 - rtol) == inf, so the
        # first tracked improvement still resets it.
        improved_c = track & (loss < c.best_loss * (1.0 - config.coast_rtol))
        coast_counter = jnp.where(
            track, jnp.where(improved_c, 0, c.coast_counter + 1),
            c.coast_counter
        ).astype(jnp.int32)

        lr_q = exponential_lr(config.quat_lr, gamma, c.step)
        lr_t = exponential_lr(config.trans_lr, gamma, c.step)
        new_q, adam_q = adam_step(
            c.pose.quat, g_q, c.adam_q, c.step, lr_q, config.quat_wd
        )
        new_t, adam_t = adam_step(
            c.pose.trans, g_t, c.adam_t, c.step, lr_t, config.trans_wd
        )
        return _Carry(
            step=c.step + 1,
            pose=PoseState(quat=new_q, trans=new_t),
            adam_q=adam_q,
            adam_t=adam_t,
            best_loss=best_loss,
            best_dl=best_dl,
            best_sl=best_sl,
            best_pose=best_pose,
            counter=counter,
            coast_counter=coast_counter,
        )

    n_rebuilds = jnp.int32(0)
    n_selects = jnp.int32(0)
    overflow = jnp.bool_(False)
    if fused and use_kcover:
        kbuf0 = make_kbuf(slot0, meta0, init_pose)
        out = jax.lax.while_loop(
            cond, body_fused_segment,
            (carry0, slot0, meta0, kbuf0, init_pose, zmin0, init_pose,
             jnp.int32(0), jnp.int32(0), ovf0),
        )
        final, n_rebuilds, n_selects, overflow = (
            out[0], out[-3], out[-2], out[-1])
    elif fused:
        final, _, _, _, _, n_rebuilds = jax.lax.while_loop(
            cond, body_fused_segment,
            (carry0, slot0, meta0, init_pose, zmin0, jnp.int32(0)),
        )
    else:
        final = jax.lax.while_loop(cond, body, carry0)
    return PairResult(
        best_pose=final.best_pose,
        best_loss=final.best_loss,
        best_depth_loss=final.best_dl,
        best_silhouette_loss=final.best_sl,
        final_pose=final.pose,
        steps_run=final.step,
        rebuilds=n_rebuilds,
        selects=n_selects,
        slot_overflow=overflow,
    )


@partial(
    jax.jit,
    static_argnames=("width", "height", "n_steps", "config", "backend", "mesh"),
)
def optimize_pose_recorded(
    scene: GaussianScene,
    init_c2w: jnp.ndarray,
    depth_gt: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    n_steps: int = 200,
    config: TrackingConfig = TrackingConfig(),
    backend: str = "pallas",
    mesh=None,
):
    """Debug variant of optimize_pose: a FIXED number of steps via lax.scan,
    returning per-step (total, depth, silhouette) loss series and the pose
    trajectory — the single-pair diagnostic harness the reference keeps in
    src/my_gsplat/gs_trainer.py (per-step wandb logging + plots).

    Returns (PairResult-like dict with series arrays).
    """
    from ..ops.rasterize import rasterize

    gamma = config.lr_decay_total ** (1.0 / config.max_steps)

    def loss_fn(quat, trans):
        pose = PoseState(quat=quat, trans=trans)
        viewmat = invert_se3(pose.to_c2w())
        render, _ = rasterize(
            scene.means, scene.quats, scene.scales, scene.opacities,
            scene.sh_coeffs, viewmat, K, width, height,
            sh_degree=config.sh_degree, near_plane=config.near_plane,
            far_plane=config.far_plane, render_mode="RGB+ED",
            backend=backend, mesh=mesh,
        )
        tl = tracking_loss(
            render[..., 3], depth_gt, config.depth_lambda, config.normal_lambda
        )
        return tl.total, (tl.depth, tl.silhouette)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    init_pose = PoseState.from_c2w(init_c2w)

    def step(carry, i):
        pose, adam_q, adam_t = carry
        (loss, (dl, sl)), (g_q, g_t) = grad_fn(pose.quat, pose.trans)
        lr_q = exponential_lr(config.quat_lr, gamma, i)
        lr_t = exponential_lr(config.trans_lr, gamma, i)
        new_q, adam_q = adam_step(pose.quat, g_q, adam_q, i, lr_q, config.quat_wd)
        new_t, adam_t = adam_step(pose.trans, g_t, adam_t, i, lr_t, config.trans_wd)
        out = dict(loss=loss, depth_loss=dl, silhouette_loss=sl,
                   quat=pose.quat, trans=pose.trans)
        return (PoseState(quat=new_q, trans=new_t), adam_q, adam_t), out

    (final_pose, _, _), series = jax.lax.scan(
        step,
        (init_pose, adam_init(init_pose.quat), adam_init(init_pose.trans)),
        jnp.arange(n_steps),
    )
    series["final_pose"] = final_pose
    return series
