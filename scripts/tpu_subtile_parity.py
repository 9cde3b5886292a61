"""Real-TPU parity check for the phase-split sub-tile path.

Thin CLI over gsplatloc_tpu.ops.parity.subtile_parity (the SAME check
bench.py gates its sub-tile number on): compares forward depth/alpha and
pose (viewmat) gradients of the sub-tile pipeline (ops/fused_subtile.py)
against the full-tile fused path at a small scale (quick compile).
Interpret mode accepts layouts Mosaic rejects, so this must run on the
real chip before trusting bench numbers. Exits 0 on PASS, 1 on FAIL.
"""

import sys

import numpy as np

from gsplatloc_tpu.ops.parity import subtile_parity


def main():
    r = subtile_parity()
    print(f"fwd: max|d| diff {r['d_err']:.3e}  "
          f"max|alpha| diff {r['a_err']:.3e}", flush=True)
    print(f"loss: full {r['loss_full']:.6e} sub {r['loss_sub']:.6e} "
          f"rel {r['loss_rel']:.3e}", flush=True)
    np.set_printoptions(precision=6, suppress=False, linewidth=120)
    print(f"grad full:\n{r['grad_full']}", flush=True)
    print(f"grad sub :\n{r['grad_sub']}", flush=True)
    print(f"rel diff :\n{r['rel']}", flush=True)
    print(f"grad max diff vs scale: {r['grad_rel']:.3e}", flush=True)
    print("PARITY " + ("PASS" if r["ok"] else "FAIL"), flush=True)
    sys.exit(0 if r["ok"] else 1)


if __name__ == "__main__":
    main()
