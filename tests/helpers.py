"""Shared test assertions."""

import numpy as np


def assert_close_except_gate_flips(actual, desired, atol, flip_frac=0.005,
                                   flip_abs=0.06):
    """Compare two renders from INDEPENDENT kernel implementations.

    The compositing math carries hard gates (alpha >= ALPHA_MIN ~ 1/255,
    sigma >= 0, transmittance > T_EPS): two paths computing the conic with
    different (all-correct) fp association differ by ~1 ulp, which flips
    the gate for pixels sitting exactly on a splat's footprint knife-edge.
    A flip changes that pixel by up to the splat's contribution — bounded
    and rare, not a defect. Assert: all but `flip_frac` of pixels within
    atol, and no pixel beyond flip_abs (a flip must stay a single-splat
    sized event, never a wholesale divergence like the round-1 bf16 bug,
    which hit 45-90% of pixels at O(1) magnitude)."""
    a, d = np.asarray(actual), np.asarray(desired)
    diff = np.abs(a - d)
    bad_frac = float((diff > atol).mean())
    assert bad_frac <= flip_frac, (bad_frac, flip_frac, diff.max())
    assert float(diff.max()) <= flip_abs, float(diff.max())
