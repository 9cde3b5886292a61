"""Isolated timing of per-chunk transmittance-scan variants on TPU.

The compositing kernels' inner loop is dominated by two inclusive scans
along the 128-slot sublane axis of a (CHUNK, P_SUB) block: cumprod of
(1 - alpha) (forward + replay) and cumsum of w*phi (backward suffix).
Hillis-Steele costs 7 sublane-shifted multiply/add rounds; the MXU
triangular-matmul form was measured WORSE at HIGHEST precision with
exp(cumsum(log)) cumprod (docs/PERFORMANCE.md) — but one-pass DEFAULT and
three-pass HIGH precisions were never isolated. This kernel-level bench
times each variant alone: a VMEM-resident fori_loop of K dependent scans,
two K values, slope = per-scan cost.

Run on the real chip (interpret mode tells nothing about VPU/MXU cost).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplatloc_tpu.ops.rasterize_pallas import (
    CHUNK, F32, _interpret, _scan_add, _scan_mul,
)

P_SUB = 256  # (16, 16) sub-tile pixels — the production block width


def _tri(precision):
    def scan(x):
        # build the lower-triangular ones in-register (a captured constant
        # is rejected by pallas_call)
        r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        lower = (r >= c).astype(F32)
        return jax.lax.dot_general(
            lower, x, dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=F32, precision=precision,
        )

    return scan


VARIANTS = {
    "hillis_mul": lambda x: _scan_mul(x, P_SUB),
    "hillis_add": lambda x: _scan_add(x, P_SUB),
    "mxu_add_default": _tri(jax.lax.Precision.DEFAULT),
    "mxu_add_high": _tri(jax.lax.Precision.HIGH),
    "mxu_add_highest": _tri(jax.lax.Precision.HIGHEST),
    "mxu_mul_log_high": lambda x: jnp.exp(
        _tri(jax.lax.Precision.HIGH)(jnp.log(jnp.maximum(x, 1e-20)))),
    "exp_only": lambda x: jnp.exp(x),  # transcendental unit baseline
}


def _bench_kernel(x_ref, o_ref, *, k, fn, renorm):
    x = x_ref[...]

    def body(_, x):
        y = fn(x)
        # renormalize so the carried value stays in a sane range (data
        # dependence prevents DCE; cumprod shrinks, cumsum grows)
        return y * renorm + x * 1e-6

    x = jax.lax.fori_loop(0, k, body, x)
    o_ref[...] = x


def timed_variant(name, fn, renorm, k):
    kern = functools.partial(_bench_kernel, k=k, fn=fn, renorm=renorm)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((CHUNK, P_SUB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )
    x0 = jnp.full((CHUNK, P_SUB), 0.997, jnp.float32)
    jitted = jax.jit(lambda x: call(x))
    float(jitted(x0)[0, 0])  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(jitted(x0)[0, 0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    K1, K2 = 2000, 10000
    print(f"scan variants at ({CHUNK}, {P_SUB}), per-scan cost from the "
          f"K={K1}->K={K2} slope:", flush=True)
    for name, fn in VARIANTS.items():
        renorm = 0.999 if "mul" in name or name == "exp_only" else 1e-2
        try:
            t1 = timed_variant(name, fn, renorm, K1)
            t2 = timed_variant(name, fn, renorm, K2)
            per = (t2 - t1) / (K2 - K1) * 1e9
            print(f"  {name:18s}: {per:8.1f} ns/scan "
                  f"(K{K1} {t1*1e3:.1f} ms, K{K2} {t2*1e3:.1f} ms)",
                  flush=True)
        except Exception as e:  # Mosaic lowering rejections etc.
            print(f"  {name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
