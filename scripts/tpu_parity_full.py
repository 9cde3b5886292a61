"""BENCH-SCALE on-chip parity (VERDICT r2 weak #6): the quick 128x256
parity gate cannot see scale-dependent divergences (segment counts,
padding paths, index ranges at 880k pixels), so each TPU session also
runs the sub-tile and K-cover parity checks once at the full 1200x680
headline geometry. Exits 0 only if both PASS.
"""

import sys

from gsplatloc_tpu.ops.parity import kcover_parity, subtile_parity


def main():
    ok = True
    for name, fn in (("sub-tile", subtile_parity), ("k-cover", kcover_parity)):
        r = fn(height=680, width=1200)
        print(f"[{name} @ 1200x680] fwd d {r['d_err']:.3e} a {r['a_err']:.3e} "
              f"loss_rel {r['loss_rel']:.3e} grad_rel {r['grad_rel']:.3e} "
              f"-> {'PASS' if r['ok'] else 'FAIL'}", flush=True)
        ok &= r["ok"]
    print("FULL-SCALE PARITY " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
