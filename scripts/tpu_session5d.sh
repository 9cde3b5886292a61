#!/usr/bin/env bash
# Round-5 session D — select-kernel variant A/Bs + step-floor sweep:
#   1. sel_base      select-only fit, shipping defaults (drift anchor)
#   2. sel_mxu       rank scan as bf16 triangular MXU dot
#   3. sel_rows8     8-row padded extraction operand
#   4. sel_both      both variants together
#   5. split256      extraction share at CB_SEL=256 (decomposition)
#   6. floor_sweep   CB_STEP ladder on the fire-free floor
#   7. ladder_dense0 0.5 px gate on the SHARP-basin scene (does the
#                    accuracy dial pay where conditioning allows?)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/tpu_session_$(date +%m%d_%H%M)}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-.jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
FAILED=""
run() {
  local name=$1; shift
  echo "=== $name: $* (log: $OUT/$name.log)"
  timeout 5400 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -4 "$OUT/$name.log"
  [ $rc -ne 0 ] && { echo "!!! $name exited $rc"; FAILED="$FAILED $name($rc)"; }
  return 0
}
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

run sel_base python scripts/perf_fire_inloop.py select
run sel_mxu env GSPLATLOC_SEL_SCAN=mxu \
  python scripts/perf_fire_inloop.py select
run sel_rows8 env GSPLATLOC_SEL_ROWS=8 \
  python scripts/perf_fire_inloop.py select
run sel_both env GSPLATLOC_SEL_SCAN=mxu GSPLATLOC_SEL_ROWS=8 \
  python scripts/perf_fire_inloop.py select

run split256 python scripts/perf_select_split.py

run floor_sweep python scripts/perf_floor_sweep.py

run ladder_dense0 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms dense0 --backend fused \
  --select-gate 0.5 --max-pairs 40 --run-dir "$OUT/ladder_dense0" --quiet

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
