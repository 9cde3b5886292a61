#!/usr/bin/env bash
# Round-3 follow-up TPU queue (after the CB_SEL select-kernel rework):
# full-scale parity under the new select kernel, rebuild-gate A/B on the
# fixture, and a product-default confirmation run. Serialized — ONE TPU
# python process at a time (the axon tunnel queues a second silently).
# Usage: bash scripts/tpu_session2.sh [outdir]
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
  tail -5 "$OUT/$name.log"
  if [ $rc -ne 0 ]; then
    echo "!!! $name exited $rc"
    FAILED="$FAILED $name($rc)"
  fi
  return 0
}

timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

# 1. full-scale parity with the CB_SEL select kernel (the committed PASS
#    predates the kernel rework)
run parity_full2 python scripts/tpu_parity_full.py

# 2. product-default confirmation run on the tuning scene (end-to-end
#    steps/s with the new select; ATE must stay 0.01749)
run fixture_default2 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_default2" --quiet

# 3. rebuild-gate A/B: the recovery sweep puts rb_gate=4/select=2 in the
#    same-or-better accuracy class with half the rebuild fires
#    (docs/PERFORMANCE.md gate table) — validate on the early-stopped
#    product loop before changing any default
run fixture_rb4 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --resort-gate 4.0 --run-dir "$OUT/fixture_rb4" --quiet

echo "=== session logs in $OUT"
if [ -n "$FAILED" ]; then
  echo "=== FAILED steps:$FAILED"
else
  echo "=== all steps exited 0"
fi
