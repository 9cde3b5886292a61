#!/usr/bin/env bash
# Round-4 session A: (1) parity-gated headline bench (regression check
# after the advisor fixes), (2) the pipelined end-to-end room0 fixture run
# (VERDICT r3 next #1: target >= ~110 steps/s end-to-end), (3) the serial
# A/B back-to-back in the same session. One TPU process at a time.
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
  [ $rc -ne 0 ] && { echo "!!! $name exited $rc"; FAILED="$FAILED $name($rc)"; }
  return 0
}
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

run bench4 python bench.py

run fixture_room0_piped python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_piped" --quiet --pcd-every 40

run fixture_room0_serial python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_serial" --quiet --no-prefetch

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
