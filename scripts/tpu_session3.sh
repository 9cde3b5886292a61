#!/usr/bin/env bash
# Round-3 session 3: headline bench + off-tuning-scene validation under
# the rb_gate=4 product default. Serialized (one TPU process at a time).
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

# 1. parity-gated headline bench under the new default (rebuild fires
#    should halve vs the 18/300 at rb_gate=2)
run bench3 python bench.py

# 2. the two off-tuning-scene rooms under the new default (room1 fast
#    motion is the rb-gate stressor: 3x the tuning scene's px/frame)
run fixture_rooms_rb4 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room1 room2 --backend fused \
  --run-dir "$OUT/fixture_rooms_rb4" --quiet

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
