#!/usr/bin/env bash
# Round-4 session B — the full VERDICT r3 evidence queue:
#   1. bench4b        parity-gated headline bench (regression check)
#   2. profile        on-chip jax.profiler trace of the product step
#                     (VERDICT next #3)
#   3. fixture_room0_piped / _serial   pipelined vs strictly-serial
#                     80-frame end-to-end A/B with per-stage wall-clock
#                     (VERDICT next #1: target >= ~110 steps/s piped)
#   4. fixture_room0_f32  float-depth (no uint16 quantization) accuracy
#                     A/B on the same frames (VERDICT next #2)
#   5. fire_inloop    differential per-fire cost probe (baseline for the
#                     select-fire rework, VERDICT next #4)
#   6. fixture_all    8-room Replica-format suite (VERDICT next #6)
#   7. tum_desk / tum_stress  2 TUM-format scenes incl. association
#                     stress
#   8. tables         aggregate res.json + markdown tables
# One TPU process at a time.
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

run bench4b python bench.py

run profile python scripts/profile_step.py "$OUT/profile"

run fire_inloop python scripts/perf_fire_inloop.py

run fixture_room0_piped python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_piped" --quiet --pcd-every 40

run fixture_room0_serial python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_serial" --quiet --no-prefetch

run fixture_room0_f32 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture_f32 --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_f32" --quiet

run fixture_all python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --all --backend fused \
  --run-dir "$OUT/suite/replica" --quiet

run tum_desk python -m gsplatloc_tpu.cli track --dataset TUM \
  --data-root datasets/TUM_fixture --rooms freiburg1_desk --backend fused \
  --run-dir "$OUT/suite/tum_desk" --quiet

run tum_stress python -m gsplatloc_tpu.cli track --dataset TUM \
  --data-root datasets/TUM_fixture --rooms freiburg2_stress --backend fused \
  --run-dir "$OUT/suite/tum_stress" --quiet

run tables python -m gsplatloc_tpu.cli tables --runs "$OUT/suite"
run tables_tum python -m gsplatloc_tpu.cli tables --runs "$OUT/suite" \
  --dataset TUM

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
