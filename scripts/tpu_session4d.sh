#!/usr/bin/env bash
# Round-4 session D — post-fix evidence queue:
#   1. bench4d      headline with coast_rtol=1e-3 (fire-rate fix) —
#                   expect the r3 fire counts back (~6 rb + ~16 sel)
#   2. fixture_room0_piped   pipelined e2e at the fixed fire rate
#   3. floor_probe  rendered-vs-rendered representation-mismatch A/B
#                   (VERDICT next #2 error budget, second half)
#   4. suite (8 Replica rooms + 2 TUM)  post-scale-clamp re-run —
#                   office1/2/3 divergences should be gone
#   5. tables       aggregate res.json + markdown
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

run bench4d python bench.py

run fixture_room0_piped python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_room0_piped" --quiet

run floor_probe python scripts/floor_probe.py 6 "$OUT/floor_probe.json"

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
