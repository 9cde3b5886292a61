#!/usr/bin/env bash
# Round-5 session B — the EVIDENCE-GRADE suite re-run (VERDICT r4 next #7):
# all 8 Replica-format rooms + dense0 + 2 TUM-format scenes in ONE session
# (no relay-state mixing), per-scene steps/s now riding res.json/tables.
# Run AFTER session A validates the new fire paths on chip.
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
  timeout 7200 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  [ $rc -ne 0 ] && { echo "!!! $name exited $rc"; FAILED="$FAILED $name($rc)"; }
  return 0
}
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

# relay-health anchor: bench before AND after the suite — if the two
# disagree by >20% the session mixed relay states and the suite's
# throughput column should carry that caveat
run bench_pre python bench.py

run fixture_all python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --all --backend fused \
  --run-dir "$OUT/suite/replica" --quiet
run dense0 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms dense0 --backend fused \
  --run-dir "$OUT/suite/replica_dense0" --quiet
run tum_desk python -m gsplatloc_tpu.cli track --dataset TUM \
  --data-root datasets/TUM_fixture --rooms freiburg1_desk --backend fused \
  --run-dir "$OUT/suite/tum_desk" --quiet
run tum_stress python -m gsplatloc_tpu.cli track --dataset TUM \
  --data-root datasets/TUM_fixture --rooms freiburg2_stress --backend fused \
  --run-dir "$OUT/suite/tum_stress" --quiet

# e2e 0.5 px select-gate ladder at the final kernels (the r3 bar:
# >=100 steps/s; fit predicts ~10.1 ms/step with coast at c_sel=35.3)
run ladder05 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --select-gate 0.5 --max-pairs 40 --run-dir "$OUT/ladder05" --quiet

run bench_post python bench.py

run tables python -m gsplatloc_tpu.cli tables --runs "$OUT/suite"
run tables_tum python -m gsplatloc_tpu.cli tables --runs "$OUT/suite" \
  --dataset TUM

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
