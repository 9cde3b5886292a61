#!/usr/bin/env bash
# Round-5 session A — measure + iterate the fire-path cuts (VERDICT r4):
#   1. parity_full       general + sub-tile + k-cover on chip, full scale
#                        (the general gate MUST run every session — r4 weak #2)
#   2. perf_general      general-path Mpix/s fwd+bwd row (r4 next #3)
#   3. select_split      extraction share of the NEW select kernel
#   4. select_sweep      CB_SEL x SEL_KGROUP standalone ladder
#   5. fire_inloop       differential fit: floor + c_rb + c_sel (new paths)
#   6. bench             headline (records the fire-rate blend)
#   7. fixture_room0     e2e ATE sanity at the new rebuild/select path
#   8. ladder05          0.5 px select gate e2e (the unmet r3 bar: >=100 steps/s)
#   9. dense0            conditioning-hypothesis run (r4 next #4)
#  10. floor_dense0      floor probe on the conditioning fixture
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
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

run parity_full python scripts/tpu_parity_full.py
run perf_general python scripts/perf_general.py
run select_split python scripts/perf_select_split.py
run select_sweep python scripts/perf_select_sweep.py
run fire_inloop python scripts/perf_fire_inloop.py
run bench python bench.py

run fixture_room0 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --max-pairs 40 --run-dir "$OUT/fixture_room0" --quiet
run ladder05 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --select-gate 0.5 --max-pairs 40 --run-dir "$OUT/ladder05" --quiet

run dense0 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms dense0 --backend fused \
  --run-dir "$OUT/dense0" --quiet
run floor_dense0 python scripts/floor_probe.py 6 "$OUT/floor_dense0.json" \
  dense0

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
