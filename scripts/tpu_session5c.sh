#!/usr/bin/env bash
# Round-5 session C — in-loop A/B of the select-kernel block width
# (standalone sweep said CB_SEL=256 is ~11 ms better but carries +/-8 ms
# relay drift; the in-loop differential fit is the decider).
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

# back-to-back same-session rows: cb512 (shipping default) first as the
# drift anchor, then the candidates
run cb512 python scripts/perf_fire_inloop.py select
run cb256 env GSPLATLOC_KCOVER_SEL_CB=256 \
  python scripts/perf_fire_inloop.py select
run cb128_kg8 env GSPLATLOC_KCOVER_SEL_CB=128 GSPLATLOC_SEL_KGROUP=8 \
  python scripts/perf_fire_inloop.py select
run cb256_again env GSPLATLOC_KCOVER_SEL_CB=256 \
  python scripts/perf_fire_inloop.py select

echo "=== session logs in $OUT"
[ -n "$FAILED" ] && echo "=== FAILED steps:$FAILED" || echo "=== all steps exited 0"
