#!/usr/bin/env bash
# One-command TPU measurement session: run when the axon relay is back up.
# Serializes everything (ONE TPU python process at a time — the tunnel
# queues a second process silently; memory: axon-tpu-timing-and-dispatch).
# Usage: bash scripts/tpu_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/tpu_session_$(date +%m%d_%H%M)}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-.jax_cache}
# survive a fresh environment where the package isn't pip-installed
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

FAILED=""
run() {
  local name=$1; shift
  echo "=== $name: $* (log: $OUT/$name.log)"
  timeout 3600 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  if [ $rc -ne 0 ]; then
    echo "!!! $name exited $rc"
    FAILED="$FAILED $name($rc)"
  fi
  return 0
}

# 0. is the TPU actually reachable? (fail fast, 2 min)
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

# 1. numerical parity of the sub-tile pipeline ON-CHIP (Mosaic vs XLA forms)
run parity python scripts/tpu_subtile_parity.py

# 1b. if parity failed, bisect the divergence (proj8 / fwd kernel / scans)
if grep -q FAIL "$OUT/parity.log" 2>/dev/null; then
  run bisect python scripts/tpu_subtile_bisect.py
fi

# 2. phase-split sub-tile timings at the bench scale (the round's open
#    measurement: PERFORMANCE.md roadmap 1b estimated ~25 ms/step)
run perf_subtile python scripts/perf_subtile.py

# 3. SUB_W=8 variant (kx=3): pair evals halve again if fixed cost shrank
GSPLATLOC_SUB_W=8 run perf_subtile_w8 python scripts/perf_subtile.py

# 4. scan-variant microbenchmarks (Hillis-Steele vs MXU forms)
run perf_scan python scripts/perf_scan.py

# 5. headline bench (the driver metric)
run bench python bench.py

# 6. headline-scale ATE evidence through the untouched product CLI: the
#    committed-generator Replica-format fixture (1200x680, cluttered)
if [ ! -d datasets/Replica_fixture/room0 ]; then
  run fixture_gen python scripts/make_replica_fixture.py --frames 80
fi
run fixture_ate python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_track" --panel-every 20 --quiet

# 7. kNN scale-init accuracy: grid-window vs exact KdTree, scale diffs +
#    end-of-pair recovery at 816k (VERDICT r1 #4)
run knn_accuracy python scripts/knn_accuracy.py

echo "=== session logs in $OUT"
if [ -n "$FAILED" ]; then
  echo "=== FAILED steps:$FAILED"
else
  echo "=== all steps exited 0"
fi
