#!/usr/bin/env bash
# One-command TPU measurement session (round 3 queue). Run when the axon
# relay is up. Serializes everything (ONE TPU python process at a time —
# the tunnel queues a second process silently).
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

# 1. numerical parity ON-CHIP, quick scale (Mosaic vs XLA forms)
run parity python scripts/tpu_subtile_parity.py

# 1b. if parity failed, bisect the divergence (proj8 / fwd kernel / scans)
if grep -q FAIL "$OUT/parity.log" 2>/dev/null; then
  run bisect python scripts/tpu_subtile_bisect.py
fi

# 2. BENCH-SCALE parity (1200x680): segment counts / index ranges the
#    quick gate can't see (VERDICT r2 weak #6)
run parity_full python scripts/tpu_parity_full.py

# 3. K-cover component timings (select / build / pallas-vs-xla step)
run perf_kcover python scripts/perf_kcover.py

# 4. headline bench (the driver metric; prints rebuild/select counters)
run bench python bench.py

# 5. fixtures: 3 varied Replica-format rooms + a TUM-format scene
if [ ! -d datasets/Replica_fixture/room2 ]; then
  run fixture_gen python scripts/make_replica_fixture.py --frames 80
fi
if [ ! -d datasets/TUM_fixture/rgbd_dataset_freiburg1_desk ]; then
  run tum_fixture_gen python scripts/make_tum_fixture.py --frames 40
fi

# 6. coast-mode A/B at the BENCHED config (kcover=16), tuning scene
#    (VERDICT r2 next #2: the benched config has never produced an ATE)
run fixture_coast_on python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --run-dir "$OUT/fixture_coast_on" --quiet
run fixture_coast_off python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --coast-after-steps 0 --run-dir "$OUT/fixture_coast_off" --quiet

# 6b. select-gate accuracy ladder at product scale (the 300-step recovery
#     sweep showed gate 0.25 reaching eT 0.0013 cm vs 0.28 at the 2 px
#     default — what does the early-stopped product run give up?)
run fixture_gate05 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --select-gate 0.5 --max-pairs 40 --run-dir "$OUT/fixture_gate05" --quiet
run fixture_gate025 python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 --backend fused \
  --select-gate 0.25 --max-pairs 40 --run-dir "$OUT/fixture_gate025" --quiet

# 7. gates validated OFF the tuning scene: fast/sparse + slow/dense/noisy
#    rooms through the untouched CLI, one run dir for aggregation
run fixture_rooms python -m gsplatloc_tpu.cli track --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room1 room2 --backend fused \
  --run-dir "$OUT/fixture_rooms" --quiet

# 8. TUM-format fixture end-to-end (association + undistort + crop)
run fixture_tum python -m gsplatloc_tpu.cli track --dataset TUM \
  --data-root datasets/TUM_fixture --rooms freiburg1_desk --backend fused \
  --run-dir "$OUT/fixture_tum" --quiet

# 9. aggregate all fixture runs -> res.json + tables (load_history parity)
run tables python -m gsplatloc_tpu.cli tables --runs "$OUT"

# 10. ICP fixture rows for the two methods round 2 missed (COLORED_ICP,
#     HYBRID) plus the original three for one comparable res.json
run icp_fixture python -m gsplatloc_tpu.cli icp --dataset Replica \
  --data-root datasets/Replica_fixture --rooms room0 \
  --methods ICP PLANE_ICP GICP COLORED_ICP HYBRID --max-pairs 40 \
  --run-dir "$OUT/icp_fixture"

echo "=== session logs in $OUT"
if [ -n "$FAILED" ]; then
  echo "=== FAILED steps:$FAILED"
else
  echo "=== all steps exited 0"
fi
