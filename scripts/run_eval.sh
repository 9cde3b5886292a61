#!/bin/bash
# Full-suite evaluation launcher (reference scripts/run_eval.sh parity):
# runs every Replica room (and optionally TUM scenes) through the tracking
# eval. The reference launches independent python processes per room; on a
# single shared TPU we run rooms sequentially (scene-level parallelism is
# cross-HOST on TPU pods — each host takes a subset of rooms).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.jax_cache}"

RUN_DIR="${RUN_DIR:-runs/full_eval}"
NUM_ITERS="${NUM_ITERS:-2000}"

python -m gsplatloc_tpu.cli track --dataset Replica --all \
  --num-iters "$NUM_ITERS" --run-dir "$RUN_DIR/replica"

if [ "${WITH_TUM:-0}" = "1" ]; then
  python -m gsplatloc_tpu.cli track --dataset TUM --all \
    --num-iters "$NUM_ITERS" --run-dir "$RUN_DIR/tum"
fi

python -m gsplatloc_tpu.cli icp --dataset Replica --all \
  --run-dir "$RUN_DIR/icp"

python -m gsplatloc_tpu.cli tables --res "$RUN_DIR/replica/res.json" \
  --dataset Replica
