#!/bin/bash
# Round-3 evidence run: every RESULTS.md row regenerated from live reports
# (VERDICT r2 #7).  Sequential — ONE TPU client at a time (CLAUDE.md).
# Usage: bash scripts/round3_catalog.sh [runs_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
RUNS=${1:-runs}
R="python -m dags_vae_search_tpu.experiments.runner"

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  timeout 7200 $R "$@" --data-dir "$RUNS" || echo "!!! FAILED: $*"
}

# Small nets: full pipeline (+ the reference's viz demo on the flagship).
for exp in asia sachs synthetic_12 child; do
  run $exp generate split train eval predictor gp search roundtrip
done
run asia viz

# alarm runs with whatever recipe the registry holds at run time (round-3
# sweep decides it before this script runs).
run alarm generate split train eval predictor gp search roundtrip

# Large nets.
for exp in hepar2 win95pts; do
  run $exp generate split train eval predictor gp search roundtrip
done

# Very large nets: persist checkpoints, then search end-to-end (VERDICT #4).
for exp in andes link; do
  run $exp generate split train eval search
done

python -m dags_vae_search_tpu.experiments.results "$RUNS" RESULTS.md
echo "=== done"
