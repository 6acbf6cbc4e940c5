#!/bin/bash
# Round-4 evidence run, part 2: alarm with the probe-selected recipe, the
# hepar2/win95pts decode-cap reruns, the hailfinder smoke rung, and the
# andes/link latent end-to-end runs (VERDICT r3 #1/#2/#8).
# Usage: bash scripts/round4_catalog2.sh [runs_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
RUNS=${1:-runs}
R="python -m dags_vae_search_tpu.experiments.runner"

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  timeout 10800 $R "$@" --data-dir "$RUNS" || echo "!!! FAILED: $*"
}
refresh() {
  python -m dags_vae_search_tpu.experiments.results "$RUNS" RESULTS.md >/dev/null
  git add RESULTS.md && git commit -q -m "RESULTS: refresh after $1" -- RESULTS.md || true
}

run asia eval; refresh asia-eval
run alarm generate split train eval predictor gp search roundtrip; refresh alarm
run hepar2 generate split train eval predictor gp search roundtrip; refresh hepar2
run andes generate split train eval search --eval-batches 2; refresh andes
run link generate split train eval search --eval-batches 1; refresh link
run hailfinder generate split train eval predictor gp search roundtrip; refresh hailfinder
run win95pts generate split train eval predictor gp search roundtrip; refresh win95pts
echo "=== part 2 done"
