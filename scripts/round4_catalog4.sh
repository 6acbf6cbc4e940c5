#!/bin/bash
# Round-4 evidence run, part 4: runs/ was wiped with the session restart, so
# rebuild the remaining evidence value-ordered — alarm full pipeline under the
# probe-selected edge-readout recipe (VERDICT r3 #2 done-criterion), then the
# andes/link latent end-to-end runs (r2 #4, three rounds open) with bounded
# hill-climb budgets, then the hailfinder/win95pts rungs.
# Usage: bash scripts/round4_catalog4.sh [runs_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
RUNS=${1:-runs}
R="python -m dags_vae_search_tpu.experiments.runner"

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  timeout 5400 $R "$@" --data-dir "$RUNS" || echo "!!! FAILED: $*"
}
refresh() {
  python -m dags_vae_search_tpu.experiments.results "$RUNS" RESULTS.md >/dev/null
  git add RESULTS.md && git commit -q -m "RESULTS: refresh after $1" -- RESULTS.md || true
}

run alarm generate split train eval predictor gp search roundtrip; refresh alarm
run andes generate split train eval search --eval-batches 2 --hc-time 300; refresh andes
run link generate split train eval search --eval-batches 1 --hc-time 300; refresh link
run hailfinder generate split train eval predictor gp search roundtrip; refresh hailfinder
run win95pts generate split train eval predictor gp search roundtrip; refresh win95pts
echo "=== part 4 done"
