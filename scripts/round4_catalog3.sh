#!/bin/bash
# Round-4 evidence run, part 3: the alarm stages lost to the stale-checkpoint
# shadowing (fixed in runner.stage_train), then the remaining part-2 tail.
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

run alarm eval predictor gp search roundtrip; refresh alarm
run andes generate split train eval search --eval-batches 2; refresh andes
run link generate split train eval search --eval-batches 1; refresh link
run hailfinder generate split train eval predictor gp search roundtrip; refresh hailfinder
run win95pts generate split train eval predictor gp search roundtrip; refresh win95pts
echo "=== part 3 done"
