#!/bin/bash
# Round-4 evidence run, part 1 (VERDICT r3 #1: evidence first, value-ordered).
# Sequential — ONE TPU client at a time (CLAUDE.md).  asia reuses its r3
# corpus/checkpoints (unchanged by this round's sampler cap: cap >= n-1)
# and reruns only search (basin-hopping restarts + warm-started BO).
# Usage: bash scripts/round4_catalog.sh [runs_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
RUNS=${1:-runs}
R="python -m dags_vae_search_tpu.experiments.runner"

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  timeout 7200 $R "$@" --data-dir "$RUNS" || echo "!!! FAILED: $*"
}
refresh() {
  python -m dags_vae_search_tpu.experiments.results "$RUNS" RESULTS.md >/dev/null
  git add RESULTS.md && git commit -q -m "RESULTS: refresh after $1" -- RESULTS.md || true
}

run asia search roundtrip; refresh asia
# small/mid nets: full fresh pipelines under the in-degree-capped sampler
for exp in sachs synthetic_12 child insurance; do
  run $exp generate split train eval predictor gp search roundtrip
  refresh $exp
done
echo "=== part 1 done"
