#!/bin/bash
# Round-5 evidence ladder: rungs are run value-ordered (VERDICT r4 #1) with a
# per-rung RESULTS refresh commit, and every stage report is mirrored into
# the committed reports/ store so a runs/ wipe cannot erase evidence again.
# ADVICE r4 fixes: full-pipeline rungs keep the 10800 s timeout, a failed or
# killed client is followed by a 60 s cool-down before the next TPU client
# (axon tunnel, CLAUDE.md), and failures are recorded in the refresh commit
# message instead of masquerading as clean runs.
# Usage: bash scripts/round5_catalog.sh <rung> [rung...]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
RUNS=runs
R="python -m dags_vae_search_tpu.experiments.runner"
FAILED=""

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  if ! timeout 10800 $R "$@" --data-dir "$RUNS"; then
    echo "!!! FAILED: $*"
    FAILED="$FAILED [$*]"
    sleep 60
  fi
}

refresh() {
  python -m dags_vae_search_tpu.experiments.results "$RUNS" RESULTS.md >/dev/null
  local msg="RESULTS: refresh after $1"
  [ -n "$FAILED" ] && msg="$msg (FAILED:$FAILED)"
  git add RESULTS.md reports && git commit -q -m "$msg" -- RESULTS.md reports || true
  FAILED=""
}

rung() {
  case "$1" in
    asia|sachs|cancer|earthquake|survey|child|insurance|alarm|hepar2|hailfinder|win95pts|synthetic_12)
      run "$1" generate split train eval predictor gp search roundtrip ;;
    pathfinder|andes|diabetes|pigs)
      run "$1" generate split train eval search --eval-batches 2 ;;
    link)
      # corpus regenerated+split this round (host-side, CPU) after the
      # runs/ wipe; train from scratch — the tier's model config changed
      # (factorized edge readout)
      run link train eval search --eval-batches 2 ;;
    *)
      echo "unknown rung $1"; return ;;
  esac
  refresh "$1"
}

for r in "$@"; do
  rung "$r"
done
echo "=== round5 ladder done: $*"
