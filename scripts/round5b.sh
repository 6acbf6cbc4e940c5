#!/bin/bash
# Round-5 part-b ladder: STRICTLY SEQUENTIAL — this host has ONE CPU core,
# so concurrent clients don't just serialize through the axon tunnel
# (CLAUDE.md), they starve each other's host feed loops (asia's chunked
# train measured 25x slower with two CPU jobs alongside).  One rung at a
# time, refresh commit after each so evidence survives a runs/ wipe.
# Usage: bash scripts/round5b.sh <rung> [rung...]
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
    asia_resume)
      # corpus+split+epochs 1-3 already on disk from the contended start
      run asia train eval predictor gp search roundtrip --resume ;;
    asia|sachs|child|insurance|alarm|hepar2|hailfinder|win95pts|synthetic_12|cancer|earthquake|survey)
      run "$1" generate split train eval predictor gp search roundtrip ;;
    pathfinder|andes|diabetes|pigs)
      run "$1" generate split train eval search --eval-batches 2 ;;
    link)
      # runs/ was wiped again — regenerate the corpus, then the full
      # n>=109-tier slice with the factorized edge readout.  The hill
      # climb wall is capped at 700s so the whole rung fits a session
      # (the tier default 1800s would outrun it; the climber converges
      # anytime, so the cap only truncates, never breaks, the row).
      run link generate split train eval search --eval-batches 2 --hc-time 700 ;;
    *)
      echo "unknown rung $1"; return ;;
  esac
  refresh "$1"
}

for r in "$@"; do
  rung "$r"
done
echo "=== round5b ladder done: $*"
