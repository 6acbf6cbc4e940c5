#!/bin/bash
# Round-2 TPU work queue — strictly serial (one TPU client at a time).
# Ordered so the fastest, highest-value targets land first; each stage
# group is bounded and a failure moves on to the next experiment.
set -u
cd /root/repo
R="python -m dags_vae_search_tpu.experiments.runner"
LOG=/tmp/queue
mkdir -p "$LOG"

run() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $name ==="
  timeout "$1" $R "${@:2}" --data-dir runs >"$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc ==="
  python -m dags_vae_search_tpu.experiments.results runs RESULTS.md >/dev/null 2>&1
}

# 1. sachs refresh (re-run: seed scoring OOM fixed — chunked family-table path)
run sachs_search    2400 sachs search roundtrip
# 2. the BASELINE north-star: alarm end-to-end with the scaled recipe
run alarm_full     10800 alarm train eval predictor gp search roundtrip
# 3. large nets end-to-end
run win95_full     10800 win95pts train eval predictor gp search roundtrip
run hepar2_full    10800 hepar2 train eval predictor gp search roundtrip
# 4. very large nets: searches + downstream on existing checkpoints
run andes_rest      7200 andes predictor gp search roundtrip
run link_rest      10800 link predictor gp search roundtrip
# 5. synthetic_12 refresh (interrupted by the sachs requeue; low risk)
run synth_search    2400 synthetic_12 search roundtrip

python -m dags_vae_search_tpu.experiments.results runs RESULTS.md
echo "=== queue done $(date -u +%H:%M:%S) ==="
