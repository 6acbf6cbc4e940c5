#!/bin/bash
# Round-2 queue B — reordered after alarm_full: the VERDICT "missing" items
# (search reports for andes/link/win95pts) outrank the hepar2 retrain, and
# alarm's search is refreshed under the trust-region gp_ascent.  prep/search
# are split per experiment so a slow predictor build cannot eat the search
# stage's budget.  Strictly serial — one TPU client at a time.
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

run alarm_search  1200 alarm search
run andes_prep    1800 andes predictor gp
run andes_search  4800 andes search roundtrip
run link_prep     2400 link predictor gp
run link_search   7200 link search roundtrip
run win95_full    9000 win95pts train eval predictor gp search roundtrip
# does more capacity crack alarm reconstruction the way the doubled model
# cracked child's? (variant dir alarm@big, canonical run untouched)
run alarm_probe   3600 alarm train eval --variant big --embed-size 128 \
    --num-layers 6 --latent-size 192 --fc-hidden 128 --epochs 40
run hepar2_full   9000 hepar2 train eval predictor gp search roundtrip
run synth_search  2400 synthetic_12 search roundtrip

python -m dags_vae_search_tpu.experiments.results runs RESULTS.md
echo "=== queue B done $(date -u +%H:%M:%S) ==="
