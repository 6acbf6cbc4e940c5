#!/bin/bash
# Alarm (n=37) recipe sweep — VERDICT r2 #3: "make the VAE learn at alarm,
# with a recorded sweep".  Short probes across capacity/latent/lr/dropout;
# report_train.json per variant is the sweep record (results land under
# runs/alarm@<variant>/).  ONE TPU client at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
RUNS=${1:-runs}
EPOCHS=${2:-30}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}
R="python -m dags_vae_search_tpu.experiments.runner"

# Shared corpus for all variants.
if [ ! -d "$RUNS/alarm/train" ]; then
  timeout 3600 $R alarm generate split --data-dir "$RUNS"
fi

probe() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] alarm@$name $*"
  timeout 3600 $R alarm train --data-dir "$RUNS" --variant "$name" \
    --epochs "$EPOCHS" "$@" || echo "!!! FAILED alarm@$name"
}

# The memorization probes (scripts/probe_overfit.py, logs in the round-3
# notes) already settled lr: 1e-3 beats 3e-4 4.4x at equal budget.  The
# runner sweep records the remaining axes on the real corpus: capacity,
# latent size, dropout, and the slow-lr control.
probe base
probe lr3e4    --lr 3e-4
probe big      --embed-size 128 --latent-size 256 --fc-hidden 128
probe bigdrop0 --embed-size 128 --latent-size 256 --fc-hidden 128 --dropout 0.05

echo "=== sweep losses:"
for v in base lr3e4 big bigdrop0; do
  python - "$RUNS" "$v" <<'EOF'
import json, sys
try:
    r = json.load(open(f"{sys.argv[1]}/alarm@{sys.argv[2]}/report_train.json"))
    f = r["final"]
    print(f"{sys.argv[2]}: loss/graph {f['loss_per_graph']:.3f} "
          f"kld {f['kld_per_graph']:.3f} ({f['graphs_per_second']:.0f} g/s)")
except FileNotFoundError:
    print(f"{sys.argv[2]}: no report")
EOF
done
