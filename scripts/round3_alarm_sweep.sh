#!/bin/bash
# Alarm (n=37) recipe sweep — VERDICT r2 #3: "make the VAE learn at alarm,
# with a recorded sweep".  Short probes across capacity/latent/lr/dropout;
# report_train.json per variant is the sweep record (results land under
# runs/alarm@<variant>/).  ONE TPU client at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
RUNS=${1:-runs}
EPOCHS=${2:-30}
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

probe base
probe lat256   --latent-size 256
probe big      --embed-size 128 --latent-size 256 --fc-hidden 128
probe biglr    --embed-size 128 --latent-size 256 --fc-hidden 128 --lr 1e-3
probe bigdrop0 --embed-size 128 --latent-size 256 --fc-hidden 128 --dropout 0.05
probe deep     --embed-size 128 --num-layers 6 --latent-size 256 --fc-hidden 128

echo "=== sweep losses:"
for v in base lat256 big biglr bigdrop0 deep; do
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
