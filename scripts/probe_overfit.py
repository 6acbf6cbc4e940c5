"""Overfit diagnostic: can the PACE VAE memorize a tiny corpus at n=37?

VERDICT r2 weak #1: alarm (n=37) trains to edge-head chance level (loss
~226/graph) with the recipe that works at child (n=20).  This probe
separates "structurally cannot" from "under-trained / wrong recipe":
train on a few hundred graphs and watch loss/recon/kld + exact-match
reconstruction.  If the model cannot even memorize 256 graphs, the failure
is architectural (e.g. posterior collapse or an information bottleneck);
if it can, the full-corpus failure is an optimization/budget problem.

Usage: python scripts/probe_overfit.py [--platform cpu|axon] [--n 37]
       [--corpus 256] [--epochs 400] [--embed 64] [--layers 4]
       [--latent 128] [--lr 3e-4] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent XLA compile cache (the scanned train step + decode scan cost
# minutes of remote compile cold; cached reloads are seconds).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n", type=int, default=37)
    ap.add_argument("--corpus", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--fc-hidden", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.15)
    ap.add_argument("--edge-readout", action="store_true")
    ap.add_argument("--edge-readout-rank", type=int, default=0)
    ap.add_argument("--matmul-dtype", default=None)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--density", type=float, default=0.2)
    ap.add_argument("--steps-per-call", type=int, default=20)
    ap.add_argument("--log-every-epochs", type=int, default=25)
    ap.add_argument("--holdout", type=int, default=0,
                    help="hold out this many graphs from training and probe "
                    "reconstruction on them too (generalization signal, not "
                    "just memorization)")
    ap.add_argument("--no-acc", action="store_true",
                    help="skip decode-accuracy probes (saves the decode "
                    "scan compile; loss/kld trajectory is the signal)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from dags_vae_search_tpu.graphs import sampler
    from dags_vae_search_tpu.models.decode import decode_to_labeled
    from dags_vae_search_tpu.graphs.dag import graphs_equal_exact
    from dags_vae_search_tpu.models.pace_vae import PaceVAE
    from dags_vae_search_tpu.training import data as data_lib
    from dags_vae_search_tpu.training.train import TrainConfig, Trainer

    n = args.n
    rng = np.random.default_rng(0)
    max_edges = int(args.density * n * (n - 1) / 2)
    # Corpus spanning the curriculum edge range, like generate_corpus.
    per = max(args.corpus // 4, 1)
    parts = []
    for m in np.linspace(n - 1, max_edges, 4).astype(int):
        parts.append(sampler.sample_er_batch(rng, per, n, int(m), n,
                                             on_exhaust="partial",
                                             max_in_degree=8))
    labels = np.concatenate([p[0] for p in parts])
    adj = np.concatenate([p[1] for p in parts])
    held_labels = held_adj = None
    if args.holdout:
        # interleaved split so both sides span the edge-count curriculum
        mask = np.zeros(len(labels), dtype=bool)
        mask[:: max(len(labels) // args.holdout, 1)] = True
        held_labels, held_adj = labels[mask], adj[mask]
        labels, adj = labels[~mask], adj[~mask]
    corpus = data_lib.Corpus(labels=labels, adj=adj)

    model = PaceVAE(
        num_real_vertices=n,
        real_label_cardinality=n,
        embed_size=args.embed,
        num_heads=args.heads,
        num_layers=args.layers,
        latent_size=args.latent,
        fc_hidden=args.fc_hidden,
        dropout=args.dropout,
        edge_readout=args.edge_readout,
        edge_readout_rank=args.edge_readout_rank,
        matmul_dtype=args.matmul_dtype,
    )
    cfg = TrainConfig(
        batch_size=min(args.batch, len(corpus)),
        epochs=args.epochs,
        learning_rate=args.lr,
        # constant lr (plateau that never fires): the probe runs fit in
        # short chunks, which would restart a cosine schedule every chunk
        lr_schedule="plateau",
        plateau_patience=10**6,
        steps_per_call=args.steps_per_call,
        log_every=0,
        checkpoint_every=args.log_every_epochs,
    )
    trainer = Trainer(model, cfg)
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.dense_batch(np.arange(2))
    )

    def recon_acc(state, temperature, labels_src=None, adj_src=None):
        if labels_src is None:
            labels_src = corpus.labels
            adj_src = corpus.dense_batch(np.arange(len(corpus)))
        k = min(128, len(labels_src))
        lb = jnp.asarray(labels_src[:k])
        ad = jnp.asarray(adj_src[:k])
        mu, _ = model.apply(
            {"params": state.params}, lb, ad, method=PaceVAE.encode
        )
        recon, valid = decode_to_labeled(
            model, {"params": state.params}, mu, jax.random.PRNGKey(9),
            temperature=temperature,
        )
        eq = graphs_equal_exact(lb, ad, recon.labels, recon.adj)
        return float(jnp.mean((eq & valid).astype(jnp.float32)))

    t0 = time.time()
    latest = {}

    def capture(msg):
        # fit's per-epoch log line; loss/kld come from the history instead.
        pass

    def probe(epoch, st):
        e = latest.get("entry", {})
        row = {
            "epoch": epoch,
            "loss": round(e.get("loss_per_graph", float("nan")), 4),
            "recon": round(e.get("recon_per_graph", float("nan")), 4),
            "kld": round(e.get("kld_per_graph", float("nan")), 4),
        }
        if not args.no_acc:
            row["acc@T1"] = round(recon_acc(st, 1.0), 3)
            row["acc@T0.1"] = round(recon_acc(st, 0.1), 3)
            if held_labels is not None:
                row["held@T0.1"] = round(
                    recon_acc(st, 0.1, held_labels, held_adj), 3
                )
        row["elapsed_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)

    # Hook the per-epoch entry: wrap history via a tiny Trainer subclass-free
    # trick — fit calls checkpoint_fn AFTER appending the entry is not
    # guaranteed, so run in log_every_epochs chunks with plateau disabled by
    # using cosine over the FULL horizon via start_epoch bookkeeping.
    done = 0
    while done < args.epochs:
        chunk = min(args.log_every_epochs, args.epochs - done)
        state, hist = trainer.fit(
            state, corpus, epochs=chunk, start_epoch=done + 1, log=capture,
        )
        latest["entry"] = hist[-1]
        done += chunk
        probe(done, state)
    final = latest["entry"]
    print(json.dumps({
        "final": True,
        "graphs_per_sec": round(final["graphs_per_second"], 1),
        "elapsed_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
