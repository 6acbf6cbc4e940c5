"""Reconstruction evaluation (validity / structure / perfect accuracy).

Reference: ``batch_test`` + ``model_test`` (``src/model_test.py:13-31``,
``experiments/01_bn_asia/main.py:195-265``) — encode to mu, decode
``encode_times x decode_times`` rounds, count per-graph: validity
(``is_valid_graph``), structure accuracy (label-blind isomorphism), perfect
accuracy (label-matched isomorphism).  NB the reference's encode_times loop
re-uses ``z = mu`` every round (``model_test.py:21-23`` — a catalogued
reference bug), so rounds differ only through decode sampling; we expose a
single ``rounds`` knob with fresh decode rng per round.

Fast path: on-device exact slot-wise equality (decoded graphs come back in
the encoding's vertex order, so exact match is the operative criterion);
``use_isomorphism=True`` switches to the reference's networkx check on host
for the official metric.

Alongside the reference-parity sampling decode (T=1), a MODE decode
(T -> 0: argmax labels, edges at p > 0.5) is reported as ``*_mode``
metrics: at n >= ~37 exact-match under sampling is noise-dominated — with
P pairs the accuracy is bounded by prod(p_i) even when every edge
probability is right (666 pairs at p = 0.99 each -> 0.1%), so the MAP
reconstruction is the informative accuracy at catalog scale.  The
reference never faces this because its largest evaluated net is n=12.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.graphs.dag import graphs_equal_exact
from dags_vae_search_tpu.graphs import nx_bridge
from dags_vae_search_tpu.models.decode import decode_to_labeled
from dags_vae_search_tpu.models.pace_vae import PaceVAE


def reconstruction_metrics(
    model: PaceVAE,
    variables,
    labels: jnp.ndarray,
    adj: jnp.ndarray,
    rng: jax.Array,
    rounds: int = 1,
    use_isomorphism: bool = False,
) -> Dict[str, float]:
    """Metrics dict over one batch: nll_per_graph, valid_ratio,
    structure_accuracy, perfect_accuracy."""
    batch = labels.shape[0]
    mu, _ = model.apply(variables, labels, adj, method=PaceVAE.encode)
    _, nll, _ = model.apply(variables, labels, adj)

    # MAP reconstruction: deterministic mode decode (one round by nature).
    recon_m, valid_m = decode_to_labeled(
        model, variables, mu, rng, temperature=1e-4
    )
    structure_m = graphs_equal_exact(
        labels, adj, recon_m.labels, recon_m.adj, attributes_match=False
    )
    perfect_m = graphs_equal_exact(
        labels, adj, recon_m.labels, recon_m.adj, attributes_match=True
    )
    mode_metrics = {
        "valid_ratio_mode": float(jnp.mean(valid_m.astype(jnp.float32))),
        "structure_accuracy_mode": float(
            jnp.mean((structure_m & valid_m).astype(jnp.float32))
        ),
        "perfect_accuracy_mode": float(
            jnp.mean((perfect_m & valid_m).astype(jnp.float32))
        ),
    }

    n_valid = 0
    n_structure = 0
    n_perfect = 0
    for round_idx in range(rounds):
        recon, valid = decode_to_labeled(
            model, variables, mu, jax.random.fold_in(rng, round_idx)
        )
        n_valid += int(jnp.sum(valid.astype(jnp.int32)))
        if use_isomorphism:
            r_labels, r_adj = np.asarray(recon.labels), np.asarray(recon.adj)
            g_labels, g_adj = np.asarray(labels), np.asarray(adj)
            v = np.asarray(valid)
            for b in range(batch):
                if not v[b]:
                    continue
                if nx_bridge.graph_equals_isomorphic(
                    g_labels[b], g_adj[b], r_labels[b], r_adj[b],
                    attributes_match=False,
                ):
                    n_structure += 1
                if nx_bridge.graph_equals_isomorphic(
                    g_labels[b], g_adj[b], r_labels[b], r_adj[b],
                    attributes_match=True,
                ):
                    n_perfect += 1
        else:
            structure = graphs_equal_exact(
                labels, adj, recon.labels, recon.adj, attributes_match=False
            )
            perfect = graphs_equal_exact(
                labels, adj, recon.labels, recon.adj, attributes_match=True
            )
            n_structure += int(jnp.sum((structure & valid).astype(jnp.int32)))
            n_perfect += int(jnp.sum((perfect & valid).astype(jnp.int32)))

    denom = batch * rounds
    return {
        "nll_per_graph": float(nll) / batch,
        "valid_ratio": n_valid / denom,
        "structure_accuracy": n_structure / denom,
        "perfect_accuracy": n_perfect / denom,
        **mode_metrics,
    }


def evaluate_corpus(
    model: PaceVAE,
    variables,
    corpus,
    batch_size: int,
    rng: jax.Array,
    max_batches: int | None = None,
    rounds: int = 1,
    use_isomorphism: bool = False,
) -> Dict[str, float]:
    """Aggregate reconstruction metrics over a corpus (model_test parity)."""
    totals: Dict[str, float] = {}
    batches = 0
    for start in range(0, len(corpus) - batch_size + 1, batch_size):
        if max_batches is not None and batches >= max_batches:
            break
        lb = jnp.asarray(corpus.labels[start : start + batch_size])
        ad = jnp.asarray(corpus.dense_batch(np.arange(start, start + batch_size)))
        m = reconstruction_metrics(
            model,
            variables,
            lb,
            ad,
            jax.random.fold_in(rng, batches),
            rounds=rounds,
            use_isomorphism=use_isomorphism,
        )
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + v
        batches += 1
    return {k: v / max(batches, 1) for k, v in totals.items()}
