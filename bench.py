"""Headline benchmark: on-device BIC scoring throughput (+ VAE train rate).

Prints ONE JSON line. The primary metric is candidate-DAG scoring
throughput on asia — the reference scores one graph per R subprocess spawn
(``src/problem/bn/bnlearn.py:46-54``, ~100 ms/graph => ~10/s, the generous
end of BASELINE.md's "1 graph per subprocess"); the north-star target is
>=10k/s on a v5e-8. ``vs_baseline`` is measured throughput / 10.

Extra fields report VAE training throughput in graphs/s vs the reference's
best comment trace (5.36 it/s x batch 32 = 171.5 graphs/s,
``experiments/01_bn_asia/main.py:560``).
"""

import json
import time

import numpy as np


def bench_bic(batch: int = 8192, iters: int = 6) -> float:
    import jax
    import jax.numpy as jnp

    from dags_vae_search_tpu.graphs import sampler
    from dags_vae_search_tpu.scoring.bic import BicScorer
    from dags_vae_search_tpu.scoring.datasets import load_target_csv

    dataset = load_target_csv("/root/reference/data/bn_asia/target.csv")
    scorer = BicScorer(dataset)
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(sampler.sample_er_batch(rng, batch, 8, 10, 8)[1])
        for _ in range(iters)
    ]
    scorer.score(batches[0]).block_until_ready()
    t0 = time.time()
    outs = [scorer.score(b) for b in batches]
    jax.block_until_ready(outs)
    return batch * iters / (time.time() - t0)


def bench_family_table(batch: int = 65536, iters: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from dags_vae_search_tpu.graphs import sampler
    from dags_vae_search_tpu.scoring.datasets import load_target_csv
    from dags_vae_search_tpu.scoring.family_table import FamilyTableScorer

    dataset = load_target_csv("/root/reference/data/bn_asia/target.csv")
    scorer = FamilyTableScorer(dataset, max_parents=7)
    rng = np.random.default_rng(1)
    batches = [
        jnp.asarray(sampler.sample_er_batch(rng, batch, 8, 10, 8)[1])
        for _ in range(iters)
    ]
    scorer.score(batches[0]).block_until_ready()
    t0 = time.time()
    outs = [scorer.score(b) for b in batches]
    jax.block_until_ready(outs)
    return batch * iters / (time.time() - t0)


def bench_train(batch: int = 256, steps: int = 30) -> float:
    import jax
    import jax.numpy as jnp

    from dags_vae_search_tpu.graphs import sampler
    from dags_vae_search_tpu.models.pace_vae import make_asia_model
    from dags_vae_search_tpu.training import data as data_lib
    from dags_vae_search_tpu.training.train import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, batch, 8, 10, 8)
    model = make_asia_model()
    trainer = Trainer(model, TrainConfig(batch_size=batch, log_every=0))
    state = trainer.init_state(jax.random.PRNGKey(0), labels[:2], adj[:2])
    lb, ad = jnp.asarray(labels), jnp.asarray(adj)
    key = jax.random.PRNGKey(1)
    state, _ = trainer._train_step(state, lb, ad, key)  # compile
    jax.block_until_ready(state.params)
    t0 = time.time()
    for i in range(steps):
        state, metrics = trainer._train_step(
            state, lb, ad, jax.random.fold_in(key, i)
        )
    jax.block_until_ready(metrics["loss"])
    return batch * steps / (time.time() - t0)


def main():
    bic_rate = bench_bic()
    table_rate = bench_family_table()
    train_rate = bench_train()
    baseline_bic = 10.0  # ~1 R subprocess / 100 ms per candidate
    baseline_train = 171.5  # 5.36 it/s * batch 32 (reference comment trace)
    print(
        json.dumps(
            {
                "metric": "bic_evals_per_sec",
                "value": round(bic_rate, 1),
                "unit": "DAGs/s",
                "vs_baseline": round(bic_rate / baseline_bic, 1),
                "family_table_evals_per_sec": round(table_rate, 1),
                "train_graphs_per_sec": round(train_rate, 1),
                "train_vs_baseline": round(train_rate / baseline_train, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
