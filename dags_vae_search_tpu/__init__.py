"""dags_vae_search_tpu — a TPU-native latent-space structure-search engine for
Bayesian networks.

Re-designed from scratch for jax/XLA/Pallas/pjit with the capabilities of the
reference `rlog58/dags-vae-search` project (see SURVEY.md):

- ``graphs``   — batched fixed-shape tensor DAG toolkit (replaces the igraph
  toolkit layer, reference ``src/toolkit/*``, ``src/encoders/pace_utils.py``).
- ``ops``      — reachability closures, Pallas BIC contingency kernels,
  transformer primitives.
- ``models``   — the PACE transformer DAG-VAE in flax
  (reference ``src/encoders/pace.py``).
- ``scoring``  — on-device decomposable-score engine (BIC/AIC/log-lik) that
  replaces the per-graph R ``bnlearn`` subprocess
  (reference ``src/problem/bn/``).
- ``surrogate``— GP regression z -> score (reference ``src/predictors/``).
- ``search``   — vmapped latent-space structure search (the capability the
  reference only sketches in ``experiments/00_bn_asia_200k/main.py``).
- ``training`` — jitted VAE training / eval loops + data pipeline
  (reference ``src/train_model.py``, ``src/datasets.py``).
- ``parallel`` — mesh / sharding helpers for multi-chip execution.
"""

__version__ = "0.1.0"
