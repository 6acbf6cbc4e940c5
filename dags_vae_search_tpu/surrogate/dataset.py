"""Predictor (surrogate) dataset builder: graphs -> (latent mu, score).

Reference: ``create_predictor_dataset`` (``src/predictors/utils.py:15-59``)
encodes ONE graph at a time (``model.encode([graph])``) and spawns ONE R
subprocess per score — the dominant bottleneck of the whole reference
pipeline (SURVEY.md §3.4).  Here both stages are batched on device: encode
whole corpora through the VAE and score whole batches through the Pallas
BIC engine.

On-disk format matches the reference ('vector' list<float> + 'target'
double parquet columns) so either stack can consume the output.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.scoring.bic import BicScorer


def build_predictor_dataset(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    labels: np.ndarray,
    adj: np.ndarray,
    batch_size: int = 1024,
    exact_scores: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """(vectors float32[R, nz], targets float64[R]) for a labeled corpus."""
    vectors, targets = [], []
    rows = labels.shape[0]
    for start in range(0, rows, batch_size):
        lb = jnp.asarray(labels[start : start + batch_size])
        ad = jnp.asarray(adj[start : start + batch_size])
        mu, _ = model.apply(variables, lb, ad, method=PaceVAE.encode)
        vectors.append(np.asarray(mu))
        relabeled = jnp.asarray(
            _relabel(np.asarray(lb), np.asarray(ad))
        )
        if exact_scores:
            targets.append(scorer.score_exact(relabeled))
        else:
            targets.append(np.asarray(scorer.score(relabeled), dtype=np.float64))
    return np.concatenate(vectors), np.concatenate(targets)


def _relabel(labels: np.ndarray, adj: np.ndarray) -> np.ndarray:
    """Permute adjacency so vertex with label L lands at index L (the
    scorer's column space; ``bnlearn.py:38-44``).  Unlabeled corpora
    (labels not a permutation, e.g. cardinality-1 graphs) map identically:
    slot i IS column i."""
    b, n = labels.shape
    is_perm = np.all(np.sort(labels, axis=1) == np.arange(n)[None, :])
    if not is_perm:
        return adj
    out = np.zeros_like(adj)
    for i in range(b):
        perm = labels[i]
        out[i][np.ix_(perm, perm)] = adj[i]
    return out


def write_predictor_parquet(path: str, vectors: np.ndarray, targets: np.ndarray):
    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "vector": pa.array(list(vectors), type=pa.list_(pa.float32())),
            "target": pa.array(targets, type=pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))


def read_predictor_parquet(path: str) -> Tuple[np.ndarray, np.ndarray]:
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    tables = [pq.read_table(f) for f in files]
    table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    vectors = np.asarray(table.column("vector").to_pylist(), dtype=np.float32)
    targets = table.column("target").to_numpy().astype(np.float64)
    return vectors, targets
