"""Training data pipeline: parquet corpora -> fixed-shape device batches.

Replaces the reference's dask-dataframe + per-row igraph/feature pipeline
(``src/datasets.py:8-27``, ``experiments/01_bn_asia/main.py:57-115``): the
corpus loads once into two dense numpy arrays, the split is a seeded
permutation (functionally the reference's ``dask_ml train_test_split`` with
``random_state=42``), and batches are views shipped to device; all
featurization (PACE wrap, masks) happens inside the jitted step.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Tuple

import numpy as np

from dags_vae_search_tpu.graphs import codec


class Corpus(NamedTuple):
    labels: np.ndarray  # int32[R, N]
    adj: np.ndarray  # float32[R, N, N]

    def __len__(self) -> int:
        return self.labels.shape[0]


def load_corpus(path: str) -> Corpus:
    labels, adj = codec.read_dataset(path)
    return Corpus(labels=labels, adj=adj)


def train_test_split(
    corpus: Corpus, test_ratio: float = 0.1, seed: int = 42
) -> Tuple[Corpus, Corpus]:
    """Seeded shuffle split (reference ``main.py:46-54`` semantics)."""
    if not (0.0 < test_ratio < 1.0):
        raise ValueError("test_ratio must be in (0, 1)")
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(corpus))
    n_test = int(len(corpus) * test_ratio)
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    return (
        Corpus(corpus.labels[train_idx], corpus.adj[train_idx]),
        Corpus(corpus.labels[test_idx], corpus.adj[test_idx]),
    )


def train_test_val_split(
    corpus: Corpus,
    test_ratio: float = 0.1,
    val_ratio: float = 0.1,
    seed: int = 42,
):
    """Three-way seeded split (train, test, val).

    The reference's ``split_dataset`` advertises this but its val branch is
    inverted and references an undefined path (``src/train_utils.py:43-83``,
    a catalogued reference bug); this is the working version.
    """
    if test_ratio + val_ratio >= 1.0:
        raise ValueError("test_ratio + val_ratio must be < 1")
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(corpus))
    n_test = int(len(corpus) * test_ratio)
    n_val = int(len(corpus) * val_ratio)
    test_idx = perm[:n_test]
    val_idx = perm[n_test : n_test + n_val]
    train_idx = perm[n_test + n_val :]
    pick = lambda idx: Corpus(corpus.labels[idx], corpus.adj[idx])
    return pick(train_idx), pick(test_idx), pick(val_idx)


def epoch_batches(
    corpus: Corpus,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Shuffled fixed-size batches (incomplete tail dropped: static shapes)."""
    order = rng.permutation(len(corpus)) if shuffle else np.arange(len(corpus))
    limit = (len(corpus) // batch_size) * batch_size if drop_last else len(corpus)
    for start in range(0, limit - batch_size + 1, batch_size):
        idx = order[start : start + batch_size]
        yield corpus.labels[idx], corpus.adj[idx]
