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
    """Dense or bit-packed corpus.

    ``adj`` is float32[R, N, N] when ``packed_bits`` is None; otherwise
    ``packed_bits`` holds uint8[R, N, ceil(N/8)] (np.packbits rows) and
    ``adj`` is empty — a link-scale (n=724) graph costs 66 KB packed vs
    2.1 MB dense, so 100k-graph corpora stay in host RAM.
    """

    labels: np.ndarray  # int32[R, N]
    adj: np.ndarray  # float32[R, N, N] (dense mode) or empty
    packed_bits: np.ndarray | None = None  # uint8[R, N, ceil(N/8)]

    def __len__(self) -> int:
        return self.labels.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.labels.shape[1]

    def dense_batch(self, idx: np.ndarray) -> np.ndarray:
        """Materialize adjacency rows (always dense float32)."""
        if self.packed_bits is None:
            return self.adj[idx]
        n = self.num_vertices
        bits = np.unpackbits(self.packed_bits[idx], axis=-1, count=n)
        return bits.astype(np.float32)


def pack_corpus(labels: np.ndarray, adj: np.ndarray) -> Corpus:
    packed = np.packbits((adj > 0).astype(np.uint8), axis=-1)
    return Corpus(labels=labels, adj=np.zeros((0,)), packed_bits=packed)


def load_corpus(path: str, pack_above: int = 64) -> Corpus:
    """Load a parquet corpus; bit-pack adjacency when n > pack_above."""
    labels, adj = codec.read_dataset(path)
    if labels.shape[1] > pack_above:
        return pack_corpus(labels, adj)
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
    def pick(idx):
        if corpus.packed_bits is not None:
            return Corpus(
                corpus.labels[idx], corpus.adj, corpus.packed_bits[idx]
            )
        return Corpus(corpus.labels[idx], corpus.adj[idx])

    return pick(train_idx), pick(test_idx)


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
    def pick(idx):
        if corpus.packed_bits is not None:
            return Corpus(
                corpus.labels[idx], corpus.adj, corpus.packed_bits[idx]
            )
        return Corpus(corpus.labels[idx], corpus.adj[idx])
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
        yield corpus.labels[idx], corpus.dense_batch(idx)
