"""networkx bridge — offline validation/reporting edge of the tensor toolkit.

The hot path never touches Python graph objects; this module exists only for
the metrics the reference defines through networkx isomorphism
(``src/toolkit/labeled.py:219-260``): structure accuracy (label-blind
isomorphism) and perfect accuracy (label-matched isomorphism) in
reconstruction eval (``src/model_test.py:13-31``).
"""

from __future__ import annotations

import networkx as nx
import numpy as np


def to_nx(labels: np.ndarray, adj: np.ndarray) -> nx.DiGraph:
    """One graph (labels[N], adj[N,N]) -> nx.DiGraph with 'type' attrs."""
    graph = nx.DiGraph()
    n = labels.shape[-1]
    for v in range(n):
        graph.add_node(v, type=int(labels[v]))
    src, dst = np.nonzero(np.asarray(adj) > 0)
    graph.add_edges_from(zip(src.tolist(), dst.tolist()))
    return graph


def filter_non_isomorphic(labels: np.ndarray, adj: np.ndarray):
    """Indices of a pairwise non-isomorphic subset of a graph batch.

    Parity with the legacy generator's dedup pass
    (``src/graph_generator.py:16-38``).  Quadratic nx check, intended for
    small eval-side batches; a cheap invariant key (degree sequences +
    label multiset) prunes most comparisons first.
    """
    kept: list = []
    keys: list = []
    for idx in range(labels.shape[0]):
        a = np.asarray(adj[idx])
        key = (
            tuple(sorted(np.asarray(labels[idx]).tolist())),
            tuple(sorted(a.sum(0).astype(int).tolist())),
            tuple(sorted(a.sum(1).astype(int).tolist())),
        )
        duplicate = False
        for j, other_key in zip(kept, keys):
            if key != other_key:
                continue
            if graph_equals_isomorphic(
                labels[idx], adj[idx], labels[j], adj[j]
            ):
                duplicate = True
                break
        if not duplicate:
            kept.append(idx)
            keys.append(key)
    return kept


def graph_equals_isomorphic(
    labels_a: np.ndarray,
    adj_a: np.ndarray,
    labels_b: np.ndarray,
    adj_b: np.ndarray,
    attributes_match: bool = True,
) -> bool:
    """Reference-parity equality: nx isomorphism, optionally label-matched."""
    ga = to_nx(labels_a, adj_a)
    gb = to_nx(labels_b, adj_b)
    if attributes_match:
        return nx.is_isomorphic(
            ga, gb, node_match=lambda a, b: a["type"] == b["type"]
        )
    return nx.is_isomorphic(ga, gb)
