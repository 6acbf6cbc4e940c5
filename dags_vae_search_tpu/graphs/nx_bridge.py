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
