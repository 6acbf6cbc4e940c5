"""Random labeled-DAG corpus generation (Erdős–Rényi with fixed edge count).

TPU-native redesign of the reference generator
(``src/toolkit/labeled.py:281-333`` + ``src/encoders/utils.py:18-93``): an
undirected ER graph with exactly ``m`` edges, oriented acyclically from lower
to higher vertex slot (so the slot order is a topological order by
construction), rejected unless weakly connected, with labels drawn without
replacement ("sample") or with replacement ("choice").

Two implementations:

- :func:`sample_er_batch` — vectorized host numpy, the ETL path that replaces
  the reference's one-igraph-at-a-time loop;
- :func:`sample_er_dags` — pure jax, vmapped and jit-able, for on-device
  corpus generation inside search loops.

The curriculum over edge counts (``encoder_dag_train_schema``,
``src/encoders/utils.py:18-57``) is reproduced by :func:`edge_count_schedule`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.graphs.dag import is_weakly_connected


def edge_count_schedule(
    num_vertices: int, density_limit: float, steps_limit: int
) -> List[Tuple[int, int]]:
    """(edge_count, num_batches) curriculum, parity with the reference.

    Edge counts are ``steps_limit`` linspace points from ``n - 1`` (weak
    connectivity minimum) to ``density_limit * n(n-1)/2``, deduplicated; the
    i-th unique step gets ``(i + 1)**2`` batches
    (``src/encoders/utils.py:36-51``).
    """
    if num_vertices < 1:
        raise ValueError("num_vertices must be at least 1")
    if not (0 < density_limit <= 1):
        raise ValueError("density_limit must be in (0, 1]")
    if steps_limit < 1:
        raise ValueError("steps_limit must be at least 1")

    min_edges = num_vertices - 1
    max_edges = (num_vertices * (num_vertices - 1)) // 2
    max_edges_density = int(max_edges * density_limit)
    if max_edges_density < min_edges:
        raise ValueError("density_limit too small for connectivity minimum")

    linspace = list(map(int, np.linspace(min_edges, max_edges_density, steps_limit)))
    unique_edges = sorted(set(linspace))
    return [(edges, (i + 1) ** 2) for i, edges in enumerate(unique_edges)]


def _pair_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row/col indices of the strictly-upper-triangular pairs, i < j."""
    rows, cols = np.triu_indices(n, k=1)
    return rows.astype(np.int32), cols.astype(np.int32)


def max_edges_capped(n: int, max_in_degree: Optional[int]) -> int:
    """Max edge count of an n-vertex upper-triangular DAG whose per-vertex
    in-degree is capped: sum_j min(j, cap) over columns j = 1..n-1."""
    if max_in_degree is None:
        return n * (n - 1) // 2
    cap = int(max_in_degree)
    js = np.arange(1, n)
    return int(np.minimum(js, cap).sum())


def _capped_edge_matrix(
    rng: np.random.Generator,
    num_graphs: int,
    n: int,
    num_edges: int,
    max_in_degree: int,
) -> np.ndarray:
    """Uniform-key edge selection with a hard per-column in-degree cap.

    Each upper-triangular pair draws a uniform key; within every column only
    the ``max_in_degree`` smallest keys stay eligible, and the ``num_edges``
    globally-smallest eligible keys become edges.  This guarantees (a) exact
    edge count and (b) in-degree <= cap — the feasibility invariant the
    scorer (``scoring/bic.py`` max_parents) and the decode cap
    (``models/decode.py``) enforce, so generated corpora are scoreable by
    construction (VERDICT r3: alarm predictor finite_fraction 0.46 came from
    uncapped corpora).  When cap >= n-1 this reduces to a uniform m-subset.
    """
    if num_edges > max_edges_capped(n, max_in_degree):
        raise ValueError(
            f"num_edges {num_edges} infeasible under in-degree cap "
            f"{max_in_degree} (max {max_edges_capped(n, max_in_degree)})"
        )
    keys = rng.random((num_graphs, n, n))
    valid = np.triu(np.ones((n, n), dtype=bool), k=1)
    keys[:, ~valid] = np.inf
    # rank of each parent entry within its column (0 = smallest key)
    rank = np.argsort(np.argsort(keys, axis=1), axis=1)
    keys[rank >= max_in_degree] = np.inf
    flat = keys.reshape(num_graphs, n * n)
    chosen = np.argpartition(flat, num_edges - 1, axis=1)[:, :num_edges]
    adj = np.zeros((num_graphs, n * n), dtype=np.float32)
    adj[np.repeat(np.arange(num_graphs), num_edges), chosen.ravel()] = 1.0
    return adj.reshape(num_graphs, n, n)


def _connected_mask_np(adj: np.ndarray) -> np.ndarray:
    """Weak connectivity per graph for a [G, N, N] numpy batch."""
    n = adj.shape[-1]
    sym = np.clip(adj + np.swapaxes(adj, -1, -2) + np.eye(n, dtype=adj.dtype), 0, 1)
    closure = sym
    steps = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    for _ in range(steps):
        closure = np.clip(closure @ closure, 0, 1)
    return np.all(closure[:, 0, :] > 0, axis=-1)


def sample_labels_np(
    rng: np.random.Generator,
    num_graphs: int,
    num_vertices: int,
    label_cardinality: int,
    method: str = "sample",
) -> np.ndarray:
    """Random labels: 'sample' = without replacement, 'choice' = with."""
    if method == "sample":
        if label_cardinality == 1:
            return np.zeros((num_graphs, num_vertices), dtype=np.int32)
        if label_cardinality < num_vertices:
            raise ValueError(
                "'sample' needs label_cardinality >= num_vertices "
                f"({label_cardinality} < {num_vertices})"
            )
        keys = rng.random((num_graphs, label_cardinality))
        perm = np.argsort(keys, axis=1)
        return perm[:, :num_vertices].astype(np.int32)
    if method == "choice":
        return rng.integers(
            0, label_cardinality, size=(num_graphs, num_vertices), dtype=np.int32
        )
    raise ValueError("method must be 'sample' or 'choice'")


def sample_er_batch(
    rng: np.random.Generator,
    num_graphs: int,
    num_vertices: int,
    num_edges: int,
    label_cardinality: int,
    label_method: str = "sample",
    require_connected: bool = True,
    max_rounds: int = 200,
    on_exhaust: str = "raise",
    max_in_degree: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side batch ER-DAG sampler -> (labels[G,N], adj[G,N,N]).

    ``on_exhaust``: when the retry budget runs out (connectivity is rare at
    edge counts near n-1), 'raise' errors; 'partial' returns only the
    successfully generated graphs — the reference's behavior, which
    log-and-continues with a short batch (``src/encoders/utils.py:85-92``).

    ``max_in_degree`` caps per-vertex parents (scorer/decode feasibility);
    None or cap >= n-1 keeps the legacy uniform m-subset stream byte-for-
    byte (seeded corpora regenerate identically).
    """
    n = num_vertices
    if num_edges < n - 1:
        raise ValueError(
            f"Expected at least {n - 1} edges (connectivity condition), got {num_edges}"
        )
    rows, cols = _pair_indices(n)
    num_pairs = rows.shape[0]
    if num_edges > num_pairs:
        raise ValueError(f"num_edges {num_edges} exceeds max {num_pairs}")
    capped = max_in_degree is not None and max_in_degree < n - 1

    out_adj = np.zeros((num_graphs, n, n), dtype=np.float32)
    need = np.ones(num_graphs, dtype=bool)
    for _ in range(max_rounds):
        g = int(need.sum())
        if g == 0:
            break
        if capped:
            adj = _capped_edge_matrix(rng, g, n, num_edges, max_in_degree)
        else:
            # Random m-subset of pairs per graph via top-m of uniform keys.
            keys = rng.random((g, num_pairs))
            chosen = np.argpartition(keys, num_edges - 1, axis=1)[:, :num_edges]
            adj = np.zeros((g, n, n), dtype=np.float32)
            gi = np.repeat(np.arange(g), num_edges)
            adj[gi, rows[chosen].ravel(), cols[chosen].ravel()] = 1.0
        ok = _connected_mask_np(adj) if require_connected else np.ones(g, dtype=bool)
        idx = np.flatnonzero(need)
        accepted = idx[ok]
        out_adj[accepted] = adj[ok]
        need[accepted] = False
    labels = sample_labels_np(rng, num_graphs, n, label_cardinality, label_method)
    if need.any():
        if on_exhaust == "partial":
            keep = ~need
            return labels[keep], out_adj[keep]
        raise RuntimeError("max_rounds exceeded with no connected DAG generated")
    return labels, out_adj


def sample_connected_dags(
    rng: np.random.Generator,
    num_graphs: int,
    num_vertices: int,
    num_edges: int,
    label_cardinality: int,
    label_method: str = "sample",
    max_in_degree: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Constructive connected-DAG sampler for large n.

    Rejection sampling of connected ER graphs is hopeless near the
    connectivity threshold for large n (P(connected) vanishes, and each
    rejection round costs an O(n^3) closure).  Instead: a uniform random
    attachment spanning tree (vertex i > 0 picks one parent among 0..i-1 —
    weak connectivity by construction) plus ``num_edges - (n-1)`` extra
    uniform forward edges.  The slot order remains topological.

    ``max_in_degree``: the extra edges respect a per-vertex parent cap
    (the tree contributes one parent per vertex, so extras fill at most
    cap-1 further slots per column) — scorer/decode feasibility, as in
    :func:`sample_er_batch`.
    """
    n = num_vertices
    if num_edges < n - 1:
        raise ValueError(f"need at least {n - 1} edges, got {num_edges}")
    rows, cols = _pair_indices(n)
    num_pairs = rows.shape[0]
    capped = max_in_degree is not None and max_in_degree < n - 1
    if capped:
        limit = max_edges_capped(n, max_in_degree)
        if num_edges > limit:
            raise ValueError(
                f"num_edges {num_edges} infeasible under in-degree cap "
                f"{max_in_degree} (max {limit})"
            )

    adj = np.zeros((num_graphs, n, n), dtype=np.float32)
    gi = np.arange(num_graphs)
    # spanning tree: parent[i] ~ U{0..i-1}
    for i in range(1, n):
        parents = rng.integers(0, i, size=num_graphs)
        adj[gi, parents, i] = 1.0
    # extra edges among the remaining pairs, per graph
    extra = num_edges - (n - 1)
    if extra > 0 and capped:
        keys = rng.random((num_graphs, n, n))
        valid = np.triu(np.ones((n, n), dtype=bool), k=1)
        keys[:, ~valid] = np.inf
        keys[adj > 0] = np.inf  # tree edges are taken
        # within each column keep the cap-1 smallest-key candidates (the
        # tree already occupies one parent slot per column)
        rank = np.argsort(np.argsort(keys, axis=1), axis=1)
        keys[rank >= max_in_degree - 1] = np.inf
        flat = keys.reshape(num_graphs, n * n)
        chosen = np.argpartition(flat, extra - 1, axis=1)[:, :extra]
        adj.reshape(num_graphs, n * n)[
            np.repeat(gi, extra), chosen.ravel()
        ] = 1.0
    elif extra > 0:
        keys = rng.random((num_graphs, num_pairs))
        # forbid already-present tree edges by pushing their keys above 1
        present = adj[:, rows, cols] > 0
        keys = keys + present * 2.0
        chosen = np.argpartition(keys, extra - 1, axis=1)[:, :extra]
        adj[
            np.repeat(gi, extra), rows[chosen].ravel(), cols[chosen].ravel()
        ] = 1.0
    labels = sample_labels_np(rng, num_graphs, n, label_cardinality, label_method)
    return labels, adj


def generate_corpus(
    rng: np.random.Generator,
    num_vertices: int,
    label_cardinality: int,
    batch_size: int,
    steps_limit: int,
    density_limit: float,
    label_method: str = "sample",
    max_in_degree: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full curriculum corpus, reference ``create_encoder_dataset`` parity.

    For each (edge_count, num_batches) schedule entry generates
    ``num_batches * batch_size`` connected random DAGs
    (``src/encoders/utils.py:96-202``) — vectorized, no tmp-parquet staging.

    With ``max_in_degree``, schedule edge counts above the cap-feasible
    maximum are clipped to it (duplicated entries merge their batch
    counts): at large n the density prior (``README.md:53-58``) can exceed
    what a cap-``max_in_degree`` DAG can hold (link: 0.05 density = 13,086
    edges vs 5,756 at cap 8), and an uncappable corpus is unscoreable.
    """
    schedule = edge_count_schedule(num_vertices, density_limit, steps_limit)
    if max_in_degree is not None:
        limit = max_edges_capped(num_vertices, max_in_degree)
        merged: dict = {}
        for edge_count, num_batches in schedule:
            clipped = min(edge_count, limit)
            merged[clipped] = merged.get(clipped, 0) + num_batches
        schedule = sorted(merged.items())
    all_labels, all_adj = [], []
    for edge_count, num_batches in schedule:
        if num_vertices > 64:
            # rejection is intractable at this scale — constructive sampler.
            labels, adj = sample_connected_dags(
                rng,
                num_batches * batch_size,
                num_vertices,
                edge_count,
                label_cardinality,
                label_method,
                max_in_degree=max_in_degree,
            )
        else:
            labels, adj = sample_er_batch(
                rng,
                num_batches * batch_size,
                num_vertices,
                edge_count,
                label_cardinality,
                label_method,
                on_exhaust="partial",
                max_in_degree=max_in_degree,
            )
        all_labels.append(labels)
        all_adj.append(adj)
    return np.concatenate(all_labels), np.concatenate(all_adj)


def sample_er_dags(
    key: jax.Array,
    num_graphs: int,
    num_vertices: int,
    num_edges: int,
    label_cardinality: int,
    label_method: str = "sample",
    require_connected: bool = True,
    num_attempts: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device batched ER-DAG sampler (jit-able, fixed shapes).

    Draws ``num_attempts`` independent candidate edge sets per slot and keeps
    the first weakly-connected one (rejection with a static retry budget —
    the jit-safe analogue of the reference's ``try_limit`` loop,
    ``src/toolkit/labeled.py:298-333``).

    Returns ``(labels, adj, ok)`` where ``ok`` bool[G] marks graphs whose
    retry budget found a connected candidate; slots with ``ok == False``
    carry the (disconnected) first attempt — filter or resample them, the
    fixed-shape analogue of ``sample_er_batch``'s ``on_exhaust``.
    """
    n = num_vertices
    rows, cols = _pair_indices(n)
    num_pairs = rows.shape[0]
    flat_idx = jnp.asarray(rows.astype(np.int64) * n + cols.astype(np.int64))

    key_edges, key_labels = jax.random.split(key)
    attempt_keys = jax.random.split(key_edges, num_attempts)

    def one_attempt(akey):
        keys = jax.random.uniform(akey, (num_graphs, num_pairs))
        _, chosen = jax.lax.top_k(keys, num_edges)
        edge_mask = (
            jnp.zeros((num_graphs, num_pairs))
            .at[jnp.arange(num_graphs)[:, None], chosen]
            .set(1.0)
        )
        adj = (
            jnp.zeros((num_graphs, n * n)).at[:, flat_idx].set(edge_mask)
        ).reshape(num_graphs, n, n)
        ok = (
            is_weakly_connected(adj)
            if require_connected
            else jnp.ones(num_graphs, dtype=bool)
        )
        return adj, ok

    adjs, oks = jax.vmap(one_attempt)(attempt_keys)  # [A, G, N, N], [A, G]
    first_ok = jnp.argmax(oks, axis=0)  # first True per graph (0 if none)
    adj = jnp.take_along_axis(adjs, first_ok[None, :, None, None], axis=0)[0]
    ok = jnp.any(oks, axis=0)

    if label_method == "sample":
        if label_cardinality == 1:
            labels = jnp.zeros((num_graphs, n), dtype=jnp.int32)
        else:
            keys = jax.random.uniform(key_labels, (num_graphs, label_cardinality))
            labels = jnp.argsort(keys, axis=1)[:, :n].astype(jnp.int32)
    else:
        labels = jax.random.randint(
            key_labels, (num_graphs, n), 0, label_cardinality, dtype=jnp.int32
        )
    return labels, adj, ok
