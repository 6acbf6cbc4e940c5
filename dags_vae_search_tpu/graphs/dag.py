"""Batched fixed-shape tensor DAG toolkit.

This is the TPU-native replacement for the reference's igraph-object toolkit
layer (``src/toolkit/base.py``, ``src/toolkit/labeled.py``,
``src/encoders/pace_utils.py``).  A batch of B labeled DAGs over N vertex
slots is a pair of dense tensors:

- ``labels``: int32[B, N] — vertex label per slot,
- ``adj``:    float32[B, N, N] — ``adj[b, i, j] == 1`` iff edge ``i -> j``.

Vertex slots are *topologically indexed*: every edge goes from a lower to a
higher slot, so ``adj`` is strictly upper-triangular and acyclicity holds by
construction.  This matches the reference's on-disk format, where row ``i`` of
the lower-triangular edge bitstring ``e{i}`` lists in-edges from slots
``< i`` (``src/toolkit/labeled.py:156-185``), so parquet corpora round-trip
exactly.

PACE wrapping (reference ``src/encoders/pace_utils.py:119-158`` and
``src/encoders/pace.py:1250-1305``) adds three virtual vertices — a *start*
vertex (label 2) at slot 0, an *input* vertex (label 0) at slot 1, an *output*
vertex (label 1) at the last slot — shifts real labels by +3, wires
start->input, input->every source, and every sink->output.  Here it is a pure
tensor transform (``pace_wrap`` / ``pace_unwrap``), vmappable over thousands
of graphs.

All functions are shape-static, jit-safe, and batched; none touch Python
graph objects.  The networkx bridge for offline isomorphism checks lives in
``graphs/nx_bridge.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# PACE virtual-vertex labels (reference src/encoders/pace_utils.py:18-20).
LABEL_INPUT = 0
LABEL_OUTPUT = 1
LABEL_START = 2
NUM_VIRTUAL = 3


class DagBatch(NamedTuple):
    """A batch of topologically-indexed labeled DAGs as dense tensors."""

    labels: jnp.ndarray  # int32[B, N]
    adj: jnp.ndarray  # float32[B, N, N], strictly upper-triangular

    @property
    def batch_size(self) -> int:
        return self.labels.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.labels.shape[-1]


def num_edges(adj: jnp.ndarray) -> jnp.ndarray:
    """Edge count per graph. adj: [..., N, N] -> [...]."""
    return jnp.sum(adj, axis=(-2, -1)).astype(jnp.int32)


def in_degrees(adj: jnp.ndarray) -> jnp.ndarray:
    """In-degree per vertex. adj: [..., N, N] -> [..., N]."""
    return jnp.sum(adj, axis=-2)


def out_degrees(adj: jnp.ndarray) -> jnp.ndarray:
    """Out-degree per vertex. adj: [..., N, N] -> [..., N]."""
    return jnp.sum(adj, axis=-1)


def density(adj: jnp.ndarray) -> jnp.ndarray:
    """Edge density m / (n(n-1)/2) per graph."""
    n = adj.shape[-1]
    return num_edges(adj) / (n * (n - 1) / 2.0)


def _num_squarings(n: int) -> int:
    """Iterations of closure-squaring needed to cover paths of length n-1."""
    k = 0
    length = 1
    while length < max(n - 1, 1):
        length *= 2
        k += 1
    return k


def transitive_closure(adj: jnp.ndarray) -> jnp.ndarray:
    """Reachability by paths of length >= 1, via O(log N) matrix squarings.

    Replaces the reference's sequential repeated-matmul loop
    (``src/encoders/pace.py:1307-1343``, O(N) matmuls with a data-dependent
    early exit) with a fixed O(log N) schedule of MXU matmuls — jit-static
    and batched.

    adj: float[..., N, N] -> float[..., N, N] with entries in {0, 1}.

    Correct for arbitrary digraphs (used for acyclicity checks on move
    candidates).  For canonical upper-triangular DAGs above ~256 vertices,
    ``ops.reachability.closure_blocked`` is the cheaper choice (no log
    factor); ``attention_allowed`` dispatches there automatically.
    """
    n = adj.shape[-1]
    closure = (adj > 0).astype(jnp.float32)
    for _ in range(_num_squarings(n)):
        longer = jnp.matmul(closure, closure, preferred_element_type=jnp.float32)
        closure = jnp.clip(closure + longer, 0.0, 1.0)
        closure = (closure > 0).astype(jnp.float32)
    return closure


def attention_allowed(
    adj: jnp.ndarray,
    n_valid: jnp.ndarray | int | None = None,
) -> jnp.ndarray:
    """DAG attention mask: ``allowed[..., q, k]`` — may query q attend key k.

    Query q attends key k iff there is a directed path k -> q, or q == k —
    i.e. each vertex sees its ancestors and itself.  This reproduces the
    reference semantics, where the *non*-reachability mask is built
    (``pace.py:1307-1343``) and then transposed before use
    (``pace.py:1474/1607``: ``target_masks.transpose(1, 2)``; torch
    ``attn_mask=True`` means *blocked*).

    For partially-built graphs during decode, ``n_valid`` marks how many
    leading slots are real; padded slots attend (only) each other, matching
    the reference's padded-block handling (``pace.py:1439-1444``).

    adj: float[..., N, N]; n_valid: int[...] or None (all slots valid).
    Returns bool[..., N, N].  Inputs are canonical (strictly
    upper-triangular) DAG tensors; large graphs use the blocked closure.
    """
    n = adj.shape[-1]
    if n > 256:
        from dags_vae_search_tpu.ops.reachability import closure_blocked

        reach = closure_blocked(adj) > 0
    else:
        reach = transitive_closure(adj) > 0
    eye = jnp.eye(n, dtype=bool)
    allowed = jnp.swapaxes(reach, -1, -2) | eye
    if n_valid is None:
        return allowed
    n_valid = jnp.asarray(n_valid)[..., None]
    idx = jnp.arange(n)
    q_real = (idx < n_valid)[..., :, None]
    k_real = (idx < n_valid)[..., None, :]
    both_real = q_real & k_real
    both_pad = (~q_real) & (~k_real)
    return (allowed & both_real) | both_pad


def pace_wrap(labels: jnp.ndarray, adj: jnp.ndarray) -> DagBatch:
    """Wrap labeled DAGs with the 3 PACE virtual vertices, as a tensor op.

    labels: int[B, N]; adj: float[B, N, N] (strictly upper-triangular).
    Returns a DagBatch over N + 3 slots:
      slot 0 = start (label 2), slot 1 = input (label 0),
      slots 2..N+1 = real vertices (labels + 3), slot N+2 = output (label 1);
      edges: start->input, input->sources, real edges shifted by +2,
      sinks->output (reference ``pace.py:1250-1288``).
    """
    b, n = labels.shape
    np_ = n + NUM_VIRTUAL

    wrapped_labels = jnp.concatenate(
        [
            jnp.full((b, 1), LABEL_START, dtype=jnp.int32),
            jnp.full((b, 1), LABEL_INPUT, dtype=jnp.int32),
            labels.astype(jnp.int32) + NUM_VIRTUAL,
            jnp.full((b, 1), LABEL_OUTPUT, dtype=jnp.int32),
        ],
        axis=1,
    )

    wrapped_adj = jnp.zeros((b, np_, np_), dtype=jnp.float32)
    wrapped_adj = wrapped_adj.at[:, 0, 1].set(1.0)
    wrapped_adj = wrapped_adj.at[:, 2 : n + 2, 2 : n + 2].set(adj)
    is_source = (in_degrees(adj) == 0).astype(jnp.float32)
    wrapped_adj = wrapped_adj.at[:, 1, 2 : n + 2].set(is_source)
    is_sink = (out_degrees(adj) == 0).astype(jnp.float32)
    wrapped_adj = wrapped_adj.at[:, 2 : n + 2, np_ - 1].set(is_sink)

    return DagBatch(labels=wrapped_labels, adj=wrapped_adj)


def pace_unwrap(labels: jnp.ndarray, adj: jnp.ndarray) -> DagBatch:
    """Inverse of :func:`pace_wrap`: strip virtual vertices, shift labels -3.

    Virtual wiring (start->input, input->source, sink->output) is dropped;
    only the real-vertex sub-block of the adjacency survives (reference
    ``pace.py:1290-1305``).
    """
    n = labels.shape[-1] - NUM_VIRTUAL
    return DagBatch(
        labels=labels[:, 2 : n + 2].astype(jnp.int32) - NUM_VIRTUAL,
        adj=adj[:, 2 : n + 2, 2 : n + 2],
    )


def isolate_mask(adj: jnp.ndarray) -> jnp.ndarray:
    """bool[..., N]: vertices with no in- or out-edges.

    Fixed-shape analogue of ``BaseDag.graph_drop_isolates``
    (``src/toolkit/base.py:47-59``): slots cannot be removed from a static
    tensor, so isolates are reported as a mask (used e.g. by the sampler's
    isolate-tolerant connectivity mode).
    """
    return (in_degrees(adj) == 0) & (out_degrees(adj) == 0)


def is_connected_ignoring_isolates(adj: jnp.ndarray) -> jnp.ndarray:
    """Weak connectivity of the non-isolate subgraph (bool[...]).

    The reference's ``accept_isolates=True`` generation mode drops isolates
    before the connectivity check (``src/toolkit/labeled.py:310-313``).
    """
    n = adj.shape[-1]
    isolates = isolate_mask(adj)
    sym = jnp.clip(adj + jnp.swapaxes(adj, -1, -2), 0.0, 1.0)
    # Treat isolates as connected-to-everything so they never break the
    # reachability of the remaining graph.
    iso_f = isolates.astype(jnp.float32)
    sym = jnp.clip(
        sym + iso_f[..., :, None] + iso_f[..., None, :] + jnp.eye(n), 0.0, 1.0
    )
    closure = sym
    for _ in range(_num_squarings(n + 1)):
        closure = jnp.matmul(closure, closure, preferred_element_type=jnp.float32)
        closure = (closure > 0).astype(jnp.float32)
    return jnp.all(closure[..., 0, :] > 0, axis=-1)


def is_valid_pace(labels: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Validity of PACE-wrapped graphs (bool[B]).

    Tensor analogue of ``PaceDag.is_valid_graph``
    (``src/encoders/pace_utils.py:70-117``): exactly one start / input /
    output vertex, positions consistent (slot order is topological — i.e.
    strictly-forward edges), plus the labeled-graph invariants.
    """
    one_start = jnp.sum((labels == LABEL_START).astype(jnp.int32), axis=-1) == 1
    one_input = jnp.sum((labels == LABEL_INPUT).astype(jnp.int32), axis=-1) == 1
    one_output = jnp.sum((labels == LABEL_OUTPUT).astype(jnp.int32), axis=-1) == 1
    n = adj.shape[-1]
    lower = jnp.tril(jnp.ones((n, n)))
    triangular_ok = jnp.all(adj * lower == 0, axis=(-2, -1))
    labels_ok = jnp.all(labels >= 0, axis=-1)
    return one_start & one_input & one_output & triangular_ok & labels_ok


def is_weakly_connected(adj: jnp.ndarray) -> jnp.ndarray:
    """Weak connectivity per graph (bool[...]) via symmetric closure."""
    n = adj.shape[-1]
    sym = jnp.clip(adj + jnp.swapaxes(adj, -1, -2) + jnp.eye(n), 0.0, 1.0)
    closure = sym
    for _ in range(_num_squarings(n + 1)):
        closure = jnp.matmul(closure, closure, preferred_element_type=jnp.float32)
        closure = (closure > 0).astype(jnp.float32)
    return jnp.all(closure[..., 0, :] > 0, axis=-1)


def is_valid_labeled(
    labels: jnp.ndarray,
    adj: jnp.ndarray,
    label_cardinality: int,
) -> jnp.ndarray:
    """Validity of labeled DAGs: labels in range and edges strictly forward.

    The tensor analogue of ``LabeledDag.is_valid_graph``
    (``src/toolkit/labeled.py:187-217``): DAG-ness reduces to the
    strictly-upper-triangular invariant, vertex count is fixed by shape, and
    labels must lie in ``[0, label_cardinality)``.
    Returns bool[B].
    """
    n = adj.shape[-1]
    labels_ok = jnp.all((labels >= 0) & (labels < label_cardinality), axis=-1)
    lower = jnp.tril(jnp.ones((n, n)))
    triangular_ok = jnp.all(adj * lower == 0, axis=(-2, -1))
    binary_ok = jnp.all((adj == 0) | (adj == 1), axis=(-2, -1))
    return labels_ok & triangular_ok & binary_ok


def graphs_equal_exact(
    labels_a: jnp.ndarray,
    adj_a: jnp.ndarray,
    labels_b: jnp.ndarray,
    adj_b: jnp.ndarray,
    attributes_match: bool = True,
) -> jnp.ndarray:
    """On-device exact equality of topologically-indexed graphs (bool[B]).

    A fast, fully batched stand-in for the reference's networkx isomorphism
    check (``src/toolkit/labeled.py:238-260``): equality of the canonical
    slot-indexed form.  Complete isomorphism (order-insensitive) is available
    offline via ``graphs.nx_bridge.graph_equals_isomorphic``.
    """
    adj_eq = jnp.all(adj_a == adj_b, axis=(-2, -1))
    if not attributes_match:
        return adj_eq
    return adj_eq & jnp.all(labels_a == labels_b, axis=-1)


def upper_tri_mask(n: int) -> np.ndarray:
    """Strictly-upper-triangular boolean mask (host-side helper)."""
    return np.triu(np.ones((n, n), dtype=bool), k=1)
