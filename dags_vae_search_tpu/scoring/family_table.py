"""Family-table scoring: decomposability turned into a lookup table.

A decomposable score is a sum of per-(node, parent-set) *family* scores.
For small nets (n <= 16) the entire family space fits in one device table
``table[i, m] = score_i(parents = bitmask m \\ {i})`` of shape [n, 2^n]
(n=16: 4 MB).  Building it costs one sweep of batched contingency scoring
(every mask broadcast to every column simultaneously, so each adjacency
batch element fills n table cells); after that, scoring ANY candidate DAG
is n gathers:

    score(A) = sum_i table[i, sum_j A[j, i] * 2^j]

— millions of DAGs per second, bounded by gather bandwidth, not counting.
This is the same family decomposition the exact DP solver
(``search/exact.py``) exploits, packaged as a drop-in ``score`` for the
search loops.  Infeasible families (in-degree > max_parents or config space
> q_cap) hold -inf, so feasibility masking falls out of the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.scoring.bic import BicScorer
from dags_vae_search_tpu.scoring.datasets import DiscreteDataset


class FamilyTableScorer:
    """Precomputed [n, 2^n] family-score table with gather-based scoring."""

    def __init__(
        self,
        dataset: DiscreteDataset,
        metric: str = "bic",
        max_parents: int | None = None,
        q_cap: int | None = None,
        chunk: int = 1024,
        base_scorer: BicScorer | None = None,
    ):
        n = dataset.num_variables
        if n > 16:
            raise ValueError(
                f"family table is 2^n; n={n} > 16 — use BicScorer directly"
            )
        self.num_variables = n
        self.metric = metric
        self.max_parents = max_parents
        scorer = base_scorer or BicScorer(
            dataset, metric=metric, max_parents=max_parents, q_cap=q_cap
        )
        self.q_cap = scorer.q_cap

        size = 1 << n
        masks = np.arange(size, dtype=np.int64)
        bits_all = ((masks[:, None] >> np.arange(n)[None, :]) & 1).astype(
            np.float32
        )
        cards = dataset.cards.astype(np.float64)

        table = np.empty((n, size), dtype=np.float32)
        for start in range(0, size, chunk):
            bits = bits_all[start : start + chunk]  # [F, n]
            f = bits.shape[0]
            # every column i of candidate f carries mask bits (diag zeroed):
            adj = np.repeat(bits[:, :, None], n, axis=2)
            idx = np.arange(n)
            adj[:, idx, idx] = 0.0
            node_scores = np.asarray(scorer.score_nodes(jnp.asarray(adj)))
            table[:, start : start + f] = node_scores.T

        # Feasibility: -inf where the family violates max_parents / q_cap.
        popcount = bits_all.sum(axis=1)  # counts bit i too; subtract later
        for i in range(n):
            m_wo_i = masks & ~(1 << i)
            parents = popcount[m_wo_i]
            q = np.ones(size)
            for j in range(n):
                has_j = ((m_wo_i >> j) & 1).astype(bool)
                q[has_j] *= cards[j]
            bad = q > self.q_cap
            if max_parents is not None:
                bad |= parents > max_parents
            table[i, bad] = -np.inf

        self._table = jnp.asarray(table)
        self._bit_weights = jnp.asarray(
            (1 << np.arange(n)).astype(np.float32)
        )
        self._score_jit = jax.jit(self._score_impl)

    def _score_impl(self, adj: jnp.ndarray) -> jnp.ndarray:
        # parent bitmask per column: exact in f32 for n <= 16 (< 2^24).
        masks = jnp.einsum(
            "bji,j->bi", adj, self._bit_weights,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [B, n]
        cols = jnp.arange(self.num_variables)[None, :]
        per_node = self._table.T[masks, cols]  # [B, n] = table[i, masks[b,i]]
        return jnp.sum(per_node, axis=-1)

    def score(self, adj: jnp.ndarray) -> jnp.ndarray:
        """float32[B] scores; -inf for infeasible structures."""
        return self._score_jit(adj)
