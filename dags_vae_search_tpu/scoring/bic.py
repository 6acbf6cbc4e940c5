"""Public scoring API — the TPU replacement for ``BNLearnWrapper``.

Reference behavior (``src/problem/bn/bnlearn.py:10-61``): construct a scorer
bound to a (dataset, metric) pair, then ``score(graph)`` one igraph at a time
via an R subprocess.  Here the scorer is bound to a device-resident coded
dataset and scores whole *batches* of adjacency tensors per jitted call.

Label semantics match the reference: a candidate graph's vertex labels index
the dataset columns, so the structure scored is the label-relabeled graph
(``bnlearn.py:38-44``).  ``score_labeled`` performs that permutation
on-device before scoring.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.ops import bic_xla
from dags_vae_search_tpu.scoring.datasets import DiscreteDataset


def relabel_to_columns(labels: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Permute adjacency so vertex with label L lands at row/col L.

    Tensor analogue of the reference's reindex-by-label step
    (``bnlearn.py:38-42``): returns ``adj'`` with
    ``adj'[b, labels[v], labels[w]] = adj[b, v, w]``.
    Assumes labels are a permutation of 0..n-1 (asserted by the reference).
    """
    n = adj.shape[-1]
    perm = jax.nn.one_hot(labels, n, dtype=adj.dtype)  # [B, n, n], P[v, L]
    # adj' = P^T adj P
    return jnp.einsum("bvl,bvw,bwm->blm", perm, adj, perm)


class BicScorer:
    """Batched decomposable-score evaluator bound to one discrete dataset.

    Parameters
    ----------
    dataset: integer-coded discrete data (see ``scoring.datasets``).
    metric: 'bic' | 'aic' | 'loglik' — bnlearn ``type=`` parity.
    max_parents: in-degree cap (None = only the q_cap feasibility bound).
    q_cap: static parent-configuration-space cap; defaults to
      ``r_max ** min(max_parents, n-1)`` capped at 4096.
    impl: 'auto' (pallas on TPU, xla elsewhere), 'xla', 'pallas', or
      'pallas_interpret' (kernel correctness-checking on CPU).
    """

    def __init__(
        self,
        dataset: DiscreteDataset,
        metric: str = "bic",
        max_parents: Optional[int] = None,
        q_cap: Optional[int] = None,
        impl: str = "auto",
    ):
        self.dataset = dataset
        self.metric = metric
        self.max_parents = max_parents
        n = dataset.num_variables
        r_max = int(dataset.cards.max())
        if q_cap is None:
            p = n - 1 if max_parents is None else min(max_parents, n - 1)
            q_cap = min(int(r_max**p), 4096)
        self.q_cap = int(q_cap)
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.impl = impl

        self._codes = jnp.asarray(dataset.codes, dtype=jnp.int32)
        self._cards = jnp.asarray(dataset.cards, dtype=jnp.int32)
        # Unique-row compression: contingency work scales with the number of
        # *distinct* dataset rows (<= prod cards; asia: 5000 cases -> <=256).
        codes_u, weights = np.unique(dataset.codes, axis=0, return_counts=True)
        self.num_unique_rows = codes_u.shape[0]
        self._codes_u = jnp.asarray(codes_u, dtype=jnp.int32)
        self._weights = jnp.asarray(weights, dtype=jnp.float32)

        if impl.startswith("pallas"):
            from dags_vae_search_tpu.ops import bic_pallas

            pallas_fn = functools.partial(
                bic_pallas.score_dags_pallas,
                q_cap=self.q_cap,
                r_max=r_max,
                num_cases=dataset.num_cases,
                metric=self.metric,
                max_parents=self.max_parents,
                interpret=(impl == "pallas_interpret"),
            )
            self._score_fn = jax.jit(
                lambda adj: pallas_fn(adj, self._codes_u, self._weights, self._cards)
            )
        elif impl == "xla":
            xla_fn = functools.partial(
                bic_xla.score_dags,
                q_cap=self.q_cap,
                r_max=r_max,
                metric=self.metric,
                max_parents=self.max_parents,
            )
            self._score_fn = jax.jit(
                lambda adj: xla_fn(adj, self._codes, self._cards)
            )
        else:
            raise ValueError(f"unknown impl {impl!r}")

        self._counts_fn = jax.jit(
            functools.partial(
                bic_xla.contingency_counts, q_cap=self.q_cap, r_max=r_max
            )
        )
        node_fn = functools.partial(
            bic_xla.score_dags,
            q_cap=self.q_cap,
            r_max=r_max,
            metric=self.metric,
            max_parents=None,
            return_node_scores=True,
        )
        self._node_scores_fn = jax.jit(
            lambda adj: node_fn(adj, self._codes, self._cards)
        )

    def score_nodes(self, adj: jnp.ndarray) -> jnp.ndarray:
        """Per-node decomposable scores float32[B, n] (no feasibility
        masking) — the primitive behind family enumeration / exact DP."""
        return self._node_scores_fn(adj)

    def score(self, adj: jnp.ndarray) -> jnp.ndarray:
        """Score candidate structures. adj: float[B, n, n] -> float32[B].

        All-float32, all-on-device: the search hot path (absolute error
        ~1e-3 on |BIC| ~ 1e4, far below the resolution needed to rank
        candidate structures).
        """
        return self._score_fn(adj)

    def score_exact(self, adj: jnp.ndarray, chunk: int = 1024) -> np.ndarray:
        """Golden-parity scoring: exact device counts + float64 entropy.

        Matches R bnlearn ``score(type=...)`` to ~1e-9 relative (reference
        golden: asia BIC -13331.093616667435,
        ``tests/problem/bn/test_bnlearn.py:55``).  Feasibility (q_cap /
        max_parents) is applied as in :meth:`score`.
        """
        adj = jnp.asarray(adj)
        out = []
        for start in range(0, adj.shape[0], chunk):
            block = adj[start : start + chunk]
            counts, q = self._counts_fn(block, self._codes, self._cards)
            scores = bic_xla.score_from_counts_np(
                counts, q, self.dataset.cards, self.dataset.num_cases, self.metric
            )
            q_np = np.asarray(q)
            feasible = np.all(q_np <= float(self.q_cap), axis=-1)
            if self.max_parents is not None:
                indeg = np.asarray(block).sum(axis=1)
                feasible &= np.all(indeg <= self.max_parents, axis=-1)
            out.append(np.where(feasible, scores, -np.inf))
        return np.concatenate(out)

    def score_exact_sparse(self, adj: np.ndarray) -> np.ndarray:
        """Cap-free exact scoring on host: float64, any in-degree.

        ``score``/``score_exact`` allocate dense ``[B, n, q_cap, r]``
        contingency tables, so graphs whose parent-configuration space
        exceeds ``q_cap`` are infeasible (-inf).  Here the log-likelihood is
        computed over *observed* parent configurations only (``np.unique``
        group-by — at most ``num_cases`` groups regardless of in-degree),
        while the BIC/AIC penalty uses the analytic ``q = prod(parent
        cards)``, matching R bnlearn exactly (its penalty counts unobserved
        configurations too; their likelihood cells are zero and drop out).
        Slow-path scorer for dense corpus graphs (e.g. ``stage_roundtrip``
        on alarm, where corpus in-degrees exceed any practical cap);
        search hot paths stay on :meth:`score`.
        """
        adj = np.asarray(adj)
        codes = np.asarray(self.dataset.codes)
        cards_i = np.asarray(self.dataset.cards, dtype=np.int64)
        cards = cards_i.astype(np.float64)
        num_cases = self.dataset.num_cases
        half_log_n = np.log(float(num_cases)) / 2.0

        def group_counts(cols: np.ndarray) -> np.ndarray:
            """Row-group sizes of codes[:, cols]: mixed-radix encode to one
            int64 key when the radix product fits (virtually always at
            max_parents <= ~30), else numpy's row-wise unique."""
            sub = codes[:, cols]
            radix = cards_i[cols]
            if np.prod(radix.astype(np.float64)) < 2**62:
                key = np.zeros(sub.shape[0], dtype=np.int64)
                for c in range(sub.shape[1]):
                    key = key * radix[c] + sub[:, c]
                return np.unique(key, return_counts=True)[1]
            return np.unique(sub, axis=0, return_counts=True)[1]

        out = np.zeros(adj.shape[0], dtype=np.float64)
        for b in range(adj.shape[0]):
            total = 0.0
            for i in range(adj.shape[-1]):
                parents = np.flatnonzero(adj[b, :, i] > 0)
                n_jk = group_counts(
                    np.concatenate([parents, [i]]).astype(np.int64)
                )
                if parents.size:
                    n_j = group_counts(parents.astype(np.int64))
                else:
                    n_j = np.asarray([num_cases])
                n_jk = n_jk.astype(np.float64)
                n_j = n_j.astype(np.float64)
                # sum_jk N_jk log(N_jk/N_j) regrouped as two entropy sums
                ll = float((n_jk * np.log(n_jk)).sum() - (n_j * np.log(n_j)).sum())
                q = float(np.prod(cards[parents])) if parents.size else 1.0
                df = (cards[i] - 1.0) * q
                if self.metric == "bic":
                    total += ll - df * half_log_n
                elif self.metric == "aic":
                    total += ll - df
                elif self.metric == "loglik":
                    total += ll
                elif self.metric == "bde":
                    from scipy.special import gammaln

                    iss = 1.0
                    a_jk = iss / (q * cards[i])
                    a_j = iss / q
                    total += float(
                        (gammaln(a_jk + n_jk) - gammaln(a_jk)).sum()
                        + (gammaln(a_j) - gammaln(a_j + n_j)).sum()
                    )
                else:
                    raise ValueError(f"unknown metric {self.metric!r}")
            out[b] = total
        return out

    def score_labeled(self, labels: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        """Score label-indexed graphs (vertex label = dataset column)."""
        return self.score(relabel_to_columns(labels, adj))

    def score_one(self, adj: np.ndarray) -> float:
        """Convenience scalar scorer (drop-in for ``BNLearnWrapper.score``)."""
        return float(self.score(jnp.asarray(adj)[None])[0])
