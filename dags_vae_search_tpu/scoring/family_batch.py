"""Batched *family* scoring: score(child, parent-set) for arbitrary family
lists, independent of any enclosing graph.

The decomposability the exact DP (``search/exact.py``) and the family table
(``scoring/family_table.py``) exploit, packaged for sparse/huge nets: a
single-edge structure move changes exactly one or two family scores, so a
hill climber needs ``score(child, parents ∪ {x})`` for many (child, x)
pairs — NOT full [B, n, n] candidate adjacencies.  At link scale (n = 724)
the dense candidate form is O(n^4) memory and O(n^3) flops per candidate;
a family is O(max_parents) — this module makes large-n structure search
tractable (reference scale anchor: ``/root/reference/README.md:39-44``).

Families are (child int32, parents int32[P] padded with -1).  Parent
configuration codes are mixed-radix like ``ops/bic_xla.py`` but computed by
gather over the P parent columns instead of a dense [n] matmul: cost
O(cases · F · P) instead of O(cases · F · n) — the win is ~n/P (≈ 80x at
link with P = 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.scoring.datasets import DiscreteDataset


class FamilyBatchScorer:
    """Scores batches of (child, padded-parent-list) families.

    Feasibility: families whose parent-config space exceeds ``q_cap`` score
    -inf (same contract as ``BicScorer``); the in-degree cap is the
    caller's job (the parent list is explicit).
    """

    def __init__(
        self,
        dataset: DiscreteDataset,
        metric: str = "bic",
        max_parents: int = 8,
        q_cap: int | None = None,
    ):
        self.dataset = dataset
        self.metric = metric
        self.max_parents = int(max_parents)
        n = dataset.num_variables
        r_max = int(dataset.cards.max())
        if q_cap is None:
            q_cap = min(int(r_max ** min(self.max_parents, n - 1)), 4096)
        self.q_cap = int(q_cap)
        self.r_max = r_max
        self.num_cases = dataset.num_cases

        # Unique-row compression (same trick as BicScorer): contingency
        # work scales with distinct rows, counts use the multiplicities.
        codes_u, weights = np.unique(dataset.codes, axis=0, return_counts=True)
        # Pad a sentinel column (index n) of zeros so parent slot -1 -> n
        # contributes stride 0 * code 0.
        codes_pad = np.concatenate(
            [codes_u, np.zeros((codes_u.shape[0], 1), codes_u.dtype)], axis=1
        )
        self._codes_pad = jnp.asarray(codes_pad, dtype=jnp.int32)
        self._weights = jnp.asarray(weights, dtype=jnp.float32)
        self._cards = jnp.asarray(dataset.cards, dtype=jnp.int32)
        self._score_jit = jax.jit(
            functools.partial(
                _score_families,
                q_cap=self.q_cap,
                r_max=self.r_max,
                num_cases=self.num_cases,
                metric=self.metric,
            )
        )

    def score(
        self, children: jnp.ndarray, parents: jnp.ndarray
    ) -> jnp.ndarray:
        """children int32[F], parents int32[F, P] (pad = -1) -> float32[F]."""
        return self._score_jit(
            jnp.asarray(children, jnp.int32),
            jnp.asarray(parents, jnp.int32),
            self._codes_pad,
            self._weights,
            self._cards,
        )

    def score_chunked(
        self, children: np.ndarray, parents: np.ndarray, chunk: int = 4096
    ) -> np.ndarray:
        """Host-chunked scoring for very large family lists (fixed-shape
        dispatches; every chunk — including a short-input call — is padded
        to exactly ``chunk`` families).  The fixed, lane-aligned dispatch
        shape matters more than the wasted pad lanes: XLA compile time for
        this kernel is pathological at odd F (measured 372 s at F=223 vs
        37 s at F=4096 on v5e), and one shape means one compile per scorer
        no matter how callers slice their family lists."""
        children = np.asarray(children, np.int32)
        parents = np.asarray(parents, np.int32)
        total = children.shape[0]
        out = np.empty(total, np.float32)
        for start in range(0, total, chunk):
            end = min(start + chunk, total)
            c = children[start:end]
            p = parents[start:end]
            if end - start < chunk:
                pad = chunk - (end - start)
                c = np.concatenate([c, np.zeros(pad, np.int32)])
                p = np.concatenate(
                    [p, np.full((pad, parents.shape[1]), -1, np.int32)]
                )
            out[start:end] = np.asarray(self.score(c, p))[: end - start]
        return out


def _score_families(
    children: jnp.ndarray,  # int32[F]
    parents: jnp.ndarray,  # int32[F, P], -1 = empty slot
    codes_pad: jnp.ndarray,  # int32[C, n+1] (last column zeros)
    weights: jnp.ndarray,  # float32[C] unique-row multiplicities
    cards: jnp.ndarray,  # int32[n]
    q_cap: int,
    r_max: int,
    num_cases: int,
    metric: str,
) -> jnp.ndarray:
    n = cards.shape[0]
    valid = parents >= 0
    pidx = jnp.where(valid, parents, n)  # sentinel column
    pcards = jnp.where(valid, cards[parents % n], 1).astype(jnp.float32)

    # Mixed-radix strides over the P parent slots (exclusive cumprod).
    inclusive = jnp.cumprod(pcards, axis=1)
    exclusive = jnp.concatenate(
        [jnp.ones_like(inclusive[:, :1]), inclusive[:, :-1]], axis=1
    )
    strides = jnp.where(valid, exclusive, 0.0)  # [F, P]
    q = inclusive[:, -1]  # [F]

    # configs[f, c] = sum_p strides[f, p] * codes[c, parent_fp].
    # Statically unrolled over the P (<= max_parents + 1) slots so the peak
    # intermediate is one [F, C] plane, never [C, F, P].
    num_p = parents.shape[1]
    configs = jnp.zeros((children.shape[0], codes_pad.shape[0]), jnp.float32)
    for p in range(num_p):
        configs = configs + strides[:, p : p + 1] * (
            codes_pad[:, pidx[:, p]].T.astype(jnp.float32)
        )
    configs = jnp.clip(configs, 0.0, float(q_cap - 1)).astype(jnp.int32)

    child_codes = codes_pad[:, children].T  # [F, C]
    seg = configs * r_max + child_codes  # [F, C]
    count_one = functools.partial(
        jax.ops.segment_sum, num_segments=q_cap * r_max
    )
    counts = jax.vmap(lambda s: count_one(weights, s))(seg)
    counts = counts.reshape(-1, q_cap, r_max)  # [F, Q, r]

    n_j = jnp.sum(counts, axis=-1, keepdims=True)
    safe = counts > 0
    ratio = jnp.where(safe, counts, 1.0) / jnp.where(n_j > 0, n_j, 1.0)
    ll = jnp.sum(counts * jnp.where(safe, jnp.log(ratio), 0.0), axis=(-2, -1))

    r_child = cards[children].astype(jnp.float32)
    df = (r_child - 1.0) * q
    if metric == "bic":
        scores = ll - df * (jnp.log(float(num_cases)) / 2.0)
    elif metric == "aic":
        scores = ll - df
    elif metric == "loglik":
        scores = ll
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return jnp.where(q <= float(q_cap), scores, -jnp.inf)
