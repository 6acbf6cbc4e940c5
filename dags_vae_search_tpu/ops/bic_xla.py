"""Batched decomposable scoring (BIC / AIC / log-likelihood) in pure XLA.

Replaces the reference's per-candidate ``Rscript`` subprocess
(``src/problem/bn/bnlearn.py:46-54`` + ``bnlearn_score.R:29-40``) with a
fully batched on-device computation: thousands of candidate DAGs are scored
per dispatch instead of one per OS process.

The trick that makes the parent sets (which differ per candidate and per
node) shape-static: for child ``i`` of candidate ``b`` the *parent
configuration index* of every data case is a mixed-radix code

    cfg = sum_j stride[b, j, i] * codes[case, j]

where ``stride[b, j, i] = adj[b, j, i] * prod_{k < j, adj[b,k,i]=1} card_k``
— an exclusive masked cumulative product.  ``cfg`` for all (case, candidate,
node) triples is then ONE dense matmul ``codes @ strides`` that rides the
MXU.  Contingency counts follow from a flat segment-sum over
``cfg * r_max + child_code``, and the familiar closed forms give

    ll_i  = sum_{j,k} N_jk (log N_jk - log N_j)
    bic_i = ll_i - (card_i - 1) * q_i * log(N)/2        (bnlearn type="bic")
    aic_i = ll_i - (card_i - 1) * q_i                   (bnlearn type="aic")

Candidates whose parent-configuration space exceeds the static cap
``q_cap`` (or whose in-degree exceeds ``max_parents``) score ``-inf`` — in
structure search the sparsity prior makes such candidates uncompetitive
anyway (reference README's density caps, ``README.md:53-58``).

A Pallas kernel for the contingency stage lives in ``ops/bic_pallas.py``;
this module is the reference implementation and the fallback for interpret
mode / CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def parent_config_strides(adj: jnp.ndarray, cards: jnp.ndarray):
    """Mixed-radix strides + config-space sizes for every (candidate, node).

    adj: float[B, n, n] (``adj[b, j, i] = 1`` iff j is a parent of i);
    cards: int[n].
    Returns (strides float32[B, n, n], q float32[B, n]) where
    ``q[b, i]`` = product of parent cardinalities of node i (1 if none).
    """
    mask = adj > 0
    factors = jnp.where(mask, cards[None, :, None].astype(jnp.float32), 1.0)
    inclusive = jnp.cumprod(factors, axis=1)
    exclusive = jnp.concatenate(
        [jnp.ones_like(inclusive[:, :1, :]), inclusive[:, :-1, :]], axis=1
    )
    strides = jnp.where(mask, exclusive, 0.0)
    q = inclusive[:, -1, :]
    return strides, q


def _contingency_counts(
    codes_f32: jnp.ndarray,  # float32[C, n]
    codes_i32: jnp.ndarray,  # int32[C, n]
    strides: jnp.ndarray,  # float32[B, n, n]
    q_cap: int,
    r_max: int,
) -> jnp.ndarray:
    """Counts N_jk: float32[B, n, q_cap, r_max] via matmul + segment sum."""
    num_cases = codes_f32.shape[0]
    # One MXU matmul: configs[c, b, i] for all cases x candidates x nodes.
    configs = jnp.einsum(
        "cm,bmi->bic", codes_f32, strides, preferred_element_type=jnp.float32
    )
    configs = jnp.clip(configs, 0.0, float(q_cap - 1)).astype(jnp.int32)
    child = codes_i32.T[None, :, :]  # [1, n, C]
    seg = configs * r_max + child  # [B, n, C]

    count_one = functools.partial(
        jax.ops.segment_sum, num_segments=q_cap * r_max
    )
    ones = jnp.ones((num_cases,), dtype=jnp.float32)
    counts = jax.vmap(jax.vmap(lambda s: count_one(ones, s)))(seg)
    return counts.reshape(*seg.shape[:2], q_cap, r_max)


def node_scores_from_counts(
    counts: jnp.ndarray,  # float32[B, n, Q, r]
    q: jnp.ndarray,  # float32[B, n] — actual parent-config counts
    cards: jnp.ndarray,  # int32[n]
    num_cases: int,
    metric: str = "bic",
    iss: float = 1.0,
) -> jnp.ndarray:
    """Per-node decomposable scores [B, n] from contingency counts.

    Metrics (bnlearn ``type=`` parity):
      'bic'    ll - (r-1) q log(N)/2
      'aic'    ll - (r-1) q
      'loglik' ll
      'bde'    BDeu with imaginary sample size ``iss``:
               sum_j [lgamma(a_j) - lgamma(a_j + N_j)
                      + sum_k (lgamma(a_jk + N_jk) - lgamma(a_jk))],
               a_j = iss/q, a_jk = iss/(q r) — over the q observed-support
               parent configurations (cells beyond q have N=0 and cancel).
    """
    cards_f = cards.astype(jnp.float32)
    n_j = jnp.sum(counts, axis=-1, keepdims=True)

    if metric == "bde":
        from jax.scipy.special import gammaln

        q_cap, r_max = counts.shape[-2], counts.shape[-1]
        # active-cell masks: configs < q, child values < r_i
        cfg_idx = jnp.arange(q_cap, dtype=jnp.float32)[None, None, :, None]
        val_idx = jnp.arange(r_max, dtype=jnp.float32)[None, None, None, :]
        active = (cfg_idx < q[..., None, None]) & (
            val_idx < cards_f[None, :, None, None]
        )
        a_jk = iss / (q * cards_f[None, :])  # [B, n]
        a_jk_b = a_jk[..., None, None]
        a_j = (iss / q)[..., None, None]
        cell = jnp.where(
            active, gammaln(a_jk_b + counts) - gammaln(a_jk_b), 0.0
        )
        row_active = cfg_idx[..., 0] < q[..., None]  # [B, n, Q]
        row = jnp.where(
            row_active,
            gammaln(a_j[..., 0]) - gammaln(a_j[..., 0] + n_j[..., 0]),
            0.0,
        )
        return jnp.sum(cell, axis=(-2, -1)) + jnp.sum(row, axis=-1)

    safe = counts > 0
    # log(N_jk / N_j) on the ratio (not as a difference of large logs):
    # the ratio is in (0, 1], so float32 log keeps ~1e-7 relative accuracy
    # per cell instead of absolute ~1e-3 from log(count) cancellation.
    ratio = jnp.where(safe, counts, 1.0) / jnp.where(n_j > 0, n_j, 1.0)
    log_ratio = jnp.where(safe, jnp.log(ratio), 0.0)
    ll = jnp.sum(counts * log_ratio, axis=(-2, -1))  # [B, n]

    df = (cards_f[None, :] - 1.0) * q  # [B, n]
    if metric == "bic":
        return ll - df * (jnp.log(float(num_cases)) / 2.0)
    if metric == "aic":
        return ll - df
    if metric == "loglik":
        return ll
    raise ValueError(f"unknown metric {metric!r}")


def score_dags(
    adj: jnp.ndarray,
    codes: jnp.ndarray,
    cards: jnp.ndarray,
    q_cap: int,
    r_max: int,
    metric: str = "bic",
    max_parents: int | None = None,
    node_mask: jnp.ndarray | None = None,
    return_node_scores: bool = False,
) -> jnp.ndarray:
    """Score a batch of candidate DAGs against a discrete dataset.

    adj:   float[B, n, n] — candidate structures (j -> i edges).
    codes: int32[C, n]    — integer-coded dataset (device-resident).
    cards: int32[n]       — per-variable cardinalities.
    q_cap: static parent-configuration cap (counts tensor is [B,n,q_cap,r]).
    r_max: static max cardinality across variables.
    metric: 'bic' | 'aic' | 'loglik' (bnlearn ``type=`` parity).
    max_parents: optional in-degree cap; violators score -inf.
    node_mask: optional bool[n] — score only these nodes (decomposability
      lets callers re-score just the nodes whose parent sets changed).

    Returns float32[B] scores (natural log, higher is better).
    """
    codes_f32 = codes.astype(jnp.float32)
    num_cases = codes.shape[0]

    strides, q = parent_config_strides(adj, cards)
    counts = _contingency_counts(codes_f32, codes, strides, q_cap, r_max)
    node_scores = node_scores_from_counts(
        counts, q, cards, num_cases, metric
    )

    if node_mask is not None:
        node_scores = jnp.where(node_mask[None, :], node_scores, 0.0)
    if return_node_scores:
        return node_scores

    total = jnp.sum(node_scores, axis=-1)

    feasible = jnp.all(q <= float(q_cap), axis=-1)
    if max_parents is not None:
        indeg = jnp.sum(adj, axis=1)
        feasible &= jnp.all(indeg <= max_parents, axis=-1)
    return jnp.where(feasible, total, -jnp.inf)


def contingency_counts(
    adj: jnp.ndarray,
    codes: jnp.ndarray,
    cards: jnp.ndarray,
    q_cap: int,
    r_max: int,
):
    """Exact sufficient statistics for a candidate batch.

    Returns (counts float32[B, n, q_cap, r_max] — exact integers — and
    q float32[B, n]).  Used by the float64 host finisher in
    ``scoring.bic.BicScorer.score_exact`` for golden-parity scoring: the
    counts are exactly representable in f32 (N_cases < 2^24), so only the
    entropy reduction needs higher precision.
    """
    strides, q = parent_config_strides(adj, cards)
    counts = _contingency_counts(
        codes.astype(jnp.float32), codes, strides, q_cap, r_max
    )
    return counts, q


def score_from_counts_np(counts, q, cards, num_cases, metric="bic", iss=1.0):
    """float64 host finisher: counts[B,n,Q,r], q[B,n] -> scores[B]."""
    import numpy as np

    counts = np.asarray(counts, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    cards = np.asarray(cards, dtype=np.float64)
    n_j = counts.sum(-1, keepdims=True)

    if metric == "bde":
        from scipy.special import gammaln

        a_jk = (iss / (q * cards[None, :]))[..., None, None]
        a_j = (iss / q)[..., None, None]
        cell = np.where(
            counts > 0, gammaln(a_jk + counts) - gammaln(a_jk), 0.0
        )
        row = np.where(
            n_j > 0, gammaln(a_j) - gammaln(a_j + n_j), 0.0
        )
        node_scores = cell.sum((-2, -1)) + row.sum((-2, -1))
        return node_scores.sum(-1)

    safe = counts > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        log_ratio = np.where(
            safe, np.log(np.where(safe, counts, 1.0)) - np.log(np.where(n_j > 0, n_j, 1.0)), 0.0
        )
    ll = (counts * log_ratio).sum((-2, -1))
    df = (cards[None, :] - 1.0) * q
    if metric == "bic":
        node_scores = ll - df * (np.log(float(num_cases)) / 2.0)
    elif metric == "aic":
        node_scores = ll - df
    elif metric == "loglik":
        node_scores = ll
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return node_scores.sum(-1)
