"""Latent-space structure search — the capability the reference names itself
after but never implements (its terminal artifact is one encode -> GP-predict
-> decode round trip, ``experiments/00_bn_asia_200k/main.py:86-104``).

All strategies are batched over thousands of candidates per device step:

- :func:`decode_and_score` — the core primitive: z batch -> sampling decode
  -> label-permuted on-device BIC; invalid decodes score -inf.
- :func:`random_search` — prior/posterior sampling baseline.
- :func:`cem_search` — cross-entropy method over z: sample population,
  decode+score, refit mean/sigma on the elite set.
- :func:`gp_ascent_search` — surrogate-guided: vmapped Adam ascent on the
  (differentiable) GP posterior mean or UCB over z, then decode+score the
  optimized points with the real scorer.

Cross-chip island parallelism lives in ``search/islands.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.models.decode import decode_to_labeled
from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.scoring.bic import BicScorer, relabel_to_columns


class SearchResult(NamedTuple):
    best_score: float
    best_labels: np.ndarray  # int32[n]
    best_adj: np.ndarray  # float32[n, n]
    best_z: np.ndarray  # float32[nz]
    num_evals: int
    history: list  # per-iteration best score


def decode_and_score(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    z: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scores float32[B] (-inf for invalid decodes), labels, adj.

    A scoreable candidate must assign every dataset column exactly once —
    the reference asserts the same before its R call (``bnlearn.py:32-35``).
    Decodes with duplicate/missing labels would alias vertices under the
    label permutation and score a bogus merged structure, so they get -inf.
    """
    recon, valid = decode_to_labeled(
        model, variables, z, rng, temperature=temperature
    )
    if model.real_label_cardinality == 1:
        # Unlabeled corpora (e.g. synthetic_12): slot i IS column i.
        scores = jnp.where(valid, scorer.score(recon.adj), -jnp.inf)
        return scores, recon.labels, recon.adj
    n = recon.labels.shape[-1]
    label_counts = jnp.sum(
        jax.nn.one_hot(recon.labels, n, dtype=jnp.float32), axis=1
    )
    is_permutation = jnp.all(label_counts == 1.0, axis=-1)
    relabeled = relabel_to_columns(recon.labels, recon.adj)
    scores = scorer.score(relabeled)
    scores = jnp.where(valid & is_permutation, scores, -jnp.inf)
    return scores, recon.labels, recon.adj


def _update_best(best, scores, labels, adj, z):
    idx = int(jnp.argmax(scores))
    score = float(scores[idx])
    if best is None or score > best.best_score:
        return SearchResult(
            best_score=score,
            best_labels=np.asarray(labels[idx]),
            best_adj=np.asarray(adj[idx]),
            best_z=np.asarray(z[idx]),
            num_evals=0,
            history=[],
        )
    return best


def random_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    key: jax.Array,
    rounds: int = 10,
    batch: int = 1024,
    sigma: float = 1.0,
    z_center: Optional[jnp.ndarray] = None,
) -> SearchResult:
    """Sample z ~ N(center, sigma^2), decode, score; repeat."""
    nz = model.latent_size
    center = jnp.zeros((nz,)) if z_center is None else z_center
    best = None
    history = []
    for r in range(rounds):
        key, k_z, k_d = jax.random.split(key, 3)
        z = center + sigma * jax.random.normal(k_z, (batch, nz))
        scores, labels, adj = decode_and_score(model, variables, scorer, z, k_d)
        best = _update_best(best, scores, labels, adj, z)
        history.append(best.best_score)
    return best._replace(num_evals=rounds * batch, history=history)


def cem_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    key: jax.Array,
    iters: int = 20,
    population: int = 1024,
    elite_frac: float = 0.1,
    init_mean: Optional[jnp.ndarray] = None,
    init_sigma: float = 1.0,
    sigma_floor: float = 0.05,
    smoothing: float = 0.5,
) -> SearchResult:
    """Cross-entropy method over the latent space."""
    nz = model.latent_size
    mean = jnp.zeros((nz,)) if init_mean is None else init_mean
    sigma = jnp.full((nz,), init_sigma)
    n_elite = max(1, int(population * elite_frac))
    best = None
    history = []

    for it in range(iters):
        key, k_z, k_d = jax.random.split(key, 3)
        z = mean + sigma * jax.random.normal(k_z, (population, nz))
        scores, labels, adj = decode_and_score(model, variables, scorer, z, k_d)
        best = _update_best(best, scores, labels, adj, z)
        history.append(best.best_score)

        # Elite refit (invalid -inf scores sink to the bottom automatically).
        _, elite_idx = jax.lax.top_k(scores, n_elite)
        elite = z[elite_idx]
        new_mean = jnp.mean(elite, axis=0)
        new_sigma = jnp.std(elite, axis=0) + 1e-6
        mean = smoothing * new_mean + (1 - smoothing) * mean
        sigma = jnp.maximum(
            smoothing * new_sigma + (1 - smoothing) * sigma, sigma_floor
        )

    return best._replace(num_evals=iters * population, history=history)


def column_adj_to_labeled(
    adj: np.ndarray, rng: Optional[np.random.Generator] = None
):
    """Column-space DAG -> (labels, slot-indexed adj) for encoding.

    The scorer works in dataset-column space; the VAE works on
    topologically-indexed labeled graphs.  Topologically sort the columns
    and carry the column identity as the vertex label (host-side, small).

    Pass ``rng`` to randomize topological tie-breaking: corpus labels are
    independent random permutations, so a deterministic (sorted) order
    correlates label with position and pushes the encoded anchor out of the
    training distribution.
    """
    adj = np.asarray(adj)
    n = adj.shape[0]
    indeg = adj.sum(0).copy()
    order = []
    ready = [v for v in range(n) if indeg[v] == 0]
    while ready:
        pick = int(rng.integers(len(ready))) if rng is not None else 0
        v = ready.pop(pick)
        order.append(v)
        for w in np.flatnonzero(adj[v] > 0):
            indeg[w] -= 1
            if indeg[w] == 0:
                ready.append(int(w))
    if len(order) != n:
        raise ValueError("adjacency is not a DAG")
    order = np.asarray(order)
    labels = order.astype(np.int32)
    sorted_adj = adj[np.ix_(order, order)].astype(np.float32)
    return labels, sorted_adj


def refine_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    anchors_labels: jnp.ndarray,  # int32[A, n] labeled anchor graphs
    anchors_adj: jnp.ndarray,  # float32[A, n, n]
    key: jax.Array,
    iters: int = 15,
    population: int = 512,
    sigma_scale: float = 0.25,
) -> SearchResult:
    """Local latent refinement around incumbent structures.

    Encodes the anchors (e.g. hill-climb winners, best corpus graphs) and
    runs CEM centered on each anchor latent with a small initial sigma —
    the hybrid that couples discrete search with the learned latent space.
    """
    mus, _ = model.apply(
        variables, anchors_labels, anchors_adj, method=PaceVAE.encode
    )
    spread = float(jnp.mean(jnp.std(mus, axis=0))) if mus.shape[0] > 1 else 1.0
    # Per-anchor incumbent scores, updated as anchors are re-centered;
    # re-centering always evicts the currently-worst anchor.
    if model.real_label_cardinality == 1:
        anchor_cols = anchors_adj
    else:
        anchor_cols = relabel_to_columns(anchors_labels, anchors_adj)
    anchor_scores = np.asarray(scorer.score(anchor_cols)).copy()
    best = None
    history = []
    evals = 0
    per_anchor = max(population // max(mus.shape[0], 1), 16)
    for it in range(iters):
        key, k_z, k_d = jax.random.split(key, 3)
        noise = jax.random.normal(k_z, (mus.shape[0], per_anchor, mus.shape[1]))
        z = (mus[:, None, :] + sigma_scale * spread * noise).reshape(
            -1, mus.shape[1]
        )
        scores, labels, adj = decode_and_score(model, variables, scorer, z, k_d)
        best = _update_best(best, scores, labels, adj, z)
        history.append(best.best_score)
        evals += z.shape[0]
        # re-center the worst anchor on the best found latent
        if np.isfinite(best.best_score) and best.best_score > anchor_scores.min():
            worst = int(np.argmin(anchor_scores))
            mus = mus.at[worst].set(jnp.asarray(best.best_z))
            anchor_scores[worst] = best.best_score
    return best._replace(num_evals=evals, history=history)


def gp_ascent_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    gp,
    key: jax.Array,
    z_init: jnp.ndarray,  # [S, nz] starting points (e.g. encoded corpus mus)
    steps: int = 100,
    learning_rate: float = 0.05,
    ucb_beta: float = 0.0,
    decode_rounds: int = 4,
    trust_radius: Optional[float] = 0.5,
    include_init: bool = True,
) -> SearchResult:
    """Vmapped Adam ascent of the GP acquisition over z, then real scoring.

    acquisition(z) = posterior_mean(z) + ucb_beta * posterior_std(z),
    computed in standardized target space (monotone in the real score).

    The GP posterior is only trustworthy near its training latents, so the
    ascent is trust-region bounded: after every Adam step each point is
    projected back onto the L2 ball of radius ``trust_radius * sqrt(nz)``
    around its start (latents are ~unit-Gaussian per dim, so sqrt(nz) is the
    natural distance scale; pass ``trust_radius=None`` for unconstrained
    ascent).  With ``include_init`` the un-moved seeds are scored too, so the
    search can never return worse than decoding its own starting points.
    """
    import optax

    def acquisition(z_batch):
        mean, std = gp.posterior_mean_std(z_batch)
        return mean + ucb_beta * std

    opt = optax.adam(learning_rate)

    @jax.jit
    def ascend(z0):
        opt_state = opt.init(z0)
        radius = (
            trust_radius * jnp.sqrt(jnp.asarray(z0.shape[-1], jnp.float32))
            if trust_radius is not None
            else None
        )

        def step(carry, _):
            z, opt_state = carry
            val, grads = jax.value_and_grad(lambda q: -jnp.sum(acquisition(q)))(z)
            updates, opt_state = opt.update(grads, opt_state)
            z = optax.apply_updates(z, updates)
            if radius is not None:
                d = z - z0
                norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
                z = z0 + d * jnp.minimum(1.0, radius / jnp.maximum(norm, 1e-9))
            return (z, opt_state), val

        (z, _), _ = jax.lax.scan(step, (z0, opt_state), None, length=steps)
        return z

    z_opt = ascend(z_init)
    best = None
    history = []
    evals = 0
    batches = ([z_init] if include_init else []) + [z_opt] * decode_rounds
    for zb in batches:
        key, k_d = jax.random.split(key)
        scores, labels, adj = decode_and_score(model, variables, scorer, zb, k_d)
        best = _update_best(best, scores, labels, adj, zb)
        history.append(best.best_score)
        evals += zb.shape[0]
    return best._replace(num_evals=evals, history=history)
