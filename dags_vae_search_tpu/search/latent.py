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
- :func:`bo_search` — the closed BO loop the one-shot ascent lacks: fit GP
  on all scored (z, BIC) pairs so far -> ascend the UCB acquisition ->
  decode+score the batch -> append -> refit, for several rounds (the
  reference's surrogate exists to be *searched over*,
  ``src/predictors/gp.py:13-32``; this is that search).

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

    Decodes are in-degree-capped to the scorer's ``max_parents`` so every
    candidate is feasible under the scorer by construction (in-degree is
    invariant under the label relabeling, so the slot-space cap equals the
    column-space cap the scorer enforces).
    """
    recon, valid = decode_to_labeled(
        model,
        variables,
        z,
        rng,
        temperature=temperature,
        max_in_degree=getattr(scorer, "max_parents", None),
    )
    if model.real_label_cardinality == 1:
        # Unlabeled corpora (e.g. synthetic_12): slot i IS column i.
        scores = jnp.where(valid, scorer.score(recon.adj), -jnp.inf)
        return scores, recon.labels, recon.adj
    relabeled, is_permutation = _relabel_and_check(recon.labels, recon.adj)
    scores = scorer.score(relabeled)
    scores = jnp.where(valid & is_permutation, scores, -jnp.inf)
    return scores, recon.labels, recon.adj


@jax.jit
def _relabel_and_check(labels: jnp.ndarray, adj: jnp.ndarray):
    """(label-relabeled adjacency, is-a-permutation mask) in one dispatch."""
    n = labels.shape[-1]
    counts = jnp.sum(jax.nn.one_hot(labels, n, dtype=jnp.float32), axis=1)
    return relabel_to_columns(labels, adj), jnp.all(counts == 1.0, axis=-1)


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


def _ascend_acquisition(
    gp,
    z0: jnp.ndarray,
    steps: int,
    learning_rate: float,
    ucb_beta: float,
    trust_radius: Optional[float],
) -> jnp.ndarray:
    """Vmapped Adam ascent of UCB(z) = mean(z) + beta * std(z) over the GP
    posterior (standardized target space — monotone in the real score),
    trust-region projected onto the L2 ball of radius
    ``trust_radius * sqrt(nz)`` around each start."""
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

    return ascend(z0)


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
    """One-shot vmapped ascent of the GP acquisition over z + real scoring.

    The GP posterior is only trustworthy near its training latents, so the
    ascent is trust-region bounded (pass ``trust_radius=None`` for
    unconstrained ascent).  With ``include_init`` the un-moved seeds are
    scored too, so the search can never return worse than decoding its own
    starting points.  For the closed fit->ascend->score->refit loop use
    :func:`bo_search`.
    """
    z_opt = _ascend_acquisition(
        gp, z_init, steps, learning_rate, ucb_beta, trust_radius
    )
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


def bo_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    key: jax.Array,
    z_init: jnp.ndarray,  # [S, nz] seed latents (e.g. encoded corpus elites)
    extra_obs: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # (z, y) pairs
    rounds: int = 6,
    ascent_steps: int = 60,
    learning_rate: float = 0.05,
    ucb_beta: float = 1.0,
    trust_radius: Optional[float] = 0.5,
    explore_sigma: float = 0.25,
    gp_iters: int = 200,
    gp_refit_iters: int = 50,
    max_gp_points: int = 1536,
    acq_pool: int = 0,
    pool_sigma: float = 1.0,
) -> SearchResult:
    """Closed-loop batched Bayesian optimization over the latent space.

    The reference's surrogate exists to be *searched over*
    (``src/predictors/gp.py:13-32``) but the reference never closes the
    loop; :func:`gp_ascent_search` closes half of it (one ascent of a
    frozen GP).  This is the whole loop: every round

      1. fit an :class:`~..surrogate.gp.ExactGP` on ALL finite (z, BIC)
         pairs observed so far (capped at ``max_gp_points``: the top-scoring
         half plus a random half, so the model stays sharp near the
         incumbent without going blind elsewhere);
      2. ascend the UCB acquisition mean + beta*std from the current
         top-scoring latents (plus Gaussian-jittered copies — the batched
         stand-in for acquisition multi-start); with ``acq_pool`` > 0 the
         multi-start itself is chosen by POOLED acquisition optimization:
         draw a broad candidate pool (local jitter around the incumbents
         plus ``pool_sigma``-scaled jitter around random observed latents —
         the corpus encodings in ``extra_obs`` give the pool global
         coverage), rank the whole pool with one batched GP-UCB predict
         (surrogate calls are ~free next to real decode+score evals), and
         spend the round's real evals only on the top-ranked candidates.
         Plain ascent can never leave the seeds' basin — exactly why bo
         tied gp_ascent on every net in the r4/r5-early budget shoot-outs;
      3. decode + really score the ascended batch (-inf for infeasible);
      4. append the finite observations and refit next round.

    Returns the incumbent over everything scored, seeds included, so the
    floor is "decode the seeds" — it can only add to gp_ascent's result.
    """
    from dags_vae_search_tpu.surrogate.gp import ExactGP

    nz = z_init.shape[-1]
    # Seed observations: decode + really score the seeds (the incumbent must
    # always carry a decoded structure).  ``extra_obs`` supplies known real
    # (z, score) pairs (e.g. the predictor dataset: corpus-graph BICs at
    # their encodings) as EXTRA GP observations — free surrogate signal
    # without pretending the encoder round-trips exactly.
    key, k_d = jax.random.split(key)
    seed_scores, labels, adj = decode_and_score(
        model, variables, scorer, z_init, k_d
    )
    best = _update_best(None, seed_scores, labels, adj, z_init)
    evals = z_init.shape[0]
    zs = np.asarray(z_init, dtype=np.float32)
    ys = np.asarray(seed_scores, dtype=np.float64)
    if extra_obs is not None:
        zs = np.concatenate([zs, np.asarray(extra_obs[0], dtype=np.float32)])
        ys = np.concatenate([ys, np.asarray(extra_obs[1], dtype=np.float64)])
    history = [best.best_score]

    batch = z_init.shape[0]
    prev_params = None
    for r in range(rounds):
        finite = np.isfinite(ys)
        if finite.sum() < 2:
            # Not enough signal for a GP — fall back to sampling around the
            # best seed so the loop still makes progress.
            key, k_z, k_d = jax.random.split(key, 3)
            z_next = jnp.asarray(zs[np.argmax(ys)]) + explore_sigma * (
                jax.random.normal(k_z, (batch, nz))
            )
        else:
            zf, yf = zs[finite], ys[finite]
            if len(zf) > max_gp_points:
                top = np.argsort(-yf)[: max_gp_points // 2]
                rest = np.setdiff1d(np.arange(len(zf)), top)
                rng_np = np.random.default_rng(r)
                rand = rng_np.choice(
                    rest, size=max_gp_points - len(top), replace=False
                )
                pick = np.concatenate([top, rand])
                zf, yf = zf[pick], yf[pick]
            # Warm-started refit: round 0 pays the full hyperparameter
            # optimization; later rounds start from the previous optimum
            # and take a short polish (the refit dominated BO wall-clock
            # in r3 — 4.3 evals/s vs 27.6k/s raw decode+score throughput).
            gp = ExactGP().fit(
                zf,
                yf,
                iters=gp_iters if prev_params is None else gp_refit_iters,
                init=prev_params,
            )
            prev_params = gp.params
            # Multi-start: current top latents + jittered copies.
            n_top = max(batch // 2, 1)
            starts = zf[np.argsort(-yf)[:n_top]]
            key, k_j = jax.random.split(key)
            jitter = starts[
                np.arange(batch - len(starts)) % len(starts)
            ] + explore_sigma * np.asarray(
                jax.random.normal(k_j, (batch - len(starts), nz))
            )
            z0 = jnp.asarray(
                np.concatenate([starts, jitter]), dtype=jnp.float32
            )
            if acq_pool and acq_pool > batch:
                # Pooled acquisition optimization: half the pool explores
                # locally (explore_sigma around the incumbents), half
                # globally (pool_sigma around random observed latents),
                # then one batched UCB predict picks the real-eval batch.
                key, k_l, k_g, k_p = jax.random.split(key, 4)
                n_loc = acq_pool // 2
                loc = starts[
                    np.arange(n_loc) % len(starts)
                ] + explore_sigma * np.asarray(
                    jax.random.normal(k_l, (n_loc, nz))
                )
                anchors = zf[
                    np.asarray(
                        jax.random.randint(
                            k_p, (acq_pool - n_loc,), 0, len(zf)
                        )
                    )
                ]
                glb = anchors + pool_sigma * np.asarray(
                    jax.random.normal(k_g, (acq_pool - n_loc, nz))
                )
                pool = np.concatenate(
                    [np.asarray(z0), loc, glb], dtype=np.float32
                )
                mu, sd = gp.predict_with_std(pool)
                ucb = mu + ucb_beta * sd
                z0 = jnp.asarray(pool[np.argsort(-ucb)[:batch]])
            z_next = _ascend_acquisition(
                gp, z0, ascent_steps, learning_rate, ucb_beta, trust_radius
            )
        key, k_d = jax.random.split(key)
        scores, labels, adj = decode_and_score(
            model, variables, scorer, z_next, k_d
        )
        best = _update_best(best, scores, labels, adj, z_next)
        evals += z_next.shape[0]
        history.append(best.best_score)
        zs = np.concatenate([zs, np.asarray(z_next)])
        ys = np.concatenate([ys, np.asarray(scores, dtype=np.float64)])

    return best._replace(num_evals=evals, history=history)
