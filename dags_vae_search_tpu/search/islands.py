"""Island-parallel latent search across a device mesh.

Each island runs an independent CEM chain (own mean/sigma); the island axis
is sharded over the mesh's ``data`` axis so XLA places each island's decode
+ score on its own chip, and migration (periodically re-centering the worst
islands on the global best latent) becomes an ICI collective inserted by
SPMD partitioning.  On a single chip the same program runs all islands
locally — the code is mesh-shape agnostic.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.scoring.bic import BicScorer
from dags_vae_search_tpu.search.latent import SearchResult, decode_and_score


class IslandState(NamedTuple):
    mean: jnp.ndarray  # [I, nz]
    sigma: jnp.ndarray  # [I, nz]
    best_score: jnp.ndarray  # [I]
    best_z: jnp.ndarray  # [I, nz]
    best_labels: jnp.ndarray  # int32[I, n_real]
    best_adj: jnp.ndarray  # float32[I, n_real, n_real]


def island_cem_search(
    model: PaceVAE,
    variables,
    scorer: BicScorer,
    key: jax.Array,
    num_islands: int = 8,
    population: int = 256,
    iters: int = 20,
    elite_frac: float = 0.1,
    init_sigma: float = 1.0,
    sigma_floor: float = 0.05,
    smoothing: float = 0.5,
    migrate_every: int = 5,
    mesh: Optional[Mesh] = None,
    init_means: Optional[jnp.ndarray] = None,
    temperature_range: tuple = (1.0, 0.25),
    exploit_repeats: int = 32,
    basis: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
) -> SearchResult:
    """Multi-island CEM with periodic best-latent migration.

    Decode temperature anneals linearly over ``temperature_range`` across
    iterations (explore with the training distribution, exploit with a
    near-mode decode late); the temperature is a traced scalar so the whole
    schedule reuses one compiled iteration.  After the CEM loop an exploit
    phase re-decodes each island's incumbent best_z ``exploit_repeats``
    times at low temperature — the sampling decoder is stochastic, so the
    best structure reachable from a good latent is usually found by
    repeated sharp decodes rather than by one lucky population draw.

    ``basis`` ([k, nz], orthonormal rows) + ``center`` ([nz]) restrict the
    search to an affine subspace of the latent space: the CEM mean/sigma
    live in k-dim coordinates and candidates decode at ``center + c @
    basis``.  Diagonal CEM cannot estimate a useful sampling distribution
    in ~900-dim latent spaces from ~50 elites per iteration (the r4 cold
    gap, VERDICT weak #2); the corpus latents' top principal components are
    where the decoder's data manifold actually lives, so a ~64-dim PCA
    subspace makes the cold search well-posed.  ``init_means``,
    ``init_sigma`` and ``sigma_floor`` are then in coordinate space
    (per-dimension vectors allowed).
    """
    nz = model.latent_size
    dim = int(basis.shape[0]) if basis is not None else nz
    n_elite = max(1, int(population * elite_frac))

    def to_full(coords: jnp.ndarray) -> jnp.ndarray:
        if basis is None:
            return coords
        return center + jnp.dot(
            coords, basis, preferred_element_type=jnp.float32
        )

    mean0 = (
        jnp.zeros((num_islands, dim)) if init_means is None else init_means
    )
    n_real = model.num_real_vertices
    state = IslandState(
        mean=mean0,
        sigma=jnp.broadcast_to(
            jnp.asarray(init_sigma, jnp.float32), (num_islands, dim)
        ),
        best_score=jnp.full((num_islands,), -jnp.inf),
        best_z=jnp.zeros((num_islands, dim)),  # coord space when basis given
        best_labels=jnp.zeros((num_islands, n_real), jnp.int32),
        best_adj=jnp.zeros((num_islands, n_real, n_real)),
    )
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
        state = jax.tree.map(lambda x: jax.device_put(x, shard), state)

    def iteration(state: IslandState, key, temp, migrate: bool):
        k_z, k_d = jax.random.split(key)
        noise = jax.random.normal(k_z, (num_islands, population, dim))
        z = state.mean[:, None, :] + state.sigma[:, None, :] * noise
        flat_z = z.reshape(num_islands * population, dim)
        scores, labels, adj = decode_and_score(
            model, variables, scorer, to_full(flat_z), k_d, temperature=temp
        )
        scores = scores.reshape(num_islands, population)
        labels = labels.reshape(num_islands, population, -1)
        adj = adj.reshape(num_islands, population, adj.shape[-2], adj.shape[-1])

        elite_scores, elite_idx = jax.lax.top_k(scores, n_elite)
        elite = jnp.take_along_axis(z, elite_idx[..., None], axis=1)
        new_mean = jnp.mean(elite, axis=1)
        new_sigma = jnp.std(elite, axis=1) + 1e-6
        mean = smoothing * new_mean + (1 - smoothing) * state.mean
        sigma = jnp.maximum(
            smoothing * new_sigma + (1 - smoothing) * state.sigma, sigma_floor
        )

        iter_best = elite_scores[:, 0]
        iter_best_z = elite[:, 0, :]
        top_idx = elite_idx[:, 0]
        iter_labels = jnp.take_along_axis(
            labels, top_idx[:, None, None], axis=1
        )[:, 0]
        iter_adj = jnp.take_along_axis(
            adj, top_idx[:, None, None, None], axis=1
        )[:, 0]
        improved = iter_best > state.best_score
        best_score = jnp.where(improved, iter_best, state.best_score)
        best_z = jnp.where(improved[:, None], iter_best_z, state.best_z)
        best_labels = jnp.where(
            improved[:, None], iter_labels, state.best_labels
        )
        best_adj = jnp.where(
            improved[:, None, None], iter_adj, state.best_adj
        )

        if migrate:
            # Global best (a cross-island all-reduce on a sharded axis)
            # replaces the WORST island's search center.
            g_idx = jnp.argmax(best_score)
            g_z = best_z[g_idx]
            w_idx = jnp.argmin(best_score)
            mean = mean.at[w_idx].set(g_z)
            sigma = sigma.at[w_idx].set(
                jnp.broadcast_to(
                    jnp.asarray(init_sigma, jnp.float32) * 0.5, (dim,)
                )
            )

        return IslandState(mean, sigma, best_score, best_z, best_labels, best_adj)

    step_plain = jax.jit(lambda s, k, t: iteration(s, k, t, False))
    step_migrate = jax.jit(lambda s, k, t: iteration(s, k, t, True))

    t_hi, t_lo = temperature_range
    history = []
    for it in range(iters):
        key, sub = jax.random.split(key)
        frac = it / max(iters - 1, 1)
        temp = jnp.asarray(t_hi + (t_lo - t_hi) * frac, jnp.float32)
        step = step_migrate if (it + 1) % migrate_every == 0 else step_plain
        state = step(state, sub, temp)
        history.append(float(jnp.max(state.best_score)))

    evals = iters * num_islands * population
    if exploit_repeats > 0:
        # Sharp re-decodes of every island's incumbent latent; fold any
        # improvement back into the island state before the final argmax.
        rep_z = jnp.repeat(state.best_z, exploit_repeats, axis=0)
        key, k_d = jax.random.split(key)
        scores, labels, adj = decode_and_score(
            model, variables, scorer, to_full(rep_z), k_d,
            temperature=jnp.asarray(min(t_lo, 0.1), jnp.float32),
        )
        evals += rep_z.shape[0]
        scores = scores.reshape(num_islands, exploit_repeats)
        labels = labels.reshape(num_islands, exploit_repeats, -1)
        adj = adj.reshape(
            num_islands, exploit_repeats, adj.shape[-2], adj.shape[-1]
        )
        r_best = jnp.argmax(scores, axis=1)
        r_score = jnp.take_along_axis(scores, r_best[:, None], axis=1)[:, 0]
        improved = r_score > state.best_score
        state = state._replace(
            best_score=jnp.where(improved, r_score, state.best_score),
            best_labels=jnp.where(
                improved[:, None],
                jnp.take_along_axis(labels, r_best[:, None, None], axis=1)[:, 0],
                state.best_labels,
            ),
            best_adj=jnp.where(
                improved[:, None, None],
                jnp.take_along_axis(
                    adj, r_best[:, None, None, None], axis=1
                )[:, 0],
                state.best_adj,
            ),
        )
        history.append(float(jnp.max(state.best_score)))

    g_idx = int(jnp.argmax(state.best_score))
    return SearchResult(
        best_score=float(state.best_score[g_idx]),
        best_labels=np.asarray(state.best_labels[g_idx]),
        best_adj=np.asarray(state.best_adj[g_idx]),
        best_z=np.asarray(to_full(state.best_z[g_idx])),
        num_evals=evals,
        history=history,
    )
