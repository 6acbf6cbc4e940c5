"""Batched greedy hill-climbing over structure space.

The classical BNSL baseline (and bnlearn's own default algorithm, i.e. what
the reference's R scorer would be driven by in practice).  With the batched
on-device scorer, ONE device dispatch evaluates every single-edge move —
addition, deletion, reversal (~3 n^2 candidates) — so a full climb to a
local optimum takes a handful of dispatches.  Serves both as a strong
search baseline and as the certified best-BIC reference for the latent
searchers.

Operates directly in dataset-column space (vertex i = variable i); general
adjacency with an explicit on-device acyclicity check (closure trace).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.graphs.dag import transitive_closure
from dags_vae_search_tpu.scoring.bic import BicScorer


class HillClimbResult(NamedTuple):
    best_score: float
    best_adj: np.ndarray
    iterations: int
    num_evals: int
    history: list
    # True = a real local optimum (no improving move left); False = the
    # iter/wall-clock budget expired mid-improvement.  Reports persist this
    # so RESULTS.md can say "converged" vs "budget-limited" from data.
    converged: bool = True
    # Optional wall-clock phase breakdown {phase: seconds} (delta climber:
    # scoring dispatches vs closure maintenance vs move selection).
    profile: Optional[dict] = None


def _move_candidates(adj: jnp.ndarray) -> jnp.ndarray:
    """All single-edge moves of one adjacency [n, n] -> [3*n*n, n, n].

    Slot layout: k = 0..n^2-1 additions (set a->b), n^2..2n^2-1 deletions,
    2n^2..3n^2-1 reversals.  Invalid moves (adding an existing edge,
    deleting a non-edge, cyclic results) are filtered by the caller's
    feasibility mask.
    """
    n = adj.shape[-1]
    eye_flat = jnp.eye(n * n)
    add = adj[None] + eye_flat.reshape(n * n, n, n)
    delete = adj[None] - eye_flat.reshape(n * n, n, n)
    reverse = (
        adj[None]
        - eye_flat.reshape(n * n, n, n)
        + eye_flat.reshape(n * n, n, n).transpose(0, 2, 1)
    )
    return jnp.concatenate([add, delete, reverse], axis=0)


def _feasible(adj: jnp.ndarray, cands: jnp.ndarray, offset=0) -> jnp.ndarray:
    """bool[len(cands)]: structurally valid (0/1, no self-loop, no 2-cycle)
    DAG moves; ``offset`` selects the window of the global move list that
    ``cands`` corresponds to."""
    n = adj.shape[-1]
    flat = adj.reshape(-1)
    has_edge = flat > 0
    has_reverse = adj.T.reshape(-1) > 0
    diag = jnp.eye(n, dtype=bool).reshape(-1)
    can_add = (~has_edge) & (~has_reverse) & (~diag)
    can_del = has_edge
    can_rev = has_edge & (~diag)
    structural = jnp.concatenate([can_add, can_del, can_rev])
    structural = jax.lax.dynamic_slice(
        structural, (offset,), (cands.shape[0],)
    )
    acyclic = jnp.trace(transitive_closure(cands), axis1=-2, axis2=-1) == 0
    return structural & acyclic


def perturb_dag(
    rng: np.random.Generator,
    adj: np.ndarray,
    delete_frac: float = 0.25,
    add_frac: float = 0.25,
    max_parents: Optional[int] = None,
) -> np.ndarray:
    """Random feasible perturbation of a DAG (basin-hopping kick).

    Deletes ``delete_frac`` of the edges at random, then adds about
    ``add_frac`` of the original edge count back as random
    acyclicity-preserving (and in-degree-feasible) edges, maintaining the
    reachability closure incrementally — O(n^2) per added edge.  Host-side
    numpy; used between hill-climb restarts to escape local optima.
    """
    adj = np.asarray(adj, dtype=np.float32).copy()
    n = adj.shape[0]
    edges = np.argwhere(adj > 0)
    m = len(edges)
    if m == 0:
        return adj
    k_del = max(1, int(round(delete_frac * m)))
    drop = edges[rng.choice(m, size=min(k_del, m), replace=False)]
    adj[drop[:, 0], drop[:, 1]] = 0.0

    # closure[u, v] = path u -> v (boolean, no self loops)
    reachf = (adj > 0).astype(np.float32)
    for _ in range(max(int(np.ceil(np.log2(max(n, 2)))), 1)):
        reachf = np.clip(reachf + reachf @ reachf, 0.0, 1.0)
    reach = reachf > 0
    indeg = adj.sum(axis=0)
    k_add = max(1, int(round(add_frac * m)))
    for _ in range(k_add):
        # candidate u -> v: no edge yet, u != v, no path v -> u, v has
        # spare parent capacity
        ok = (adj == 0) & ~np.eye(n, dtype=bool) & ~reach.T
        if max_parents is not None:
            ok &= (indeg < max_parents)[None, :]
        cand = np.argwhere(ok)
        if len(cand) == 0:
            break
        u, v = cand[rng.integers(len(cand))]
        adj[u, v] = 1.0
        indeg[v] += 1
        # new paths: (ancestors(u) + u) x (descendants(v) + v)
        src = reach[:, u].copy()
        src[u] = True
        dst = reach[v].copy()
        dst[v] = True
        reach |= np.outer(src, dst)
        reach[np.arange(n), np.arange(n)] = False
    return adj


def climb_with_restarts(
    climb,
    rng: np.random.Generator,
    restarts: int = 0,
    max_parents: Optional[int] = None,
    first: Optional[HillClimbResult] = None,
    tie_stop: int = 2,
    tie_tol: float = 1e-6,
) -> HillClimbResult:
    """Basin hopping: greedy climb + ``restarts`` perturb-and-reclimb kicks.

    ``climb(init_adj)`` runs one greedy climb (dense or family-delta).  Each
    restart perturbs the incumbent with a random kick strength and climbs
    again; the incumbent only ever improves.  bnlearn's own hill-climbing
    ships the same device (``restart``/``perturb`` args of ``hc``) — the
    reference never exposes it.  Returns the incumbent with evals/iterations
    summed across all climbs and per-restart bests in ``history``.

    ``tie_stop``: stop kicking after this many CONSECUTIVE restarts that
    fail to improve the incumbent (alarm r4: 8 restarts, 8 identical
    results, ~1,400 s spent re-finding the same optimum — VERDICT r4 weak
    #5).  0 disables early stopping.
    """
    from dags_vae_search_tpu.graphs import sampler as g_sampler

    best = first if first is not None else climb(None)
    n = best.best_adj.shape[0]
    evals = best.num_evals
    iters = best.iterations
    history = [best.best_score]
    ties = 0
    for r in range(restarts):
        if r % 2 == 0:
            # kick: perturb the incumbent (stay near the good basin)
            frac = float(rng.choice([0.15, 0.3, 0.5]))
            init = perturb_dag(
                rng, best.best_adj, delete_frac=frac, add_frac=frac,
                max_parents=max_parents,
            )
        else:
            # diversify: fresh random DAG under a random vertex order
            m = int(rng.integers(n - 1, max(2 * n, n), endpoint=True))
            m = min(m, g_sampler.max_edges_capped(n, max_parents))
            _, adj0 = g_sampler.sample_er_batch(
                rng, 1, n, m, n, require_connected=False,
                max_in_degree=max_parents,
            )
            p = rng.permutation(n)
            init = adj0[0][np.ix_(p, p)]
        res = climb(init)
        evals += res.num_evals
        iters += res.iterations
        if res.best_score > best.best_score + tie_tol:
            best = res
            ties = 0
        else:
            ties += 1
        history.append(best.best_score)
        if tie_stop and ties >= tie_stop:
            break
    return best._replace(num_evals=evals, iterations=iters, history=history)


def hill_climb(
    scorer: BicScorer,
    num_variables: int,
    init_adj: Optional[np.ndarray] = None,
    max_iters: int = 200,
    min_improvement: float = 1e-6,
    score_chunk: int = 4096,
) -> HillClimbResult:
    """Greedy best-move climb from init (empty graph by default).

    Moves are scored in fixed ``score_chunk`` blocks so the [B, n, U]
    scoring intermediates stay bounded at large n (3 n^2 candidates would
    otherwise exceed HBM around n ~ 70)."""
    n = num_variables
    adj = jnp.zeros((n, n)) if init_adj is None else jnp.asarray(init_adj)
    total_moves = 3 * n * n
    chunk = min(score_chunk, total_moves)

    @jax.jit
    def propose_chunk(adj, start):
        cands = jax.lax.dynamic_slice(
            _move_candidates(adj), (start, 0, 0), (chunk, n, n)
        )
        ok = _feasible(adj, cands, offset=start)
        scores = jnp.where(ok, scorer.score(cands), -jnp.inf)
        k = jnp.argmax(scores)
        return scores[k], cands[k]

    def propose(adj):
        best_score, best_adj = -np.inf, None
        for start in range(0, total_moves, chunk):
            start = min(start, total_moves - chunk)
            score, cand = propose_chunk(adj, start)
            if float(score) > best_score:
                best_score, best_adj = float(score), cand
        return best_score, best_adj

    current = float(scorer.score(adj[None])[0])
    history = [current]
    evals = 1
    for it in range(max_iters):
        best_score, best_adj = propose(adj)
        evals += total_moves
        if float(best_score) <= current + min_improvement:
            return HillClimbResult(
                best_score=current,
                best_adj=np.asarray(adj),
                iterations=it,
                num_evals=evals,
                history=history,
            )
        current = float(best_score)
        adj = best_adj
        history.append(current)
    return HillClimbResult(
        best_score=current,
        best_adj=np.asarray(adj),
        iterations=max_iters,
        num_evals=evals,
        history=history,
        converged=False,
    )
