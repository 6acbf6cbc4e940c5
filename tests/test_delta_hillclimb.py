"""Family-batch scoring + delta hill climbing (large-n structure search)."""

import jax.numpy as jnp
import numpy as np

from dags_vae_search_tpu.graphs import sampler
from dags_vae_search_tpu.scoring import catalog
from dags_vae_search_tpu.scoring.bic import BicScorer
from dags_vae_search_tpu.scoring.family_batch import FamilyBatchScorer
from dags_vae_search_tpu.search import hillclimb
from dags_vae_search_tpu.search.delta_hillclimb import (
    _closure_bool,
    delta_hill_climb,
)


def _setup(n=7, seed=0, cases=2000, max_parents=4):
    rng = np.random.default_rng(seed)
    cards = rng.integers(2, 4, size=n)
    _, truth = sampler.sample_er_batch(rng, 1, n, n + 2, n)
    ds = catalog.simulate_dataset(rng, truth[0], cards, cases)
    bs = BicScorer(ds, max_parents=max_parents)
    fb = FamilyBatchScorer(ds, max_parents=max_parents, q_cap=bs.q_cap)
    return rng, ds, bs, fb


def test_family_batch_matches_score_nodes():
    rng, ds, bs, fb = _setup()
    n = ds.num_variables
    _, adjs = sampler.sample_er_batch(rng, 16, n, n + 3, n)
    node_scores = np.asarray(bs.score_nodes(jnp.asarray(adjs)))
    for b in range(adjs.shape[0]):
        children, parents = [], []
        for y in range(n):
            ps = np.flatnonzero(adjs[b][:, y])
            row = np.full(fb.max_parents + 1, -1, np.int32)
            row[: ps.size] = ps
            children.append(y)
            parents.append(row)
        fs = np.asarray(fb.score(np.asarray(children, np.int32), np.stack(parents)))
        np.testing.assert_allclose(fs, node_scores[b], rtol=1e-4, atol=1e-3)


def test_family_batch_infeasible_q_cap():
    _, ds, bs, fb = _setup(max_parents=4)
    # a family whose parent-config space exceeds q_cap must be -inf
    small = FamilyBatchScorer(ds, max_parents=6, q_cap=4)
    row = np.asarray([[0, 1, 2, 3, 4, -1, -1]], np.int32)
    out = np.asarray(small.score(np.asarray([5], np.int32), row))
    assert out[0] == -np.inf


def test_delta_hill_climb_matches_dense():
    _, ds, bs, fb = _setup()
    n = ds.num_variables
    hc = hillclimb.hill_climb(bs, n, max_iters=100)
    dhc = delta_hill_climb(fb, n, max_iters=300)
    exact_hc = float(bs.score_exact(hc.best_adj[None])[0])
    exact_dhc = float(bs.score_exact(dhc.best_adj[None])[0])
    # both are greedy best-move climbers over the same move set
    assert exact_dhc >= exact_hc - 1e-6
    # internal delta bookkeeping must agree with exact rescoring
    assert abs(exact_dhc - dhc.best_score) < 1.0
    # delta climbing touches ~n-fold fewer (and cheaper) evaluations
    assert dhc.num_evals < hc.num_evals


def test_delta_hill_climb_from_init_and_acyclicity():
    _, ds, bs, fb = _setup(seed=3)
    n = ds.num_variables
    rng = np.random.default_rng(1)
    _, init = sampler.sample_er_batch(rng, 1, n, n + 2, n)
    res = delta_hill_climb(fb, n, init_adj=init[0], max_iters=200)
    adj = res.best_adj
    # result is a DAG within the in-degree cap
    reach = _closure_bool(adj > 0)
    assert not reach.diagonal().any()
    assert (adj.sum(0) <= fb.max_parents).all()
    init_score = float(bs.score_exact(init[0][None])[0])
    assert res.best_score >= init_score - 1e-6


def test_delta_hill_climb_batch_acceptance():
    # accept_batch > 1 folds several distinct-child moves into one refresh
    # dispatch; the result must still be a DAG within the cap, at least as
    # good as the single-move climb's certified local optimum quality-wise
    # within a small tolerance, and must report convergence + a profile.
    _, ds, bs, fb = _setup(seed=5, n=10)
    n = ds.num_variables
    single = delta_hill_climb(fb, n, max_iters=400, accept_batch=1)
    batched = delta_hill_climb(fb, n, max_iters=400, accept_batch=8)
    reach = _closure_bool(batched.best_adj > 0)
    assert not reach.diagonal().any()
    assert (batched.best_adj.sum(0) <= fb.max_parents).all()
    assert single.converged and batched.converged
    assert batched.profile is not None
    # both are local optima of the same move set; greedy path may differ,
    # but internal bookkeeping must agree with exact rescoring
    exact_b = float(bs.score_exact(batched.best_adj[None])[0])
    assert abs(exact_b - batched.best_score) < 1.0
    assert batched.best_score >= single.best_score - 0.01 * abs(
        single.best_score
    )
    # the batched climb must reach its optimum in fewer frontier scans
    assert len(batched.history) <= len(single.history)


def test_delta_hill_climb_time_budget_returns_incumbent():
    _, ds, bs, fb = _setup()
    n = ds.num_variables
    # an exhausted budget must still return a valid (empty-graph) incumbent
    res = delta_hill_climb(fb, n, max_iters=300, time_budget_s=0.0)
    assert res.iterations == 0
    assert np.isfinite(res.best_score)
    assert res.best_adj.sum() == 0
    # a generous budget must not change the converged result
    full = delta_hill_climb(fb, n, max_iters=300)
    budgeted = delta_hill_climb(fb, n, max_iters=300, time_budget_s=600.0)
    assert budgeted.best_score == full.best_score
