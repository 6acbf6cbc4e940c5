"""Scoring-engine tests: the golden asia BIC anchor (reference
tests/problem/bn/test_bnlearn.py asserts -13331.093616667435 +- 1e-5) plus
numpy cross-checks on synthetic problems."""

import numpy as np
import jax.numpy as jnp
import pytest

from dags_vae_search_tpu.scoring import catalog
from dags_vae_search_tpu.scoring.bic import BicScorer, relabel_to_columns
from dags_vae_search_tpu.scoring.datasets import load_target_csv

ASIA_TARGET = "/root/reference/data/bn_asia/target.csv"
GOLDEN_ASIA_BIC = -13331.093616667435

# The hand-coded asia graph from reference experiments/00_bn_asia_200k/main.py
# :50-69 (vertex label == vertex index, so label-relabeling is the identity).
ASIA_GOLDEN_EDGES = [
    (0, 1), (1, 4), (0, 5), (1, 5), (1, 6), (4, 6), (3, 7), (4, 7), (5, 7),
]


def asia_golden_adj() -> np.ndarray:
    adj = np.zeros((8, 8), dtype=np.float32)
    for a, b in ASIA_GOLDEN_EDGES:
        adj[a, b] = 1.0
    return adj


def reference_score_np(adj, codes, cards, metric="bic"):
    """Straight-line numpy scorer used as an independent cross-check."""
    num_cases, n = codes.shape
    total = 0.0
    for i in range(n):
        parents = np.flatnonzero(adj[:, i] > 0)
        q = int(np.prod(cards[parents])) if parents.size else 1
        cfg = np.zeros(num_cases, dtype=np.int64)
        mult = 1
        for p in parents:
            cfg += codes[:, p] * mult
            mult *= cards[p]
        tbl = np.zeros((q, cards[i]))
        np.add.at(tbl, (cfg, codes[:, i]), 1.0)
        nj = tbl.sum(1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            ll = np.where(tbl > 0, tbl * (np.log(tbl) - np.log(nj)), 0.0).sum()
        df = (cards[i] - 1) * q
        if metric == "bic":
            total += ll - df * np.log(num_cases) / 2
        elif metric == "aic":
            total += ll - df
        else:
            total += ll
    return total


@pytest.fixture(scope="module")
def asia_dataset():
    return load_target_csv(ASIA_TARGET)


def test_asia_golden_bic_exact(asia_dataset):
    # Reference golden test tolerance: +-1e-5 (tests/problem/bn/test_bnlearn.py:55).
    scorer = BicScorer(asia_dataset, metric="bic")
    value = scorer.score_exact(np.asarray(asia_golden_adj())[None])[0]
    assert value == pytest.approx(GOLDEN_ASIA_BIC, abs=1e-5)


def test_asia_golden_bic_fast_path(asia_dataset):
    # The all-f32 search path trades ~1e-3 absolute accuracy for speed.
    scorer = BicScorer(asia_dataset, metric="bic")
    value = scorer.score_one(asia_golden_adj())
    assert value == pytest.approx(GOLDEN_ASIA_BIC, abs=0.05)


def test_asia_golden_bic_labeled_permuted(asia_dataset):
    # Permute the golden graph's slots; labels carry the column identity, so
    # the labeled score must be invariant (bnlearn.py:38-44 semantics).
    adj = asia_golden_adj()
    perm = np.array([3, 0, 6, 1, 7, 2, 5, 4])
    adj_p = adj[np.ix_(perm, perm)]  # vertex v' = position of old vertex
    labels_p = perm  # slot k holds old vertex perm[k] whose label is perm[k]
    scorer = BicScorer(asia_dataset)
    value = float(
        scorer.score_labeled(jnp.asarray(labels_p)[None], jnp.asarray(adj_p)[None])[0]
    )
    assert value == pytest.approx(GOLDEN_ASIA_BIC, abs=0.05)


def test_empty_graph_matches_numpy(asia_dataset):
    scorer = BicScorer(asia_dataset)
    adj = np.zeros((8, 8), dtype=np.float32)
    expect = reference_score_np(adj, asia_dataset.codes, asia_dataset.cards)
    assert scorer.score_one(adj) == pytest.approx(expect, rel=1e-6)


@pytest.mark.parametrize("metric", ["bic", "aic", "loglik"])
def test_batch_scores_match_numpy_synthetic(metric):
    rng = np.random.default_rng(3)
    n = 6
    cards = np.array([2, 3, 2, 4, 2, 3], dtype=np.int32)
    ds_adj = np.zeros((n, n), dtype=np.float32)
    for a, b in [(0, 2), (1, 2), (2, 4), (3, 4), (1, 5)]:
        ds_adj[a, b] = 1.0
    dataset = catalog.simulate_dataset(rng, ds_adj, cards, 2000)

    from dags_vae_search_tpu.graphs import sampler

    _, cands = sampler.sample_er_batch(rng, 16, n, 7, n)
    scorer = BicScorer(dataset, metric=metric, q_cap=256)
    got = np.asarray(scorer.score(jnp.asarray(cands)))
    want = np.array(
        [
            reference_score_np(c, dataset.codes, dataset.cards, metric)
            for c in cands
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_kernel_matches_xla(asia_dataset):
    rng = np.random.default_rng(5)
    from dags_vae_search_tpu.graphs import sampler

    _, cands = sampler.sample_er_batch(rng, 8, 8, 9, 8)
    xla = BicScorer(asia_dataset, impl="xla")
    pal = BicScorer(asia_dataset, impl="pallas_interpret")
    got_xla = np.asarray(xla.score(jnp.asarray(cands)))
    got_pal = np.asarray(pal.score(jnp.asarray(cands)))
    np.testing.assert_allclose(got_pal, got_xla, rtol=1e-5, atol=1e-2)
    # and against the exact golden graph
    golden = np.asarray(pal.score(jnp.asarray(asia_golden_adj())[None]))[0]
    assert golden == pytest.approx(GOLDEN_ASIA_BIC, abs=0.05)


def test_max_parents_infeasible(asia_dataset):
    adj = np.zeros((8, 8), dtype=np.float32)
    adj[0:5, 6] = 1.0  # node 6 has 5 parents
    scorer = BicScorer(asia_dataset, max_parents=3)
    assert scorer.score_one(adj) == -np.inf
    scorer2 = BicScorer(asia_dataset, max_parents=5)
    assert np.isfinite(scorer2.score_one(adj))


def test_q_cap_infeasible():
    rng = np.random.default_rng(0)
    cards = np.array([4, 4, 4, 4], dtype=np.int32)
    ds_adj = np.zeros((4, 4), dtype=np.float32)
    dataset = catalog.simulate_dataset(rng, ds_adj, cards, 500)
    adj = np.zeros((4, 4), dtype=np.float32)
    adj[0, 3] = adj[1, 3] = adj[2, 3] = 1.0  # q = 64 > cap 16
    scorer = BicScorer(dataset, q_cap=16)
    assert scorer.score_one(adj) == -np.inf


def test_true_structure_beats_perturbations():
    # Sanity: on simulated data the generating structure should usually
    # out-score random same-size structures.
    rng = np.random.default_rng(11)
    adj, dataset = catalog.make_synthetic_problem("cancer", num_cases=4000)
    scorer = BicScorer(dataset)
    from dags_vae_search_tpu.graphs import sampler

    _, rand = sampler.sample_er_batch(rng, 32, adj.shape[0], 4, adj.shape[0])
    true_score = scorer.score_one(adj)
    rand_scores = np.asarray(scorer.score(jnp.asarray(rand)))
    assert true_score >= np.percentile(rand_scores, 90)


def test_family_table_matches_direct_scorer(asia_dataset):
    from dags_vae_search_tpu.scoring.family_table import FamilyTableScorer
    from dags_vae_search_tpu.graphs import sampler

    base = BicScorer(asia_dataset, max_parents=4)
    table = FamilyTableScorer(asia_dataset, max_parents=4)
    rng = np.random.default_rng(9)
    _, cands = sampler.sample_er_batch(rng, 64, 8, 9, 8)
    direct = np.asarray(base.score(jnp.asarray(cands)))
    gathered = np.asarray(table.score(jnp.asarray(cands)))
    finite = np.isfinite(direct)
    np.testing.assert_allclose(gathered[finite], direct[finite], rtol=2e-5, atol=0.02)
    assert np.array_equal(np.isfinite(gathered), finite)
    # golden graph too
    g = np.asarray(table.score(jnp.asarray(asia_golden_adj())[None]))[0]
    assert g == pytest.approx(GOLDEN_ASIA_BIC, abs=0.05)


def test_bde_metric_against_independent_formula(asia_dataset):
    from scipy.special import gammaln as gln

    def bde_np(adj, codes, cards, iss=1.0):
        num_cases, n = codes.shape
        total = 0.0
        for i in range(n):
            parents = np.flatnonzero(adj[:, i] > 0)
            q = int(np.prod(cards[parents])) if parents.size else 1
            r = int(cards[i])
            cfg = np.zeros(num_cases, dtype=np.int64)
            mult = 1
            for p in parents:
                cfg += codes[:, p] * mult
                mult *= cards[p]
            tbl = np.zeros((q, r))
            np.add.at(tbl, (cfg, codes[:, i]), 1.0)
            a_jk = iss / (q * r)
            a_j = iss / q
            total += (gln(a_j) - gln(a_j + tbl.sum(1))).sum()
            total += (gln(a_jk + tbl) - gln(a_jk)).sum()
        return total

    adj = asia_golden_adj()
    want = bde_np(adj, asia_dataset.codes, asia_dataset.cards)
    scorer = BicScorer(asia_dataset, metric="bde")
    got_exact = scorer.score_exact(adj[None])[0]
    assert got_exact == pytest.approx(want, rel=1e-9)
    got_fast = scorer.score_one(adj)
    assert got_fast == pytest.approx(want, abs=2.0)
    pal = BicScorer(asia_dataset, metric="bde", impl="pallas_interpret")
    assert float(pal.score(jnp.asarray(adj)[None])[0]) == pytest.approx(want, abs=2.0)


def test_sparse_exact_scorer_golden_and_capfree(asia_dataset):
    scorer = BicScorer(asia_dataset, metric="bic", max_parents=4)
    # Golden parity on the asia anchor graph.
    value = scorer.score_exact_sparse(asia_golden_adj()[None])[0]
    assert value == pytest.approx(GOLDEN_ASIA_BIC, abs=1e-6)
    # A dense graph (node 7 has 7 parents -> q = 2^7 but max_parents/q_cap
    # make the dense path -inf) stays finite and matches the numpy scorer.
    dense = np.triu(np.ones((8, 8), dtype=np.float32), k=1)
    assert scorer.score_exact(dense[None])[0] == -np.inf
    got = scorer.score_exact_sparse(dense[None])[0]
    expect = reference_score_np(dense, asia_dataset.codes, asia_dataset.cards)
    assert got == pytest.approx(expect, rel=1e-9)


@pytest.mark.parametrize("metric", ["bic", "aic", "loglik"])
def test_sparse_exact_matches_numpy_synthetic(metric):
    rng = np.random.default_rng(11)
    n = 6
    cards = rng.integers(2, 4, size=n)
    codes = np.stack(
        [rng.integers(0, c, size=400) for c in cards], axis=1
    ).astype(np.int32)
    from dags_vae_search_tpu.scoring.datasets import DiscreteDataset

    ds = DiscreteDataset(
        codes=codes, cards=cards.astype(np.int32),
        columns=[f"x{i}" for i in range(n)],
    )
    scorer = BicScorer(ds, metric=metric)
    adjs = np.zeros((16, n, n), dtype=np.float32)
    iu = np.triu_indices(n, k=1)
    for b in range(16):
        mask = rng.random(iu[0].shape[0]) < 0.4
        adjs[b][iu[0][mask], iu[1][mask]] = 1.0
    got = scorer.score_exact_sparse(adjs)
    expect = np.array(
        [reference_score_np(a, codes, cards, metric) for a in adjs]
    )
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_sparse_vs_dense_exact_parity_n37():
    from dags_vae_search_tpu.graphs import sampler

    # Two independent implementations — the device segment-sum contingency
    # path (score_exact: f32 counts + f64 host finisher) and the host
    # np.unique group-by path (score_exact_sparse) — must agree at alarm
    # scale for both BIC and BDe.
    rng = np.random.default_rng(11)
    n = 37
    _, truth = sampler.sample_er_batch(rng, 1, n, 2 * n, n)
    cards = rng.integers(2, 4, size=n)
    ds = catalog.simulate_dataset(rng, truth[0], cards, 3000)
    _, adjs = sampler.sample_er_batch(rng, 4, n, 2 * n, n)
    for metric in ("bic", "bde"):
        scorer = BicScorer(ds, metric=metric, max_parents=6)
        dense = scorer.score_exact(np.asarray(adjs, np.float32))
        sparse = scorer.score_exact_sparse(np.asarray(adjs, np.float32))
        # The sparse path has no q_cap/max_parents feasibility masking —
        # compare where the dense path is finite (and require coverage).
        finite = np.isfinite(dense)
        assert finite.any()
        assert np.isfinite(sparse).all()
        np.testing.assert_allclose(dense[finite], sparse[finite], rtol=1e-9)
