"""The bnlearn network catalog + synthetic ground-truth simulation.

The reference targets the classical bnlearn repository networks
(``README.md:11-44``) with a sparsity prior per network size
(``README.md:53-58``).  The real bnlearn ``.bif`` definitions are not
shippable here (no network egress, no pgmpy/R), so:

- the two shipped datasets (asia, sachs ``target.csv``) are used as-is for
  golden parity, and
- every other catalog entry is exercised through :func:`simulate_dataset` —
  ancestral sampling from a ground-truth DAG with random Dirichlet CPTs,
  the same mechanism the reference uses to produce ``target.csv`` for sachs
  (pgmpy ``model.simulate(5000, seed=42)``, ``data/bn_sachs/README.md``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np

from dags_vae_search_tpu.scoring.datasets import DiscreteDataset


class CatalogEntry(NamedTuple):
    name: str
    num_vertices: int
    num_edges: int


#: The bnlearn catalog as listed in the reference README (``README.md:16-44``).
CATALOG: Dict[str, CatalogEntry] = {
    e.name: e
    for e in [
        CatalogEntry("asia", 8, 8),
        CatalogEntry("cancer", 5, 4),
        CatalogEntry("earthquake", 5, 4),
        CatalogEntry("sachs", 11, 17),
        CatalogEntry("survey", 6, 6),
        CatalogEntry("alarm", 37, 46),
        CatalogEntry("barley", 48, 84),
        CatalogEntry("child", 20, 25),
        CatalogEntry("insurance", 27, 52),
        CatalogEntry("mildew", 35, 46),
        CatalogEntry("water", 32, 66),
        CatalogEntry("hailfinder", 56, 66),
        CatalogEntry("hepar2", 70, 123),
        CatalogEntry("win95pts", 76, 112),
        CatalogEntry("andes", 223, 338),
        CatalogEntry("diabetes", 413, 602),
        CatalogEntry("link", 724, 1125),
        CatalogEntry("pathfinder", 109, 195),
        CatalogEntry("pigs", 441, 592),
    ]
}


def density_cap(num_vertices: int) -> float:
    """The reference's sparsity prior per network size (``README.md:53-58``)."""
    if num_vertices < 10:
        return 0.6
    if num_vertices < 20:
        return 0.4
    if num_vertices < 50:
        return 0.2
    if num_vertices < 100:
        return 0.1
    return 0.05


def random_cpts(
    rng: np.random.Generator,
    adj: np.ndarray,
    cards: np.ndarray,
    concentration: float = 0.5,
):
    """Random Dirichlet CPTs for each node given its parents in ``adj``."""
    n = adj.shape[0]
    cpts = []
    for i in range(n):
        parents = np.flatnonzero(adj[:, i] > 0)
        q = int(np.prod(cards[parents])) if parents.size else 1
        table = rng.dirichlet(np.full(cards[i], concentration), size=q)
        cpts.append((parents, table))
    return cpts


def simulate_dataset(
    rng: np.random.Generator,
    adj: np.ndarray,
    cards: np.ndarray,
    num_cases: int,
    concentration: float = 0.5,
) -> DiscreteDataset:
    """Ancestral sampling of ``num_cases`` rows from (adj, random CPTs).

    ``adj`` must be topologically indexed (strictly upper-triangular), so a
    single index-order pass is a valid sampling order; the per-node step is
    vectorized over all cases.
    """
    n = adj.shape[0]
    cards = np.asarray(cards, dtype=np.int64)
    cpts = random_cpts(rng, adj, cards, concentration)
    codes = np.zeros((num_cases, n), dtype=np.int32)
    for i in range(n):
        parents, table = cpts[i]
        if parents.size:
            cfg = np.zeros(num_cases, dtype=np.int64)
            mult = 1
            for p in parents:
                cfg += codes[:, p] * mult
                mult *= cards[p]
        else:
            cfg = np.zeros(num_cases, dtype=np.int64)
        probs = table[cfg]  # [num_cases, r_i]
        u = rng.random((num_cases, 1))
        codes[:, i] = (probs.cumsum(axis=1) < u).sum(axis=1).astype(np.int32)
    return DiscreteDataset(
        codes=codes,
        cards=cards.astype(np.int32),
        columns=[f"x{i}" for i in range(n)],
    )


def make_synthetic_problem(
    name: str,
    num_cases: int = 5000,
    max_card: int = 2,
    seed: int = 42,
    rng: Optional[np.random.Generator] = None,
):
    """Ground-truth (adj, dataset) for a catalog entry without shipped data.

    Structure: a connected ER DAG with the catalog's vertex/edge counts;
    cardinalities uniform in [2, max_card].
    Returns (adj float32[n, n], DiscreteDataset).
    """
    from dags_vae_search_tpu.graphs import sampler

    entry = CATALOG[name]
    rng = rng or np.random.default_rng(seed)
    _, adj = sampler.sample_er_batch(
        rng, 1, entry.num_vertices, entry.num_edges, entry.num_vertices
    )
    adj = adj[0]
    cards = rng.integers(2, max_card + 1, size=entry.num_vertices)
    dataset = simulate_dataset(rng, adj, cards, num_cases)
    return adj, dataset
