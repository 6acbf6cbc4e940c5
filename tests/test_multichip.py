"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dags_vae_search_tpu.graphs import sampler
from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.parallel import mesh as mesh_lib
from dags_vae_search_tpu.scoring import catalog
from dags_vae_search_tpu.scoring.bic import BicScorer
from dags_vae_search_tpu.search import islands


@pytest.mark.slow
def test_island_search_sharded_over_mesh():
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh()
    model = PaceVAE(
        num_real_vertices=5, real_label_cardinality=5,
        embed_size=8, num_heads=2, num_layers=1, latent_size=8, fc_hidden=8,
        dropout=0.0,
    )
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 4, 5, 6, 5)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj))
    cards = np.full(5, 2, dtype=np.int32)
    dataset = catalog.simulate_dataset(rng, np.zeros((5, 5), np.float32), cards, 300)
    scorer = BicScorer(dataset)
    res = islands.island_cem_search(
        model, variables, scorer, jax.random.PRNGKey(1),
        num_islands=8, population=8, iters=3, migrate_every=2, mesh=mesh,
    )
    # 3 CEM iters + the low-temperature exploit pass (32 repeats/island)
    assert res.num_evals == 8 * 8 * 3 + 8 * 32
    assert len(res.history) == 4


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(float(x)) for x in out)
    g.dryrun_multichip(8)
