"""Large-n path: model forward/loss through the blocked closure (n > 256)."""

import numpy as np
import jax
import jax.numpy as jnp

from dags_vae_search_tpu.graphs import sampler
from dags_vae_search_tpu.models.pace_vae import PaceVAE


def test_loss_at_n300_uses_blocked_closure():
    n = 300
    model = PaceVAE(
        num_real_vertices=n,
        real_label_cardinality=n,
        embed_size=8,
        num_heads=2,
        num_layers=1,
        latent_size=16,
        fc_hidden=8,
        dropout=0.0,
    )
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(
        rng, 1, n, int(n * 1.5), n, require_connected=False
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj)
    )
    total, recon, kld = model.apply(variables, jnp.asarray(labels), jnp.asarray(adj))
    assert np.isfinite(float(total))
