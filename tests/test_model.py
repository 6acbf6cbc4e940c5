"""PACE VAE tests: parameter-count parity with the reference, loss
semantics, mask/shape checks, decode validity, and a learning smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dags_vae_search_tpu.graphs import pace_wrap, sampler
from dags_vae_search_tpu.models.decode import decode_to_labeled, sample_decode
from dags_vae_search_tpu.models.pace_vae import PaceVAE, make_asia_model


def _init(model, batch=2):
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(
        rng, batch, model.num_real_vertices, model.num_real_vertices + 1,
        model.real_label_cardinality, require_connected=False,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj))
    return variables, jnp.asarray(labels), jnp.asarray(adj)


def test_param_count_parity_asia():
    # Reference: asia model = 284,556 params (experiments/01_bn_asia/README.md;
    # printed by main.py:158). Same architecture -> same count.
    model = make_asia_model()
    variables, _, _ = _init(model)
    count = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert count == 284_556


@pytest.mark.slow
def test_param_count_parity_families():
    # Reference src/train_model.py:60-62: 12+3 -> 402,384; 20+3 -> 502,744;
    # 100+3 -> 1,506,344 (ninp=32, nhid=64, nlayers=3, nz=64).
    for n_real, expected in [(12, 402_384), (20, 502_744), (100, 1_506_344)]:
        model = PaceVAE(
            num_real_vertices=n_real,
            real_label_cardinality=n_real,
            latent_size=64,
        )
        variables, _, _ = _init(model)
        count = sum(x.size for x in jax.tree.leaves(variables["params"]))
        assert count == expected, (n_real, count, expected)


def test_loss_shapes_and_finiteness():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=4)
    total, recon, kld = model.apply(variables, labels, adj)
    assert np.isfinite(float(total)) and np.isfinite(float(recon))
    assert float(kld) >= 0.0
    assert float(total) == pytest.approx(float(recon) + 0.005 * float(kld), rel=1e-5)


def test_encode_shapes():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=4)
    mu, logvar = model.apply(variables, labels, adj, method=PaceVAE.encode)
    assert mu.shape == (4, 32) and logvar.shape == (4, 32)


@pytest.mark.slow
def test_loss_edge_targets_are_real_edges():
    # With add_edge forced to strong logits via crafted params it's hard to
    # assert targets directly; instead check the loss is sensitive to edges:
    # flipping one real edge must change recon NLL.
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=1)
    _, recon_a, _ = model.apply(variables, labels, adj)
    adj_b = np.asarray(adj).copy()
    # flip an edge between real vertices (slot 3->5 exists or not)
    adj_b[0, 3, 5] = 1.0 - adj_b[0, 3, 5]
    _, recon_b, _ = model.apply(variables, labels, jnp.asarray(adj_b))
    assert float(recon_a) != pytest.approx(float(recon_b))


@pytest.mark.slow
def test_deterministic_loss_reproducible():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=3)
    a = model.apply(variables, labels, adj)
    b = model.apply(variables, labels, adj)
    assert float(a[0]) == float(b[0])


@pytest.mark.slow
def test_stochastic_loss_uses_rngs():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=3)
    loss = lambda seed: float(
        model.apply(
            variables,
            labels,
            adj,
            False,
            method=PaceVAE.loss,
            rngs={"dropout": jax.random.PRNGKey(seed), "reparam": jax.random.PRNGKey(seed + 7)},
        )[0]
    )
    assert loss(0) != pytest.approx(loss(1))


@pytest.mark.slow
def test_decode_structure():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=8)
    z = jnp.zeros((8, 32))
    pl, pa, finished = sample_decode(model, variables, z, jax.random.PRNGKey(0))
    assert pl.shape == (8, 11) and pa.shape == (8, 11, 11)
    # start/input/output invariants
    assert np.all(np.asarray(pl)[:, 0] == 2)
    assert np.all(np.asarray(pl)[:, 1] == 0)
    assert np.all(np.asarray(pa)[:, 0, 1] == 1.0)
    # edges strictly forward (upper-triangular)
    a = np.asarray(pa)
    assert np.all(a * np.tril(np.ones((11, 11))) == 0)


def test_decode_roundtrip_types():
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=4)
    mu, _ = model.apply(variables, labels, adj, method=PaceVAE.encode)
    recon, valid = decode_to_labeled(model, variables, mu, jax.random.PRNGKey(1))
    assert recon.labels.shape == (4, 8)
    assert recon.adj.shape == (4, 8, 8)
    assert valid.shape == (4,)


@pytest.mark.slow
def test_training_reduces_loss():
    # A few Adam steps on a fixed small batch must reduce the loss — the
    # end-to-end learning smoke test (grad flow through masks, embeddings,
    # encoder/decoder, both heads).
    model = make_asia_model()
    variables, labels, adj = _init(model, batch=16)
    params = variables["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            total, recon, kld = model.apply(
                {"params": p},
                labels,
                adj,
                False,
                method=PaceVAE.loss,
                rngs={
                    "dropout": jax.random.fold_in(key, 0),
                    "reparam": jax.random.fold_in(key, 1),
                },
            )
            return total, (recon, kld)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, total

    key = jax.random.PRNGKey(0)
    first = None
    for i in range(60):
        params, opt_state, total = train_step(params, opt_state, jax.random.fold_in(key, i))
        if first is None:
            first = float(total)
    assert float(total) < 0.75 * first


@pytest.mark.slow
def test_constrained_decode_always_valid_at_n20():
    # VERDICT r1 #2: unconstrained decode at n >= 20 virtually never emits a
    # label permutation, so latent search scored -inf everywhere.  The
    # constrained decode masks virtual labels, used labels, and early output,
    # making every decode a valid permutation-labeled DAG — even untrained.
    n = 20
    model = PaceVAE(
        num_real_vertices=n, real_label_cardinality=n,
        embed_size=16, num_heads=4, num_layers=2, latent_size=16, fc_hidden=16,
    )
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 4, n, n + 4, n)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (32, model.latent_size))
    recon, valid = decode_to_labeled(model, variables, z, jax.random.PRNGKey(2))
    assert bool(np.all(np.asarray(valid)))
    lab = np.asarray(recon.labels)
    assert np.all(np.sort(lab, axis=1) == np.arange(n)[None, :])
    # The reference's unconstrained semantics stay available for parity.
    _, valid_u = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(2), constrain_labels=False
    )
    assert np.asarray(valid_u).mean() < 0.5


@pytest.mark.slow
def test_constrained_decode_unlabeled_cardinality_one():
    # Unlabeled corpora (synthetic_12 style): no used-label masking (the one
    # real label repeats), but virtual/output masking still forces a
    # full-size valid decode.
    model = PaceVAE(
        num_real_vertices=6, real_label_cardinality=1,
        embed_size=16, num_heads=4, num_layers=2, latent_size=8, fc_hidden=16,
    )
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 4, 6, 7, 1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (16, model.latent_size))
    recon, valid = decode_to_labeled(model, variables, z, jax.random.PRNGKey(2))
    assert bool(np.all(np.asarray(valid)))
    assert np.all(np.asarray(recon.labels) == 0)


@pytest.mark.slow
def test_low_temperature_decode_is_deterministic():
    # temperature -> 0 approaches the mode decode: two different sampling
    # keys must produce identical structures (logit ties are measure-zero).
    n = 10
    model = PaceVAE(
        num_real_vertices=n, real_label_cardinality=n,
        embed_size=16, num_heads=4, num_layers=2, latent_size=16, fc_hidden=16,
    )
    rng = np.random.default_rng(3)
    labels, adj = sampler.sample_er_batch(rng, 4, n, n + 4, n)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (8, model.latent_size))
    r1, _ = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(2), temperature=1e-3
    )
    r2, _ = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(99), temperature=1e-3
    )
    assert np.array_equal(np.asarray(r1.labels), np.asarray(r2.labels))
    assert np.array_equal(np.asarray(r1.adj), np.asarray(r2.adj))
    # temperature is a traced scalar: same compiled fn must serve t=1.0.
    r3, _ = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(2),
        temperature=jnp.asarray(1.0),
    )
    assert np.asarray(r3.labels).shape == np.asarray(r1.labels).shape


@pytest.mark.slow
def test_decode_max_in_degree_cap_at_large_n():
    # VERDICT r2 #2: the search scorer marks in-degree > max_parents as -inf
    # (scoring/bic.py), so decode must cap sampled in-degree or latent search
    # emits valid-but-unscoreable graphs (the hepar2 -inf mechanism).  From
    # an untrained model (worst case: near-uniform edge heads sample ~n/2
    # parents per node), every unwrapped node must have in-degree <= cap and
    # decodes must stay valid.  (n=48 keeps the CPU scan compile affordable;
    # the mask math is n-independent.)
    n, cap = 48, 8
    model = PaceVAE(
        num_real_vertices=n, real_label_cardinality=n,
        embed_size=16, num_heads=4, num_layers=1, latent_size=16, fc_hidden=16,
    )
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 2, n, 2 * n, n)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (256, model.latent_size))
    recon, valid = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(2), max_in_degree=cap
    )
    indeg = np.asarray(recon.adj).sum(axis=1)  # [B, n] in-degree per node
    assert indeg.max() <= cap
    assert bool(np.all(np.asarray(valid)))
    # Without the cap the same model overshoots, so the test has teeth.
    recon_u, _ = decode_to_labeled(model, variables, z[:32], jax.random.PRNGKey(2))
    assert np.asarray(recon_u.adj).sum(axis=1).max() > cap


@pytest.mark.slow
def test_loss_variant_v1_matches_v3_in_well_conditioned_regime():
    # V1 (BCE on sigmoid probs, torch clamp at -100) equals V3
    # (BCE-with-logits) wherever the sigmoid doesn't saturate; at init the
    # logits are small, so the two must agree to float32 rounding.
    n = 6
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 8, n, n + 2, n)
    lb, ad = jnp.asarray(labels), jnp.asarray(adj)
    kwargs = dict(
        num_real_vertices=n, real_label_cardinality=n,
        embed_size=16, num_heads=4, num_layers=1, latent_size=8, fc_hidden=16,
    )
    m3 = PaceVAE(**kwargs)
    m1 = PaceVAE(**kwargs, loss_variant="v1")
    variables = m3.init(jax.random.PRNGKey(0), lb, ad)
    t3 = m3.apply(variables, lb, ad, True, method=PaceVAE.loss)
    t1 = m1.apply(variables, lb, ad, True, method=PaceVAE.loss)
    np.testing.assert_allclose(float(t1[0]), float(t3[0]), rtol=1e-5)


@pytest.mark.slow
def test_edge_readout_decode_matches_loss_pair_indexing():
    """With the transformer edge head zeroed and the readout bias set from a
    target PACE adjacency, mode decode must reproduce exactly that graph —
    proving the decode-side (slot idx, parent p) bias mapping equals the
    loss-side (i, j) = (idx-1, p-1) pair indexing."""
    n = 5
    rng = np.random.default_rng(4)
    labels = np.arange(n, dtype=np.int32)[None]  # identity labels
    _, adj = sampler.sample_er_batch(rng, 1, n, 6, n)
    model = PaceVAE(
        num_real_vertices=n,
        real_label_cardinality=n,
        embed_size=8,
        num_heads=2,
        num_layers=1,
        latent_size=8,
        fc_hidden=8,
        dropout=0.0,
        edge_readout=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(labels), jnp.asarray(adj))
    wrapped = pace_wrap(jnp.asarray(labels), jnp.asarray(adj))
    W = np.asarray(wrapped.adj)[0]  # [n+3, n+3]
    N = n + 3
    bias_mat = np.full((N - 1, N - 1), -10.0, np.float32)
    pi, pj = np.tril_indices(N - 1, k=-1)
    bias_mat[pi, pj] = np.where(W[pj + 1, pi + 1] > 0, 10.0, -10.0)

    params = jax.tree.map(lambda x: x, variables["params"])  # shallow copy
    params = jax.device_get(params)
    params["add_edge_out"]["kernel"] = np.zeros_like(
        params["add_edge_out"]["kernel"]
    )
    params["add_edge_out"]["bias"] = np.zeros_like(
        params["add_edge_out"]["bias"]
    )
    params["edge_readout_fc"]["kernel"] = np.zeros_like(
        params["edge_readout_fc"]["kernel"]
    )
    params["edge_readout_fc"]["bias"] = bias_mat.reshape(-1)
    # uniform node logits: constrained argmax decode emits labels in order
    params["add_node_out"]["kernel"] = np.zeros_like(
        params["add_node_out"]["kernel"]
    )
    params["add_node_out"]["bias"] = np.zeros_like(
        params["add_node_out"]["bias"]
    )

    z = jnp.zeros((1, model.latent_size))
    recon, valid = decode_to_labeled(
        model, {"params": params}, z, jax.random.PRNGKey(1), temperature=1e-4
    )
    assert bool(valid[0])
    assert np.array_equal(np.asarray(recon.labels)[0], labels[0])
    assert np.array_equal(np.asarray(recon.adj)[0], adj[0])


def test_factorized_edge_readout_row_matches_full_bias():
    """The decode scan reads the z->edge-logit bias one child row at a time
    (``_edge_bias_row``); it must agree with the full bilinear bias the loss
    gathers pairs from (``_edge_bias``) — same (i, j) indexing, same 1/sqrt(r)
    scale."""
    n = 7
    model = PaceVAE(
        num_real_vertices=n,
        real_label_cardinality=n,
        embed_size=8,
        num_heads=2,
        num_layers=1,
        latent_size=16,
        fc_hidden=8,
        dropout=0.0,
        edge_readout=True,
        edge_readout_rank=4,
    )
    variables, lb, ad = _init(model)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, model.latent_size))
    N = model.max_n
    full = model.apply(
        variables, z, N, method=lambda m, z_, n_: m._edge_bias(z_, n_)
    )
    assert full.shape == (2, N - 1, N - 1)
    for i in (0, 3, N - 2):
        row = model.apply(
            variables,
            z,
            N,
            jnp.asarray(i),
            method=lambda m, z_, n_, i_: m._edge_bias_row(z_, n_, i_),
        )
        np.testing.assert_allclose(
            np.asarray(row), np.asarray(full[:, i, :]), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_factorized_edge_readout_loss_and_decode_run():
    """Loss is finite and trains, sampling decode stays valid with the
    rank-factorized readout head."""
    n = 6
    model = PaceVAE(
        num_real_vertices=n,
        real_label_cardinality=n,
        embed_size=8,
        num_heads=2,
        num_layers=1,
        latent_size=16,
        fc_hidden=8,
        dropout=0.0,
        edge_readout=True,
        edge_readout_rank=4,
    )
    variables, lb, ad = _init(model, batch=4)
    total, recon, kld = model.apply(variables, lb, ad, True, method=PaceVAE.loss)
    assert np.isfinite(float(total))
    # grads flow through both factors
    def loss_fn(params):
        t, _, _ = model.apply({"params": params}, lb, ad, True, method=PaceVAE.loss)
        return t
    grads = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.abs(grads["edge_readout_u"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["edge_readout_v"]["kernel"]).sum()) > 0
    z = jax.random.normal(jax.random.PRNGKey(5), (4, model.latent_size))
    recon_g, valid = decode_to_labeled(
        model, variables, z, jax.random.PRNGKey(6)
    )
    assert bool(jnp.all(valid))


def test_matmul_dtype_bfloat16_close_to_f32():
    """bf16 matmul operands (f32 accumulation/params) change the loss only
    at bf16 rounding level — the training-dynamics contract for the MFU
    recipe."""
    model32 = PaceVAE(num_real_vertices=8, real_label_cardinality=8)
    model16 = PaceVAE(
        num_real_vertices=8, real_label_cardinality=8, matmul_dtype="bfloat16"
    )
    variables, lb, ad = _init(model32, batch=4)
    t32 = model32.apply(variables, lb, ad, True, method=PaceVAE.loss)
    t16 = model16.apply(variables, lb, ad, True, method=PaceVAE.loss)
    # same parameter tree (dtype is not part of the params)
    assert abs(float(t16[0]) - float(t32[0])) / abs(float(t32[0])) < 0.05
