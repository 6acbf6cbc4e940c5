"""Training subsystem tests: fit loop, LR plateau, checkpoint round trip,
eval metrics, and the data-parallel mesh path on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dags_vae_search_tpu.graphs import sampler
from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.parallel import mesh as mesh_lib
from dags_vae_search_tpu.training import checkpoint as ckpt_lib
from dags_vae_search_tpu.training import data as data_lib
from dags_vae_search_tpu.training import eval as eval_lib
from dags_vae_search_tpu.training.train import PlateauState, TrainConfig, Trainer


def tiny_model():
    return PaceVAE(
        num_real_vertices=5,
        real_label_cardinality=5,
        embed_size=8,
        num_heads=2,
        num_layers=1,
        latent_size=8,
        fc_hidden=8,
        dropout=0.1,
    )


def tiny_corpus(rows=64):
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, rows, 5, 6, 5)
    return data_lib.Corpus(labels, adj)


def test_split_deterministic():
    corpus = tiny_corpus(50)
    train_a, test_a = data_lib.train_test_split(corpus, 0.2, seed=42)
    train_b, test_b = data_lib.train_test_split(corpus, 0.2, seed=42)
    assert np.array_equal(train_a.labels, train_b.labels)
    assert len(test_a) == 10 and len(train_a) == 40


@pytest.mark.slow
def test_trainer_reduces_loss_and_history():
    corpus = tiny_corpus(64)
    model = tiny_model()
    config = TrainConfig(batch_size=16, epochs=8, learning_rate=3e-3, log_every=0)
    trainer = Trainer(model, config)
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    state, history = trainer.fit(state, corpus, log=lambda s: None)
    assert len(history) == 8
    assert history[-1]["loss_per_graph"] < history[0]["loss_per_graph"]


def test_plateau_state_machine():
    config = TrainConfig(plateau_factor=0.5, plateau_patience=2, learning_rate=1.0)
    p = PlateauState(float("inf"), 0, 1.0)
    p = p.step(10.0, config)
    assert p.best == 10.0 and p.lr == 1.0
    p = p.step(10.0, config)  # bad 1
    p = p.step(10.0, config)  # bad 2
    assert p.lr == 1.0
    p = p.step(10.0, config)  # bad 3 > patience -> reduce
    assert p.lr == 0.5 and p.bad_epochs == 0


def test_set_learning_rate_applies():
    corpus = tiny_corpus(8)
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=4, log_every=0))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    state = trainer.set_learning_rate(state, 5e-6)
    assert float(state.opt_state[1].hyperparams["learning_rate"]) == pytest.approx(5e-6)


def test_checkpoint_roundtrip(tmp_path):
    corpus = tiny_corpus(8)
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=4, log_every=0))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    ckpt_lib.save_checkpoint(str(tmp_path), 3, {"params": state.params})
    assert ckpt_lib.latest_epoch(str(tmp_path)) == 3
    zero = jax.tree.map(jnp.zeros_like, state.params)
    restored = ckpt_lib.restore_params(str(tmp_path), 3, zero)
    orig_flat = jax.tree.leaves(state.params)
    rest_flat = jax.tree.leaves(restored)
    assert all(np.allclose(a, b) for a, b in zip(orig_flat, rest_flat))


def test_eval_metrics_shape():
    corpus = tiny_corpus(16)
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=8, log_every=0))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    metrics = eval_lib.evaluate_corpus(
        model, {"params": state.params}, corpus, 8, jax.random.PRNGKey(0),
        max_batches=1,
    )
    for key in ("nll_per_graph", "valid_ratio", "structure_accuracy", "perfect_accuracy"):
        assert key in metrics
        assert 0.0 <= metrics["valid_ratio"] <= 1.0


def test_eval_isomorphism_path_agrees_on_perfect():
    # A perfectly reconstructing "model" is hard to fake; instead check the
    # iso path runs and perfect <= structure <= valid.
    corpus = tiny_corpus(8)
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=8, log_every=0))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    m = eval_lib.reconstruction_metrics(
        model, {"params": state.params},
        jnp.asarray(corpus.labels[:8]), jnp.asarray(corpus.adj[:8]),
        jax.random.PRNGKey(1), use_isomorphism=True,
    )
    assert m["perfect_accuracy"] <= m["structure_accuracy"] + 1e-9
    assert m["structure_accuracy"] <= m["valid_ratio"] + 1e-9


@pytest.mark.slow
def test_data_parallel_training_on_cpu_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = mesh_lib.make_mesh()
    corpus = tiny_corpus(64)
    model = tiny_model()
    config = TrainConfig(batch_size=16, epochs=2, learning_rate=1e-3, log_every=0)
    trainer = Trainer(model, config, mesh=mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    state, history = trainer.fit(state, corpus, log=lambda s: None)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss_per_graph"])


@pytest.mark.slow
def test_fit_resilient_recovers_from_crash(tmp_path):
    corpus = tiny_corpus(32)
    model = tiny_model()
    config = TrainConfig(batch_size=16, epochs=4, learning_rate=1e-3, log_every=0)
    trainer = Trainer(model, config)
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )

    crashes = {"left": 2}
    original_fit = trainer.fit

    def flaky_fit(*args, **kwargs):
        if crashes["left"] > 0:
            crashes["left"] -= 1
            # run one epoch (checkpointing it), then die
            st, hist = original_fit(
                *args, **{**kwargs, "epochs": 1}
            )
            raise RuntimeError("injected failure")
        return original_fit(*args, **kwargs)

    trainer.fit = flaky_fit
    state, history = trainer.fit_resilient(
        state, corpus, str(tmp_path), max_restarts=3, log=lambda s: None
    )
    assert len(history) == 4
    assert any(h.get("recovered") for h in history)


def test_fit_resilient_gives_up(tmp_path):
    corpus = tiny_corpus(32)
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=16, epochs=2, log_every=0))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )

    def always_fail(*args, **kwargs):
        raise RuntimeError("boom")

    trainer.fit = always_fail
    with pytest.raises(RuntimeError):
        trainer.fit_resilient(
            state, corpus, str(tmp_path), max_restarts=2, log=lambda s: None
        )


@pytest.mark.slow
def test_device_loop_packed_transfer_matches_per_step():
    """The chunked device loop ships the corpus as packed bits and unpacks
    on device; it must train to the same kind of result as the per-step
    path (same corpus, same seeds -> identical permutations, so the only
    difference is the transfer encoding)."""
    corpus = tiny_corpus(64)
    model = tiny_model()

    def run(steps_per_call):
        trainer = Trainer(
            model,
            TrainConfig(
                batch_size=16, epochs=2, log_every=0,
                steps_per_call=steps_per_call,
            ),
        )
        state = trainer.init_state(
            jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
        )
        state, history = trainer.fit(state, corpus, log=lambda s: None)
        return history[-1]["loss_per_graph"]

    chunked = run(2)
    per_step = run(1)
    assert np.isfinite(chunked)
    # Same data order and init; RNG folding differs per path, so allow the
    # small sampling-noise gap (dropout + reparameterization draws).
    assert abs(chunked - per_step) / abs(per_step) < 0.05


@pytest.mark.slow
def test_packed_corpus_roundtrip_and_training():
    rng = np.random.default_rng(7)
    labels, adj = sampler.sample_er_batch(rng, 32, 5, 6, 5)
    corpus = data_lib.pack_corpus(labels, adj)
    assert corpus.packed_bits is not None
    dense = corpus.dense_batch(np.arange(32))
    assert np.array_equal(dense, adj)
    train, test = data_lib.train_test_split(corpus, 0.25, seed=0)
    assert train.packed_bits is not None and len(test) == 8
    model = tiny_model()
    trainer = Trainer(model, TrainConfig(batch_size=8, epochs=1, log_every=0,
                                         steps_per_call=4))
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.dense_batch(np.arange(2))
    )
    # packed corpora run the chunked device loop too: the corpus stays
    # bit-packed in device memory and each gathered batch unpacks on device
    state, history = trainer.fit(state, train, log=lambda s: None)
    assert np.isfinite(history[-1]["loss_per_graph"])


@pytest.mark.slow
def test_device_loop_tail_chunk_covers_full_epoch():
    """steps not divisible by steps_per_call: the tail runs as one shorter
    chunk instead of being dropped (ADVICE r3)."""
    corpus = tiny_corpus(7 * 8)  # 7 batches of 8
    model = tiny_model()
    trainer = Trainer(
        model,
        TrainConfig(batch_size=8, epochs=1, log_every=0, steps_per_call=4),
    )
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.adj[:2]
    )
    logs = []
    state, history = trainer.fit(state, corpus, log=logs.append)
    entry = history[-1]
    # 7 steps = one chunk of 4 + one tail chunk of 3; graphs_per_second
    # numerator counts all 7 * 8 graphs
    assert abs(entry["graphs_per_second"] * entry["epoch_seconds"] - 56) < 1e-3
    assert np.isfinite(entry["dispatch_ms"]) and entry["dispatch_ms"] > 0


@pytest.mark.slow
def test_mesh_packed_corpus_uses_device_loop():
    """Packed corpora under a mesh route through the chunked loop (r3 fell
    back to per-step dispatch silently)."""
    rng = np.random.default_rng(3)
    labels, adj = sampler.sample_er_batch(rng, 64, 5, 6, 5)
    corpus = data_lib.pack_corpus(labels, adj)
    mesh = mesh_lib.make_mesh()
    model = tiny_model()
    trainer = Trainer(
        model,
        TrainConfig(batch_size=16, epochs=2, log_every=0, steps_per_call=2),
        mesh=mesh,
    )
    state = trainer.init_state(
        jax.random.PRNGKey(0), corpus.labels[:2], corpus.dense_batch(np.arange(2))
    )
    logs = []
    state, history = trainer.fit(state, corpus, log=logs.append)
    assert any("corpus -> device" in s for s in logs)  # chunked path ran
    assert np.isfinite(history[-1]["loss_per_graph"])
