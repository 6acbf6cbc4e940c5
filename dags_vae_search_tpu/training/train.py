"""Jitted VAE training loop.

Reference semantics (``src/train_model.py`` + the V3 loop in
``experiments/01_bn_asia/main.py:117-193``): per batch — loss, backward,
``clip_grad_norm_(1.0)``, Adam; per epoch — ``ReduceLROnPlateau(factor=0.1,
patience=10)`` on the last batch loss, wall-clock print, epoch-numbered
checkpoint.  Here the step is one jitted function (featurization included),
the LR plateau controller is a small host-side state machine driving an
``inject_hyperparams`` Adam, and checkpoints are orbax pytrees.

Multi-chip: pass a mesh — batches are sharded over the ``data`` axis,
params replicated, and the gradient all-reduce is inserted by XLA (SPMD).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from dags_vae_search_tpu.models.pace_vae import PaceVAE
from dags_vae_search_tpu.parallel import mesh as mesh_lib
from dags_vae_search_tpu.training import data as data_lib
from dags_vae_search_tpu.utils.debug import nan_guard
from dags_vae_search_tpu.utils.profiling import StepTimer, annotate


@dataclass
class TrainConfig:
    batch_size: int = 32
    epochs: int = 10
    learning_rate: float = 1e-4
    clip_norm: float = 1.0
    # torch ReduceLROnPlateau defaults used by the reference (main.py:162).
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    min_learning_rate: float = 0.0
    # 'plateau' (reference parity) or 'cosine' (linear warmup_epochs then
    # cosine decay to min_learning_rate) — both drive the same injected
    # Adam hyperparam host-side, so switching never recompiles the step.
    lr_schedule: str = "plateau"
    warmup_epochs: int = 5
    seed: int = 42
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1
    log_every: int = 100
    # >1 enables the device-resident loop: corpus in HBM, K optimizer steps
    # per dispatch under lax.scan. Useful when device dispatch latency >>
    # step compute; costs a much longer one-time XLA compile of the scanned
    # step, so the per-step path (1) is the default.
    steps_per_call: int = 1


def _dense_adj(adj: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dense float32 adjacency from either encoding (static under jit).

    uint8 input = np.packbits rows (MSB-first): unpack with shifts and trim
    the byte padding; anything else is already dense and only needs a cast.
    """
    if adj.dtype != jnp.uint8:
        return adj.astype(jnp.float32)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (adj[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*adj.shape[:-1], -1)[..., :n].astype(jnp.float32)


class PlateauState(NamedTuple):
    """Host-side ReduceLROnPlateau (mode='min', rel threshold)."""

    best: float
    bad_epochs: int
    lr: float

    def step(self, value: float, config: TrainConfig) -> "PlateauState":
        if value < self.best * (1.0 - config.plateau_threshold):
            return PlateauState(value, 0, self.lr)
        bad = self.bad_epochs + 1
        if bad > config.plateau_patience:
            new_lr = max(self.lr * config.plateau_factor, config.min_learning_rate)
            return PlateauState(self.best, 0, new_lr)
        return PlateauState(self.best, bad, self.lr)


def cosine_lr(epoch: int, total_epochs: int, config: "TrainConfig") -> float:
    """Linear warmup then cosine decay, computed per epoch (1-indexed)."""
    peak = config.learning_rate
    floor = config.min_learning_rate
    warm = max(config.warmup_epochs, 0)
    if warm and epoch <= warm:
        return peak * epoch / warm
    span = max(total_epochs - warm, 1)
    t = min(max(epoch - warm, 0) / span, 1.0)
    return floor + 0.5 * (peak - floor) * (1.0 + float(np.cos(np.pi * t)))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    def __init__(
        self,
        model: PaceVAE,
        config: TrainConfig,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_norm),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=config.learning_rate
            ),
        )
        self._train_step = jax.jit(self._make_train_step())
        self._chunk_step = jax.jit(self._make_chunk_step())

    def _make_train_step(self) -> Callable:
        model, optimizer = self.model, self.optimizer

        def train_step(state: TrainState, labels, adj, key):
            def loss_fn(params):
                total, recon, kld = model.apply(
                    {"params": params},
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

            (total, (recon, kld)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": total, "recon": recon, "kld": kld}
            return TrainState(params, opt_state, state.step + 1), metrics

        return train_step

    def _make_chunk_step(self) -> Callable:
        """Many train steps per dispatch: the corpus lives in HBM and a
        ``lax.scan`` over per-step index blocks runs K optimizer steps in
        one jitted call — removing the per-step host->device round trip
        that dominates small-batch training through a remote device."""
        train_step = self._make_train_step()

        def chunk_step(state: TrainState, corpus_labels, corpus_adj, idx, key):
            # idx: int32[K, B] — gather indices for K consecutive steps.
            # ``corpus_adj`` is dense float32[R, n, n] or bit-packed
            # uint8[R, n, ceil(n/8)] (large-n corpora stay packed in HBM —
            # n=724 costs 91 B/row packed vs 2 MB dense); dtype is static
            # under jit, so the unpack branch compiles away when dense.
            def body(carry, step_idx):
                state, key = carry
                key, sub = jax.random.split(key)
                labels = jnp.take(corpus_labels, step_idx, axis=0).astype(
                    jnp.int32
                )
                adj = jnp.take(corpus_adj, step_idx, axis=0)
                adj = _dense_adj(adj, labels.shape[-1])
                state, metrics = train_step(state, labels, adj, sub)
                return (state, key), jnp.stack(
                    [metrics["loss"], metrics["recon"], metrics["kld"]]
                )

            (state, _), stacked = jax.lax.scan(body, (state, key), idx)
            return state, stacked  # stacked: [K, 3]

        return chunk_step

    def init_state(self, rng: jax.Array, sample_labels, sample_adj) -> TrainState:
        variables = self.model.init(
            rng, jnp.asarray(sample_labels), jnp.asarray(sample_adj)
        )
        params = variables["params"]
        opt_state = self.optimizer.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = mesh_lib.replicate_tree(self.mesh, state)
        return state

    def set_learning_rate(self, state: TrainState, lr: float) -> TrainState:
        opt_state = list(state.opt_state)
        inner = opt_state[1]
        hyperparams = dict(inner.hyperparams)
        hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        opt_state[1] = inner._replace(hyperparams=hyperparams)
        return state._replace(opt_state=tuple(opt_state))

    def fit_resilient(
        self,
        state: TrainState,
        corpus: data_lib.Corpus,
        checkpoint_dir: str,
        max_restarts: int = 3,
        epochs: Optional[int] = None,
        start_epoch: int = 1,
        log: Callable[[str], None] = print,
    ) -> tuple:
        """Crash-resilient fit: per-epoch checkpoints; on failure, restore
        the last epoch's params and continue (optimizer moments restart —
        documented elasticity semantics).  The reference has no recovery
        mechanism at all (SURVEY.md §5: "nothing restarts training")."""
        from dags_vae_search_tpu.training import checkpoint as ckpt

        total = epochs if epochs is not None else self.config.epochs
        history: List[Dict] = []
        restarts = 0

        def save(epoch, st):
            ckpt.save_checkpoint(checkpoint_dir, epoch, {"params": st.params})

        while len(history) < total:
            begin = start_epoch + len(history)
            try:
                state, part = self.fit(
                    state,
                    corpus,
                    epochs=total - len(history),
                    start_epoch=begin,
                    log=log,
                    checkpoint_fn=save,
                )
                history.extend(part)
            except Exception as exc:  # noqa: BLE001 — elastic boundary
                restarts += 1
                if restarts > max_restarts:
                    raise
                latest = ckpt.latest_epoch(checkpoint_dir)
                log(
                    f"fit_resilient: restart {restarts}/{max_restarts} after "
                    f"{type(exc).__name__}: {exc}; resuming from epoch {latest}"
                )
                if latest is not None and latest >= begin:
                    params = ckpt.restore_params(
                        checkpoint_dir, latest, state.params
                    )
                    state = state._replace(
                        params=params, opt_state=self.optimizer.init(params)
                    )
                    history.extend(
                        {"epoch": e, "recovered": True}
                        for e in range(begin, latest + 1)
                    )
        return state, history

    def fit(
        self,
        state: TrainState,
        corpus: data_lib.Corpus,
        epochs: Optional[int] = None,
        start_epoch: int = 1,
        log: Callable[[str], None] = print,
        checkpoint_fn: Optional[Callable[[int, TrainState], None]] = None,
    ) -> tuple:
        """Epoch loop; returns (state, history of per-epoch dicts)."""
        config = self.config
        epochs = epochs if epochs is not None else config.epochs
        rng_np = np.random.default_rng(config.seed)
        key = jax.random.PRNGKey(config.seed)
        plateau = PlateauState(float("inf"), 0, config.learning_rate)
        history: List[Dict] = []
        time_start = time.time()
        device_loop = config.steps_per_call > 1

        if device_loop:
            # The whole corpus moves to HBM once.  Through the remote-tunnel
            # device the TRANSFER (not compilation, which measures ~39 s)
            # dominates startup, so 0/1 adjacencies always travel as packed
            # bits (32x smaller than dense float32 — e.g. the 14k-row n=37
            # alarm train split is 7 MB dense vs 0.9 MB packed+labels, and
            # dense grows quadratically with n) with int16 labels.  Mid-size
            # corpora then unpack ONCE into a dense HBM corpus (cheapest
            # per-step gather); large-n corpora (n > 64, pre-packed by the
            # loader) STAY packed in HBM and the chunk step unpacks each
            # gathered batch (link: 91 B/row packed vs 2 MB dense).  Mesh
            # runs replicate the packed corpus and also unpack per batch —
            # the gather/unpack is SPMD-compatible, so multichip training
            # uses the same chunked loop (r3 silently fell back to per-step
            # dispatch for packed corpora under a mesh).
            t_put = time.time()
            n = corpus.num_vertices
            host_labels = corpus.labels.astype(np.int16)
            if corpus.packed_bits is not None:
                host_packed = corpus.packed_bits
            else:
                host_packed = np.packbits(
                    (np.asarray(corpus.adj) > 0).astype(np.uint8), axis=-1
                )  # uint8[R, n, ceil(n/8)] (MSB-first rows)
            sent_mb = (host_packed.nbytes + host_labels.nbytes) / 1e6
            if self.mesh is not None:
                corpus_labels, corpus_adj = mesh_lib.replicate_tree(
                    self.mesh,
                    (jnp.asarray(host_labels), jnp.asarray(host_packed)),
                )
            elif corpus.packed_bits is None:

                @jax.jit
                def _unpack(p, lb):
                    return _dense_adj(p, n), lb.astype(jnp.int32)

                corpus_adj, corpus_labels = _unpack(host_packed, host_labels)
            else:
                corpus_labels = jnp.asarray(host_labels)
                corpus_adj = jnp.asarray(host_packed)
            jax.block_until_ready((corpus_labels, corpus_adj))
            log(
                f"corpus -> device: {sent_mb:,.0f} MB sent "
                f"in {time.time() - t_put:.1f}s"
            )

        horizon = start_epoch + epochs - 1
        for epoch in range(start_epoch, start_epoch + epochs):
            if config.lr_schedule == "cosine":
                lr_now = cosine_lr(epoch, horizon, config)
                if lr_now != plateau.lr:
                    state = self.set_learning_rate(state, lr_now)
                    plateau = plateau._replace(lr=lr_now)
            last = None
            batches = 0
            dispatches = 0
            epoch_t0 = time.time()
            timer = StepTimer(window=10_000)
            if device_loop:
                b = config.batch_size
                steps = len(corpus) // b
                if steps == 0:
                    raise ValueError("corpus smaller than one batch")
                perm = rng_np.permutation(len(corpus))[: steps * b].reshape(
                    steps, b
                )
                k = min(config.steps_per_call, steps)
                # Full epoch coverage: the tail (steps % k) runs as ONE
                # shorter chunk — one extra compiled program per distinct
                # tail size, instead of silently dropping up to k-1 batches
                # per epoch (with k=100 and e.g. sachs' ~225 steps that
                # drop was ~11% of every epoch).
                for start in range(0, steps, k):
                    kc = min(k, steps - start)
                    block = jnp.asarray(
                        perm[start : start + kc], dtype=jnp.int32
                    )
                    if self.mesh is not None:
                        block = jax.device_put(
                            block,
                            jax.sharding.NamedSharding(
                                self.mesh, jax.sharding.PartitionSpec(None, "data")
                            ),
                        )
                    key, sub = jax.random.split(key)
                    t_chunk = time.time()
                    with timer.step(items=kc), annotate("train_chunk"):
                        state, stacked = self._chunk_step(
                            state, corpus_labels, corpus_adj, block, sub
                        )
                        jax.block_until_ready(stacked)
                    if epoch == start_epoch and batches == 0:
                        log(
                            "first chunk (compile + run): "
                            f"{time.time() - t_chunk:.1f}s"
                        )
                    batches += kc
                    dispatches += 1
                    # log when a multiple of log_every was crossed this chunk
                    if config.log_every and (
                        batches // config.log_every
                        != (batches - kc) // config.log_every
                    ):
                        vals = np.asarray(stacked[-1])
                        log(
                            f"epoch {epoch} batch {batches}: "
                            f"loss {vals[0] / b:.5f} recon {vals[1] / b:.5f} "
                            f"kld {vals[2] / b:.5f}"
                        )
                vals = np.asarray(stacked[-1])
                last = {"loss": vals[0], "recon": vals[1], "kld": vals[2]}
            else:
                for labels, adj in data_lib.epoch_batches(
                    corpus, config.batch_size, rng_np
                ):
                    if self.mesh is not None:
                        labels, adj = mesh_lib.shard_batch(self.mesh, labels, adj)
                    else:
                        labels, adj = jnp.asarray(labels), jnp.asarray(adj)
                    key, sub = jax.random.split(key)
                    # no per-step device sync: dispatches pipeline through
                    # the remote device; the timer here measures dispatch
                    # cost, and true step time comes from the epoch clock.
                    with timer.step(items=1), annotate("train_step"):
                        state, metrics = self._train_step(state, labels, adj, sub)
                    last = metrics
                    batches += 1
                    if config.log_every and batches % config.log_every == 0:
                        log(
                            f"epoch {epoch} batch {batches}: "
                            f"loss {float(metrics['loss']) / config.batch_size:.5f} "
                            f"recon {float(metrics['recon']) / config.batch_size:.5f} "
                            f"kld {float(metrics['kld']) / config.batch_size:.5f}"
                        )

            loss_value = float(last["loss"]) if last is not None else float("nan")
            if not np.isfinite(loss_value):
                nan_guard(last, name=f"epoch {epoch} metrics")
            if config.lr_schedule == "plateau":
                new_plateau = plateau.step(loss_value, config)
                if new_plateau.lr != plateau.lr:
                    log(f"epoch {epoch}: reducing lr to {new_plateau.lr:.2e}")
                    state = self.set_learning_rate(state, new_plateau.lr)
                plateau = new_plateau

            epoch_dt = time.time() - epoch_t0
            entry = {
                "epoch": epoch,
                "loss_per_graph": loss_value / config.batch_size,
                "recon_per_graph": float(last["recon"]) / config.batch_size,
                "kld_per_graph": float(last["kld"]) / config.batch_size,
                "epoch_seconds": epoch_dt,
                "graphs_per_second": batches * config.batch_size / epoch_dt,
                # measured per-optimizer-step time: synchronous (true) on the
                # device-loop path, dispatch-side on the per-step path.
                "step_ms": 1e3 * epoch_dt / max(batches, 1),
                # per-step share of a dispatch: divide by the MEAN ACTUAL
                # chunk length (config.steps_per_call overstates it when the
                # epoch is shorter than one chunk — andes/link have ~4-6
                # steps/epoch vs steps_per_call 25).
                "dispatch_ms": 1e3 * timer.mean_step_seconds()
                / max(
                    batches / dispatches if device_loop and dispatches else 1.0,
                    1e-9,
                ),
                "lr": plateau.lr,
            }
            history.append(entry)
            log(
                f"====> epoch {epoch} loss {entry['loss_per_graph']:.5f} "
                f"({entry['graphs_per_second']:,.0f} graphs/s, "
                f"total {time.time() - time_start:.1f}s)"
            )
            if checkpoint_fn is not None and epoch % config.checkpoint_every == 0:
                checkpoint_fn(epoch, state)

        return state, history
