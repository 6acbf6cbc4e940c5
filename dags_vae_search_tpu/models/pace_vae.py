"""PACE transformer DAG-VAE, TPU-native (flax).

Re-design of the reference ``PaceVaeV3`` (``src/encoders/pace.py:1139-2046``)
with the same math but tensor-only interfaces:

- featurization is a pure on-device transform of ``(labels, adj)`` batches
  (the reference featurizes one igraph at a time in Python at dataset load,
  ``experiments/01_bn_asia/main.py:57-76`` — its load-time bottleneck);
- the DAG attention mask comes from an O(log N) closure
  (``graphs.attention_allowed``) instead of a sequential matmul loop
  (``pace.py:1307-1343``);
- the teacher-forced loss is fully batched over static upper-triangular
  pair indices (the reference's ``loss_log_likelihood_full_vectorized``,
  ``pace.py:1880-1972``, boolean-gathers per batch — dynamic shapes);
- autoregressive sampling decode is a fixed-length ``lax.scan`` with
  on-device categorical/Bernoulli sampling (``models/decode.py``), replacing
  the per-step host round-trip + igraph mutation loop (``pace.py:1666-1749``).

Architecture (= reference):
  label embed Linear(L,E)+ReLU concat GNN positional encoding (E) ->
  d_model = 2E; post-LN transformer encoder (mask = ancestors+self) ->
  flatten -> fc1/fc2 = mu/logvar; fc3(z) -> decoder memory [N, d];
  teacher-forced post-LN decoder -> add_node / add_edge heads;
  loss = node NLL + edge BCE (sums) + beta*KL, beta=0.005
  (``pace.py:2029-2033``); reparameterize with eps_scale=0.01
  (``pace.py:1649-1664``).

Positions: the reference stores igraph's ``topological_sorting()`` as the
``position`` attribute; for slot-indexed DAGs (all corpora and all decoded
graphs) that order is the identity, so the position one-hot is a constant
eye and the GNN positional input reduces to ``[I ‖ A^T]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dags_vae_search_tpu.graphs.dag import (
    NUM_VIRTUAL,
    attention_allowed,
    pace_wrap,
)
from dags_vae_search_tpu.models.transformer import (
    Decoder,
    Dense,
    Encoder,
)

xavier_gain_1414 = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")


class PaceVAE(nn.Module):
    """The DAG-VAE over ``num_real_vertices``-node labeled DAGs.

    Attributes mirror the reference ctor (``pace.py:1140-1156``); virtual
    vertices/labels (+3) are handled internally, exactly like ``PaceVaeV3``.
    asia flagship config: (8, 8, embed=32, heads=8, layers=3, latent=32,
    fc_hidden=32, dropout=0.15) = 284,556 params.
    """

    num_real_vertices: int
    real_label_cardinality: int
    embed_size: int = 32
    num_heads: int = 8
    num_layers: int = 3
    latent_size: int = 32
    fc_hidden: int = 32
    dropout: float = 0.15
    beta: float = 0.005
    epsilon_scale: float = 0.01
    # 'v3' = BCE-with-logits edge likelihood (PaceVaeV2/V3,
    # pace.py:1965-1967); 'v1' = BCE on sigmoid probabilities with torch's
    # log clamp at -100 (PaceVae V1, pace.py:607-608 via
    # F.binary_cross_entropy).  On this package's fixed-size corpora the
    # three reference loss generations otherwise compute identical sums
    # (V1's per-graph loop and V2's per-graph meshgrid are vectorization
    # differences only), so one flag covers the whole family.
    loss_variant: str = "v3"
    # Direct linear edge readout from z: adds fc(z) -> [n-1, n-1] as a
    # per-pair bias on the edge logits (teacher-forced loss AND sampling
    # decode).  An extension over the reference decoder (whose edge head
    # sees only transformer hidden states): with latent_size >= #pairs it
    # makes reconstruction linearly decodable — the round-4 n=37 probes
    # show the transformer-only path learns edge marginals but cannot
    # reach graph-specific reconstruction at catalog scale (PROBES.md).
    edge_readout: bool = False
    # > 0 factorizes the readout: z -> U [n-1, r], V [n-1, r], bias =
    # U V^T / sqrt(r).  The monolithic fc(z) head is a LINEAR map whose
    # image spans at most latent_size pair-dimensions — at hepar2 (2,415
    # pairs vs the 1,792 latent cap) it is rank-starved and reconstruction
    # collapses (VERDICT r4 weak #1).  The bilinear form is quadratic in z,
    # so its reachable bias set is not rank-bounded by latent_size, and its
    # parameter/compute cost is O(n r) instead of O(n^2) — the n >= 70
    # regime's readout.
    edge_readout_rank: int = 0
    # operand dtype for every matmul ("bfloat16" = MXU-native; accumulation
    # and params stay float32) — the train-MFU lever (VERDICT r4 weak #3)
    matmul_dtype: Optional[str] = None

    @property
    def max_n(self) -> int:
        return self.num_real_vertices + NUM_VIRTUAL

    @property
    def cardinality(self) -> int:
        return self.real_label_cardinality + NUM_VIRTUAL

    @property
    def d_model(self) -> int:
        return 2 * self.embed_size

    def setup(self):
        n, d = self.max_n, self.d_model
        # GNN positional encoding (pace.py:186-221): W1 [2N, 2E], W2 [2E, E],
        # xavier-uniform gain 1.414.
        self.pos_w1 = self.param(
            "pos_w1", xavier_gain_1414, (2 * n, 2 * self.embed_size), jnp.float32
        )
        self.pos_w2 = self.param(
            "pos_w2", xavier_gain_1414, (2 * self.embed_size, self.embed_size),
            jnp.float32,
        )
        md = self.matmul_dtype
        self.label_embed = Dense(self.embed_size, name="label_embed",
                                 matmul_dtype=md)
        self.encoder = Encoder(self.num_layers, self.num_heads, self.dropout,
                               matmul_dtype=md)
        self.fc1 = Dense(self.latent_size, name="fc1", matmul_dtype=md)
        self.fc2 = Dense(self.latent_size, name="fc2", matmul_dtype=md)
        self.fc3 = Dense(n * d, name="fc3", matmul_dtype=md)
        self.decoder = Decoder(self.num_layers, self.num_heads, self.dropout,
                               matmul_dtype=md)
        self.add_node_hidden = Dense(self.fc_hidden, name="add_node_hidden",
                                     matmul_dtype=md)
        self.add_node_out = Dense(self.cardinality, name="add_node_out",
                                  matmul_dtype=md)
        self.add_edge_hidden = Dense(d, name="add_edge_hidden",
                                     matmul_dtype=md)
        self.add_edge_out = Dense(1, name="add_edge_out", matmul_dtype=md)
        if self.edge_readout:
            if self.edge_readout_rank > 0:
                r = self.edge_readout_rank
                self.edge_readout_u = Dense((n - 1) * r, name="edge_readout_u",
                                            matmul_dtype=md)
                self.edge_readout_v = Dense((n - 1) * r, name="edge_readout_v",
                                            matmul_dtype=md)
            else:
                self.edge_readout_fc = Dense(
                    (n - 1) * (n - 1), name="edge_readout_fc", matmul_dtype=md
                )
        self.drop = nn.Dropout(self.dropout)

    # ---------------------------------------------------------------- utils

    def _pos_encoding(self, adj: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """[I ‖ A^T] -> relu(. W1) -> dropout -> . W2 -> dropout; [B, N, E]."""
        b, n, _ = adj.shape
        eye = jnp.broadcast_to(jnp.eye(n, dtype=adj.dtype), (b, n, n))
        x = jnp.concatenate([eye, jnp.swapaxes(adj, -1, -2)], axis=-1)
        w1, w2 = self.pos_w1, self.pos_w2
        if self.matmul_dtype is not None:
            md = jnp.dtype(self.matmul_dtype)
            x, w1, w2 = x.astype(md), w1.astype(md), w2.astype(md)
        h = nn.relu(jnp.dot(x, w1, preferred_element_type=jnp.float32))
        h = self.drop(h, deterministic=deterministic)
        if self.matmul_dtype is not None:
            h = h.astype(jnp.dtype(self.matmul_dtype))
        h = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        return self.drop(h, deterministic=deterministic)

    def _vertex_features(
        self, labels: jnp.ndarray, adj: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        """concat(label embedding, positional embedding) -> [B, N, d_model]."""
        labels_1h = jax.nn.one_hot(labels, self.cardinality, dtype=jnp.float32)
        emb = nn.relu(self.label_embed(labels_1h))
        pos = self._pos_encoding(adj, deterministic)
        return jnp.concatenate([emb, pos], axis=-1)

    def _add_node(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.add_node_out(nn.relu(self.add_node_hidden(h)))

    def _add_edge(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.add_edge_out(nn.relu(self.add_edge_hidden(h)))

    def _edge_bias(self, z: jnp.ndarray, n: int) -> jnp.ndarray:
        """z -> per-pair edge-logit bias [B, n-1, n-1] (loss-pair indexing:
        row i = child slot, column j = parent slot)."""
        if self.edge_readout_rank > 0:
            r = self.edge_readout_rank
            u = self.edge_readout_u(z).reshape(-1, n - 1, r)
            v = self.edge_readout_v(z).reshape(-1, n - 1, r)
            return jnp.einsum(
                "bir,bjr->bij", u, v, preferred_element_type=jnp.float32
            ) / (r**0.5)
        return self.edge_readout_fc(z).reshape(-1, n - 1, n - 1)

    def _edge_bias_row(self, z: jnp.ndarray, n: int, i: jnp.ndarray) -> jnp.ndarray:
        """Row ``i`` of :meth:`_edge_bias` without materializing the full
        [B, n-1, n-1] bias — the decode scan needs one child row per step
        (at link n=724 the full bias is ~0.5 M floats per graph per step)."""
        if self.edge_readout_rank > 0:
            r = self.edge_readout_rank
            u = self.edge_readout_u(z).reshape(-1, n - 1, r)
            u_row = jax.lax.dynamic_index_in_dim(u, i, axis=1, keepdims=False)
            v = self.edge_readout_v(z).reshape(-1, n - 1, r)
            return jnp.einsum(
                "br,bjr->bj", u_row, v, preferred_element_type=jnp.float32
            ) / (r**0.5)
        bias = self.edge_readout_fc(z).reshape(-1, n - 1, n - 1)
        return jax.lax.dynamic_index_in_dim(bias, i, axis=1, keepdims=False)

    # ------------------------------------------------------------- encoding

    def encode_wrapped(
        self,
        labels: jnp.ndarray,
        adj: jnp.ndarray,
        allowed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mu, logvar) from PACE-wrapped tensors (``pace.py:1613-1641``)."""
        if allowed is None:
            allowed = attention_allowed(adj)
        feats = self._vertex_features(labels, adj, deterministic)
        memory = self.encoder(feats, allowed=allowed, deterministic=deterministic)
        flat = memory.reshape(memory.shape[0], self.max_n * self.d_model)
        return self.fc1(flat), self.fc2(flat)

    def encode(
        self, labels: jnp.ndarray, adj: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mu, logvar) from *labeled* (real-vertex) tensors."""
        wrapped = pace_wrap(labels, adj)
        return self.encode_wrapped(
            wrapped.labels, wrapped.adj, deterministic=deterministic
        )

    def reparameterize(
        self, mu: jnp.ndarray, logvar: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        if deterministic:
            return mu
        std = jnp.exp(0.5 * logvar)
        eps = (
            jax.random.normal(self.make_rng("reparam"), mu.shape)
            * self.epsilon_scale
        )
        return mu + eps * std

    # ------------------------------------------------------------- decoding

    def decoder_output(
        self,
        z: jnp.ndarray,
        labels: jnp.ndarray,
        adj: jnp.ndarray,
        allowed: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced decoder hidden states [B, N, d] for PACE tensors."""
        b = z.shape[0]
        memory = self.fc3(z).reshape(b, self.max_n, self.d_model)
        tgt = self._vertex_features(labels, adj, deterministic)
        return self.decoder(
            tgt, memory, allowed=allowed, deterministic=deterministic
        )

    def decode_step(
        self,
        z: jnp.ndarray,
        labels: jnp.ndarray,  # int32[B, N] current PACE labels (pad=OUTPUT)
        adj: jnp.ndarray,  # float32[B, N, N] current PACE adjacency
        allowed: jnp.ndarray,  # bool[B, N, N] attention mask for this step
        idx: jnp.ndarray,  # int32 — slot being generated (2..N-1)
    ):
        """One sampling-decode step: (type logits [B, L], parent-edge probs
        [B, N] indexed by parent slot).  Deterministic submodules (decode is
        an eval-mode operation in the reference, ``main.py:228``).  The
        attention mask is maintained incrementally by the caller (each new
        node's ancestor set = its parents + their ancestors — O(N^2) per
        step instead of a fresh O(N^3 log N) closure)."""
        out = self.decoder_output(z, labels, adj, allowed, deterministic=True)
        h_new = jax.lax.dynamic_index_in_dim(out, idx - 1, axis=1, keepdims=False)
        type_logits = self._add_node(h_new)  # [B, L]

        # Parent slot p (1 <= p <= idx-1) pairs h_new with hidden out[p-1]
        # (pace.py:1716: edge head sees [h_new ‖ h_vi], parent = vi + 1).
        parent_hidden = jnp.roll(out, 1, axis=1)
        pair = jnp.concatenate(
            [
                jnp.broadcast_to(h_new[:, None, :], parent_hidden.shape),
                parent_hidden,
            ],
            axis=-1,
        )
        edge_logits = self._add_edge(pair)[..., 0]  # [B, N]
        if self.edge_readout:
            n = labels.shape[-1]
            # loss pair (i, j) = (slot idx - 1, parent slot p - 1): take row
            # i = idx-1 and shift one slot right so position p reads [i, p-1]
            row = self._edge_bias_row(z, n, idx - 1)  # [B, n-1]
            row = jnp.pad(row, ((0, 0), (0, 1)))
            edge_logits = edge_logits + jnp.roll(row, 1, axis=-1)
        edge_probs = jax.nn.sigmoid(edge_logits)
        return type_logits, edge_probs

    # ----------------------------------------------------------------- loss

    def loss_wrapped(
        self,
        labels: jnp.ndarray,
        adj: jnp.ndarray,
        allowed: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ):
        """(total, recon_nll, kld) on PACE-wrapped tensors — sums over the
        batch, matching the reference reductions (``pace.py:1880-2035``)."""
        if allowed is None:
            allowed = attention_allowed(adj)
        b, n = labels.shape

        mu, logvar = self.encode_wrapped(
            labels, adj, allowed=allowed, deterministic=deterministic
        )
        z = self.reparameterize(mu, logvar, deterministic)
        out = self.decoder_output(z, labels, adj, allowed, deterministic)

        # Node NLL: position t predicts the label of vertex t+1 (the start
        # vertex is never predicted), t < n-1 (pace.py:1891-1919).
        node_logp = jax.nn.log_softmax(self._add_node(out), axis=-1)
        targets = jax.nn.one_hot(
            labels[:, 1:], self.cardinality, dtype=jnp.float32
        )
        node_ll = jnp.sum(node_logp[:, : n - 1, :] * targets)

        # Edge BCE over static pair indices (i > j, both < n-1): logit from
        # [out_i ‖ out_j], target adj[j+1, i+1] (pace.py:1921-1971).
        pi, pj = np.tril_indices(n - 1, k=-1)
        pair = jnp.concatenate([out[:, pi, :], out[:, pj, :]], axis=-1)
        logits = self._add_edge(pair)[..., 0]  # [B, P]
        if self.edge_readout:
            logits = logits + self._edge_bias(z, n)[:, pi, pj]
        edge_targets = adj[:, pj + 1, pi + 1]
        if self.loss_variant == "v1":
            # V1 numerics: BCE on the sigmoid output with torch's
            # log-clamp at -100 (F.binary_cross_entropy semantics) —
            # loses precision for |logit| >~ 17 where sigmoid saturates
            # in float32, exactly like the reference.
            probs = jax.nn.sigmoid(logits)
            log_p = jnp.maximum(jnp.log(probs), -100.0)
            log_1p = jnp.maximum(jnp.log(1.0 - probs), -100.0)
            edge_ll = jnp.sum(
                edge_targets * log_p + (1.0 - edge_targets) * log_1p
            )
        else:
            edge_ll = jnp.sum(
                edge_targets * jax.nn.log_sigmoid(logits)
                + (1.0 - edge_targets) * jax.nn.log_sigmoid(-logits)
            )

        log_likelihood = node_ll + edge_ll
        kld = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))
        total = -log_likelihood + self.beta * kld
        return total, -log_likelihood, kld

    def loss(
        self, labels: jnp.ndarray, adj: jnp.ndarray, deterministic: bool = False
    ):
        """(total, recon_nll, kld) from labeled (real-vertex) tensors."""
        wrapped = pace_wrap(labels, adj)
        return self.loss_wrapped(
            wrapped.labels, wrapped.adj, deterministic=deterministic
        )

    def __call__(self, labels: jnp.ndarray, adj: jnp.ndarray):
        """Init/inspection entry point: deterministic loss triple."""
        return self.loss(labels, adj, deterministic=True)


def make_asia_model() -> PaceVAE:
    """The flagship config (reference ``experiments/01_bn_asia/main.py:33-43``)."""
    return PaceVAE(num_real_vertices=8, real_label_cardinality=8)
