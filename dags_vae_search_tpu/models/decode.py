"""Autoregressive sampling decode as a fixed-length ``lax.scan``.

The reference's ``PaceVaeV3.decode`` (``src/encoders/pace.py:1666-1749``)
crosses the device->host boundary every step: softmax to numpy, per-graph
``np.random.choice``, igraph mutation, and a full Python re-featurization of
every partial graph.  Here the whole decode is one jitted scan over node
slots with on-device categorical/Bernoulli sampling; the partial graphs are
the (labels, adj) state tensors themselves.

Reproduced reference semantics (including its quirks):

- slot 0/1 pre-seeded with start/input, start->input edge;
- each step samples a node type from ``add_node`` logits and in-edges from
  per-parent Bernoulli over ``sigmoid(add_edge([h_new ‖ h_parent]))``;
- if the *sampled* type is the output label, the new node instead connects
  every current sink (out-degree 0) and the graph freezes — note the
  reference keys this branch on the sampled type even at the last slot
  where the stored label is forced to output (``pace.py:1721-1741``), so a
  non-output sample at the last slot takes ordinary Bernoulli edges;
- graphs that freeze early keep output-labeled placeholder slots, which
  unwrap to out-of-range labels and are counted invalid (the reference
  would crash converting them — trained models never emit them).

Constrained sampling (``constrain_labels=True``, the default) restricts the
categorical to the *support of the training distribution*: corpora are
fixed-size graphs whose labels are drawn without replacement
(``graphs/sampler.py:77-100``; reference ``src/toolkit/labeled.py:318-321``
``random.sample``), so virtual labels never appear in generated slots, the
output label appears only at the last slot, and — when the cardinality
equals the vertex count, i.e. labels are exact permutations — no real label
repeats.  Masking the logits accordingly is distribution-consistent (it
renormalizes over outcomes the training data could actually contain) and
makes every decode a valid, scoreable graph; without it the probability of
sampling each label exactly once vanishes for n >= 20 and latent search
scores -inf everywhere.  Pass ``constrain_labels=False`` for the
reference's unconstrained semantics (parity tests, quirk reproduction).

``max_in_degree`` caps each node's sampled *real* parents (the virtual
INPUT edge at slot 1 unwraps away and never counts): the SURVEY §7 step-4
sparsity mask, sized from the experiment's ``search.max_parents``.  The
search scorer marks in-degree > max_parents as -inf
(``scoring/bic.py:163-165``), so without the cap a decode can be *valid*
yet *unscoreable* — the round-2 -inf mechanism at hepar2 (VERDICT r2 #2).
When a step samples more than the cap, the cap highest-probability parents
are kept (a hard top-k mask on the Bernoulli edge head; density-prior
anchor ``/root/reference/README.md:53-58``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dags_vae_search_tpu.graphs.dag import (
    LABEL_INPUT,
    LABEL_OUTPUT,
    LABEL_START,
    DagBatch,
    is_valid_labeled,
    pace_unwrap,
)
from dags_vae_search_tpu.models.pace_vae import PaceVAE


def sample_decode(
    model: PaceVAE,
    variables,
    z: jnp.ndarray,
    rng: jax.Array,
    constrain_labels: bool = True,
    temperature=1.0,
    max_in_degree: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode latents to PACE tensors.

    Returns (labels int32[B, N], adj float32[B, N, N], finished bool[B])
    over the wrapped (N = real + 3) vertex space.  See the module docstring
    for ``constrain_labels`` / ``max_in_degree`` semantics.

    ``temperature`` sharpens both sampling heads (logits / T); it may be a
    traced scalar, so annealing schedules reuse one compiled decode.
    T <= 1e-3 is the exact mode decode (argmax labels, edges at p > 0.5);
    T = 1 is the reference's sampling semantics (``pace.py:1710-1728``).
    """
    batch = z.shape[0]
    n = model.max_n
    card = model.cardinality
    temp = jnp.asarray(temperature, jnp.float32)
    hard = temp <= 1e-3
    inv_t = 1.0 / jnp.maximum(temp, 1e-3)
    # Used-label masking only applies when corpus labels are permutations.
    mask_used = (
        constrain_labels
        and model.real_label_cardinality == model.num_real_vertices
        and model.real_label_cardinality > 1
    )

    labels0 = jnp.full((batch, n), LABEL_OUTPUT, dtype=jnp.int32)
    labels0 = labels0.at[:, 0].set(LABEL_START).at[:, 1].set(LABEL_INPUT)
    adj0 = jnp.zeros((batch, n, n), dtype=jnp.float32).at[:, 0, 1].set(1.0)
    # reach[b, v, w] = path v -> w among built slots; maintained
    # incrementally (new node's ancestors = parents + their ancestors).
    reach0 = adj0
    finished0 = jnp.zeros((batch,), dtype=bool)
    used0 = jnp.zeros((batch, card), dtype=bool)

    slot = jnp.arange(n)
    eye = jnp.eye(n, dtype=bool)
    # Virtual labels are never sampleable under constrained decode: START and
    # INPUT occupy pre-seeded slots 0/1 only.
    virtual = jnp.zeros((card,), dtype=bool)
    virtual = virtual.at[LABEL_START].set(True).at[LABEL_INPUT].set(True)
    is_output_label = jnp.zeros((card,), dtype=bool).at[LABEL_OUTPUT].set(True)

    def step(carry, idx):
        labels, adj, reach, finished, used, key = carry
        key, k_type, k_edge = jax.random.split(key, 3)

        # Attention mask from the carried closure: query q attends key k iff
        # path k -> q or q == k, restricted to built slots; padding block
        # attends itself (graphs.dag.attention_allowed semantics).
        built = (slot < idx)[None, :]
        q_real, k_real = built[:, :, None], built[:, None, :]
        allowed_core = jnp.swapaxes(reach > 0, -1, -2) | eye
        allowed = (allowed_core & q_real & k_real) | ((~q_real) & (~k_real))

        type_logits, edge_probs = model.apply(
            variables, z, labels, adj, allowed, idx, method=PaceVAE.decode_step
        )

        if constrain_labels:
            last = idx == n - 1
            disallow = virtual[None, :] | jnp.where(
                last, ~is_output_label, is_output_label
            )
            if mask_used:
                disallow = disallow | used
            type_logits = jnp.where(
                disallow, jnp.finfo(type_logits.dtype).min, type_logits
            )

        sampled = jnp.where(
            hard,
            jnp.argmax(type_logits, axis=-1),
            jax.random.categorical(k_type, type_logits * inv_t, axis=-1),
        )
        is_output = sampled == LABEL_OUTPUT
        new_label = jnp.where(idx == n - 1, LABEL_OUTPUT, sampled)
        labels = labels.at[:, idx].set(
            jnp.where(finished, labels[:, idx], new_label)
        )

        parent_ok = (slot >= 1) & (slot <= idx - 1)
        p = jnp.clip(edge_probs, 1e-6, 1.0 - 1e-6)
        edge_logits = jnp.log(p) - jnp.log1p(-p)
        sharpened = jax.nn.sigmoid(edge_logits * inv_t)
        bern = jnp.where(
            hard,
            edge_probs > 0.5,
            jax.random.uniform(k_edge, edge_probs.shape) < sharpened,
        )
        sampled_edges = bern & parent_ok[None, :]

        if max_in_degree is not None:
            # Keep at most ``max_in_degree`` REAL parents (slots >= 2; the
            # slot-1 INPUT edge unwraps away).  Double-argsort ranking keeps
            # the highest-probability sampled parents with deterministic
            # index tie-breaking, so the cap holds exactly even when the
            # sigmoid saturates many probabilities to the same value.
            real_sampled = sampled_edges & (slot >= 2)[None, :]
            neg = jnp.where(real_sampled, -edge_probs, jnp.inf)
            rank = jnp.argsort(jnp.argsort(neg, axis=-1), axis=-1)
            # all sampled slots rank before unsampled ones, so when the
            # sampled count is already <= cap nothing is dropped
            kept = real_sampled & (rank < max_in_degree)
            sampled_edges = kept | (sampled_edges & (slot < 2)[None, :])

        sinks = (jnp.sum(adj, axis=-1) == 0) & (slot < idx)[None, :]
        new_col = jnp.where(is_output[:, None], sinks, sampled_edges)
        new_col = jnp.where(finished[:, None], False, new_col)
        col_f = new_col.astype(jnp.float32)
        adj = jax.lax.dynamic_update_index_in_dim(adj, col_f, idx, axis=2)

        # Incremental closure: ancestors(idx) = parents U ancestors(parents).
        anc = jnp.clip(
            col_f
            + jnp.einsum(
                "bvp,bp->bv", reach, col_f, preferred_element_type=jnp.float32
            ),
            0.0,
            1.0,
        )
        reach = jax.lax.dynamic_update_index_in_dim(reach, anc, idx, axis=2)

        used = used | (
            jax.nn.one_hot(new_label, card, dtype=bool) & ~finished[:, None]
        )
        finished = finished | is_output
        return (labels, adj, reach, finished, used, key), None

    (labels, adj, _, finished, _, _), _ = jax.lax.scan(
        step, (labels0, adj0, reach0, finished0, used0, rng), jnp.arange(2, n)
    )
    return labels, adj, finished


@functools.partial(
    jax.jit, static_argnames=("model", "constrain_labels", "max_in_degree")
)
def _decode_to_labeled_jit(
    model, variables, z, rng, constrain_labels, temperature, max_in_degree
):
    labels, adj, _ = sample_decode(
        model,
        variables,
        z,
        rng,
        constrain_labels=constrain_labels,
        temperature=temperature,
        max_in_degree=max_in_degree,
    )
    unwrapped = pace_unwrap(labels, adj)
    valid = is_valid_labeled(
        unwrapped.labels, unwrapped.adj, model.real_label_cardinality
    )
    return unwrapped, valid


def decode_to_labeled(
    model: PaceVAE,
    variables,
    z: jnp.ndarray,
    rng: jax.Array,
    constrain_labels: bool = True,
    temperature=1.0,
    max_in_degree: Optional[int] = None,
) -> Tuple[DagBatch, jnp.ndarray]:
    """Decode latents to labeled DAGs + validity mask.

    Validity = unwrapped labels all within the real cardinality (the tensor
    equivalent of ``LabeledDag.is_valid_graph`` on decoded graphs; DAG-ness
    holds by construction since sampled edges only point forward).

    Jitted end to end (the flax module is a hashable static argument, so
    equal-config models share one compile): unjitted, the scan plus its
    surrounding ops issue dozens of eager dispatches per call — ruinous
    through a remote-tunnel device at ~100 ms per dispatch.  ``temperature``
    stays a traced scalar, so annealing schedules reuse the one executable.
    """
    return _decode_to_labeled_jit(
        model,
        variables,
        z,
        rng,
        constrain_labels,
        jnp.asarray(temperature, jnp.float32),
        max_in_degree,
    )
