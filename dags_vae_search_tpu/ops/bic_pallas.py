"""Pallas TPU kernel for batched contingency-count scoring.

The XLA fallback (``ops/bic_xla.py``) lowers the contingency stage to a
scatter (``segment_sum``) which serializes badly on TPU (~2 s per 4096-
candidate batch on v5e).  This kernel keeps everything in VMEM and turns
counting into dense compare + matvec work the VPU/MXU eat:

    counts[s] = sum_u  w_u * [seg_u == s]
             = (w^T @ EQ)      with EQ[u, s] = (seg_u == s)

where ``seg = cfg * r_max + child_code`` combines the parent-configuration
index and the child value into one flat cell index, ``u`` runs over the
*unique* dataset rows (weight = multiplicity — for small nets this
compresses 5000 cases to <= prod(cards) rows), and ``s`` over the
``q_cap * r_max`` table cells.

Grid: one program per (candidate, node-tile); the unique-row axis is
processed in static chunks with a running accumulator, so VMEM holds only
``[U_CHUNK, S]`` equality tiles.

The mixed-radix config computation (one big MXU einsum over all candidates
x nodes x rows) and the entropy/penalty reduction stay in XLA — they are
matmul/elementwise shaped and XLA already fuses them well; the kernel covers
exactly the part XLA does poorly.

Replaces: one ``Rscript`` subprocess per candidate in the reference
(``src/problem/bn/bnlearn.py:46-54``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dags_vae_search_tpu.ops import bic_xla


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _counts_kernel(w_ref, seg_ref, out_ref, *, u_chunk: int):
    """One program: the counts row for one (candidate, node) pair.

    w_ref:   [1, U_pad] f32 — unique-row weights (0 for padding rows).
    seg_ref: [1, 1, U_pad] i32 — flat cell index per row; padding rows carry
             an out-of-range index (weight 0 guards regardless).
    out_ref: [1, 1, S] f32.

    The unique-row axis is folded with a ``fori_loop`` so only one
    [u_chunk, S] equality tile is ever live in VMEM (unrolled loops let the
    compiler stack tiles and blow the scoped-vmem limit at larger shapes).
    """
    u_pad = w_ref.shape[-1]
    s = out_ref.shape[-1]
    num_chunks = u_pad // u_chunk
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (u_chunk, s), 1)

    def tile_counts(seg_flat, w_flat):
        seg = seg_flat.reshape(u_chunk, 1)
        w = w_flat.reshape(u_chunk, 1)
        # VPU select+reduce keeps integer weights exact in f32 (an MXU
        # matvec would round weights > 256 through bf16).
        return jnp.sum(jnp.where(seg == iota_s, w, 0.0), axis=0)

    if num_chunks == 1:
        out_ref[0, 0, :] = tile_counts(seg_ref[0, 0, :], w_ref[0, :])
        return

    def body(c, acc):
        # u_chunk is 128-aligned, so the dynamic lane-dim offset is provably
        # a multiple of 128 (a Mosaic vector-load requirement).
        start = pl.multiple_of(c * u_chunk, u_chunk)
        return acc + tile_counts(
            seg_ref[0, 0, pl.ds(start, u_chunk)], w_ref[0, pl.ds(start, u_chunk)]
        )

    acc = jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((s,), jnp.float32))
    out_ref[0, 0, :] = acc


def contingency_counts_pallas(
    adj: jnp.ndarray,  # float32[B, n, n]
    codes_u: jnp.ndarray,  # int32[U, n] unique dataset rows
    weights: jnp.ndarray,  # float32[U] multiplicities
    cards: jnp.ndarray,  # int32[n]
    q_cap: int,
    r_max: int,
    u_chunk: int = 512,
    interpret: bool = False,
):
    """Counts float32[B, n, q_cap, r_max] + config sizes q float32[B, n]."""
    b, n, _ = adj.shape
    u = codes_u.shape[0]
    s = q_cap * r_max
    s_pad = _round_up(s, 128)
    # Chunk no larger than the unique-row count (heavily compressed datasets
    # — asia: 45 rows — would otherwise burn whole tiles on padding), but
    # 128-aligned so multi-chunk dynamic offsets satisfy Mosaic's lane
    # alignment.
    u_chunk = min(u_chunk, _round_up(u, 128))
    u_pad = _round_up(u, u_chunk)

    strides, q = bic_xla.parent_config_strides(adj, cards)
    # configs[b, i, u] — one MXU einsum for every (candidate, node, row).
    configs = jnp.einsum(
        "um,bmi->biu",
        codes_u.astype(jnp.float32),
        strides,
        preferred_element_type=jnp.float32,
    )
    child = codes_u.T[None, :, :]  # [1, n, U]
    seg = jnp.clip(configs, 0.0, float(q_cap - 1)).astype(jnp.int32) * r_max + child

    pad_rows = u_pad - u
    if pad_rows:
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, pad_rows)), constant_values=s_pad)
        weights = jnp.pad(weights, (0, pad_rows))

    # Fold (candidate, node) into the grid's leading axis with a size-1
    # middle dim so every block's trailing dims equal the array dims
    # (the Mosaic tiling requirement for non-8/128-aligned blocks).
    seg = seg.reshape(b * n, 1, u_pad)

    kernel = functools.partial(_counts_kernel, u_chunk=u_chunk)
    counts = pl.pallas_call(
        kernel,
        grid=(b * n,),
        in_specs=[
            pl.BlockSpec((1, u_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, u_pad),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s_pad),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, 1, s_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * u_pad * s_pad,
            bytes_accessed=b * n * (u_pad + s_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(weights[None, :], seg)

    counts = counts.reshape(b, n, s_pad)[..., :s].reshape(b, n, q_cap, r_max)
    return counts, q


def score_dags_pallas(
    adj: jnp.ndarray,
    codes_u: jnp.ndarray,
    weights: jnp.ndarray,
    cards: jnp.ndarray,
    q_cap: int,
    r_max: int,
    num_cases: int,
    metric: str = "bic",
    max_parents: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched decomposable scores via the Pallas contingency kernel.

    Same contract as ``bic_xla.score_dags`` but takes the unique-row
    compressed dataset (codes_u, weights) and the true case count.
    """
    counts, q = contingency_counts_pallas(
        adj, codes_u, weights, cards, q_cap, r_max, interpret=interpret
    )
    node_scores = bic_xla.node_scores_from_counts(
        counts, q, cards, num_cases, metric
    )
    total = jnp.sum(node_scores, axis=-1)

    feasible = jnp.all(q <= float(q_cap), axis=-1)
    if max_parents is not None:
        indeg = jnp.sum(adj, axis=1)
        feasible &= jnp.all(indeg <= max_parents, axis=-1)
    return jnp.where(feasible, total, -jnp.inf)
