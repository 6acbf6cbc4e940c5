"""Masked transformer primitives (post-LN) for the PACE DAG-VAE.

Functionally equivalent to the reference's hand-rolled pre-torch-2-style
layers (``src/encoders/pace.py:17-182``): post-layer-norm residual blocks,
multi-head attention with a per-query/key boolean *allow* mask, ReLU FFN
whose hidden width equals the model width, and dropout on attention weights,
residuals, and the FFN hidden.

Differences from the reference are deliberate TPU choices, not semantics
changes: batch-first layouts ([B, N, D]; torch's MHA is seq-first), one
broadcast [B, 1, N, N] mask instead of a materialized [B*heads, N, N]
stack, and attention computed as two batched einsums that map onto the MXU.

Note the reference's decoder layer passes ``tgt_mask`` — not
``memory_mask`` — to its cross-attention (``pace.py:148``, comment "memory
mask to target mask"); the prepared memory masks are computed but never
used.  We reproduce the *used* semantics: cross-attention takes the same
allow mask as self-attention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both
# kernel and bias.  Keeping the reference's init family keeps its training
# dynamics (lr schedules, clip norms) transferable.
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
xavier_uniform = nn.initializers.xavier_uniform()


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in**0.5)
    import jax

    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Module):
    """Linear layer with torch-style default init.

    ``matmul_dtype`` (e.g. ``"bfloat16"``) casts the matmul OPERANDS only;
    accumulation and outputs stay float32 (``preferred_element_type``) —
    the TPU MXU's native mode.  Params are always stored float32.
    """

    features: int
    use_bias: bool = True
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init, (fan_in, self.features), jnp.float32
        )
        if self.matmul_dtype is not None:
            md = jnp.dtype(self.matmul_dtype)
            x = x.astype(md)
            kernel = kernel.astype(md)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d: torch_bias_init(k, s, d, fan_in=fan_in),
                (self.features,),
                jnp.float32,
            )
            y = y + bias
        return y


class MultiHeadAttention(nn.Module):
    """MHA with boolean allow-mask (True = may attend), torch-equivalent.

    attn = softmax(q k^T / sqrt(d_head) + (-inf where blocked)); dropout on
    the attention weights, then out-projection (``pace.py:29,52-56``).
    """

    num_heads: int
    dropout: float
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Nq, D]
        key: jnp.ndarray,  # [B, Nk, D]
        value: jnp.ndarray,  # [B, Nk, D]
        allowed: Optional[jnp.ndarray] = None,  # bool[B, Nq, Nk] or [Nq, Nk]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_model = query.shape[-1]
        if d_model % self.num_heads:
            raise ValueError("d_model must divide num_heads")
        d_head = d_model // self.num_heads

        # torch packs q/k/v projections in one xavier-initialized matrix.
        md = self.matmul_dtype
        q = Dense(d_model, name="q_proj", matmul_dtype=md)(query)
        k = Dense(d_model, name="k_proj", matmul_dtype=md)(key)
        v = Dense(d_model, name="v_proj", matmul_dtype=md)(value)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)  # [B, H, N, d_head]

        if md is not None:
            q, k = q.astype(jnp.dtype(md)), k.astype(jnp.dtype(md))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (d_head**0.5)
        if allowed is not None:
            if allowed.ndim == 2:
                allowed = allowed[None]
            logits = jnp.where(allowed[:, None, :, :], logits, -1e30)
        weights = nn.softmax(logits, axis=-1)
        weights = nn.Dropout(self.dropout, deterministic=deterministic)(weights)

        if md is not None:
            weights = weights.astype(jnp.dtype(md))
            v = v.astype(jnp.dtype(md))
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
        )
        b, h, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d_model)
        return Dense(d_model, name="out_proj", matmul_dtype=md)(out)


class EncoderLayer(nn.Module):
    """Post-LN encoder block (``pace.py:17-67``)."""

    num_heads: int
    dropout: float
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, src, allowed=None, deterministic=True):
        d_model = src.shape[-1]
        md = self.matmul_dtype
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        attn = MultiHeadAttention(
            self.num_heads, self.dropout, matmul_dtype=md, name="self_attn"
        )(src, src, src, allowed=allowed, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + drop(attn))

        ff = Dense(d_model, name="linear2", matmul_dtype=md)(
            drop(nn.relu(Dense(d_model, name="linear1", matmul_dtype=md)(src)))
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + drop(ff))


class DecoderLayer(nn.Module):
    """Post-LN decoder block: self-attn, cross-attn, FFN
    (``pace.py:110-154``; cross-attn reuses the target mask, see module
    docstring)."""

    num_heads: int
    dropout: float
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, tgt, memory, allowed=None, deterministic=True):
        d_model = tgt.shape[-1]
        md = self.matmul_dtype
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        sa = MultiHeadAttention(
            self.num_heads, self.dropout, matmul_dtype=md, name="self_attn"
        )(tgt, tgt, tgt, allowed=allowed, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + drop(sa))

        ca = MultiHeadAttention(
            self.num_heads, self.dropout, matmul_dtype=md, name="cross_attn"
        )(tgt, memory, memory, allowed=allowed, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + drop(ca))

        ff = Dense(d_model, name="linear2", matmul_dtype=md)(
            drop(nn.relu(Dense(d_model, name="linear1", matmul_dtype=md)(tgt)))
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + drop(ff))


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    dropout: float
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, src, allowed=None, deterministic=True):
        for i in range(self.num_layers):
            src = EncoderLayer(
                self.num_heads, self.dropout, matmul_dtype=self.matmul_dtype,
                name=f"layer{i}",
            )(src, allowed=allowed, deterministic=deterministic)
        return src


class Decoder(nn.Module):
    num_layers: int
    num_heads: int
    dropout: float
    matmul_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, tgt, memory, allowed=None, deterministic=True):
        for i in range(self.num_layers):
            tgt = DecoderLayer(
                self.num_heads, self.dropout, matmul_dtype=self.matmul_dtype,
                name=f"layer{i}",
            )(tgt, memory, allowed=allowed, deterministic=deterministic)
        return tgt
