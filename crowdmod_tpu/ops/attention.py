"""Multi-head attention primitives.

At reference scale the token counts are tiny (27–216 tokens, SURVEY.md §5.7),
so whole attention problems fit in VMEM; the jax path below is written so XLA
fuses QK^T → softmax → V into a couple of MXU ops, and a fused Pallas kernel
(:mod:`crowdmod_tpu.ops.pallas.attention`) is swapped in on TPU for the hot
sampler loops.

Semantics follow ``torch.nn.MultiheadAttention(batch_first=True)``
(used at reference models/backbones/layers.py:10 and DiT*py): packed QKV
projection with bias, scaled dot-product, optional attention-weight dropout,
output projection with bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over ``(..., S, H, Dh)`` tensors.

    Accumulates logits and the softmax in float32 regardless of input dtype
    (bf16-safe), returning the input dtype.
    """
    dtype = q.dtype
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    use_dropout = dropout_rate > 0.0 and not deterministic

    if not use_dropout:
        from crowdmod_tpu.ops.pallas import fused_attention, pallas_mode

        mode = pallas_mode("attention")
        if mode != "off":
            # Pallas kernel wants a (B, H, S, Dh) layout: shuffle in/out.
            sq, h = q.shape[-3], q.shape[-2]
            sk = k.shape[-3]
            lead = q.shape[:-3]
            to_bhsd = lambda x, s: jnp.moveaxis(
                x.reshape((-1, s) + x.shape[-2:]), -2, 1
            )
            out = fused_attention(
                to_bhsd(q, sq), to_bhsd(k, sk), to_bhsd(v, sk),
                scale=float(1.0 / dh**0.5), mode=mode,
            )
            return (
                jnp.moveaxis(out, 1, -2)
                .reshape(lead + (sq, h, dh))
                .astype(dtype)
            )
    # XLA path: einsum directly on (..., S, H, Dh) — dot_general folds
    # the head transpose into its dimension numbers, so no materialized
    # layout copies (the moveaxis round-trip above costs ~120 MB/step of
    # HBM copy traffic at DiT flagship shapes; measured on v5e).
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1)
    if use_dropout:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum(
        "...hqk,...khd->...qhd", weights.astype(dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


class MultiHeadAttention(nn.Module):
    """Torch-semantics MHA: packed QKV + output projection, both biased.

    Call with ``(q_input, kv_input)`` — self-attention passes the same array
    twice; the DiT4D_V4 temporal stage passes future-slot queries against
    all-slot keys/values.
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,
        kv_in: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if kv_in is None:
            kv_in = q_in
        d = q_in.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"hidden dim {d} not divisible by {self.num_heads} heads")
        dh = d // self.num_heads

        dense = lambda name: nn.Dense(
            d, dtype=self.dtype, kernel_init=self.kernel_init, name=name
        )
        q = dense("query")(q_in)
        k = dense("key")(kv_in)
        v = dense("value")(kv_in)

        split = lambda x: x.reshape(x.shape[:-1] + (self.num_heads, dh))
        dropout_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        out = dot_product_attention(
            split(q), split(k), split(v),
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        )
        out = out.reshape(out.shape[:-2] + (d,))
        return dense("out")(out)
