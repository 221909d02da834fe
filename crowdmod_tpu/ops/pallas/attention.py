"""Fused multi-head attention Pallas kernel.

At reference scale a whole attention problem is tiny (Sq ≤ 216, Dh ∈ {32, 64}
— SURVEY.md §5.7), so the entire QK^T → softmax → V chain for one (batch,
head) pair fits comfortably in VMEM.  One kernel invocation per (batch, head)
grid cell computes the full output with both matmuls on the MXU and the
softmax in between on the VPU — logits never round-trip to HBM, which is the
entire win over the unfused path at these shapes.

Gradients: the kernel carries a ``jax.custom_vjp`` whose backward is the
reference jnp implementation's VJP.  Forward runs the Pallas kernel; backward
recomputes through XLA (cheap at these sizes, and exact — both paths compute
the same function).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale):
    """jnp oracle: fp32 logits/softmax over ``(B, H, Sq/Sk, Dh)``."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", w.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (Sq, Dh)
    k = k_ref[0, 0]  # (Sk, Dh)
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    w = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
    out = jnp.dot(w.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attention_pallas(q, k, v, scale, *, interpret: bool = False):
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    spec = lambda s: pl.BlockSpec(
        (1, 1, s, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    flops = 2 * b * h * sq * sk * dh * 2  # two matmuls
    return pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h),
        in_specs=[spec(sq), spec(sk), spec(sk)],
        out_specs=spec(sq),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(q, k, v, scale, interpret):
    return _attention_pallas(q, k, v, scale, interpret=interpret)


def _fused_fwd(q, k, v, scale, interpret):
    return _attention_pallas(q, k, v, scale, interpret=interpret), (q, k, v)


def _fused_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, scale), q, k, v)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    mode: str | None = None,
) -> jnp.ndarray:
    """Fused attention over ``(B, H, S, Dh)`` tensors.

    ``mode``: 'compiled' | 'interpret' | 'off' (default: auto via
    :func:`crowdmod_tpu.ops.pallas.pallas_mode`).
    """
    from crowdmod_tpu.ops.pallas import pallas_mode

    scale = float(scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5))
    mode = mode or pallas_mode("attention")
    if mode == "off":
        return attention_reference(q, k, v, scale)
    return _fused(q, k, v, scale, mode == "interpret")
