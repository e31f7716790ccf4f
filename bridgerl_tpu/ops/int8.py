"""Int8 MXU matmul path (opt-in, measured): dynamic-range quantized forward,
straight-through bfloat16 backward.

The v5e MXU runs int8xint8->int32 at 2x its bf16 FLOPs, and int8 operands
halve the HBM bytes a matmul moves. This module provides the smallest
honest test of that lever for the flagship transformer (the last unmeasured
perf direction in the round-3 handoff, docs/ROUND3.md):

- ``int8_matmul(x, w)``: per-row (x) and per-column (w) symmetric abs-max
  scales, round-to-nearest int8, ``lax.dot_general`` with
  ``preferred_element_type=int32``, rescale. The backward pass is plain
  straight-through in the input dtype (quantization treated as identity),
  so only the forward matmul changes numerics — the standard
  quantized-training recipe (AQT-style int8 forward).
- ``Int8Dense``: drop-in for ``nn.Dense`` on the transformer FF layers
  (flag ``int8_ff``), where half the model's matmul FLOPs live.

The reference has no quantized-compute path at all (fp32 torch end to end);
this is a TPU-only lever, kept opt-in until the perf battery shows a win
(same protocol as fused attention / cheap_dropout: measure at the headline
config, adopt only quality-neutral wins).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize(v: jax.Array, axis: int):
    """Symmetric abs-max int8 quantization along ``axis``."""
    s = jnp.max(jnp.abs(v), axis=axis, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s / 127.0, 1e-8)
    q = jnp.clip(jnp.round(v.astype(jnp.float32) / s), -127.0, 127.0)
    return q.astype(jnp.int8), s


def _int8_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    xq, sx = _quantize(x, -1)           # per-row of the activation
    wq, sw = _quantize(w, 0)            # per-column of the kernel
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """(…, K) @ (K, N) with int8 MXU forward, straight-through backward."""
    return _int8_fwd(x, w)


def _vjp_fwd(x, w):
    return _int8_fwd(x, w), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    gx = jnp.einsum("...n,kn->...k", g, w).astype(x.dtype)
    gw = jnp.einsum("...k,...n->kn", x, g).astype(w.dtype)
    return gx, gw


int8_matmul.defvjp(_vjp_fwd, _vjp_bwd)


class Int8Dense(nn.Module):
    """nn.Dense twin whose forward matmul runs on the int8 MXU path.

    Parameters are stored in f32 (same init/checkpoint tree shape as
    nn.Dense), cast to ``dtype`` and dynamically quantized per call —
    checkpoints trained with either flavor load interchangeably.
    """

    features: int
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = int8_matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y
