"""Pallas TPU kernel: fused packed-window attention (scores -> block-diagonal
mask -> softmax -> dropout -> PV) with a flash-style custom VJP.

Why: the flagship's W=10 windows are packed P per attention call
(models/layers.py block_diagonal_mask) so the score matmuls are MXU-sized, but
XLA still materializes the (N, H, S, S) logits tensor in HBM between the two
matmuls and streams it ~3x for mask+softmax+dropout (26 MB/layer at batch
4096, fwd, more in bwd) — pure HBM-bandwidth cost on a memory-bound step.
This kernel keeps the logits entirely in VMEM: per grid program it loads a
tile of (head, pack-row) Q/K/V, computes scores, adds the additive mask bias,
softmaxes in f32, applies dropout from the on-core PRNG, and multiplies by V —
one HBM read of Q/K/V and one write of the output. The backward pass
recomputes the probabilities (flash-attention-style) with the same PRNG seed,
so the dropout mask is bit-identical between fwd and bwd and the logits never
exist in HBM in either direction.

Semantics vs flax nn.dot_product_attention: identical math for the masked
softmax and PV product; dropout differs only in mask SAMPLING (per-row
hardware PRNG instead of threefry with broadcast_dropout) — same Bernoulli
keep probability and 1/keep scaling, deterministic given the integer seed.

MEASURED (v5e, full train step, perf_battery round 2): isolated attention
fwd+bwd is 1.23x faster than flax at flagship shapes, but the END-TO-END
step is 23% SLOWER at the flagship config (102.5k vs 132.7k windows/s at
batch 4096 / pack 8) — XLA's fused unpacked path pipelines better than this
kernel's per-row serial matmuls at S=80. The kernel only wins at pack 16
with big batches (+18% at 8192, +15% at 16384), configs that are themselves
dominated by 4096/pack8. Hence `fused_attention` defaults to OFF; the flag
and the hardware gate (scripts/attn_kernel_check.py) stay for larger-window
retraining regimes where S growth flips the balance.

Replaces the reference's torch F.multi_head_attention path
(models/vqvae.py:437, 475) on the TPU hot path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of the flattened (N*H) batch handled per grid program. 8 keeps the
# unrolled per-row matmuls' live set small; VMEM use is ~1 MB/program.
TILE_B = 8


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                 scale: float, dropout_rate: float, tile_b: int):
    """Forward tile: out = dropout(softmax(q k^T * scale + bias)) v."""
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    bias = bias_ref[:]                                     # (S, S) f32
    for r in range(tile_b):
        q = q_ref[r].astype(jnp.float32)                   # (S, Dh)
        k = k_ref[r].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)         # (S, S)
        if dropout_rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            keep_prob = 1.0 - dropout_rate
            thresh = jnp.uint32(keep_prob * 4294967296.0)
            p = jnp.where(bits < thresh, p * (1.0 / keep_prob), 0.0)
        v = v_ref[r].astype(jnp.float32)
        out_ref[r] = jnp.dot(p, v, preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     scale: float, dropout_rate: float, tile_b: int):
    """Backward tile: recompute p (same PRNG seed => same dropout mask)."""
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    bias = bias_ref[:]
    keep_prob = 1.0 - dropout_rate
    for r in range(tile_b):
        q = q_ref[r].astype(jnp.float32)
        k = k_ref[r].astype(jnp.float32)
        v = v_ref[r].astype(jnp.float32)
        do = do_ref[r].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # NOTE: bits must be drawn in the same order as the forward pass
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            thresh = jnp.uint32(keep_prob * 4294967296.0)
            keep = bits < thresh
            p_drop = jnp.where(keep, p * (1.0 / keep_prob), 0.0)
        else:
            keep = None
            p_drop = p
        dv_ref[r] = jax.lax.dot_general(p_drop, do, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(dv_ref.dtype)
        dp_drop = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp_drop * (1.0 / keep_prob), 0.0)
        else:
            dp = dp_drop
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax JVP^T
        ds = ds * scale
        dq_ref[r] = jnp.dot(ds, k, preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
        dk_ref[r] = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(dk_ref.dtype)


def _specs(tile_b, S, Dh):
    row = pl.BlockSpec((tile_b, S, Dh), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    return seed, row, bias


def _pad_rows(x, nb):
    return x if x.shape[0] == nb else jnp.pad(
        x, ((0, nb - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _packed_attention(q, k, v, bias, seed, scale, dropout_rate):
    out, _ = _packed_attention_fwd(q, k, v, bias, seed, scale, dropout_rate)
    return out


def _packed_attention_fwd(q, k, v, bias, seed, scale, dropout_rate):
    B, S, Dh = q.shape
    nb = -(-B // TILE_B) * TILE_B
    qp, kp, vp = _pad_rows(q, nb), _pad_rows(k, nb), _pad_rows(v, nb)
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1, 1))
    seed_spec, row_spec, bias_spec = _specs(TILE_B, S, Dh)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale,
                          dropout_rate=dropout_rate, tile_b=TILE_B),
        grid=(nb // TILE_B,),
        in_specs=[seed_spec, row_spec, row_spec, row_spec, bias_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((nb, S, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * S * S * Dh, bytes_accessed=4 * nb * S * Dh * 4,
            transcendentals=nb * S * S),
        interpret=_interpret(),
    )(seed_arr, qp, kp, vp, bias)
    return out[:B], (q, k, v, bias, seed)


def _packed_attention_bwd(scale, dropout_rate, residuals, g):
    q, k, v, bias, seed = residuals
    B, S, Dh = q.shape
    nb = -(-B // TILE_B) * TILE_B
    qp, kp, vp, gp = (_pad_rows(x, nb) for x in (q, k, v, g))
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1, 1))
    seed_spec, row_spec, bias_spec = _specs(TILE_B, S, Dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, tile_b=TILE_B),
        grid=(nb // TILE_B,),
        in_specs=[seed_spec, row_spec, row_spec, row_spec, bias_spec, row_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, S, Dh), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * nb * S * S * Dh, bytes_accessed=7 * nb * S * Dh * 4,
            transcendentals=nb * S * S),
        interpret=_interpret(),
    )(seed_arr, qp, kp, vp, bias, gp)
    # bias is always the constant block-diagonal mask and seed is integer
    # state, not a learnable input: zero/None cotangents by construction.
    return dq[:B], dk[:B], dv[:B], jnp.zeros_like(bias), None


_packed_attention.defvjp(_packed_attention_fwd, _packed_attention_bwd)


def fused_attention_fn(query: jax.Array, key: jax.Array, value: jax.Array,
                       mask: Optional[jax.Array] = None,
                       dropout_rng: Optional[jax.Array] = None,
                       dropout_rate: float = 0.0,
                       deterministic: bool = False,
                       dtype=None, **_ignored) -> jax.Array:
    """Drop-in flax `attention_fn` backed by the fused Pallas kernel.

    query/key/value: (B, S, H, Dh) per the flax MHA convention. The boolean
    mask (broadcastable to (B, H, S, S); here always the (1, 1, S, S)
    block-diagonal window mask) becomes an additive f32 bias shared across the
    flattened (B*H) batch."""
    B, S, H, Dh = query.shape
    rate_req = 0.0 if deterministic else float(dropout_rate)
    if rate_req > 0.0 and _interpret():
        # the on-core PRNG (pltpu.prng_seed) has no CPU-interpret lowering;
        # off-TPU the dropout-active path uses the stock flax kernel
        return reference_attention_fn(
            query, key, value, mask=mask, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic, dtype=dtype)
    fold = lambda x: jnp.moveaxis(x, -2, 1).reshape(B * H, S, x.shape[-1])
    q, k, v = fold(query), fold(key), fold(value)
    if mask is not None:
        m2 = jnp.broadcast_to(mask, (1, 1, S, S))[0, 0]
        bias = jnp.where(m2, 0.0, -1e9).astype(jnp.float32)
    else:
        bias = jnp.zeros((S, S), jnp.float32)
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (), 0, 2**31 - 1, jnp.int32)
    else:
        seed = jnp.int32(0)
    scale = 1.0 / (Dh ** 0.5)
    out = _packed_attention(q, k, v, bias, seed, scale, rate)
    return jnp.moveaxis(out.reshape(B, H, S, Dh), 1, -2).astype(
        dtype or query.dtype)


def reference_attention_fn(*args, **kwargs):
    """The stock flax path, for A/B tests."""
    import flax.linen as nn
    return nn.dot_product_attention(*args, **kwargs)
