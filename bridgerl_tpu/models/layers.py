"""Encoder/decoder building blocks for the dual VQ-VAE model zoo.

Behavioral twins of reference models/vqvae.py:265-499 (ResBlock1D, simple /
resnet conv encoders-decoders, full-resolution `resnet_no_down` variants, and
the transformer-with-single-token-bottleneck pair), re-designed for TPU:

- layout is channel-last ``(B, T, C)`` end-to-end (feature dim on lanes); the
  reference permutes between (B,T,C) and (B,C,T) around every stage — here
  there are zero transposes on the hot path;
- convolutions/linears map straight onto the MXU; BatchNorm statistics are
  batch-global under data sharding automatically (jit sees global shapes);
- attention over <=64 tokens with d_model=256 — small, fused by XLA.

Weight initialization uses flax defaults (lecun-normal) by default; with
``torch_init=True`` every kernel switches to torch's defaults (kaiming-uniform
U(±sqrt(1/fan_in)) for Linear/Conv, xavier-uniform for attention projections)
for A/B validation against reference training curves (docs/REF_EXACT.md).
Biases stay zero-init in both modes (torch uses U(±sqrt(1/fan_in)) biases; the
weight init dominates the forward scale).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.Linear/ConvNd default: kaiming_uniform_(a=sqrt(5)) == U(±sqrt(1/fan_in)),
# i.e. variance_scaling with scale 1/3, fan_in, uniform.
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
TORCH_ATTN_INIT = nn.initializers.xavier_uniform()  # torch MultiheadAttention in_proj


def dense_kinit(torch_init: bool):
    return TORCH_KERNEL_INIT if torch_init else nn.initializers.lecun_normal()


def attn_kinit(torch_init: bool):
    return TORCH_ATTN_INIT if torch_init else nn.initializers.lecun_normal()


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


def sinusoidal_pe(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """(max_len, d_model) sinusoidal positional table (vqvae.py:412-424)."""
    position = jnp.arange(max_len, dtype=dtype)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=dtype) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def block_diagonal_mask(packing: int, seq_len: int) -> jax.Array:
    """(1, 1, P*T, P*T) boolean mask allowing attention only within each of the
    P packed windows. With this mask, running P windows as one (P*T)-token
    attention is mathematically identical to P separate T-token attentions —
    but the score matmuls become MXU-sized instead of T x T (T=10 pads to a
    128x128 tile at ~1% utilization)."""
    eye = jnp.eye(packing, dtype=jnp.float32)
    m = jnp.kron(eye, jnp.ones((seq_len, seq_len), jnp.float32))
    return (m > 0.5)[None, None]


class PositionalEncoding(nn.Module):
    """Sinusoidal PE added to (B, T, C) sequences (vqvae.py:280-291; the
    reference defines this for conv encoders but no current arch uses it —
    kept for inventory parity and available to custom encoders)."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x + sinusoidal_pe(x.shape[1], self.d_model, x.dtype)


class ResBlock1D(nn.Module):
    """Conv(3)+BN+LeakyReLU x2 residual block, stride 1 (vqvae.py:265-278)."""

    channels: int
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ki = dense_kinit(self.torch_init)
        h = nn.Conv(self.channels, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(h)
        h = leaky_relu(h)
        h = nn.Conv(self.channels, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(h)
        h = leaky_relu(h)
        return x + h


class ConvEncoder(nn.Module):
    """'simple' / 'resnet' strided conv encoder, T -> T/4 (vqvae.py:293-325).

    simple: two stride-2 Conv(k=4, p=1) + LeakyReLU.
    resnet: stride-2 conv, N ResBlocks, stride-2 conv, final ResBlock.
    """

    hidden_dim: int
    arch: str = "simple"
    num_res_layers: int = 4
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ki = dense_kinit(self.torch_init)
        h = nn.Conv(self.hidden_dim, kernel_size=(4,), strides=(2,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(x)
        h = leaky_relu(h)
        if self.arch == "resnet":
            for i in range(self.num_res_layers):
                h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name=f"res_{i}")(h, train=train)
        h = nn.Conv(self.hidden_dim, kernel_size=(4,), strides=(2,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(h)
        h = leaky_relu(h)
        if self.arch == "resnet":
            h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name="res_final")(h, train=train)
        return h


class ConvDecoder(nn.Module):
    """'simple' / 'resnet' upsampling decoder, T/4 -> T (vqvae.py:327-365).

    simple: two ConvTranspose(k=4, s=2, torch p=1 => lax padding (2,2)), i.e.
    exact 2x length each. resnet: N ResBlocks, then two (nearest-Upsample x2 +
    Conv(3)) stages with a transition ResBlock.
    """

    output_dim: int
    hidden_dim: int
    arch: str = "simple"
    num_res_layers: int = 4
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ki = dense_kinit(self.torch_init)
        if self.arch == "resnet":
            h = x
            for i in range(self.num_res_layers):
                h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name=f"res_{i}")(h, train=train)
            h = jnp.repeat(h, 2, axis=1)  # nearest upsample x2
            h = nn.Conv(self.hidden_dim, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(h)
            h = leaky_relu(h)
            h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name="res_mid")(h, train=train)
            h = jnp.repeat(h, 2, axis=1)
            h = nn.Conv(self.output_dim, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(h)
            return h
        h = nn.ConvTranspose(self.hidden_dim, kernel_size=(4,), strides=(2,), padding=((2, 2),), dtype=self.dtype, kernel_init=ki)(x)
        h = leaky_relu(h)
        h = nn.ConvTranspose(self.output_dim, kernel_size=(4,), strides=(2,), padding=((2, 2),), dtype=self.dtype, kernel_init=ki)(h)
        return h


class NoDownsampleEncoder(nn.Module):
    """Full-resolution ResNet encoder, stride 1 throughout (vqvae.py:370-391)."""

    hidden_dim: int
    num_res_layers: int = 4
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ki = dense_kinit(self.torch_init)
        h = nn.Conv(self.hidden_dim, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki)(x)
        h = leaky_relu(h)
        for i in range(self.num_res_layers):
            h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name=f"res_{i}")(h, train=train)
        h = nn.Conv(self.hidden_dim, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype, kernel_init=ki, name="final_conv")(h)
        return leaky_relu(h)


class NoDownsampleDecoder(nn.Module):
    """Full-resolution ResNet decoder, stride 1 (vqvae.py:393-410)."""

    output_dim: int
    hidden_dim: int
    num_res_layers: int = 4
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        for i in range(self.num_res_layers):
            h = ResBlock1D(self.hidden_dim, dtype=self.dtype, torch_init=self.torch_init, name=f"res_{i}")(h, train=train)
        return nn.Conv(self.output_dim, kernel_size=(3,), strides=(1,), padding=((1, 1),), dtype=self.dtype,
                       kernel_init=dense_kinit(self.torch_init), name="out_conv")(h)


class CheapDropout(nn.Module):
    """Dropout whose mask comes from uint8 random bits instead of f32
    uniforms: 8 PRNG bits/element instead of 32. The keep probability is
    quantized to 1/256 granularity (rate 0.1 -> 26/256 = 0.1016), and the
    kept activations are rescaled by the exact quantized rate, so E[out] = x
    still holds. Measured motivation: dropout-mask generation costs ~11% of
    the flagship step at the headline config even on the rbg PRNG
    (perf_battery.md: 222.3k -> 247.3k windows/s with dropout off)."""

    rate: float
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.deterministic or self.rate <= 0.0:
            return x
        thresh = min(int(round(self.rate * 256.0)), 255)  # 256 overflows uint8
        if thresh <= 0:
            return x
        q_rate = thresh / 256.0
        key = self.make_rng("dropout")
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
        keep = bits >= jnp.uint8(thresh)
        return jnp.where(keep, x / jnp.asarray(1.0 - q_rate, x.dtype),
                         jnp.zeros((), x.dtype))


def cheap_attn_dropout_fn(query, key, value, bias=None, mask=None,
                          broadcast_dropout=True, dropout_rng=None,
                          dropout_rate=0.0, deterministic=False, dtype=None,
                          precision=None, module=None, **kwargs):
    """attention_fn for nn.MultiHeadDotProductAttention that applies the
    attention-probability dropout with uint8 bits (same quantized-rate scheme
    as CheapDropout). Softmax/scores math is stock jax."""
    del module, kwargs
    depth = query.shape[-1]
    q = query / jnp.sqrt(depth).astype(query.dtype)
    weights = jnp.einsum("...qhd,...khd->...hqk", q, key,
                         precision=precision)
    if bias is not None:
        weights = weights + bias
    if mask is not None:
        weights = jnp.where(mask, weights, jnp.finfo(weights.dtype).min)
    weights = jax.nn.softmax(weights.astype(jnp.float32)).astype(weights.dtype)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        thresh = min(int(round(dropout_rate * 256.0)), 255)  # 256 overflows uint8
        if thresh > 0:
            q_rate = thresh / 256.0
            if broadcast_dropout and weights.ndim >= 4:
                shape = (1,) * (weights.ndim - 3) + weights.shape[-3:]
            else:
                shape = weights.shape
            bits = jax.random.bits(dropout_rng, shape, dtype=jnp.uint8)
            keep = bits >= jnp.uint8(thresh)
            weights = jnp.where(
                keep, weights / jnp.asarray(1.0 - q_rate, weights.dtype),
                jnp.zeros((), weights.dtype))
    return jnp.einsum("...hqk,...khd->...qhd", weights, value,
                      precision=precision)


class TransformerBlock(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer
    defaults: relu FF, dropout 0.1, norm after residual — vqvae.py:437)."""

    d_model: int
    n_heads: int
    ff_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    torch_init: bool = False
    fused_attention: bool = False
    cheap_dropout: bool = False
    int8_ff: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, mask=None) -> jax.Array:
        ki = dense_kinit(self.torch_init)
        attn_kwargs = {}
        if self.fused_attention:
            from ..ops.pallas.attention import fused_attention_fn
            attn_kwargs["attention_fn"] = fused_attention_fn
        elif self.cheap_dropout:
            attn_kwargs["attention_fn"] = cheap_attn_dropout_fn

        def drop(rate):
            if self.cheap_dropout:
                return CheapDropout(rate, deterministic=not train)
            return nn.Dropout(rate, deterministic=not train)

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
            kernel_init=attn_kinit(self.torch_init),
            name="self_attn",
            **attn_kwargs,
        )(x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + drop(self.dropout)(attn))
        DenseFF = nn.Dense
        if self.int8_ff:
            from ..ops.int8 import Int8Dense
            DenseFF = Int8Dense
        h = DenseFF(self.ff_dim, dtype=self.dtype, kernel_init=ki, name="ff1")(x)
        h = nn.relu(h)
        h = drop(self.dropout)(h)
        h = DenseFF(self.d_model, dtype=self.dtype, kernel_init=ki, name="ff2")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + drop(self.dropout)(h))
        return x


class TransformerStack(nn.Module):
    """num_layers TransformerBlocks, optionally compiled ONCE via nn.scan.

    With scan=True the layer body is traced once and driven by a lax.scan over
    stacked per-layer parameters. MEASURED at this model's scale (4 layers,
    d_model 256): runtime drops ~40% (67k vs 115k windows/s — scan blocks
    XLA's cross-layer fusion/pipelining) and the compile saving doesn't pay
    off; the flag stays opt-in for much deeper stacks. The parameter tree
    differs (stacked leaves), so the flag is part of the model config.
    """

    num_layers: int
    d_model: int
    n_heads: int
    ff_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    scan: bool = False
    torch_init: bool = False
    fused_attention: bool = False
    cheap_dropout: bool = False
    int8_ff: bool = False

    @nn.compact
    def __call__(self, h: jax.Array, train: bool = False, mask=None) -> jax.Array:
        if not self.scan:
            for i in range(self.num_layers):
                h = TransformerBlock(self.d_model, self.n_heads, self.ff_dim,
                                     dropout=self.dropout, dtype=self.dtype,
                                     torch_init=self.torch_init,
                                     fused_attention=self.fused_attention,
                                     cheap_dropout=self.cheap_dropout,
                                     int8_ff=self.int8_ff,
                                     name=f"layer_{i}")(h, train=train, mask=mask)
            return h

        class _Body(nn.Module):
            d_model: int
            n_heads: int
            ff_dim: int
            dropout: float
            dtype: Any
            train: bool
            torch_init: bool
            fused_attention: bool
            cheap_dropout: bool
            int8_ff: bool

            @nn.compact
            def __call__(self, carry, mask):
                out = TransformerBlock(self.d_model, self.n_heads, self.ff_dim,
                                       dropout=self.dropout, dtype=self.dtype,
                                       torch_init=self.torch_init,
                                       fused_attention=self.fused_attention,
                                       cheap_dropout=self.cheap_dropout,
                                       int8_ff=self.int8_ff,
                                       name="block")(carry, train=self.train, mask=mask)
                return out, None

        ScanBody = nn.scan(
            _Body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            in_axes=(nn.broadcast,),
        )
        h, _ = ScanBody(self.d_model, self.n_heads, self.ff_dim,
                        self.dropout, self.dtype, train, self.torch_init,
                        self.fused_attention, self.cheap_dropout,
                        self.int8_ff, name="layers")(h, mask)
        return h


class TransformerMotionEncoder(nn.Module):
    """Linear -> PE -> 4x transformer -> mean-pool to ONE token -> Linear
    (vqvae.py:429-463). Output (B, 1, hidden_dim): the whole window becomes a
    single latent token.

    tokens=k (opt-in, config.tf_tokens) pools to k tokens via chunked means
    over T/k frames each — raises the latent rate past the reference's
    single-token bottleneck at identical parameter count."""

    hidden_dim: int
    d_model: int = 256
    n_heads: int = 4
    num_layers: int = 4
    ff_dim: int = 512
    max_len: int = 5000
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_packing: int = 1
    scan_layers: bool = False
    torch_init: bool = False
    fused_attention: bool = False
    cheap_dropout: bool = False
    int8_ff: bool = False
    tokens: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, T, C_in)
        B, T = x.shape[0], x.shape[1]
        h = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=dense_kinit(self.torch_init), name="input_proj")(x)
        h = h + sinusoidal_pe(T, self.d_model, h.dtype)
        P = self.attn_packing if self.attn_packing > 1 and B % self.attn_packing == 0 else 1
        mask = None
        if P > 1:
            h = h.reshape(B // P, P * T, self.d_model)
            mask = block_diagonal_mask(P, T)
        if self.scan_layers:
            h = TransformerStack(self.num_layers, self.d_model, self.n_heads,
                                 self.ff_dim, dropout=self.dropout, dtype=self.dtype,
                                 scan=True, torch_init=self.torch_init,
                                 fused_attention=self.fused_attention,
                                 cheap_dropout=self.cheap_dropout,
                                     int8_ff=self.int8_ff,
                                 name="stack")(h, train=train, mask=mask)
        else:
            for i in range(self.num_layers):
                h = TransformerBlock(self.d_model, self.n_heads, self.ff_dim,
                                     dropout=self.dropout, dtype=self.dtype,
                                     torch_init=self.torch_init,
                                     fused_attention=self.fused_attention,
                                     cheap_dropout=self.cheap_dropout,
                                     int8_ff=self.int8_ff,
                                     name=f"layer_{i}")(h, train=train, mask=mask)
        if P > 1:
            h = h.reshape(B, T, self.d_model)
        if self.tokens == 1:
            h = jnp.mean(h, axis=1, keepdims=True)  # (B, 1, d_model)
        else:
            h = jnp.mean(h.reshape(B, self.tokens, T // self.tokens,
                                   self.d_model), axis=2)  # (B, k, d_model)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, kernel_init=dense_kinit(self.torch_init), name="output_proj")(h)  # (B, k, hidden)


class TransformerMotionDecoder(nn.Module):
    """Linear -> repeat token seq_len times -> PE -> 4x transformer -> Linear
    (vqvae.py:465-499). Non-autoregressive one-shot generation.

    tokens=k mirrors the encoder's multi-token latent: each of the k tokens
    is nearest-upsampled over its own T/k-frame span before the stack."""

    output_dim: int
    hidden_dim: int
    seq_len: int
    d_model: int = 256
    n_heads: int = 4
    num_layers: int = 4
    ff_dim: int = 512
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_packing: int = 1
    scan_layers: bool = False
    torch_init: bool = False
    fused_attention: bool = False
    cheap_dropout: bool = False
    int8_ff: bool = False
    tokens: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, k, hidden)
        B, T = x.shape[0], self.seq_len
        h = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=dense_kinit(self.torch_init), name="input_proj")(x)  # (B, k, d_model)
        if self.tokens == 1:
            h = jnp.broadcast_to(h, (B, T, self.d_model))
        else:
            h = jnp.repeat(h, T // self.tokens, axis=1)  # (B, T, d_model)
        h = h + sinusoidal_pe(T, self.d_model, h.dtype)
        P = self.attn_packing if self.attn_packing > 1 and B % self.attn_packing == 0 else 1
        mask = None
        if P > 1:
            h = h.reshape(B // P, P * T, self.d_model)
            mask = block_diagonal_mask(P, T)
        if self.scan_layers:
            h = TransformerStack(self.num_layers, self.d_model, self.n_heads,
                                 self.ff_dim, dropout=self.dropout, dtype=self.dtype,
                                 scan=True, torch_init=self.torch_init,
                                 fused_attention=self.fused_attention,
                                 cheap_dropout=self.cheap_dropout,
                                     int8_ff=self.int8_ff,
                                 name="stack")(h, train=train, mask=mask)
        else:
            for i in range(self.num_layers):
                h = TransformerBlock(self.d_model, self.n_heads, self.ff_dim,
                                     dropout=self.dropout, dtype=self.dtype,
                                     torch_init=self.torch_init,
                                     fused_attention=self.fused_attention,
                                     cheap_dropout=self.cheap_dropout,
                                     int8_ff=self.int8_ff,
                                     name=f"layer_{i}")(h, train=train, mask=mask)
        if P > 1:
            h = h.reshape(B, T, self.d_model)
        return nn.Dense(self.output_dim, dtype=self.dtype, kernel_init=dense_kinit(self.torch_init), name="output_proj")(h)  # (B, T, out)
