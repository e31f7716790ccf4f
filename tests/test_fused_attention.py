"""Fused Pallas attention (ops/pallas/attention.py): math parity with the
stock flax kernel. CPU runs the kernel in interpret mode (dropout-active
paths fall back to flax off-TPU); the hardware dropout path is exercised by
the perf battery on the real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.models.layers import block_diagonal_mask
from bridgerl_tpu.ops.pallas.attention import fused_attention_fn


def _qkv(B=6, S=80, H=4, Dh=64):
    return tuple(jax.random.normal(jax.random.key(i), (B, S, H, Dh), jnp.float32)
                 for i in range(3))


def test_fused_matches_flax_forward():
    q, k, v = _qkv()
    mask = block_diagonal_mask(8, 10)
    ref = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
    got = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_matches_flax_grads():
    q, k, v = _qkv(B=4)
    mask = block_diagonal_mask(8, 10)

    def loss(fn, *args):
        return jnp.sum(fn(*args, mask=mask, deterministic=True) ** 2)

    gr = jax.grad(lambda *a: loss(nn.dot_product_attention, *a), argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(lambda *a: loss(fused_attention_fn, *a), argnums=(0, 1, 2))(q, k, v)
    scale = max(float(jnp.abs(g).max()) for g in gr)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5 * scale)


def test_fused_flag_preserves_param_tree_and_eval_output():
    kw = dict(window=10, mode="teacher", hidden_dim=16, codebook_size=32,
              d_model=32, ff_dim=64, n_tf_layers=2, attn_packing=4, dropout=0.1)
    e0 = make_experiment("transformer", "ae", **kw)
    e1 = make_experiment("transformer", "ae", fused_attention=True, **kw)
    m0, v0 = init_model(e0.model, jax.random.key(0))
    m1, v1 = init_model(e1.model, jax.random.key(0))
    # identical param tree (the fused kernel only swaps the attention_fn)
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    x_r = jax.random.normal(jax.random.key(1), (8, 10, 29))
    x_h = jax.random.normal(jax.random.key(2), (8, 10, 126))
    o0 = m0.apply(v0, x_robot=x_r, x_human=x_h, train=False)
    o1 = m1.apply(v0, x_robot=x_r, x_human=x_h, train=False)
    np.testing.assert_allclose(np.asarray(o1["robot"]["recon"]),
                               np.asarray(o0["robot"]["recon"]), atol=5e-5)


def test_fused_unpadded_tile_rows():
    # B*H not a multiple of TILE_B exercises the row-padding path
    q, k, v = _qkv(B=3, S=20, H=2, Dh=16)
    mask = block_diagonal_mask(2, 10)
    ref = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
    got = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
