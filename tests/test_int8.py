"""Int8 MXU matmul path (ops/int8.py): numerics, straight-through gradients,
checkpoint-tree compatibility, and full-model integration behind `int8_ff`.

TPU-only perf lever (the reference is fp32 torch end to end); quality gates
here are CPU-exact properties, the throughput verdict comes from the perf
battery on hardware.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import ModelConfig
from bridgerl_tpu.models import init_model
from bridgerl_tpu.ops.int8 import Int8Dense, int8_matmul

KEY = jax.random.key(0)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 12, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    ref = x @ w
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.02, f"int8 forward error {rel} too large"


def test_int8_matmul_outlier_rows():
    """Per-row activation scales isolate outliers: a 1000x row doesn't
    destroy other rows' precision (the reason scales aren't per-tensor)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    x[0] *= 1000.0
    w = rng.normal(size=(64, 16)).astype(np.float32)
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    ref = x @ w
    rel_rest = np.abs(y[1:] - ref[1:]).max() / np.abs(ref[1:]).max()
    assert rel_rest < 0.02


def test_int8_matmul_straight_through_grads():
    """Backward is the exact f32 matmul VJP of the ORIGINAL operands."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(3, 5, 8)).astype(np.float32))

    _, vjp = jax.vjp(int8_matmul, x, w)
    gx, gw = vjp(g)
    np.testing.assert_allclose(np.asarray(gx),
                               np.einsum("bto,ko->btk", g, w),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw),
                               np.einsum("btk,bto->ko", x, g),
                               rtol=1e-3, atol=1e-5)


def test_int8_dense_tree_matches_nn_dense():
    """Checkpoints trained with either flavor load interchangeably."""
    x = jnp.zeros((2, 6, 16))
    v_a = nn.Dense(8).init(KEY, x)
    v_b = Int8Dense(8).init(KEY, x)
    ta = jax.tree_util.tree_map(lambda a: a.shape, v_a)
    tb = jax.tree_util.tree_map(lambda a: a.shape, v_b)
    assert ta == tb


@pytest.mark.parametrize("scan_layers", [False, True])
def test_int8_ff_model_trains(scan_layers):
    """transformer + int8_ff: forward close to the stock model at init,
    gradients flow into the FF kernels, scan path included (the
    flag-dropped-in-scan regression class from round 2's ADVICE)."""
    base = ModelConfig(arch="transformer", method="ae", window_size=10,
                       hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=2,
                       dropout=0.0, scan_layers=scan_layers)
    cfg8 = dataclasses.replace(base, int8_ff=True)
    model, vs = init_model(base, KEY)
    model8, vs8 = init_model(cfg8, KEY)
    # identical trees (same init RNG path) -> interchangeable checkpoints
    assert (jax.tree_util.tree_map(lambda a: a.shape, vs)
            == jax.tree_util.tree_map(lambda a: a.shape, vs8))
    x_r = jax.random.normal(jax.random.key(1), (4, 10, 29))
    out = model.apply(vs, x_robot=x_r, train=False)
    out8 = model8.apply(vs8, x_robot=x_r, train=False)
    ref = np.asarray(out["robot"]["recon"])
    q = np.asarray(out8["robot"]["recon"])
    assert np.isfinite(q).all()
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(q - ref).max() / scale < 0.1, "int8 FF drifted too far"

    def loss(params):
        o = model8.apply({**vs8, "params": params}, x_robot=x_r, train=False)
        return jnp.mean((o["robot"]["recon"] - x_r) ** 2)

    grads = jax.grad(loss)(vs8["params"])
    leaves = [(p, g) for p, g in
              jax.tree_util.tree_leaves_with_path(grads)]
    ff_leaves = [g for p, g in leaves
                 if ("ff1" in jax.tree_util.keystr(p)
                     or "ff2" in jax.tree_util.keystr(p))
                 and "human" not in jax.tree_util.keystr(p)]  # robot loss only
    assert ff_leaves and all(float(jnp.abs(g).max()) > 0 for g in ff_leaves)
