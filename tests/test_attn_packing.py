"""Attention window-packing: exact equivalence with unpacked attention and
safe fallback when the batch is not divisible by the pack factor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import ModelConfig
from bridgerl_tpu.models import init_model
from bridgerl_tpu.models.layers import block_diagonal_mask


def test_block_diagonal_mask_structure():
    m = np.asarray(block_diagonal_mask(3, 4))[0, 0]
    assert m.shape == (12, 12)
    assert m[:4, :4].all() and m[4:8, 4:8].all() and m[8:, 8:].all()
    assert not m[:4, 4:].any() and not m[8:, :8].any()


@pytest.mark.parametrize("P", [4, 8])
def test_packed_equals_unpacked(P):
    x_r = jax.random.normal(jax.random.key(1), (16, 10, 29))
    x_h = jax.random.normal(jax.random.key(2), (16, 10, 126))
    outs = {}
    for packing in (1, P):
        cfg = ModelConfig(arch="transformer", method="ae", window_size=10,
                          hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=2,
                          attn_packing=packing, dropout=0.0)
        model, vs = init_model(cfg, jax.random.key(0))
        out = model.apply(vs, x_robot=x_r, x_human=x_h, train=False)
        outs[packing] = (np.asarray(out["robot"]["recon"]),
                         np.asarray(out["human"]["retargeted"]))
    np.testing.assert_allclose(outs[1][0], outs[P][0], atol=1e-4)
    np.testing.assert_allclose(outs[1][1], outs[P][1], atol=1e-4)


def test_fallback_when_batch_not_divisible():
    cfg = ModelConfig(arch="transformer", method="ae", window_size=10,
                      hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=1,
                      attn_packing=8, dropout=0.0)
    model, vs = init_model(cfg, jax.random.key(0))
    x_r = jax.random.normal(jax.random.key(1), (5, 10, 29))  # 5 % 8 != 0
    out = model.apply(vs, x_robot=x_r, train=False)
    assert out["robot"]["recon"].shape == (5, 10, 29)
    assert np.isfinite(np.asarray(out["robot"]["recon"])).all()


def test_packed_gradients_match():
    x_r = jax.random.normal(jax.random.key(1), (8, 10, 29))
    grads = {}
    for packing in (1, 4):
        cfg = ModelConfig(arch="transformer", method="ae", window_size=10,
                          hidden_dim=8, d_model=16, ff_dim=32, n_tf_layers=1,
                          attn_packing=packing, dropout=0.0)
        model, vs = init_model(cfg, jax.random.key(0))

        def loss(params):
            out = model.apply({**vs, "params": params}, x_robot=x_r, train=False)
            return jnp.mean((out["robot"]["recon"] - x_r) ** 2)

        grads[packing] = jax.grad(loss)(vs["params"])
    for a, b in zip(jax.tree_util.tree_leaves(grads[1]),
                    jax.tree_util.tree_leaves(grads[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packing_composes_with_data_parallel_mesh(eight_devices):
    """Packed attention must work under the batch-sharded mesh (the reshape
    (B,T,C)->(B/P,P*T,C) keeps the leading dim divisible by the mesh)."""
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.parallel import make_mesh
    from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables

    exp = make_experiment("transformer", "hybrid", window=10, batch_size=64,
                          hidden_dim=16, codebook_size=128, d_model=32, ff_dim=64,
                          n_tf_layers=1, attn_packing=8)
    model, vs = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(vs)
    tx = make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))
    robot = jax.random.normal(jax.random.key(1), (128, 10, 29))
    human = jax.random.normal(jax.random.key(2), (128, 10, 126))
    idx = jnp.arange(128).reshape(2, 64)
    keys = jax.random.split(jax.random.key(3), 2)
    f = make_train_epoch(model, tx, exp, mesh=make_mesh())
    state, logs = f(state, robot, human, idx, keys)
    assert np.isfinite(float(logs["train_loss"]))


def test_scan_layers_forward_and_training():
    """scan_layers=True: same param count, finite training, loss decreases."""
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables

    x_r = jax.random.normal(jax.random.key(1), (32, 10, 29))
    x_h = jax.random.normal(jax.random.key(2), (32, 10, 126))
    exp = make_experiment("transformer", "hybrid", window=10, batch_size=16,
                          hidden_dim=16, codebook_size=128, d_model=32, ff_dim=64,
                          n_tf_layers=3, scan_layers=True)
    model, vs = init_model(exp.model, jax.random.key(0))
    # param count equals the unscanned variant
    import dataclasses
    cfg0 = dataclasses.replace(exp.model, scan_layers=False)
    _, vs0 = init_model(cfg0, jax.random.key(0))
    count = lambda t: sum(x.size for x in jax.tree_util.tree_leaves(t["params"]))
    assert count(vs) == count(vs0)

    params, rest = split_variables(vs)
    tx = make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))
    idx = jnp.arange(32).reshape(2, 16)
    keys = jax.random.split(jax.random.key(3), 2)
    f = make_train_epoch(model, tx, exp, None)
    losses = []
    for _ in range(4):
        state, logs = f(state, x_r, x_h, idx, keys)
        losses.append(float(logs["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
