"""World-space FK loss: differentiability and integration into the teacher step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.sim import load_g1_chain
from bridgerl_tpu.sim.kinematics import make_fk
from bridgerl_tpu.train.losses import fk_loss


@pytest.fixture(scope="module")
def fk_fn():
    f = make_fk(load_g1_chain())
    return jax.vmap(jax.vmap(lambda q: f(q)[0]))


def test_fk_loss_zero_for_identical(fk_fn, rng):
    q = jnp.asarray(rng.uniform(-0.3, 0.3, size=(2, 5, 29)), jnp.float32)
    assert float(fk_loss(q, q, fk_fn)) == 0.0


def test_fk_loss_differentiable(fk_fn, rng):
    real = jnp.asarray(rng.uniform(-0.3, 0.3, size=(2, 5, 29)), jnp.float32)
    recon = jnp.asarray(rng.uniform(-0.3, 0.3, size=(2, 5, 29)), jnp.float32)
    g = jax.grad(lambda r: fk_loss(r, real, fk_fn))(recon)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
    # gradient descent on the FK loss pulls joints toward the target
    loss_grad = jax.jit(jax.value_and_grad(lambda r: fk_loss(r, real, fk_fn)))
    r = recon
    l0, _ = loss_grad(r)
    for _ in range(100):
        l, g = loss_grad(r)
        r = r - 5.0 * g
    l_final, _ = loss_grad(r)
    assert float(l_final) < 0.9 * float(l0)


def test_teacher_step_with_fk_loss(rng):
    """lambda_fk > 0 changes the teacher loss and still trains."""
    import dataclasses
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        arrays = generate_synthetic_dataset(d, n_sequences=4, min_len=30, max_len=40,
                                            window=8, step=4, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    n = (len(ds) // 16) * 16
    idx = jnp.arange(n).reshape(-1, 16)[:2]
    keys = jax.random.split(jax.random.key(0), idx.shape[0])

    losses = {}
    for lam in (0.0, 1.0):
        exp = make_experiment("resnet_no_down", "ae", window=8, batch_size=16,
                              hidden_dim=16, num_res_layers=1, lambda_fk=lam)
        model, variables = init_model(exp.model, jax.random.key(0))
        params, rest = split_variables(variables)
        tx = make_optimizer(exp, params)
        state = TrainState(params, rest, tx.init(params))
        f = make_train_epoch(model, tx, exp, None)
        state, logs = f(state, ds.robot, ds.human, idx, keys)
        losses[lam] = float(logs["train_loss"])
        assert np.isfinite(losses[lam])
    assert losses[1.0] > losses[0.0]  # FK term adds positive loss at init
