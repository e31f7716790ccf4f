"""bf16 compute-dtype path: forward/step run, losses finite, params stay f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import ModelConfig, make_experiment
from bridgerl_tpu.models import init_model

KEY = jax.random.key(0)


@pytest.mark.parametrize("arch,method", [
    ("transformer", "hybrid"),
    ("resnet_no_down", "ema"),
    ("simple", "fsq"),
])
def test_bf16_forward(arch, method):
    cfg = ModelConfig(arch=arch, method=method, window_size=8, hidden_dim=16,
                      codebook_size=64, d_model=32, ff_dim=64, n_tf_layers=1,
                      num_res_layers=1, compute_dtype="bfloat16")
    model, vs = init_model(cfg, KEY)
    # params must stay f32 (mixed precision: bf16 compute, f32 master weights)
    for leaf in jax.tree_util.tree_leaves(vs["params"]):
        assert leaf.dtype == jnp.float32
    x_r = jax.random.normal(jax.random.key(1), (4, 8, 29))
    x_h = jax.random.normal(jax.random.key(2), (4, 8, 126))
    out, _ = model.apply(vs, x_robot=x_r, x_human=x_h, train=True,
                         mutable=["batch_stats", "qstats"],
                         rngs={"dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(out["robot"]["recon"], np.float32)).all()
    assert np.isfinite(float(out["robot"]["loss_vq"]))


def test_bf16_train_step_converges():
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        arrays = generate_synthetic_dataset(d, n_sequences=4, min_len=30, max_len=40,
                                            window=8, step=4, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    exp = make_experiment("resnet_no_down", "ae", window=8, batch_size=16,
                          hidden_dim=16, num_res_layers=1, compute_dtype="bfloat16")
    model, variables = init_model(exp.model, KEY)
    params, rest = split_variables(variables)
    tx = make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))
    n = (len(ds) // 16) * 16
    idx = jnp.arange(n).reshape(-1, 16)
    keys = jax.random.split(KEY, idx.shape[0])
    f = make_train_epoch(model, tx, exp, None)
    losses = []
    for _ in range(3):
        state, logs = f(state, ds.robot, ds.human, idx, keys)
        losses.append(float(logs["train_loss"]))
    assert losses[-1] < losses[0]
    # loss computed in f32 even under bf16 compute
    assert np.isfinite(losses).all()
