"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel training
step, sharded-vs-single-device numerical equivalence, multi-seed vmap trainer."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
from bridgerl_tpu.models import init_model
from bridgerl_tpu.parallel import batch_sharding, make_mesh
from bridgerl_tpu.train import (
    MultiSeedTrainer,
    Trainer,
    TrainState,
    init_states_vmapped,
    make_optimizer,
    make_train_epoch,
    split_variables,
)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    arrays = generate_synthetic_dataset(str(d), n_sequences=6, min_len=40, max_len=60,
                                        window=10, step=2, seed=0)
    return PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])


def tiny_exp(tmp_path, **kw):
    defaults = dict(hidden_dim=16, codebook_size=32, num_res_layers=1,
                    epochs=2, batch_size=32, d_model=32, ff_dim=64, n_tf_layers=1)
    defaults.update(kw)
    exp = make_experiment("resnet_no_down", kw.pop("method", "ema") if "method" in kw else "ema",
                          window=10, **{k: v for k, v in defaults.items() if k != "method"})
    return dataclasses.replace(exp, log_dir=os.path.join(tmp_path, "results"),
                               checkpoint_dir=os.path.join(tmp_path, "ckpts"))


def test_mesh_construction(eight_devices):
    mesh = make_mesh()
    assert mesh.devices.size == 8
    s = batch_sharding(mesh, 3)
    assert s.spec == P("data", None, None)


def test_sharded_epoch_matches_unsharded(data, tmp_path, eight_devices):
    """The data-parallel program must be numerically equivalent to the
    single-device program (same global batch, XLA handles the collectives)."""
    exp = tiny_exp(str(tmp_path))
    model, variables = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(variables)
    tx = make_optimizer(exp, params)

    n = (len(data) // 32) * 32
    idx = jnp.arange(n).reshape(-1, 32)[:2]
    keys = jax.random.split(jax.random.key(1), idx.shape[0])

    # single-device (fresh copies: the epoch donates its state buffers)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    f0 = make_train_epoch(model, tx, exp, mesh=None)
    s0 = TrainState(copy(params), copy(rest), tx.init(copy(params)))
    s0, logs0 = f0(s0, data.robot, data.human, idx, keys)

    # sharded over 8 virtual devices: the dataset stays replicated (its N need
    # not divide the mesh); each gathered BATCH is constrained to P('data').
    mesh = make_mesh()
    f8 = make_train_epoch(model, tx, exp, mesh=mesh)
    s8 = TrainState(copy(params), copy(rest), tx.init(copy(params)))
    s8, logs8 = f8(s8, data.robot, data.human, idx, keys)

    np.testing.assert_allclose(float(logs0["train_loss"]), float(logs8["train_loss"]),
                               rtol=2e-4)
    # Gradient-level equivalence. (Comparing post-Adam params is too brittle:
    # Adam rescales any near-zero gradient to a full ±lr step, so f32
    # reduction-order noise between GSPMD partitionings flips update signs on
    # dead biases. Gradients themselves must agree to float tolerance.)
    from bridgerl_tpu.train.losses import teacher_loss

    def grads_of(mesh):
        from bridgerl_tpu.parallel import shard_batch

        def loss_fn(p):
            variables = {"params": p, **rest}
            x_r = shard_batch(mesh, jnp.take(data.robot, idx[0], axis=0))
            out, _ = model.apply(variables, x_robot=x_r, train=True,
                                 mutable=["batch_stats", "qstats"],
                                 rngs={"dropout": jax.random.key(9)})
            return teacher_loss(out["robot"]["recon"], x_r, out["robot"]["loss_vq"])["loss"]

        return jax.jit(jax.grad(loss_fn))(params)

    g0 = jax.tree_util.tree_leaves(grads_of(None))
    g8 = jax.tree_util.tree_leaves(grads_of(mesh))
    for a, b in zip(g0, g8):
        # floor of 1e-5 absorbs mathematically-zero leaves (e.g. conv biases
        # followed by BatchNorm) whose values are pure cancellation noise
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * (1.0 + scale))
    # EMA codebook stats must match batch-globally (the psum-correctness claim)
    q0 = jax.tree_util.tree_leaves(s0.rest.get("qstats", {}))
    q8 = jax.tree_util.tree_leaves(s8.rest.get("qstats", {}))
    for a, b in zip(q0, q8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_multiseed_vmap_trainer(data, tmp_path):
    exp = tiny_exp(str(tmp_path), seeds=(42, 7, 1024))
    hist = MultiSeedTrainer(exp, verbose=False).run(data)
    assert set(hist) == {42, 7, 1024}
    for s, h in hist.items():
        assert len(h["train_loss"]) == 2
        assert np.isfinite(h["val_recon"]).all()
        assert os.path.exists(os.path.join(exp.log_dir, f"log_resnet_no_down_ema_seed_{s}.json"))
        assert os.path.exists(os.path.join(
            exp.checkpoint_dir, f"Exp_resnet_no_down_W10_ema_teacher_seed_{s}_final.ckpt"))
    # seeds must produce different trajectories (independent inits/shuffles)
    assert hist[42]["train_loss"] != hist[7]["train_loss"]


def test_multiseed_matches_singleseed_structure(data, tmp_path):
    """vmapped state tree has a leading seed axis on every leaf."""
    exp = tiny_exp(str(tmp_path), seeds=(42, 7))
    states = init_states_vmapped(exp, (42, 7))
    for leaf in jax.tree_util.tree_leaves(states.params):
        assert leaf.shape[0] == 2


def test_multiseed_seed_axis_sharded(data, tmp_path, eight_devices):
    """Seed axis can be laid out over the mesh (whole seeds per device)."""
    exp = tiny_exp(str(tmp_path), seeds=tuple(range(8)), epochs=1)
    mesh = make_mesh()
    hist = MultiSeedTrainer(exp, mesh=mesh, verbose=False).run(data)
    assert len(hist) == 8


def test_multiseed_seed_sharding_equivalence(data, tmp_path, eight_devices):
    """Sharding the seed axis over the mesh is a LAYOUT choice: per-seed loss
    trajectories must match the unsharded vmapped program (whole seeds per
    device -> zero cross-device collectives in the hot loop)."""
    seeds = tuple(range(8))
    h0 = MultiSeedTrainer(tiny_exp(os.path.join(str(tmp_path), "a"), seeds=seeds),
                          verbose=False).run(data)
    h8 = MultiSeedTrainer(tiny_exp(os.path.join(str(tmp_path), "b"), seeds=seeds),
                          mesh=make_mesh(), verbose=False).run(data)
    # rtol 5e-4: device-local vs global leaves change f32 reduction order
    # (measured ~1.4e-4 after 2 epochs); a routing bug (wrong seed on a
    # device) would diverge by O(1), far outside this band
    for s in seeds:
        np.testing.assert_allclose(h0[s]["train_loss"], h8[s]["train_loss"],
                                   rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(h0[s]["val_recon"], h8[s]["val_recon"],
                                   rtol=5e-4, atol=1e-6)
