"""Gradient-accumulation (TrainConfig.accum_chunks) semantics.

The accumulated step must produce the same parameters as the monolithic
big-batch step whenever the model has no per-microbatch state (losses are
batch means, so mean-of-chunk-gradients == big-batch gradient); stateful
collections (EMA qstats) legally update once per microbatch — the reference's
own semantics at batch_size/accum — and must stay healthy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables


def build(method, accum, dropout=0.0, batch=64, sgd=False, reuse=False):
    exp = make_experiment(
        "transformer", method, window=10, mode="teacher",
        hidden_dim=16, codebook_size=32, d_model=32, ff_dim=64, n_tf_layers=1,
        batch_size=batch, accum_chunks=accum, dropout=dropout,
        reuse_dropout_mask=reuse,
    )
    model, variables = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(variables)
    # sgd(lr=1): the post-step param delta IS the gradient, so the equivalence
    # assertion probes the gradient itself (Adam is scale-invariant and would
    # mask e.g. a missing 1/accum normalization).
    import optax
    tx = optax.sgd(1.0) if sgd else make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))
    fn = make_train_epoch(model, tx, exp, mesh=None)
    return exp, state, fn


def run_epoch(fn, state, batch=64, steps=2):
    robot = jax.random.normal(jax.random.key(1), (batch * steps, 10, 29), jnp.float32)
    human = jax.random.normal(jax.random.key(2), (batch * steps, 10, 126), jnp.float32)
    idx = jnp.arange(batch * steps).reshape(steps, batch)
    keys = jax.random.split(jax.random.key(3), steps)
    return fn(state, robot, human, idx, keys)


def test_accum_chunks_bit_matches_monolithic_step():
    # ae = IdentityVQ + LayerNorm-only transformer: no mutable collections, so
    # the gradient equality is exact up to fp reassociation of the sum.
    _, s1, f1 = build("ae", accum=1, sgd=True)
    _, s4, f4 = build("ae", accum=4, sgd=True)
    out1, logs1 = run_epoch(f1, s1, steps=1)
    out4, logs4 = run_epoch(f4, s4, steps=1)
    init = jax.tree_util.tree_leaves(build("ae", accum=1, sgd=True)[1].params)
    p1 = jax.tree_util.tree_leaves(out1.params)
    p4 = jax.tree_util.tree_leaves(out4.params)
    grads1 = [np.asarray(a) - np.asarray(p0) for p0, a in zip(init, p1)]  # -grad under sgd(1.0)
    grads4 = [np.asarray(b) - np.asarray(p0) for p0, b in zip(init, p4)]
    scale = max(np.abs(g).max() for g in grads1)  # global gradient magnitude
    for g1, g4 in zip(grads1, grads4):
        np.testing.assert_allclose(g1, g4, rtol=1e-4, atol=1e-6 * scale)
    np.testing.assert_allclose(float(logs1["train_loss"]), float(logs4["train_loss"]),
                               rtol=1e-5)


def test_accum_chunks_ema_path_stays_healthy():
    _, s, f = build("ema", accum=2)
    out, logs = run_epoch(f, s)
    assert np.isfinite(float(logs["train_loss"]))
    for leaf in jax.tree_util.tree_leaves(out.rest):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_accum_chunks_must_divide_batch():
    with pytest.raises(ValueError, match="accum_chunks"):
        make_experiment("transformer", "ae", window=10, batch_size=64, accum_chunks=3)


def test_accum_config_roundtrip():
    exp = make_experiment("transformer", "ae", window=10, batch_size=64, accum_chunks=4)
    assert exp.train.accum_chunks == 4
    assert dataclasses.asdict(exp.train)["accum_chunks"] == 4


def test_reuse_dropout_mask_bit_matches_when_dropout_off():
    """With dropout=0 the reused-key path must be bit-identical to the
    per-microbatch-key path (the flag only changes RNG threading)."""
    _, s0, f0 = build("ae", accum=4, sgd=True)
    _, s1, f1 = build("ae", accum=4, sgd=True, reuse=True)
    out0, logs0 = run_epoch(f0, s0, steps=1)
    out1, logs1 = run_epoch(f1, s1, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(out0.params),
                    jax.tree_util.tree_leaves(out1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(logs0["train_loss"]) == float(logs1["train_loss"])


def test_reuse_dropout_mask_shares_mask_across_microbatches():
    """Semantics probe through the REAL trainer path: feed 4 IDENTICAL
    microbatches. With reuse, every micro sees the same data AND the same
    mask, so the accumulated step must bit-match the accum=1 step on one
    microbatch (g+g+g+g = 4g exactly, /4 exact). With fresh per-micro keys
    the masks differ, so the same comparison must NOT match."""
    import optax

    window = jax.random.normal(jax.random.key(1), (8, 10, 29), jnp.float32)
    human32 = jnp.zeros((32, 10, 126), jnp.float32)

    def step(batch, accum, reuse, robot):
        exp = make_experiment(
            "transformer", "ae", window=10, mode="teacher",
            hidden_dim=16, codebook_size=32, d_model=32, ff_dim=64,
            n_tf_layers=1, batch_size=batch, accum_chunks=accum, dropout=0.5,
            reuse_dropout_mask=reuse)
        model, variables = init_model(exp.model, jax.random.key(0))
        params, rest = split_variables(variables)
        tx = optax.sgd(1.0)
        state = TrainState(params, rest, tx.init(params))
        fn = make_train_epoch(model, tx, exp, mesh=None)
        idx = jnp.arange(robot.shape[0]).reshape(1, robot.shape[0])
        keys = jax.random.split(jax.random.key(3), 1)
        out, logs = fn(state, robot, human32[: robot.shape[0]], idx, keys)
        return jax.tree_util.tree_leaves(out.params), float(logs["train_loss"])

    tiled = jnp.tile(window, (4, 1, 1))  # 4 identical microbatches of 8
    p_mono, l_mono = step(8, 1, False, window)       # accum=1: key used directly
    p_reuse, l_reuse = step(32, 4, True, tiled)      # reuse: every micro gets `key`
    p_fresh, l_fresh = step(32, 4, False, tiled)     # fresh per-micro keys

    for a, b in zip(p_mono, p_reuse):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(l_mono, l_reuse, rtol=1e-6)
    assert abs(l_mono - l_fresh) > 1e-6  # fresh masks genuinely differ


def test_accum_clamps_to_divisor_on_small_batches():
    """A dataset smaller than batch_size clamps the effective batch (trainer
    train_seed); accum must fall back to a divisor instead of crashing at
    reshape (round-2 ADVICE). accum=4 with an effective batch of 6 -> gcd=2."""
    exp, state, fn = build("ae", accum=4, batch=8)
    robot = jax.random.normal(jax.random.key(1), (6, 10, 29), jnp.float32)
    human = jax.random.normal(jax.random.key(2), (6, 10, 126), jnp.float32)
    idx = jnp.arange(6).reshape(1, 6)  # effective batch 6, not divisible by 4
    keys = jax.random.split(jax.random.key(3), 1)
    state, logs = fn(state, robot, human, idx, keys)
    assert np.isfinite(float(logs["train_loss"]))
