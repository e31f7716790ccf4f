"""Motion-token prior tests: causality, learning, sampling, decode loop.

The prior is net-new surface (the reference never consumes its VQ indices);
these tests pin the properties that make it trustworthy:

- strict causality (position t's logits ignore positions >= t)
- the training loop actually learns (loss drops on a deterministic pattern)
- sampled grids live in the normalized vocab and decode to finite motion of
  the documented length through the real quantizer + decoder
- checkpoint roundtrip preserves params and config
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.models.token_prior import (
    MotionTokenPrior,
    PriorConfig,
    codes_to_grid,
    grid_to_codes,
    prior_loss,
    sample_grids,
)
from bridgerl_tpu.train.prior import (
    PriorTrainConfig,
    extract_code_grids,
    load_prior_checkpoint,
    sample_motion,
    save_prior_checkpoint,
    stitch_windows,
    train_prior,
)

TINY = PriorConfig(
    streams=("quantizer/a", "quantizer/b"), vocab_sizes=(7, 5),
    tokens_per_stream=1, window=10, stride=5,
    d_model=16, n_heads=2, n_layers=2, ff_dim=32, dropout=0.0, max_len=8)


def _tiny_model():
    model = MotionTokenPrior(TINY)
    grid = jnp.zeros((2, 8, 2), jnp.int32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, grid, train=False)
    return model, variables


def test_causality():
    """Changing positions >= t must not change logits at position t."""
    model, variables = _tiny_model()
    rng = np.random.default_rng(0)
    g1 = rng.integers(0, 5, size=(2, 8, 2)).astype(np.int32)
    g2 = g1.copy()
    g2[:, 4:] = (g2[:, 4:] + 1) % 5
    l1 = model.apply(variables, jnp.asarray(g1), train=False)
    l2 = model.apply(variables, jnp.asarray(g2), train=False)
    for a, b in zip(l1, l2):
        # logits at positions <= 4 (inputs are shifted right by BOS) agree
        np.testing.assert_allclose(np.asarray(a[:, :5]), np.asarray(b[:, :5]),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(a[:, 5:]), np.asarray(b[:, 5:]))


def test_prior_learns_a_deterministic_pattern():
    """CE on a constant-token dataset collapses toward 0."""
    grids = np.zeros((16, 8, 2), np.int32)
    grids[..., 0] = 3
    grids[..., 1] = 1
    mask = np.ones((16, 8), np.float32)
    tcfg = PriorTrainConfig(epochs=40, batch_size=8, lr=3e-3, patience=-1,
                            val_fraction=0.25, seed=0)
    variables, history = train_prior(grids, mask, TINY, tcfg, verbose=False)
    assert history["val_loss"][-1] < 0.2 * history["val_loss"][0]


def test_masked_positions_do_not_train():
    """Padded positions contribute nothing to the loss."""
    model, variables = _tiny_model()
    g = np.zeros((2, 8, 2), np.int32)
    m_full = np.ones((2, 8), np.float32)
    m_half = m_full.copy()
    m_half[:, 4:] = 0.0
    logits = model.apply(variables, jnp.asarray(g), train=False)
    l_full = prior_loss(logits, jnp.asarray(g), jnp.asarray(m_full))
    l_half = prior_loss(logits, jnp.asarray(g), jnp.asarray(m_half))
    assert np.isfinite(float(l_full)) and np.isfinite(float(l_half))
    assert abs(float(l_full) - float(l_half)) > 0  # different supports


def test_sample_grids_vocab_and_determinism():
    model, variables = _tiny_model()
    g = sample_grids(model, variables, jax.random.key(7), batch=3, length=6,
                     temperature=0.9, top_k=3)
    g = np.asarray(g)
    assert g.shape == (3, 6, 2)
    assert g[..., 0].min() >= 0 and g[..., 0].max() < 7
    assert g[..., 1].min() >= 0 and g[..., 1].max() < 5
    g2 = np.asarray(sample_grids(model, variables, jax.random.key(7), batch=3,
                                 length=6, temperature=0.9, top_k=3))
    np.testing.assert_array_equal(g, g2)
    with pytest.raises(ValueError, match="max_len"):
        sample_grids(model, variables, jax.random.key(0), 1, 99)


def test_grid_codes_roundtrip():
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 5, size=(4, 6, 2)).astype(np.int32)
    codes = grid_to_codes(TINY, jnp.asarray(grid))
    assert set(codes) == {"quantizer/a", "quantizer/b"}
    assert codes["quantizer/a"].shape == (24, 1)
    back = np.asarray(codes_to_grid(TINY, codes, n_positions=6))
    np.testing.assert_array_equal(back, grid)


def test_stitch_windows_jax_matches_numpy():
    """The frozen generator's in-graph overlap-add equals the host stitch."""
    from bridgerl_tpu.train.prior import stitch_windows_jax

    rng = np.random.default_rng(5)
    wins = rng.normal(size=(2, 7, 10, 29)).astype(np.float32)
    out = np.asarray(stitch_windows_jax(jnp.asarray(wins), stride=4))
    for b in range(2):
        np.testing.assert_allclose(out[b], stitch_windows(wins[b], 4),
                                   rtol=1e-6, atol=1e-6)


def test_stitch_windows_overlap_average():
    wins = np.ones((3, 4, 2), np.float32)
    wins[1] = 3.0
    out = stitch_windows(wins, stride=2)
    assert out.shape == (2 * 2 + 4, 2)
    np.testing.assert_allclose(out[:2], 1.0)     # only window 0
    np.testing.assert_allclose(out[2:4], 2.0)    # avg(1, 3)


@pytest.fixture(scope="module")
def tiny_vq():
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1)
    model, variables = init_model(exp.model, jax.random.key(0))
    return exp, model, variables


def test_extract_code_grids(tiny_vq):
    exp, model, variables = tiny_vq
    rng = np.random.default_rng(1)
    seqs = [rng.normal(size=(t, 29)).astype(np.float32) for t in (40, 25, 9)]
    mean, std = np.zeros(29, np.float32), np.ones(29, np.float32)
    grids, mask, pcfg, seq_ids = extract_code_grids(
        model, variables, exp, seqs, mean, std, stride=5, max_len=8)
    # the 9-frame sequence yields no window; 40 -> 7 windows, 25 -> 4
    assert grids.shape == (2, 8, 5 * 10)  # 5 streams x T'=10 tokens each
    np.testing.assert_array_equal(mask.sum(1), [7, 4])
    np.testing.assert_array_equal(seq_ids, [0, 1])
    assert pcfg.tokens_per_stream == 10 and pcfg.stride == 5
    assert len(pcfg.streams) == 5 and pcfg.streams[0] == "quantizer/fsq"
    # every token is inside its declared vocab
    for s, v in enumerate(pcfg.vocab_sizes):
        col = grids[..., s][mask > 0]
        assert col.min() >= 0 and col.max() < v


def test_sample_motion_end_to_end(tiny_vq):
    """Fresh prior + fresh VQ-VAE: sampled tokens decode to finite motion of
    the documented length through the real quantizer/decoder stack."""
    exp, model, variables = tiny_vq
    from bridgerl_tpu.models.token_prior import flatten_vocab_sizes
    from bridgerl_tpu.ops import code_vocab_sizes

    sizes = sorted(code_vocab_sizes(exp.model).items())
    pcfg = PriorConfig(
        streams=tuple(n for n, _ in sizes),
        vocab_sizes=flatten_vocab_sizes(sizes, tokens_per_stream=10),
        tokens_per_stream=10, window=10, stride=5,
        d_model=16, n_heads=2, n_layers=1, ff_dim=32, max_len=8)
    prior = MotionTokenPrior(pcfg)
    pv = prior.init({"params": jax.random.key(1), "dropout": jax.random.key(1)},
                    jnp.zeros((1, 8, len(pcfg.vocab_sizes)), jnp.int32),
                    train=False)
    mean, std = np.zeros(29, np.float32), np.ones(29, np.float32)
    motions = sample_motion(model, variables, exp, prior, pv, mean, std,
                            n_samples=2, n_positions=4, seed=3)
    assert len(motions) == 2
    for m in motions:
        assert m.shape == (5 * 3 + 10, 29)
        assert np.isfinite(m).all()


def test_conditioned_prior_learns_per_class_patterns():
    """Two classes, two disjoint constant token patterns: a conditioned prior
    must sample each class's own pattern."""
    import dataclasses

    pcfg = dataclasses.replace(TINY, class_names=("march", "wave"))
    grids = np.zeros((16, 8, 2), np.int32)
    grids[:8, :, 0], grids[:8, :, 1] = 6, 4     # class 0 pattern
    grids[8:, :, 0], grids[8:, :, 1] = 1, 0     # class 1 pattern
    class_ids = np.repeat(np.asarray([0, 1], np.int32), 8)
    mask = np.ones((16, 8), np.float32)
    tcfg = PriorTrainConfig(epochs=60, batch_size=8, lr=3e-3, patience=-1,
                            val_fraction=0.125, seed=1)
    variables, history = train_prior(grids, mask, pcfg, tcfg, verbose=False,
                                     class_ids=class_ids)
    model = MotionTokenPrior(pcfg)
    g0 = np.asarray(sample_grids(model, variables, jax.random.key(0), 4, 6,
                                 temperature=0.1,
                                 class_ids=jnp.zeros(4, jnp.int32)))
    g1 = np.asarray(sample_grids(model, variables, jax.random.key(0), 4, 6,
                                 temperature=0.1,
                                 class_ids=jnp.ones(4, jnp.int32)))
    assert (g0[..., 0] == 6).mean() > 0.9 and (g0[..., 1] == 4).mean() > 0.9
    assert (g1[..., 0] == 1).mean() > 0.9 and (g1[..., 1] == 0).mean() > 0.9


def test_conditioned_prior_requires_class_ids():
    import dataclasses

    pcfg = dataclasses.replace(TINY, class_names=("a", "b"))
    grids = np.zeros((4, 8, 2), np.int32)
    mask = np.ones((4, 8), np.float32)
    with pytest.raises(ValueError, match="class_ids"):
        train_prior(grids, mask, pcfg, PriorTrainConfig(epochs=1),
                    verbose=False)


def test_conditioned_checkpoint_roundtrip(tmp_path):
    import dataclasses

    pcfg = dataclasses.replace(TINY, class_names=("walk", "run"))
    model = MotionTokenPrior(pcfg)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, 8, 2), jnp.int32), train=False,
        class_ids=jnp.zeros((1,), jnp.int32))
    path = str(tmp_path / "cond.ckpt")
    save_prior_checkpoint(path, variables, pcfg)
    _, v2, pcfg2 = load_prior_checkpoint(path)
    assert pcfg2.class_names == ("walk", "run")
    assert "class_embed" in v2["params"]


def test_prior_checkpoint_roundtrip(tmp_path):
    model, variables = _tiny_model()
    path = str(tmp_path / "prior.ckpt")
    save_prior_checkpoint(path, variables, TINY, history={"val_loss": [1.0]})
    model2, v2, pcfg2 = load_prior_checkpoint(path)
    assert pcfg2 == TINY
    flat1 = jax.tree_util.tree_leaves(variables)
    flat2 = jax.tree_util.tree_leaves(v2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="token-prior"):
        bad = str(tmp_path / "bad.ckpt")
        open(bad, "wb").write(b"\x81\xa4kind\xa3nop")
        load_prior_checkpoint(bad)


# ------------------------------------------------------------- slot-AR prior

TINY_AR = dataclasses.replace(TINY, slot_ar=True, depth_layers=1)


def _tiny_ar_model():
    model = MotionTokenPrior(TINY_AR)
    grid = jnp.zeros((2, 8, 2), jnp.int32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, grid, train=False)
    return model, variables


def test_slot_ar_depth_causality():
    """Slot s's logits at position t see slots < s of t and nothing later.

    Changing slot 0's token at position t must change slot 1's logits AT t
    (the depth link) but not slot 0's own logits at t; changing slot 1's
    token at t must change neither slot's logits at t (only positions > t).
    """
    model, variables = _tiny_ar_model()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 5, size=(1, 8, 2)).astype(np.int32)
    t = 3

    flip0 = base.copy()
    flip0[:, t, 0] = (flip0[:, t, 0] + 1) % 5
    flip1 = base.copy()
    flip1[:, t, 1] = (flip1[:, t, 1] + 1) % 5

    lb = model.apply(variables, jnp.asarray(base), train=False)
    l0 = model.apply(variables, jnp.asarray(flip0), train=False)
    l1 = model.apply(variables, jnp.asarray(flip1), train=False)

    # flip slot 0 at t: slot 0 logits at t unchanged, slot 1 logits at t move
    np.testing.assert_allclose(np.asarray(lb[0][:, t]), np.asarray(l0[0][:, t]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(lb[1][:, t]), np.asarray(l0[1][:, t]))
    # flip slot 1 at t: both slots' logits at t unchanged...
    for s in range(2):
        np.testing.assert_allclose(np.asarray(lb[s][:, t]),
                                   np.asarray(l1[s][:, t]),
                                   rtol=1e-5, atol=1e-6)
    # ...but positions after t see the change (temporal link intact)
    assert not np.allclose(np.asarray(lb[0][:, t + 1:]),
                           np.asarray(l1[0][:, t + 1:]))


def test_slot_ar_learns_within_position_correlation():
    """slot1 == slot0 with slot0 iid-uniform: the factorized prior is
    information-bound at CE ~= log(5) on slot 1 (it never sees slot 0 of the
    same position), the slot-AR prior can drive slot 1's CE to ~0 — and its
    samples must respect the constraint."""
    rng = np.random.default_rng(4)
    grids = np.zeros((64, 8, 2), np.int32)
    grids[..., 0] = rng.integers(0, 5, size=(64, 8))
    grids[..., 1] = grids[..., 0]
    mask = np.ones((64, 8), np.float32)
    tcfg = PriorTrainConfig(epochs=80, batch_size=16, lr=3e-3, patience=-1,
                            val_fraction=0.125, seed=0)

    _, hist_fact = train_prior(grids, mask, TINY, tcfg, verbose=False)
    vars_ar, hist_ar = train_prior(grids, mask, TINY_AR, tcfg, verbose=False)

    # mean CE over both slots: factorized floor = (log5 + log5)/2 = 1.609
    # (slot 0 is unpredictable, slot 1 is a copy it cannot see);
    # slot-AR floor = (log5 + 0)/2 = 0.805.
    assert min(hist_fact["val_loss"]) > 1.35
    assert min(hist_ar["val_loss"]) < 1.15

    model_ar = MotionTokenPrior(TINY_AR)
    g = np.asarray(sample_grids(model_ar, vars_ar, jax.random.key(1),
                                batch=8, length=8, temperature=0.5))
    agree = (g[..., 1] == g[..., 0]).mean()
    assert agree > 0.9, f"sampled slot agreement {agree}"


def test_slot_ar_checkpoint_roundtrip(tmp_path):
    model, variables = _tiny_ar_model()
    assert "depth_stack" in variables["params"]
    path = str(tmp_path / "prior_ar.ckpt")
    save_prior_checkpoint(path, variables, TINY_AR)
    _, v2, pcfg2 = load_prior_checkpoint(path)
    assert pcfg2.slot_ar and pcfg2.depth_layers == 1
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------- corpus phases + grouped split

def test_extract_code_grids_phases(tiny_vq):
    """N phases = N independent stride grids per take, same take id."""
    exp, model, variables = tiny_vq
    rng = np.random.default_rng(2)
    seqs = [rng.normal(size=(40, 29)).astype(np.float32)]
    mean, std = np.zeros(29, np.float32), np.ones(29, np.float32)
    g1, m1, _, id1 = extract_code_grids(
        model, variables, exp, seqs, mean, std, stride=5, max_len=8)
    g2, m2, _, id2 = extract_code_grids(
        model, variables, exp, seqs, mean, std, stride=5, max_len=8,
        phases=[0, 2])
    # phase 0: starts 0..30 -> 7 windows; phase 2: starts 2..27 -> 6
    np.testing.assert_array_equal(m1.sum(1), [7])
    np.testing.assert_array_equal(m2.sum(1), [7, 6])
    np.testing.assert_array_equal(id2, [0, 0])  # copies keep the take id
    # the phase-0 grid is bit-identical to the unaugmented one
    np.testing.assert_array_equal(g2[0], g1[0])
    # a phase copy is a different token sequence, not a duplicate
    assert not np.array_equal(g2[1, :6], g2[0, :6])
    with pytest.raises(ValueError, match="phase"):
        extract_code_grids(model, variables, exp, seqs, mean, std, stride=5,
                           max_len=8, phases=[5])


def test_grouped_split_keeps_takes_together():
    """With seq_ids, grids of one take never straddle train/val.

    Two takes with DISJOINT constant token patterns, 4 identical grid copies
    each (what phase augmentation produces). A leaky per-grid split puts
    copies of both takes in train, so val CE memorizes to ~0; the grouped
    split holds one whole take out, so its pattern is never seen and val CE
    stays high. The contrast proves the grouping, not just the plumbing.
    """
    grids = np.zeros((8, 8, 2), np.int32)
    grids[:4, ..., 0], grids[:4, ..., 1] = 6, 4   # take 0 pattern
    grids[4:, ..., 0], grids[4:, ..., 1] = 1, 0   # take 1 pattern
    mask = np.ones((8, 8), np.float32)
    seq_ids = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    tcfg = PriorTrainConfig(epochs=50, batch_size=4, lr=3e-3, patience=-1,
                            val_fraction=0.5, seed=3)
    _, leaky = train_prior(grids, mask, TINY, tcfg, verbose=False)
    _, grouped = train_prior(grids, mask, TINY, tcfg, verbose=False,
                             seq_ids=seq_ids)
    assert min(leaky["val_loss"]) < 0.5       # memorized across the leak
    assert min(grouped["val_loss"]) > 1.0     # held-out take stays unseen
    with pytest.raises(ValueError, match="seq_ids"):
        train_prior(grids, mask, TINY, tcfg, verbose=False,
                    seq_ids=seq_ids[:3])


def test_select_train_survives_rising_val():
    """A corpus whose val takes are unpredictable from train takes: 'val'
    selection early-stops near init, 'train' selection keeps fitting.

    This pins the memorization-scale protocol fix (docs/ROUND3.md): grouped
    val CE rises from epoch ~0, so select='val' returns a near-init prior
    while select='train' returns the corpus fit the generation path needs.
    """
    rng = np.random.default_rng(7)
    # per-take constant token pairs: each take trivially learnable, takes
    # mutually unpredictive -> held-out takes give rising val CE
    grids = np.stack([np.full((8, 2), rng.integers(0, 5, 2), np.int32)
                      for _ in range(12)])
    mask = np.ones((12, 8), np.float32)
    seq_ids = np.arange(12, dtype=np.int32)
    common = dict(epochs=60, batch_size=4, lr=3e-3, patience=10,
                  val_fraction=0.25, seed=0)
    tv = PriorTrainConfig(select="val", **common)
    vav, hv = train_prior(grids, mask, TINY, tv, seq_ids=seq_ids,
                          verbose=False)
    tt = PriorTrainConfig(select="train", **common)
    vat, ht = train_prior(grids, mask, TINY, tt, seq_ids=seq_ids,
                          verbose=False)
    # train CE keeps falling -> train-selected run never early-stops
    assert len(ht["train_loss"]) == 60
    assert min(ht["train_loss"]) < 0.5 * ht["train_loss"][0]
    # val-selected run early-stops once held-out takes stop improving,
    # long before the train fit is done
    assert len(hv["val_loss"]) < 60
    # and the two selections return measurably different weights
    import jax
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        vav["params"], vat["params"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-3


def test_select_rejects_unknown():
    tcfg = PriorTrainConfig(select="best", epochs=1)
    grids = np.zeros((4, 8, 2), np.int32)
    mask = np.ones((4, 8), np.float32)
    import pytest
    with pytest.raises(ValueError, match="select"):
        train_prior(grids, mask, TINY, tcfg, verbose=False)


def test_prompted_sampling_keeps_prompt_and_continues():
    model, variables = _tiny_model()
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, 5, size=(3, 2)).astype(np.int32)  # (P, S)
    g = np.asarray(sample_grids(model, variables, jax.random.key(7),
                                batch=4, length=8, prompt=prompt))
    assert g.shape == (4, 8, 2)
    # prompt broadcast to every sample, preserved verbatim
    for b in range(4):
        np.testing.assert_array_equal(g[b, :3], prompt)
    # vocab bounds hold on the generated suffix
    assert g[..., 0].max() < 7 and g[..., 1].max() < 5
    # per-sample prompts also work
    pb = rng.integers(0, 5, size=(4, 3, 2)).astype(np.int32)
    g2 = np.asarray(sample_grids(model, variables, jax.random.key(7),
                                 batch=4, length=8, prompt=pb))
    np.testing.assert_array_equal(g2[:, :3], pb)
    # a different prompt changes the continuation (same key)
    assert not np.array_equal(g[:, 3:], g2[:, 3:])


def test_prompted_sampling_validates():
    model, variables = _tiny_model()
    ok = np.zeros((2, 2), np.int32)
    with pytest.raises(ValueError, match="nothing to generate"):
        sample_grids(model, variables, jax.random.key(0), 1, 2,
                     prompt=ok)
    with pytest.raises(ValueError, match="incompatible"):
        sample_grids(model, variables, jax.random.key(0), 2, 6,
                     prompt=np.zeros((3, 2, 2), np.int32))
    with pytest.raises(ValueError, match="incompatible"):
        sample_grids(model, variables, jax.random.key(0), 1, 6,
                     prompt=np.zeros((1, 2, 3), np.int32))


def test_prompted_sampling_slot_ar():
    cfg = dataclasses.replace(TINY, slot_ar=True)
    model = MotionTokenPrior(cfg)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           jnp.zeros((1, 8, 2), jnp.int32), train=False)
    prompt = np.array([[1, 2], [3, 4]], np.int32)
    g = np.asarray(sample_grids(model, variables, jax.random.key(3),
                                batch=2, length=6, prompt=prompt))
    np.testing.assert_array_equal(g[0, :2], prompt)
    np.testing.assert_array_equal(g[1, :2], prompt)
    assert g[..., 0].max() < 7 and g[..., 1].max() < 5


def test_nucleus_filter_keeps_mass_and_crossing_token():
    """Top-p keeps exactly the smallest prefix of sorted probs reaching p
    (the crossing token included), and never empties the support."""
    from bridgerl_tpu.models.token_prior import nucleus_filter

    lg = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(nucleus_filter(lg, 0.6))
    assert np.isfinite(out[0, :2]).all()          # 0.5 + 0.3 crosses 0.6
    assert np.isinf(out[0, 2:]).all() and (out[0, 2:] < 0).all()
    # degenerate p: the argmax always survives
    out = np.asarray(nucleus_filter(lg, 1e-9))
    assert np.isfinite(out[0, 0]) and np.isinf(out[0, 1:]).all()
    # p = 1 keeps everything
    out = np.asarray(nucleus_filter(lg, 1.0))
    assert np.isfinite(out).all()


def test_sample_grids_top_p_greedy_limit():
    """top_p -> 0 equals greedy decoding (argmax chain)."""
    model, variables = _tiny_model()
    g_p = np.asarray(sample_grids(model, variables, jax.random.key(3),
                                  batch=2, length=6, top_p=1e-9))
    g_greedy = np.asarray(sample_grids(model, variables, jax.random.key(5),
                                       batch=2, length=6, top_k=1))
    np.testing.assert_array_equal(g_p, g_greedy)  # key-independent
    # top_p=1.0 is a no-op filter: matches unfiltered sampling exactly
    g_all = np.asarray(sample_grids(model, variables, jax.random.key(3),
                                    batch=2, length=6, top_p=1.0))
    g_none = np.asarray(sample_grids(model, variables, jax.random.key(3),
                                     batch=2, length=6))
    np.testing.assert_array_equal(g_all, g_none)


def test_scheduled_sampling_trains_and_differs():
    """ss>0 still learns the constant pattern; the run differs from ss=0
    (two-pass context corruption is a different program), and ss=0 keeps
    the original single-pass history (backward-compat regression)."""
    grids = np.zeros((16, 8, 2), np.int32)
    grids[..., 0] = 3
    grids[..., 1] = 1
    mask = np.ones((16, 8), np.float32)
    base = dict(epochs=30, batch_size=8, lr=3e-3, patience=-1,
                val_fraction=0.25, seed=0)
    _, h0 = train_prior(grids, mask, TINY, PriorTrainConfig(**base),
                        verbose=False)
    _, h0b = train_prior(grids, mask, TINY, PriorTrainConfig(**base),
                         verbose=False)
    assert h0["train_loss"] == h0b["train_loss"]  # deterministic
    _, hs = train_prior(
        grids, mask, TINY,
        PriorTrainConfig(**base, scheduled_sampling=0.5), verbose=False)
    assert hs["val_loss"][-1] < 0.2 * hs["val_loss"][0]  # still learns
    assert hs["train_loss"] != h0["train_loss"]          # ss path engaged


# ---------- overlap-consistency guided sampling (round 4) ----------

def _slot0_decoder(W=10):
    """Fake decode_window: a position's window is constant at its slot-0
    token value — overlap agreement becomes |tok_t - tok_{t+1}|."""
    def decode_window(codes_pos):  # (B, S) -> (B, W, 1)
        v = codes_pos[:, 0].astype(jnp.float32)
        return jnp.broadcast_to(v[:, None, None], (codes_pos.shape[0], W, 1))
    return decode_window


def test_guided_sampling_selects_consistent_candidates():
    """Best-of-N selection must cut successive slot-0 jumps vs unguided
    sampling from the SAME untrained (≈uniform) prior."""
    from bridgerl_tpu.models.token_prior import sample_grids_guided

    model, variables = _tiny_model()
    g_plain = np.asarray(sample_grids(model, variables, jax.random.key(5),
                                      batch=4, length=8))
    g_guided = np.asarray(sample_grids_guided(
        model, variables, jax.random.key(5), 4, 8, _slot0_decoder(),
        candidates=6))
    assert g_guided.shape == (4, 8, 2)
    for s, v in enumerate(TINY.vocab_sizes):
        assert g_guided[..., s].min() >= 0 and g_guided[..., s].max() < v
    jump = lambda g: np.abs(np.diff(g[..., 0].astype(int), axis=1)).mean()
    # uniform prior: unguided jumps ~2.2 for vocab 7; best-of-6 much lower
    assert jump(g_guided) < 0.5 * jump(g_plain)
    # deterministic under the same key
    g2 = np.asarray(sample_grids_guided(
        model, variables, jax.random.key(5), 4, 8, _slot0_decoder(),
        candidates=6))
    np.testing.assert_array_equal(g_guided, g2)


def test_guided_sampling_prompt_kept_and_anchored():
    from bridgerl_tpu.models.token_prior import sample_grids_guided

    model, variables = _tiny_model()
    prompt = np.zeros((3, 2), np.int32)
    prompt[:, 0] = 6  # slot-0 track pinned high
    B = 16
    g = np.asarray(sample_grids_guided(
        model, variables, jax.random.key(7), B, 8, _slot0_decoder(),
        candidates=6, prompt=prompt))
    np.testing.assert_array_equal(g[:, :3], np.broadcast_to(prompt, (B, 3, 2)))
    # the first generated position is selected against the prompt's last
    # window (value 6): the closest-to-6 pick of 6 candidates must sit above
    # the unguided draw from the same prior/prompt/key on average
    g0 = np.asarray(sample_grids(model, variables, jax.random.key(7),
                                 batch=B, length=8, prompt=prompt))
    assert g[:, 3, 0].mean() > g0[:, 3, 0].mean()


def test_guided_sampling_dyn_weight_prefers_lively():
    """dyn_weight > 0 must bias best-of-N selection toward candidates whose
    decoded window moves more (counters the stillest-candidate bias of pure
    overlap agreement)."""
    from bridgerl_tpu.models.token_prior import sample_grids_guided

    def ramp_decoder(W=10, ov=5):
        # overlap frames are zero for EVERY candidate (equal overlap score);
        # the rest ramps with the slot-0 token: higher token == livelier
        def decode_window(codes_pos):
            v = codes_pos[:, 0].astype(jnp.float32)
            ramp = jnp.concatenate(
                [jnp.zeros(ov), jnp.linspace(0.0, 1.0, W - ov)])
            return v[:, None, None] * ramp[None, :, None]
        return decode_window

    model, variables = _tiny_model()
    kwargs = dict(candidates=6)
    g0 = np.asarray(sample_grids_guided(
        model, variables, jax.random.key(3), 8, 8, ramp_decoder(), **kwargs))
    g_dyn = np.asarray(sample_grids_guided(
        model, variables, jax.random.key(3), 8, 8, ramp_decoder(),
        dyn_weight=100.0, **kwargs))
    # overlap ties, so dyn picks ~the max-token candidate each step while
    # the pure-consistency run keeps an unbiased draw: a wide margin
    assert g_dyn[:, 1:, 0].mean() > g0[:, 1:, 0].mean() + 0.8
    for s, v in enumerate(TINY.vocab_sizes):
        assert g_dyn[..., s].min() >= 0 and g_dyn[..., s].max() < v


def test_guided_sampling_validates():
    from bridgerl_tpu.models.token_prior import sample_grids_guided

    model, variables = _tiny_model()
    with pytest.raises(ValueError, match="candidates"):
        sample_grids_guided(model, variables, jax.random.key(0), 2, 8,
                            _slot0_decoder(), candidates=1)
    nool = dataclasses.replace(TINY, stride=TINY.window)  # no overlap
    m2 = MotionTokenPrior(nool)
    with pytest.raises(ValueError, match="overlap"):
        sample_grids_guided(m2, variables, jax.random.key(0), 2, 8,
                            _slot0_decoder(), candidates=4)


def test_guided_sample_motion_end_to_end(tiny_vq):
    """guide_candidates flows through sample_motion over the REAL decode
    stack and cuts the decoded overlap disagreement vs unguided."""
    from bridgerl_tpu.eval.generation import overlap_disagreement
    from bridgerl_tpu.models.token_prior import flatten_vocab_sizes
    from bridgerl_tpu.ops import code_vocab_sizes

    exp, model, variables = tiny_vq
    sizes = sorted(code_vocab_sizes(exp.model).items())
    pcfg = PriorConfig(
        streams=tuple(n for n, _ in sizes),
        vocab_sizes=flatten_vocab_sizes(sizes, tokens_per_stream=10),
        tokens_per_stream=10, window=10, stride=5,
        d_model=16, n_heads=2, n_layers=1, ff_dim=32, max_len=8)
    prior = MotionTokenPrior(pcfg)
    pv = prior.init({"params": jax.random.key(1),
                     "dropout": jax.random.key(1)},
                    jnp.zeros((1, 8, len(pcfg.vocab_sizes)), jnp.int32),
                    train=False)
    mean, std = np.zeros(29, np.float32), np.ones(29, np.float32)
    kw = dict(n_samples=2, n_positions=6, seed=3, return_windows=True)
    m0, w0 = sample_motion(model, variables, exp, prior, pv, mean, std, **kw)
    mg, wg = sample_motion(model, variables, exp, prior, pv, mean, std,
                           guide_candidates=8, **kw)
    assert mg[0].shape == m0[0].shape and np.isfinite(mg[0]).all()
    d0 = np.mean([overlap_disagreement(w, 5) for w in w0])
    dg = np.mean([overlap_disagreement(w, 5) for w in wg])
    assert dg < d0  # guidance reduces decoded overlap disagreement


def test_chunked_eval_matches_whole_set_mean():
    """train_prior's chunked val eval must equal the one-shot masked mean.

    The chunking (bridgerl_tpu/train/prior.py eval_fn) exists because a
    whole-split eval OOMs at scale (docs/evidence/s10_queue.log: 26.6G HBM at the
    2560-take arm); correctness = sum(chunk sums)/sum(chunk weights)
    reproduces prior_loss exactly, including zero-weight padded chunks.
    """
    from bridgerl_tpu.models.token_prior import prior_loss_sums

    rng = np.random.default_rng(0)
    model, variables = _tiny_model()
    grid = jnp.asarray(rng.integers(0, 5, (13, 8, 2)), jnp.int32)
    mask = jnp.asarray((rng.random((13, 8)) > 0.2), jnp.float32)
    logits = model.apply(variables, grid, train=False)
    whole = float(prior_loss(logits, grid, mask))

    chunk = 4  # 13 -> chunks of 4 with a padded tail, like eval_fn
    pad = (-13) % chunk
    gp = jnp.concatenate([grid, jnp.zeros((pad, 8, 2), jnp.int32)])
    mp = jnp.concatenate([mask, jnp.zeros((pad, 8), jnp.float32)])
    total = weight = 0.0
    for i in range(0, int(gp.shape[0]), chunk):
        lg = model.apply(variables, gp[i:i + chunk], train=False)
        s, w = prior_loss_sums(lg, gp[i:i + chunk], mp[i:i + chunk])
        total += float(s)
        weight += float(w)
    assert abs(total / weight - whole) < 1e-5


def test_staged_logits_match_full_forward():
    """The staged sampling path ("context" + "position_logits" modes) must
    reproduce the teacher-forcing logits exactly at every position, for both
    factorized and slot-AR priors (and with class conditioning) — this is
    what makes the fast sampler distribution-identical to the old one."""
    rng = np.random.default_rng(3)
    for slot_ar in (False, True):
        for class_names in ((), ("walk", "run")):
            cfg = dataclasses.replace(TINY, slot_ar=slot_ar,
                                      class_names=class_names)
            model = MotionTokenPrior(cfg)
            grid = jnp.asarray(
                rng.integers(0, 5, size=(3, 8, 2)), jnp.int32)
            cls = (jnp.asarray([0, 1, 0], jnp.int32)
                   if class_names else None)
            variables = model.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(0)},
                grid, train=False, class_ids=cls)
            full = model.apply(variables, grid, train=False, class_ids=cls)
            ctx = model.apply(variables, grid, train=False, class_ids=cls,
                              mode="context")
            for t in range(grid.shape[1]):
                staged = model.apply(variables, mode="position_logits",
                                     ctx=ctx[:, t], slots=grid[:, t])
                for s in range(2):
                    np.testing.assert_allclose(
                        np.asarray(staged[s]), np.asarray(full[s][:, t]),
                        rtol=0, atol=1e-5,
                        err_msg=f"slot_ar={slot_ar} cls={class_names} "
                                f"t={t} s={s}")


def test_guided_candidates_share_backbone_same_distribution():
    """Guided sampling with candidates=2 at temperature->0 must produce the
    same grid as unguided greedy sampling (both candidates collapse to the
    argmax token, selection is then a no-op)."""
    from bridgerl_tpu.models.token_prior import sample_grids_guided

    model, variables = _tiny_model()

    def decode_window(slots):   # deterministic fake decoder
        f = slots.astype(jnp.float32)
        base = f[:, :1] + 0.1 * f[:, 1:2]
        t = jnp.linspace(0.0, 1.0, TINY.window)[None, :, None]
        return base[:, None, :] * (1.0 + t)

    greedy = sample_grids(model, variables, jax.random.key(0), 2, 6,
                          temperature=1e-6)
    guided = sample_grids_guided(model, variables, jax.random.key(0), 2, 6,
                                 decode_window, candidates=2,
                                 temperature=1e-6)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(guided))


def test_energy_tilt_weights_and_weighted_training(tiny_vq):
    """extract_code_grids returns per-position window speed; tilt weights
    are mean-1 over valid positions, monotone in energy, and plumb through
    train_prior as train-CE weights (val CE stays unweighted)."""
    from bridgerl_tpu.train.prior import energy_tilt_weights

    exp, model, variables = tiny_vq
    rng = np.random.default_rng(0)
    # one still take, one lively take
    still = np.tile(rng.normal(size=(1, 29)).astype(np.float32), (60, 1))
    lively = np.cumsum(rng.normal(size=(60, 29)).astype(np.float32) * 0.3, 0)
    mean = np.zeros(1, np.float32)
    std = np.ones(1, np.float32)
    grids, mask, pcfg, ids, energy = extract_code_grids(
        model, variables, exp, [still, lively], mean, std, 5,
        max_len=12, return_energy=True)
    assert energy.shape == mask.shape
    e_still = energy[ids == 0][mask[ids == 0] > 0]
    e_lively = energy[ids == 1][mask[ids == 1] > 0]
    assert e_still.max() < 1e-5 < e_lively.min()

    w = energy_tilt_weights(energy, mask, 1.0)
    valid = mask > 0
    np.testing.assert_allclose(w[valid].mean(), 1.0, atol=1e-5)
    assert w[~valid].sum() == 0.0
    assert w[ids == 1][mask[ids == 1] > 0].min() > \
        w[ids == 0][mask[ids == 0] > 0].max()

    # weighted training runs and differs from unweighted
    tcfg = PriorTrainConfig(epochs=3, batch_size=4, seed=0, patience=0,
                            select="train")
    v0, h0 = train_prior(grids, mask, pcfg, tcfg, seq_ids=ids, verbose=False)
    v1, h1 = train_prior(grids, mask, pcfg, tcfg, seq_ids=ids, verbose=False,
                         pos_weights=w)
    l0 = jax.tree_util.tree_leaves(v0["params"])
    l1 = jax.tree_util.tree_leaves(v1["params"])
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
    # bad shape rejected
    with pytest.raises(ValueError):
        train_prior(grids, mask, pcfg, tcfg, seq_ids=ids,
                    pos_weights=w[:, :3])
