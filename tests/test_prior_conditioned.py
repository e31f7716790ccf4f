"""Conditioned-prior-at-scale surfaces: labeled take generator, explicit
per-class val splits, the prior-as-classifier readout, and the code-space
histogram class match (the committed 4/7 metric from docs/ROUND3.md).

All net-new surface vs the reference (its VQ indices die inside the
quantizer forward, reference models/vqvae.py:38-40); these pin the tools the
conditioned scaling study (scripts/exp_prior_conditioned.py) stands on.
"""

import dataclasses

import numpy as np
import pytest

from bridgerl_tpu.data.synthetic import ACTION_BANDS, synth_labeled_takes
from bridgerl_tpu.eval.generation import (
    class_histogram_match,
    slot_histograms,
)
from bridgerl_tpu.models.token_prior import MotionTokenPrior, PriorConfig
from bridgerl_tpu.train.prior import (
    PriorTrainConfig,
    classify_grids,
    train_prior,
)

COND = PriorConfig(
    streams=("q/a",), vocab_sizes=(6,), tokens_per_stream=1,
    window=10, stride=5, d_model=16, n_heads=2, n_layers=1, ff_dim=32,
    dropout=0.0, max_len=6, class_names=("alpha", "beta"))


def _class_grids(n_per_class=6, N=6, seed=0):
    """Two classes with disjoint token ranges: trivially separable."""
    rng = np.random.default_rng(seed)
    g0 = rng.integers(0, 3, size=(n_per_class, N, 1)).astype(np.int32)
    g1 = rng.integers(3, 6, size=(n_per_class, N, 1)).astype(np.int32)
    grids = np.concatenate([g0, g1])
    mask = np.ones(grids.shape[:2], np.float32)
    cls = np.repeat(np.arange(2, dtype=np.int32), n_per_class)
    return grids, mask, cls


# ----------------------------------------------------------- labeled takes

def test_labeled_takes_shapes_and_labels():
    takes, labels = synth_labeled_takes(2, 120, 140, seed=5)
    actions = tuple(ACTION_BANDS)
    assert len(takes) == 2 * len(actions)
    # interleaved: first len(actions) entries are one take per class
    assert labels[:len(actions)] == list(actions)
    for t in takes:
        assert t.dtype == np.float32 and t.shape[1] == 29
        assert 120 <= t.shape[0] <= 140


def test_labeled_takes_superset_monotone():
    """Arm k's takes are a prefix of arm k' per class under one seed."""
    small, _ = synth_labeled_takes(1, 100, 110, seed=9)
    big, _ = synth_labeled_takes(3, 100, 110, seed=9)
    for i, t in enumerate(small):
        np.testing.assert_array_equal(t, big[i])


def test_labeled_takes_band_separation():
    """'fight' takes carry higher-frequency content than 'walk' takes."""
    takes, labels = synth_labeled_takes(3, 400, 420, seed=1)

    def peak(x):
        spec = np.abs(np.fft.rfft(x - x.mean(0), axis=0)).sum(1)
        f = np.fft.rfftfreq(x.shape[0])
        return float(f[np.argmax(spec)])

    for t, l in zip(takes, labels):
        if l == "walk":
            assert peak(t) < 0.04, f"walk peak {peak(t)} outside band"
        elif l == "fight":
            assert peak(t) > 0.10, f"fight peak {peak(t)} outside band"


# ----------------------------------------------------- explicit val takes

def test_val_take_ids_validation():
    grids, mask, cls = _class_grids()
    ids = np.arange(grids.shape[0], dtype=np.int32) // 3  # 4 takes
    cfg = dataclasses.replace(COND, class_names=())
    tcfg = PriorTrainConfig(epochs=1, batch_size=4, patience=-1)
    with pytest.raises(ValueError, match="requires seq_ids"):
        train_prior(grids, mask, cfg, tcfg, val_take_ids=[0])
    with pytest.raises(ValueError, match="not in seq_ids"):
        train_prior(grids, mask, cfg, tcfg, seq_ids=ids, val_take_ids=[99])
    with pytest.raises(ValueError, match="every take"):
        train_prior(grids, mask, cfg, tcfg, seq_ids=ids,
                    val_take_ids=[0, 1, 2, 3])


def test_val_take_ids_pins_the_split():
    """Pinned val takes -> val CE differs from the seeded-fraction split and
    training still learns (loss falls)."""
    grids, mask, cls = _class_grids(n_per_class=8)
    ids = np.arange(grids.shape[0], dtype=np.int32) // 2  # 8 takes
    cfg = dataclasses.replace(COND, class_names=())
    tcfg = PriorTrainConfig(epochs=8, batch_size=4, patience=-1, seed=3)
    _, h_pin = train_prior(grids, mask, cfg, tcfg, seq_ids=ids,
                           val_take_ids=[0, 4], verbose=False)
    _, h_pin2 = train_prior(grids, mask, cfg, tcfg, seq_ids=ids,
                            val_take_ids=[0, 4], verbose=False)
    assert h_pin["val_loss"] == h_pin2["val_loss"]  # deterministic
    assert h_pin["train_loss"][-1] < h_pin["train_loss"][0]


# ------------------------------------------------------ prior-as-classifier

def test_classify_grids_learns_separable_classes():
    grids, mask, cls = _class_grids(n_per_class=8, seed=2)
    tcfg = PriorTrainConfig(epochs=60, batch_size=8, patience=-1,
                            select="train", seed=0)
    best, hist = train_prior(grids, mask, COND, tcfg, class_ids=cls,
                             verbose=False)
    model = MotionTokenPrior(COND)
    pred, ce = classify_grids(model, best, grids, mask, batch=5)
    assert pred.shape == (grids.shape[0],) and ce.shape == (grids.shape[0], 2)
    # disjoint token ranges: the class token is worth real nats
    assert float(np.mean(pred == cls)) >= 0.9


def test_classify_grids_rejects_unconditioned():
    cfg = dataclasses.replace(COND, class_names=())
    model = MotionTokenPrior(cfg)
    with pytest.raises(ValueError, match="class-conditioned"):
        classify_grids(model, {}, np.zeros((1, 6, 1), np.int32),
                       np.ones((1, 6), np.float32))


# ------------------------------------------------------- histogram matching

def test_slot_histograms_mask_and_norm():
    grids = np.array([[[0], [1], [2]]], np.int32)
    mask = np.array([[1.0, 1.0, 0.0]], np.float32)
    h = slot_histograms(grids, mask, vocab_sizes=(4,))
    np.testing.assert_allclose(h, [0.5, 0.5, 0.0, 0.0])
    with pytest.raises(ValueError, match="slots"):
        slot_histograms(grids, None, vocab_sizes=(4, 4))


def test_class_histogram_match_disjoint_tokens():
    grids, mask, cls = _class_grids(n_per_class=10, seed=4)
    gen, _, gen_cls = _class_grids(n_per_class=4, seed=7)
    rep = class_histogram_match(gen, gen_cls, grids, cls,
                                vocab_sizes=(6,), data_mask=mask)
    assert rep["accuracy"] == 1.0 and rep["n_classes"] == 2
    assert all(m > 0.5 for m in rep["margins"].values())
    assert rep["predicted"] == {0: 0, 1: 1}
