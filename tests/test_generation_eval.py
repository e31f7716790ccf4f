"""Generation-statistics tests: the no-reference quality report must separate
data-like motion from the two known failure modes (frozen mean-prediction and
out-of-distribution noise)."""

import numpy as np

from bridgerl_tpu.eval.generation import compare_to_data, format_report, motion_stats


def _walkish(rng, t=200, d=29, amp=1.0):
    ph = rng.uniform(0, np.pi, d)
    f = rng.uniform(0.05, 0.2, d)
    return (amp * np.sin(np.arange(t)[:, None] * f + ph)).astype(np.float32)


def test_matching_distribution_scores_near_one():
    rng = np.random.default_rng(0)
    data = [_walkish(rng) for _ in range(8)]
    gen = [_walkish(rng) for _ in range(4)]
    rep = compare_to_data(gen, data)
    assert 0.8 < rep["vel_ratio"] < 1.25
    assert 0.8 < rep["jerk_ratio"] < 1.25
    assert rep["range_coverage_mean"] > 0.8
    assert rep["static_frac_gen"] < 0.05
    assert "vel RMS" in format_report(rep)


def test_frozen_prior_is_flagged():
    """Mean-prediction collapse: near-zero velocity, high static fraction,
    tiny range coverage."""
    rng = np.random.default_rng(1)
    data = [_walkish(rng) for _ in range(8)]
    gen = [np.zeros((100, 29), np.float32) for _ in range(3)]
    rep = compare_to_data(gen, data)
    assert rep["vel_ratio"] < 0.01
    assert rep["static_frac_gen"] > 0.95
    assert rep["range_coverage_mean"] < 0.1


def test_noise_overshoot_is_flagged():
    rng = np.random.default_rng(2)
    data = [_walkish(rng) for _ in range(8)]
    gen = [rng.normal(scale=5.0, size=(100, 29)).astype(np.float32)
           for _ in range(3)]
    rep = compare_to_data(gen, data)
    assert rep["vel_ratio"] > 3.0 and rep["jerk_ratio"] > 3.0


def test_short_sequences_do_not_crash():
    m = motion_stats([np.ones((3, 4), np.float32)])
    assert m["jerk_rms"] == 0.0 and np.isfinite(m["vel_rms"])


def test_overlap_disagreement_zero_on_true_windows():
    """Windows cut from ONE trajectory on the stride grid agree exactly."""
    from bridgerl_tpu.eval.generation import overlap_disagreement

    rng = np.random.default_rng(3)
    traj = rng.normal(size=(50, 29)).astype(np.float32)
    W, S = 10, 4
    wins = np.stack([traj[s:s + W] for s in range(0, 50 - W + 1, S)])
    assert overlap_disagreement(wins, S) == 0.0


def test_overlap_disagreement_measures_incoherence():
    from bridgerl_tpu.eval.generation import overlap_disagreement

    rng = np.random.default_rng(4)
    wins = rng.normal(size=(8, 10, 29)).astype(np.float32)  # iid windows
    d = overlap_disagreement(wins, 4)
    assert d > 1.0  # iid gaussian halves differ by ~sqrt(2)
    # no overlap -> vacuously coherent
    assert overlap_disagreement(wins, 10) == 0.0
    assert overlap_disagreement(wins[:1], 4) == 0.0


def test_code_novelty_verbatim_vs_recombined_vs_random():
    from bridgerl_tpu.eval.generation import code_novelty

    rng = np.random.default_rng(5)
    data = rng.integers(0, 50, size=(6, 12, 3)).astype(np.int32)
    mask = np.ones((6, 12), np.float32)
    # verbatim copy: zero novelty at both orders
    rep = code_novelty(data[:2].copy(), data, mask)
    assert rep["position_novel_frac"] == 0.0
    assert rep["bigram_novel_frac"] == 0.0
    # recombination: known positions stitched in a new order -> positions
    # stay known, bigrams become novel
    flat = data.reshape(-1, 3)
    shuffled = flat[rng.permutation(flat.shape[0])][:24].reshape(2, 12, 3)
    rep = code_novelty(shuffled, data, mask)
    assert rep["position_novel_frac"] == 0.0
    assert rep["bigram_novel_frac"] > 0.5
    # off-distribution codes: novel at both orders
    rep = code_novelty(data[:2] + 1000, data, mask)
    assert rep["position_novel_frac"] == 1.0
    assert rep["bigram_novel_frac"] == 1.0


def test_code_novelty_respects_mask():
    from bridgerl_tpu.eval.generation import code_novelty

    data = np.zeros((1, 4, 2), np.int32)
    data[0, :2] = [[1, 1], [2, 2]]          # only first 2 positions real
    mask = np.array([[1.0, 1.0, 0.0, 0.0]], np.float32)
    gen = np.array([[[0, 0], [0, 0]]], np.int32)   # = the PADDING rows
    rep = code_novelty(gen, data, mask)
    assert rep["position_novel_frac"] == 1.0   # padding isn't data


def test_nearest_data_distance_floor_and_scale():
    from bridgerl_tpu.eval.generation import nearest_data_distance

    rng = np.random.default_rng(6)
    data = rng.normal(size=(40, 8, 5)).astype(np.float32)
    rep = nearest_data_distance(data[:4].copy(), data, chunk=7)
    assert rep["nn_mse_mean"] < 1e-9           # verbatim -> 0
    shifted = data[:4] + 0.5
    rep = nearest_data_distance(shifted, data, chunk=7)
    assert 0.05 < rep["nn_mse_mean"] <= 0.5    # offset^2 = 0.25 upper bound
    assert rep["nn_mse_min"] <= rep["nn_mse_mean"] <= rep["nn_mse_max"]


def test_continuation_curves_shapes_and_semantics():
    from bridgerl_tpu.eval.generation import continuation_curves

    rng = np.random.default_rng(3)
    data = rng.normal(size=(50, 6, 4)).astype(np.float32)
    true = np.stack([data[:5], data[5:10]])          # (2, 5, 6, 4)
    # continuation = truth at offset 0, drifting linearly afterwards
    drift = np.arange(5, dtype=np.float32)[None, :, None, None] * 0.3
    cont = true + drift
    rep = continuation_curves(cont, true, data, offsets=(0, 1, 3))
    assert rep["offsets"] == [0, 1, 3, 4]            # final always probed
    assert rep["truth_mse_by_offset"][0] < 1e-6      # anchored at the seam
    t = rep["truth_mse_by_offset"]
    assert t[0] < t[1] < t[2] < t[3]                 # compounding drift
    assert rep["nn_mse_by_offset"][0] < 1e-6         # offset 0 IS a data row
    # mismatched shapes must be rejected
    import pytest
    with pytest.raises(ValueError):
        continuation_curves(cont[:, :3], true, data)


def test_synth_robot_takes_distribution_contract():
    from bridgerl_tpu.data.synthetic import G1_DOF, synth_robot_takes

    takes = synth_robot_takes(3, 50, 80, seed=5)
    assert len(takes) == 3
    for t in takes:
        assert t.dtype == np.float32
        assert t.shape[1] == G1_DOF
        assert 50 <= t.shape[0] <= 80
    # deterministic in the seed, different across seeds
    again = synth_robot_takes(3, 50, 80, seed=5)
    assert all(np.array_equal(a, b) for a, b in zip(takes, again))
    other = synth_robot_takes(3, 50, 80, seed=6)
    assert not np.array_equal(takes[0][:50], other[0][:50])
