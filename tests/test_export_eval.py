"""Export (overlap-add reconstruction) and evaluation (plots/latex) tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.export import (
    reconstruct_long_sequence,
    reconstruct_single_window,
    window_starts,
)
from bridgerl_tpu.eval import generate_latex, load_and_aggregate, plot_all, smooth


# ---------- window placement ----------

def test_window_starts_matches_reference_loop():
    """Starts must replicate the reference while-loop + tail logic
    (export_motion.py:42-77)."""
    for T, W, S in [(600, 10, 5), (100, 64, 32), (23, 10, 4), (11, 10, 5), (20, 10, 10)]:
        ref = []
        cur = 0
        while cur + W <= T:
            ref.append(cur)
            cur += S
        if cur < T:
            ref.append(T - W)
        ours = window_starts(T, W, S).tolist()
        # dedupe trailing repeat (reference may add T-W twice when cur==T-W+S>T)
        assert ours == sorted(set(ref)), (T, W, S, ours, ref)


def test_overlap_add_identity_model():
    """With an identity 'model', reconstruction must return the input exactly
    (every frame covered, averaging of identical windows is lossless)."""
    T, W, S, D = 57, 10, 4, 29
    rng = np.random.default_rng(0)
    seq = rng.normal(size=(T, D)).astype(np.float32)
    mean = seq.reshape(-1, D).mean(0)
    std = seq.reshape(-1, D).std(0) + 1e-6
    out = reconstruct_long_sequence(lambda x: x, seq, W, S, mean, std)
    np.testing.assert_allclose(out, seq, atol=1e-4)


def test_overlap_add_averages_overlaps():
    """A constant-offset model must produce a constant offset everywhere —
    the count buffer normalizes overlapping accumulation correctly."""
    T, W, S, D = 30, 10, 3, 4
    seq = np.zeros((T, D), np.float32)
    mean = np.zeros(D, np.float32)
    std = np.ones(D, np.float32)
    out = reconstruct_long_sequence(lambda x: x + 2.0, seq, W, S, mean, std)
    np.testing.assert_allclose(out, 2.0 * np.ones((T, D)), atol=1e-5)


def test_short_sequence_returns_none():
    seq = np.zeros((8, 4), np.float32)
    assert reconstruct_long_sequence(lambda x: x, seq, 10, 5,
                                     np.zeros(4), np.ones(4)) is None
    out = reconstruct_single_window(lambda x: x, np.zeros((12, 4), np.float32), 10,
                                    np.zeros(4, np.float32), np.ones(4, np.float32))
    assert out.shape == (10, 4)


# ---------- full export path ----------

def test_export_motions_from_checkpoint(tmp_path):
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.train import Trainer

    data_dir = str(tmp_path / "processed")
    arrays = generate_synthetic_dataset(data_dir, n_sequences=3, min_len=30, max_len=50,
                                        window=10, step=2, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    exp = make_experiment("resnet_no_down", "ae", window=10, epochs=1, batch_size=32,
                          hidden_dim=16, num_res_layers=1)
    import dataclasses
    exp = dataclasses.replace(exp, log_dir=str(tmp_path / "results"),
                              checkpoint_dir=str(tmp_path / "ckpts"))
    Trainer(exp, verbose=False).train_seed(ds, 42)

    from bridgerl_tpu.export import export_motions
    ckpt = os.path.join(exp.checkpoint_dir, "Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt")
    out_dir = str(tmp_path / "motions")
    written = export_motions(ckpt, data_dir=data_dir, output_dir=out_dir,
                             num_samples=2, verbose=False)
    assert len(written) == 4
    # returned entries are openable paths (not bare names; CWD-independent)
    assert all(os.path.exists(p) for p in written)
    recon_files = [f for f in os.listdir(out_dir) if f.startswith("recon_")]
    assert any("FullSeq_W10" in f for f in recon_files)
    gt = np.load(os.path.join(out_dir, "idx0_gt.npy"))
    rec = np.load(os.path.join(out_dir, [f for f in recon_files if "idx0" in f][0]))
    assert gt.shape == rec.shape and gt.shape[1] == 29


# ---------- plotting / latex ----------

def _fake_logs(log_dir, exp_id, seeds=(42, 7), epochs=12):
    os.makedirs(log_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for s in seeds:
        log = {
            "train_loss": (1.0 / np.arange(1, epochs + 1) + rng.normal(0, 0.01, epochs)).tolist(),
            "val_recon": (0.5 / np.arange(1, epochs + 1)).tolist(),
            "val_cross_recon": (0.6 / np.arange(1, epochs + 1)).tolist(),
            "val_align": (0.1 / np.arange(1, epochs + 1)).tolist(),
            "val_vel": (0.01 * np.ones(epochs)).tolist(),
            "val_jerk": (0.02 * np.ones(epochs)).tolist(),
            "perplexity": (100 + np.arange(epochs)).tolist(),
            "dcr": (0.5 * np.ones(epochs)).tolist(),
            "dead_code_ratio": (0.5 * np.ones(epochs)).tolist(),
        }
        with open(os.path.join(log_dir, f"log_{exp_id}_seed_{s}.json"), "w") as f:
            json.dump(log, f)


def test_smooth_ema():
    out = smooth([1.0, 0.0, 0.0], weight=0.5)
    np.testing.assert_allclose(out, [1.0, 0.5, 0.25])


def test_aggregate_groups_by_seed(tmp_path):
    _fake_logs(str(tmp_path), "simple_ema")
    _fake_logs(str(tmp_path), "resnet_rvq", seeds=(42,))
    data = load_and_aggregate(str(tmp_path))
    assert set(data) == {"simple_ema", "resnet_rvq"}
    assert len(data["simple_ema"]["val_recon"]) == 2  # two seeds


def test_plot_all_writes_pngs(tmp_path):
    _fake_logs(str(tmp_path / "results"), "simple_ema")
    written = plot_all(str(tmp_path / "results"), str(tmp_path / "plots" / "metrics"))
    assert any("compare_val_recon" in p for p in written)
    assert any("radar_chart" in p for p in written)
    for p in written:
        assert os.path.getsize(p) > 0


def test_latex_table(tmp_path):
    _fake_logs(str(tmp_path), "simple_ema")
    _fake_logs(str(tmp_path), "resnet_fsq", seeds=(42,))
    table = generate_latex(str(tmp_path))
    assert r"\toprule" in table and "Baseline(Simple)" in table
    assert "N/A" in table  # experiments without logs
    # last-5-epoch mean of val_recon for simple_ema: mean(0.5/k, k=8..12)
    expected = np.mean([0.5 / k for k in range(8, 13)])
    assert f"{expected:.4f}" in table


# ---------- parity criteria (round-2) ----------

def test_parity_criteria_not_evaluable_on_empty(tmp_path):
    from bridgerl_tpu.eval.parity import evaluate_parity, render_parity_md

    crits = evaluate_parity(str(tmp_path))
    assert all(c.passed is None for c in crits)
    md = render_parity_md(crits, str(tmp_path))
    assert "n/a" in md and "| C1 |" in md


def test_parity_detects_ordering(tmp_path):
    from bridgerl_tpu.eval.parity import evaluate_parity

    # synthesize a grid that satisfies the reference ordering signatures
    vals = {"resnet_hybrid": 0.012, "resnet_rvq": 0.013, "resnet_fsq": 0.032,
            "resnet_ema": 0.035, "simple_ema": 0.046}
    for exp_id, r in vals.items():
        for s in (42, 1024):
            log = {"val_recon": [r * (1 + 0.01 * k) for k in range(10)],
                   "perplexity": [900.0] * 10 if "hybrid" in exp_id else [100.0] * 10,
                   "dcr": [0.01] * 10 if exp_id in ("resnet_fsq", "resnet_hybrid") else [0.5] * 10}
            if exp_id == "resnet_hybrid":
                log["rvq_ppl"] = [200.0] * 10
            with open(os.path.join(tmp_path, f"log_{exp_id}_seed_{s}.json"), "w") as f:
                json.dump(log, f)
    crits = {c.cid: c for c in evaluate_parity(str(tmp_path))}
    assert crits["C1"].passed and crits["C2"].passed
    assert crits["C3"].passed and crits["C4"].passed


def test_generation_criteria_not_evaluable_on_empty(tmp_path):
    from bridgerl_tpu.eval.parity import evaluate_generation

    crits = evaluate_generation(
        scaling_paths=(str(tmp_path / "none.json"),),
        cond_path=str(tmp_path / "cond.json"),
        prompted_path=str(tmp_path / "prompted.json"))
    assert {c.cid for c in crits} == {"G1", "G2", "G3", "G4", "G5", "G6"}
    assert all(c.passed is None for c in crits)


def test_generation_criteria_bands(tmp_path):
    """G1-G5 pass on an in-band synthesized study and fail out-of-band
    (regression bands around the measured round-3/4 results)."""
    from bridgerl_tpu.eval.parity import evaluate_generation

    def arm(truth, floor, recon, ce0, ce_best, vel, overlap):
        return {
            "recon_floor": recon, "val_nn_floor": floor,
            "val_ce_epoch0": ce0, "val_ce_best": ce_best,
            "free_run": {"vel_ratio": vel, "overlap_disagreement": overlap},
            "prompted_val_P8": {"truth_mse_by_offset": [truth] * 4},
        }

    scaling = {
        "takes64": arm(0.40, 0.31, 0.0038, 6.6, 6.6, 0.3, 0.2),  # <160: exempt from G1
        "takes640": arm(0.10, 0.31, 0.0038, 4.8, 4.0, 0.25, 0.17),
        "takes640_ss25": arm(9.9, 0.31, 0.0038, 4.8, 4.0, 0.0, 0.9),  # tagged: ignored
    }
    sp = tmp_path / "scaling.json"
    sp.write_text(json.dumps(scaling))
    cond = {"perclass12": {
        "histogram_match": {"accuracy": 1.0, "n_classes": 7},
        "conditioning_gain_nats": 0.003}}
    cp = tmp_path / "conditioned.json"
    cp.write_text(json.dumps(cond))
    crits = {c.cid: c for c in evaluate_generation(
        scaling_paths=(str(sp),), cond_path=str(cp))}
    assert all(crits[g].passed for g in ("G1", "G2", "G3", "G4", "G5")), crits

    # out-of-band largest arm flips G1 (truth >= floor), G3 (no CE gain),
    # and G4 (static, incoherent overlaps); degraded tokenizer flips G2
    scaling["takes1280"] = arm(0.35, 0.31, 0.02, 4.5, 4.4, 0.05, 0.5)
    sp.write_text(json.dumps(scaling))
    cond["perclass12"]["histogram_match"]["accuracy"] = 0.7
    cp.write_text(json.dumps(cond))
    crits = {c.cid: c for c in evaluate_generation(
        scaling_paths=(str(sp),), cond_path=str(cp))}
    assert not any(crits[g].passed for g in ("G1", "G2", "G3", "G4", "G5"))


def test_latex_student_sourced_cross_align(tmp_path):
    """Cross/Align columns come from the student log family when present
    (teacher logs carry untrained-human-branch noise for those keys)."""
    _fake_logs(str(tmp_path), "simple_ema", seeds=(42,))
    stud = {"val_cross_recon": [0.007] * 6, "val_align": [0.003] * 6}
    with open(os.path.join(tmp_path, "log_simple_ema_student_seed_42.json"), "w") as f:
        json.dump(stud, f)
    table = generate_latex(str(tmp_path))
    row = next(l for l in table.splitlines() if "Baseline(Simple)" in l)
    assert "0.0070" in row and "0.0030" in row      # student-sourced
    assert "0.0500" not in row                       # teacher val_cross tail mean
    # teacher-sourced columns unchanged
    expected = np.mean([0.5 / k for k in range(8, 13)])
    assert f"{expected:.4f}" in row
