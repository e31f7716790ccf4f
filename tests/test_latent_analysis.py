"""t-SNE latent-space analysis: action-keyword loading, encoder extraction,
plot generation (reference analyze_latent_space.py)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory, rng):
    """Raw npz tree with action keywords + trained ckpt + stats."""
    import dataclasses
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.data.synthetic import synth_pair, HUMAN_JOINTS
    from bridgerl_tpu.train import Trainer

    d = tmp_path_factory.mktemp("latent")
    data_dir = str(d / "processed")
    arrays = generate_synthetic_dataset(data_dir, n_sequences=3, min_len=40,
                                        max_len=50, window=10, step=4, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    exp = make_experiment("resnet_no_down", "ae", window=10, epochs=1, batch_size=16,
                          hidden_dim=16, num_res_layers=1)
    exp = dataclasses.replace(exp, log_dir=str(d / "results"),
                              checkpoint_dir=str(d / "ckpts"))
    Trainer(exp, verbose=False).train_seed(ds, 42)
    ckpt = os.path.join(exp.checkpoint_dir,
                        "Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt")

    raw_dir = str(d / "raw")
    os.makedirs(raw_dir, exist_ok=True)
    g = np.random.default_rng(1)
    for action in ("walk", "run"):
        for i in range(2):
            robot, human_aa = synth_pair(g, 60)
            np.savez(os.path.join(raw_dir, f"{action}_motion_{i}.npz"),
                     joint_pos=robot,
                     smplx_pose_body=human_aa.reshape(60, HUMAN_JOINTS, 3))
    # one file with no keyword (must be ignored)
    robot, human_aa = synth_pair(g, 60)
    np.savez(os.path.join(raw_dir, "idle_x.npz"), joint_pos=robot,
             smplx_pose_body=human_aa.reshape(60, HUMAN_JOINTS, 3))
    return ckpt, data_dir, raw_dir, str(d / "plots")


def test_load_paired_data_by_action(setup):
    from bridgerl_tpu.eval import load_paired_data_by_action

    _, data_dir, raw_dir, _ = setup
    stats = {
        "mean": np.load(os.path.join(data_dir, "mean.npy")),
        "std": np.load(os.path.join(data_dir, "std.npy")),
        "human_mean": np.load(os.path.join(data_dir, "human_mean.npy")),
        "human_std": np.load(os.path.join(data_dir, "human_std.npy")),
    }
    by_action = load_paired_data_by_action(raw_dir, window=10, stats=stats,
                                           max_per_action=30)
    assert set(by_action) == {"walk", "run"}  # idle ignored
    r, h = by_action["walk"]
    assert r.shape[1:] == (10, 29) and h.shape[1:] == (10, 126)
    assert len(r) <= 30


def test_analyze_checkpoint_writes_plots(setup):
    from bridgerl_tpu.eval import analyze_checkpoint

    ckpt, data_dir, raw_dir, out_dir = setup
    written = analyze_checkpoint(ckpt, raw_dir, data_dir, out_dir,
                                 max_per_action=20, tsne_perplexity=5.0)
    assert len(written) == 2
    assert any("domain" in w for w in written)
    assert any("actions" in w for w in written)
    for w in written:
        assert os.path.getsize(w) > 0
