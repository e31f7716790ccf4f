"""MotionRetargeter (real replacement for the reference's stub) and the
csv->npz converter CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny trained checkpoint + data dir."""
    import dataclasses
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.train import Trainer

    d = tmp_path_factory.mktemp("retarget")
    data_dir = str(d / "processed")
    arrays = generate_synthetic_dataset(data_dir, n_sequences=3, min_len=30,
                                        max_len=40, window=10, step=4, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    exp = make_experiment("resnet_no_down", "ae", window=10, epochs=1, batch_size=16,
                          hidden_dim=16, num_res_layers=1)
    exp = dataclasses.replace(exp, log_dir=str(d / "results"),
                              checkpoint_dir=str(d / "ckpts"))
    Trainer(exp, verbose=False).train_seed(ds, 42)
    ckpt = os.path.join(exp.checkpoint_dir,
                        "Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt")
    return ckpt, data_dir, arrays


def test_motion_retargeter(trained):
    from bridgerl_tpu.utils.alignment import MotionRetargeter

    ckpt, data_dir, arrays = trained
    rt = MotionRetargeter(ckpt, data_dir=data_dir)
    human = arrays["human_train.npy"][:4]  # (4, 10, 126)
    robot = rt.human_to_robot(human)
    assert robot.shape == (4, 10, 29)
    assert np.isfinite(robot).all()
    # single window convenience
    one = rt.human_to_robot(human[0])
    assert one.shape == (1, 10, 29)
    # FK of retargeted motion -> world link positions
    pos = rt.robot_fk(robot)
    assert pos.shape[:2] == (4, 10) and pos.shape[-1] == 3


def test_load_and_align_data(tmp_path, rng):
    from bridgerl_tpu.utils.alignment import load_and_align_data

    a = rng.normal(size=(10, 29)).astype(np.float32)
    b = rng.normal(size=(14, 126)).astype(np.float32)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", b)
    r, h = load_and_align_data(str(tmp_path / "a.npy"), str(tmp_path / "b.npy"))
    assert len(r) == len(h) == 10


def test_csv_to_npz_cli(tmp_path, rng):
    T = 40
    root_pos = np.zeros((T, 3), np.float32)
    root_pos[:, 2] = 0.74
    quat_xyzw = np.zeros((T, 4), np.float32)
    quat_xyzw[:, 3] = 1.0  # identity, xyzw
    dof = rng.uniform(-0.3, 0.3, size=(T, 29)).astype(np.float32)
    csv = np.concatenate([root_pos, quat_xyzw, dof], axis=1)
    csv_path = str(tmp_path / "motion.csv")
    np.savetxt(csv_path, csv, delimiter=",")
    out_path = str(tmp_path / "motion.npz")

    env = dict(os.environ, BRIDGERL_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "csv_to_npz.py"),
         "--input_file", csv_path, "--input_fps", "20", "--output_fps", "40",
         "--output_file", out_path],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    data = np.load(out_path)
    T_out = data["joint_pos"].shape[0]
    assert data["joint_pos"].shape == (T_out, 29)
    assert data["joint_vel"].shape == (T_out, 29)
    assert data["body_pos_w"].shape[0] == T_out and data["body_pos_w"].shape[2] == 3
    assert data["body_quat_w"].shape[2] == 4
    # identity root: quaternions normalized, pelvis at z=0.74
    np.testing.assert_allclose(np.linalg.norm(data["body_quat_w"][0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(data["body_pos_w"][0, 0, 2], 0.74, atol=1e-5)
    assert int(data["fps"]) == 40
