"""Real-data readiness (round-2 VERDICT item 9): schema+checksum manifest and
the fixture->pipeline artifact contract."""

import json
import os

import numpy as np
import pytest

from bridgerl_tpu.data import (
    ARTIFACTS,
    process_paired_data,
    synthetic_npz_tree,
    verify_tree,
)
from bridgerl_tpu.data.manifest import MANIFEST_NAME, candidate_files


@pytest.fixture()
def raw_tree(tmp_path):
    return synthetic_npz_tree(str(tmp_path / "raw"), n_files=3, T=120)


def test_verify_records_then_enforces_checksums(raw_tree):
    r1 = verify_tree(raw_tree)
    assert r1.ok and r1.checked == 3 and r1.recorded == 3
    assert os.path.exists(os.path.join(raw_tree, MANIFEST_NAME))

    r2 = verify_tree(raw_tree)
    assert r2.ok and r2.recorded == 0  # all known, all matching

    # tamper with one file -> verification fails
    victim = candidate_files(raw_tree)[0]
    data = dict(np.load(victim, allow_pickle=True))
    data["joint_pos"] = data["joint_pos"] + 0.1
    np.savez(victim, **data)
    r3 = verify_tree(raw_tree)
    assert not r3.ok
    assert any("checksum mismatch" in e for e in r3.errors)


def test_verify_rejects_schema_violations(tmp_path):
    root = str(tmp_path / "raw")
    d = os.path.join(root, "train_bad")
    os.makedirs(d)
    np.savez(os.path.join(d, "bad.npz"),
             joint_pos=np.zeros((50, 17), np.float32),          # wrong DoF
             smplx_pose_body=np.zeros((50, 21, 3), np.float32))
    r = verify_tree(root)
    assert not r.ok
    assert any("joint_pos shape" in e for e in r.errors)


def test_verify_rejects_quat_form(tmp_path):
    """21-joint quats are misparsed by the %3-first dispatch (same as the
    reference, process_data.py:16-21) — the manifest gates them out."""
    root = str(tmp_path / "raw")
    d = os.path.join(root, "train_q")
    os.makedirs(d)
    np.savez(os.path.join(d, "q.npz"),
             joint_pos=np.zeros((50, 29), np.float32),
             smplx_pose_body=np.zeros((50, 21, 4), np.float32))
    r = verify_tree(root)
    assert not r.ok


def test_verify_rejects_pickled_entries(tmp_path):
    """Object (pickled) arrays in an untrusted npz are REJECTED without being
    unpickled — verify_tree loads with allow_pickle=False (round-2 ADVICE)."""
    root = str(tmp_path / "raw")
    d = os.path.join(root, "train_evil")
    os.makedirs(d)
    np.savez(os.path.join(d, "evil.npz"),
             joint_pos=np.array([{"pwned": True}], dtype=object),
             smplx_pose_body=np.zeros((50, 21, 3), np.float32))
    r = verify_tree(root)
    assert not r.ok
    assert any("pickle" in e for e in r.errors)


def test_verify_detects_deleted_files(raw_tree):
    """Files recorded in the manifest but gone from the tree are errors —
    a partial re-extraction cannot silently shrink the training set."""
    assert verify_tree(raw_tree).ok
    os.remove(candidate_files(raw_tree)[0])
    r = verify_tree(raw_tree)
    assert not r.ok
    assert any("missing from tree" in e for e in r.errors)


def test_fixture_pipeline_artifact_contract(raw_tree, tmp_path):
    """process_paired_data on the schema fixture emits the exact artifact set
    with contract shapes/dtypes/stat formulas."""
    out = str(tmp_path / "processed")
    arrays = process_paired_data(raw_tree, out, window=10, step=5, verbose=False)
    assert arrays is not None
    for name in ARTIFACTS:
        assert os.path.exists(os.path.join(out, name)), name
    g1 = arrays["g1_train.npy"]
    hu = arrays["human_train.npy"]
    assert g1.shape[1:] == (10, 29) and g1.dtype == np.float32
    assert hu.shape[1:] == (10, 126) and hu.dtype == np.float32
    assert len(g1) == len(hu)
    # stats contract: flattened-frame mean/std with the +1e-6 floor
    np.testing.assert_allclose(
        arrays["std.npy"], g1.reshape(-1, 29).std(axis=0) + 1e-6, rtol=1e-5)
    raw = arrays["g1_train_full_raw.npy"]
    assert raw.dtype == object and all(seq.shape[-1] == 29 for seq in raw)
