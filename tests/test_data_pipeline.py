"""Data pipeline tests: windowing, artifact contract, synthetic generator."""

import numpy as np
import pytest

from bridgerl_tpu.data import (
    PairedDataset,
    epoch_batch_indices,
    generate_synthetic_dataset,
    inspect_npz,
    load_artifacts,
    process_paired_data,
    slice_windows,
    split_indices,
    synthetic_npz_tree,
    train_val_split,
)

import jax
import jax.numpy as jnp


def test_slice_windows_matches_reference_loop(rng):
    """slice_windows must equal the reference's Python slice loop
    (process_data.py:31-38)."""
    motion = rng.normal(size=(57, 29)).astype(np.float32)
    for window, stride in [(10, 1), (10, 3), (64, 20), (57, 1)]:
        ref = [motion[i:i + window] for i in range(0, max(motion.shape[0] - window + 1, 0), stride)]
        ours = slice_windows(motion, window, stride)
        assert ours.shape[0] == len(ref)
        if ref:
            np.testing.assert_array_equal(ours, np.stack(ref))


def test_slice_windows_too_short(rng):
    out = slice_windows(rng.normal(size=(5, 29)), 10, 1)
    assert out.shape == (0, 10, 29)


def test_pipeline_end_to_end(tmp_path):
    raw = synthetic_npz_tree(str(tmp_path / "raw"), n_files=3, T=80, seed=1)
    out = str(tmp_path / "processed")
    arrays = process_paired_data(raw, out, window=10, step=2, verbose=False)
    assert arrays is not None
    loaded = load_artifacts(out)
    r, h = loaded["g1_train.npy"], loaded["human_train.npy"]
    assert r.shape[1:] == (10, 29)
    assert h.shape[1:] == (10, 126)
    assert r.shape[0] == h.shape[0] > 0
    assert loaded["mean.npy"].shape == (29,)
    assert loaded["human_std.npy"].shape == (126,)
    assert (loaded["std.npy"] > 0).all()
    raws = loaded["g1_train_full_raw.npy"]
    assert len(raws) == 3 and raws[0].shape[1] == 29
    # cache short-circuit (process_data.py:46-53)
    assert process_paired_data(raw, out, window=10, step=2, verbose=False) is None


def test_inspect_npz(tmp_path):
    raw = synthetic_npz_tree(str(tmp_path / "raw"), n_files=1, T=30)
    import glob, os
    f = glob.glob(os.path.join(raw, "**", "*.npz"), recursive=True)[0]
    info = inspect_npz(f)
    assert info["joint_pos"][0] == (30, 29)
    assert info["smplx_pose_body"][0] == (30, 21, 3)


def test_synthetic_dataset_artifacts(tmp_path):
    arrays = generate_synthetic_dataset(str(tmp_path), n_sequences=4, min_len=40,
                                        max_len=60, window=10, step=5, seed=0)
    assert arrays["g1_train.npy"].shape[1:] == (10, 29)
    assert arrays["human_train.npy"].shape[1:] == (10, 126)


def test_split_deterministic():
    tr1, va1 = split_indices(100, 0.1, seed=42)
    tr2, va2 = split_indices(100, 0.1, seed=42)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(tr1) == 90 and len(va1) == 10
    assert set(tr1) | set(va1) == set(range(100))
    tr3, _ = split_indices(100, 0.1, seed=7)
    assert not np.array_equal(tr1, tr3)


def test_train_val_split_and_batching(rng):
    ds = PairedDataset.from_numpy(
        rng.normal(size=(50, 10, 29)).astype(np.float32),
        rng.normal(size=(53, 10, 126)).astype(np.float32),  # truncate-to-min
    )
    assert len(ds) == 50
    tr, va = train_val_split(ds, 0.1, seed=0)
    assert len(tr) == 45 and len(va) == 5
    idx = epoch_batch_indices(jax.random.key(0), len(tr), 8)
    assert idx.shape == (5, 8)
    flat = np.asarray(idx).ravel()
    assert len(set(flat.tolist())) == len(flat)  # no duplicates within epoch
