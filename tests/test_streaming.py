"""Streaming overlap-add retargeter: equivalence with the offline path.

The offline reconstruction (export/reconstruct.py, reference
export_motion.py:25-83) is the ground truth; streaming must emit the same
frames, as early as mathematically final (latency = window + 1 frames).
"""

import numpy as np
import pytest

from bridgerl_tpu.export import reconstruct_long_sequence, window_starts
from bridgerl_tpu.export.streaming import StreamingRetargeter


def _norm_fn(x):
    """Deterministic nonlinear 'model' on normalized windows (jnp: the
    offline path jits it, the streaming path feeds numpy)."""
    import jax.numpy as jnp
    return jnp.tanh(x) * 0.9 + 0.05 * x ** 2


@pytest.mark.parametrize("T,W,S", [
    (57, 10, 4), (100, 64, 32), (23, 10, 4), (20, 10, 10),
    (30, 10, 3), (11, 10, 5), (12, 10, 7), (30, 5, 8),  # last: S > W gaps
])
def test_stream_matches_offline(T, W, S):
    rng = np.random.default_rng(T * 100 + S)
    D = 6
    seq = rng.normal(size=(T, D)).astype(np.float32)
    mean = seq.mean(0)
    std = seq.std(0) + 1e-6

    offline = reconstruct_long_sequence(_norm_fn, seq, W, S, mean, std)
    assert offline is not None

    def raw_fn(x):  # raw-in/raw-out, same normalization as offline
        return _norm_fn((x - mean) / std) * std + mean

    sr = StreamingRetargeter(raw_fn, window=W, step=S, in_dim=D)
    emitted = [sr.push(f) for f in seq]
    emitted.append(sr.flush())
    streamed = np.concatenate([e for e in emitted if e.size], axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-5, atol=1e-5)


def test_stream_emission_is_as_early_as_final():
    """Cumulative emitted frames after n pushes must be max(n - W, 0) — one
    frame per push once past the W+1 latency, nothing held back longer."""
    W, S, D = 10, 4, 3
    sr = StreamingRetargeter(lambda x: x, window=W, step=S, in_dim=D)
    total = 0
    for n in range(1, 40):
        total += sr.push(np.zeros(D, np.float32)).shape[0]
        assert total == max(n - W, 0), n
    assert sr.latency_frames == W + 1


def test_short_stream_flush_empty():
    """T <= window: offline returns None (caller falls back); streaming emits
    nothing."""
    sr = StreamingRetargeter(lambda x: x, window=10, step=5, in_dim=4)
    outs = [sr.push(np.zeros(4, np.float32)) for _ in range(10)]
    assert all(o.shape[0] == 0 for o in outs)
    assert sr.flush().shape[0] == 0


def test_cross_dim_retargeting_stream():
    """in_dim != out_dim (human 126 -> robot 29 shape): matches a manual
    offline overlap-add over window_starts."""
    T, W, S, DI, DO = 41, 10, 5, 12, 5
    rng = np.random.default_rng(7)
    seq = rng.normal(size=(T, DI)).astype(np.float32)
    M = rng.normal(size=(DI, DO)).astype(np.float32)

    def fn(x):  # (k, W, DI) -> (k, W, DO)
        return np.tanh(x @ M)

    buf = np.zeros((T, DO), np.float32)
    cnt = np.zeros((T, 1), np.float32)
    for s in window_starts(T, W, S):
        buf[s:s + W] += fn(seq[None, s:s + W])[0]
        cnt[s:s + W] += 1.0
    expected = buf / np.maximum(cnt, 1.0)

    sr = StreamingRetargeter(fn, window=W, step=S, in_dim=DI)
    parts = [sr.push(f) for f in seq] + [sr.flush()]
    streamed = np.concatenate([p for p in parts if p.size], axis=0)
    np.testing.assert_allclose(streamed, expected, rtol=1e-5, atol=1e-5)


def test_explicit_out_dim_matches_inferred():
    """The documented out_dim ctor parameter pre-sizes the accumulators;
    values must equal the inferred-out_dim path (regression: passing out_dim
    used to crash on the first completed window — (W,1) accumulator vs
    (W,out_dim) output)."""
    T, W, S, DI, DO = 31, 8, 4, 6, 3
    rng = np.random.default_rng(3)
    seq = rng.normal(size=(T, DI)).astype(np.float32)
    M = rng.normal(size=(DI, DO)).astype(np.float32)
    fn = lambda x: np.tanh(x @ M)  # noqa: E731

    def run(**kw):
        sr = StreamingRetargeter(fn, window=W, step=S, in_dim=DI, **kw)
        parts = [sr.push(f) for f in seq] + [sr.flush()]
        return np.concatenate([p for p in parts if p.size], axis=0)

    np.testing.assert_array_equal(run(out_dim=DO), run())
    # an out_dim that contradicts the window function is an error, not
    # silent corruption
    sr = StreamingRetargeter(fn, window=W, step=S, in_dim=DI, out_dim=DO + 1)
    with pytest.raises(ValueError, match="out_dim"):
        for f in seq[:W]:
            sr.push(f)


def test_bad_inputs():
    sr = StreamingRetargeter(lambda x: x, window=10, step=5, in_dim=4)
    with pytest.raises(ValueError, match="expected frame shape"):
        sr.push(np.zeros(3, np.float32))
    with pytest.raises(ValueError, match="positive"):
        StreamingRetargeter(lambda x: x, window=10, step=0, in_dim=4)


def test_stream_over_serving_artifact(tmp_path):
    """End to end: a frozen artifact's retarget drives the streaming loop."""
    import dataclasses
    import os

    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
    from bridgerl_tpu.export import export_serving_artifact, load_serving_artifact
    from bridgerl_tpu.train import Trainer

    data_dir = str(tmp_path / "processed")
    arrays = generate_synthetic_dataset(data_dir, n_sequences=3, min_len=30,
                                        max_len=50, window=10, step=2, seed=0)
    ds = PairedDataset.from_numpy(arrays["g1_train.npy"], arrays["human_train.npy"])
    exp = make_experiment("resnet_no_down", "ae", window=10, epochs=1,
                          batch_size=32, hidden_dim=16, num_res_layers=1)
    exp = dataclasses.replace(exp, log_dir=str(tmp_path / "results"),
                              checkpoint_dir=str(tmp_path / "ckpts"))
    Trainer(exp, verbose=False).train_seed(ds, 42)
    ckpt = os.path.join(exp.checkpoint_dir,
                        "Exp_resnet_no_down_W10_ae_teacher_seed_42_best.ckpt")
    art = str(tmp_path / "serving.zip")
    export_serving_artifact(ckpt, art, data_dir=data_dir)
    mod = load_serving_artifact(art)

    feed = np.random.default_rng(1).normal(size=(35, 126)).astype(np.float32)
    sr = StreamingRetargeter(lambda x: np.asarray(mod.retarget(x)),
                             window=10, step=5, in_dim=126)
    parts = [sr.push(f) for f in feed] + [sr.flush()]
    out = np.concatenate([p for p in parts if p.size], axis=0)
    assert out.shape == (35, 29) and np.all(np.isfinite(out))
