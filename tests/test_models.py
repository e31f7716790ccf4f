"""Shape/dtype/behavior tests for encoders, decoders and DualMotionVQVAE
across the arch x window grid (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.config import ModelConfig
from bridgerl_tpu.models import (
    ConvDecoder,
    ConvEncoder,
    DualMotionVQVAE,
    NoDownsampleDecoder,
    NoDownsampleEncoder,
    TransformerMotionDecoder,
    TransformerMotionEncoder,
    init_model,
)

KEY = jax.random.key(0)


def conv_out_len(t):
    """torch Conv1d(k=4, s=2, p=1): floor((T-2)/2)+1, applied twice."""
    f = lambda x: (x - 2) // 2 + 1
    return f(f(t))


@pytest.mark.parametrize("arch", ["simple", "resnet"])
@pytest.mark.parametrize("T", [64, 16])
def test_conv_encoder_decoder_shapes(arch, T):
    enc = ConvEncoder(hidden_dim=32, arch=arch)
    x = jnp.zeros((2, T, 29))
    vs = enc.init({"params": KEY}, x)
    z = enc.apply(vs, x, mutable=["batch_stats"])[0] if arch == "resnet" else enc.apply(vs, x)
    assert z.shape == (2, conv_out_len(T), 32)

    dec = ConvDecoder(output_dim=29, hidden_dim=32, arch=arch)
    dvs = dec.init({"params": KEY}, z)
    y = dec.apply(dvs, z, mutable=["batch_stats"])[0] if arch == "resnet" else dec.apply(dvs, z)
    assert y.shape == (2, 4 * conv_out_len(T), 29)
    if T % 4 == 0:
        assert y.shape[1] == T  # exact round-trip for divisible windows


def test_no_downsample_full_resolution():
    enc = NoDownsampleEncoder(hidden_dim=64)
    x = jnp.zeros((2, 10, 29))
    vs = enc.init({"params": KEY}, x)
    z, _ = enc.apply(vs, x, mutable=["batch_stats"])
    assert z.shape == (2, 10, 64)
    dec = NoDownsampleDecoder(output_dim=29, hidden_dim=64)
    dvs = dec.init({"params": KEY}, z)
    y, _ = dec.apply(dvs, z, mutable=["batch_stats"])
    assert y.shape == (2, 10, 29)


def test_transformer_single_token_bottleneck():
    enc = TransformerMotionEncoder(hidden_dim=64, d_model=64, n_heads=4, num_layers=2, ff_dim=128)
    x = jax.random.normal(KEY, (3, 10, 29))
    vs = enc.init({"params": KEY}, x)
    z = enc.apply(vs, x)
    assert z.shape == (3, 1, 64)  # whole window -> ONE latent token

    dec = TransformerMotionDecoder(output_dim=29, hidden_dim=64, seq_len=10,
                                   d_model=64, n_heads=4, num_layers=2, ff_dim=128)
    dvs = dec.init({"params": KEY}, z)
    y = dec.apply(dvs, z)
    assert y.shape == (3, 10, 29)


@pytest.mark.parametrize("arch,method,window", [
    ("resnet_no_down", "ae", 10),
    ("transformer", "hybrid", 10),
    ("simple", "ema", 64),
    ("resnet", "rvq", 64),
    ("resnet", "fsq", 64),
    ("resnet", "lfq", 64),
    ("resnet", "standard", 64),
])
def test_dual_model_forward(arch, method, window):
    cfg = ModelConfig(arch=arch, method=method, window_size=window, hidden_dim=32,
                      codebook_size=64, d_model=32, ff_dim=64, n_tf_layers=2,
                      num_res_layers=2)
    model, vs = init_model(cfg, KEY)
    x_r = jax.random.normal(jax.random.key(1), (4, window, 29))
    x_h = jax.random.normal(jax.random.key(2), (4, window, 126))
    out, _ = model.apply(vs, x_robot=x_r, x_human=x_h, train=True,
                         mutable=["batch_stats", "qstats"],
                         rngs={"dropout": jax.random.key(3)})
    assert out["robot"]["recon"].shape == x_r.shape
    assert out["human"]["retargeted"].shape == x_r.shape  # cross-decode -> ROBOT dims
    assert out["robot"]["z_e"].shape == out["human"]["z_e"].shape
    for k in ("perplexity", "dcr"):
        assert np.isfinite(float(out["robot"]["metrics"][k]))


def test_dual_model_single_branch():
    cfg = ModelConfig(arch="resnet_no_down", method="ae", window_size=10,
                      hidden_dim=32, num_res_layers=2)
    model, vs = init_model(cfg, KEY)
    x_r = jax.random.normal(KEY, (2, 10, 29))
    out = model.apply(vs, x_robot=x_r, train=False)
    assert "robot" in out and "human" not in out


def test_shared_quantizer_between_branches():
    """Both branches must use the SAME codebook (shared quantizer params)."""
    cfg = ModelConfig(arch="resnet_no_down", method="standard", window_size=10,
                      hidden_dim=16, codebook_size=32, num_res_layers=1)
    model, vs = init_model(cfg, KEY)
    # exactly one quantizer param subtree
    assert "quantizer" in vs["params"]
    flat = jax.tree_util.tree_leaves(vs["params"]["quantizer"])
    assert len(flat) == 1  # single (K, D) embedding table


def test_deterministic_eval():
    cfg = ModelConfig(arch="transformer", method="fsq", window_size=10,
                      hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=1)
    model, vs = init_model(cfg, KEY)
    x_r = jax.random.normal(KEY, (2, 10, 29))
    o1 = model.apply(vs, x_robot=x_r, train=False)
    o2 = model.apply(vs, x_robot=x_r, train=False)
    np.testing.assert_array_equal(np.asarray(o1["robot"]["recon"]),
                                  np.asarray(o2["robot"]["recon"]))


# ---------- cheap (uint8-bit) dropout ----------

def test_cheap_dropout_semantics():
    """uint8-mask dropout: identity in eval; in train the drop fraction and
    rescale match the QUANTIZED rate (26/256 for 0.1) so E[out] = x."""
    from bridgerl_tpu.models.layers import CheapDropout

    x = jnp.ones((64, 64, 64))
    d_eval = CheapDropout(0.1, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(d_eval.apply({}, x)), np.asarray(x))

    d = CheapDropout(0.1, deterministic=False)
    out = np.asarray(d.apply({}, x, rngs={"dropout": jax.random.key(3)}))
    q = 26 / 256
    dropped = (out == 0).mean()
    assert abs(dropped - q) < 0.01
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - q), rtol=1e-5)
    np.testing.assert_allclose(out.mean(), 1.0, rtol=0.02)  # expectation kept


def test_cheap_attn_fn_matches_stock_when_deterministic():
    """cheap_attn_dropout_fn must reproduce stock dot-product attention
    exactly when dropout is off (same scaling/mask/softmax math)."""
    from bridgerl_tpu.models.layers import cheap_attn_dropout_fn

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (2, 10, 4, 16))
    k = jax.random.normal(k2, (2, 10, 4, 16))
    v = jax.random.normal(k3, (2, 10, 4, 16))
    mask = jnp.tril(jnp.ones((10, 10), bool))[None, None]
    import flax.linen as nn
    ref = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
    got = cheap_attn_dropout_fn(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_cheap_dropout_extreme_rate_no_overflow():
    """Regression: rate >= 255.5/256 rounded the uint8 threshold to 256,
    raising OverflowError at trace time; the threshold clamps to 255."""
    from bridgerl_tpu.models.layers import CheapDropout

    x = jnp.ones((8, 8))
    d = CheapDropout(1.0, deterministic=False)
    out = np.asarray(d.apply({}, x, rngs={"dropout": jax.random.key(0)}))
    assert np.isfinite(out).all()  # no crash; ~255/256 dropped


def test_cheap_dropout_model_trains():
    """Flagship-shaped model with cheap_dropout=True runs a train-mode forward
    with dropout rngs and matches the stock model exactly in EVAL mode (the
    flag changes only mask generation, not the param tree or eval math)."""
    cfg = ModelConfig(arch="transformer", method="hybrid", window_size=10,
                      hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=1,
                      cheap_dropout=True)
    cfg_ref = ModelConfig(arch="transformer", method="hybrid", window_size=10,
                          hidden_dim=16, d_model=32, ff_dim=64, n_tf_layers=1)
    model, vs = init_model(cfg, KEY)
    model_ref, vs_ref = init_model(cfg_ref, KEY)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs_ref)
    x_r = jax.random.normal(KEY, (8, 10, 29))
    out, _ = model.apply(vs, x_robot=x_r, train=True, mutable=["qstats"],
                         rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out["robot"]["recon"])).all()
    e1 = model.apply(vs, x_robot=x_r, train=False)
    e2 = model_ref.apply(vs, x_robot=x_r, train=False)
    np.testing.assert_allclose(np.asarray(e1["robot"]["recon"]),
                               np.asarray(e2["robot"]["recon"]), atol=2e-5)
