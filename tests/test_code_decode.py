"""Code-decode tests: discrete motion tokens are a complete representation.

`ops/code_decode.decode_codes` must rebuild the exact quantized latent the
forward pass produced from the sown index streams, for every quantizer with
an invertible index space — so decoder(decode(codes)) == the forward's
reconstruction. The reference discards indices after the lookup
(models/vqvae.py:38-40); this inverse is what makes the token streams
actionable (storage, transmission, generation).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.ops import (
    code_vocab_sizes,
    decode_codes,
    denormalize_codes,
    fsq_codes_to_values,
    fsq_index_range,
    normalize_codes,
)


def _forward_with_codes(model, variables, x_robot):
    out, mods = model.apply(variables, x_robot=x_robot, train=False,
                            mutable=["intermediates"])
    flat = traverse_util.flatten_dict(mods["intermediates"])
    codes = {"/".join(k[:-1]): v[0] for k, v in flat.items() if k[-1] == "codes"}
    return out["robot"]["recon"], codes


@pytest.mark.parametrize("method", ["standard", "ema", "rvq", "fsq", "lfq",
                                    "hybrid"])
def test_decode_reproduces_forward_recon(method):
    """decoder(decode_codes(codes)) == the forward's reconstruction."""
    exp = make_experiment("resnet_no_down", method, window=10, hidden_dim=16,
                          num_res_layers=1, codebook_size=32, n_layers=2)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 10, 29), jnp.float32)
    recon, codes = _forward_with_codes(model, variables, x)

    assert set(codes) == set(code_vocab_sizes(exp.model))
    z_q = decode_codes(exp.model, variables, codes)
    recon2 = model.apply(variables, z_q, method="decode_latent")
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2),
                               rtol=1e-5, atol=1e-6)


def test_codes_within_vocab_after_normalize():
    """normalize_codes maps every stream into [0, vocab) (prior surface)."""
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = 3.0 * jax.random.normal(jax.random.key(2), (8, 10, 29), jnp.float32)
    _, codes = _forward_with_codes(model, variables, x)
    sizes = code_vocab_sizes(exp.model)
    norm = normalize_codes(exp.model, codes)
    for name, v in norm.items():
        v = np.asarray(v)
        assert v.min() >= 0 and v.max() < sizes[name], name
    # and denormalize is the exact inverse
    back = denormalize_codes(exp.model, norm)
    for name in codes:
        np.testing.assert_array_equal(np.asarray(back[name]),
                                      np.asarray(codes[name]))


def test_fsq_digit_roundtrip():
    """index = sum(digit * basis) inverts exactly over the bounded range."""
    levels = (8, 5, 5, 5)
    rng = np.random.default_rng(0)
    lows = np.asarray([-(l // 2) for l in levels])
    digits = np.stack([rng.integers(lo, lo + l, size=64)
                       for lo, l in zip(lows, levels)], axis=-1)
    basis = np.asarray([math.prod(levels[:i]) for i in range(len(levels))])
    idx = (digits * basis).sum(-1).astype(np.int32)
    lo, n = fsq_index_range(levels)
    assert ((idx >= lo) & (idx < lo + n)).all()
    rec = np.asarray(fsq_codes_to_values(jnp.asarray(idx), levels))
    np.testing.assert_array_equal(rec, digits.astype(np.float32))


def test_unbounded_fsq_decode_rejected():
    """The reference's unbounded FSQ index is a hash, not a code: decode
    must refuse rather than return wrong motion."""
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1, fsq_bounded=False)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 10, 29), jnp.float32)
    _, codes = _forward_with_codes(model, variables, x)
    with pytest.raises(ValueError, match="fsq_bounded"):
        decode_codes(exp.model, variables, codes)


def test_ae_has_no_codes():
    with pytest.raises(ValueError, match="ae"):
        code_vocab_sizes(make_experiment("resnet_no_down", "ae",
                                         window=10).model)


def test_decode_jittable():
    """The decode path is a pure jittable function of (variables, codes)."""
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(3), (2, 10, 29), jnp.float32)
    _, codes = _forward_with_codes(model, variables, x)

    @jax.jit
    def f(codes):
        return model.apply(variables, decode_codes(exp.model, variables, codes),
                           method="decode_latent")

    np.testing.assert_allclose(
        np.asarray(f(codes)),
        np.asarray(model.apply(
            variables, decode_codes(exp.model, variables, codes),
            method="decode_latent")),
        rtol=1e-6, atol=1e-7)
