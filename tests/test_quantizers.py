"""Unit tests for the quantizer zoo (SURVEY.md §4 test strategy):
STE gradient flow, EMA convergence, FSQ index math, LFQ entropy sign,
RVQ residual stacking, metric formulas, and shared-state threading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgerl_tpu.ops import (
    FSQ,
    LFQ,
    HybridVQ,
    IdentityVQ,
    ResidualVQ,
    VectorQuantizer,
    nearest_codes_xla,
    unique_count,
)

B, T, D = 8, 10, 16
KEY = jax.random.key(0)


def _z(key=KEY, b=B, t=T, d=D):
    return jax.random.normal(key, (b, t, d), jnp.float32)


# ---------- nearest_codes backend ----------

def test_nearest_codes_matches_bruteforce():
    z = jax.random.normal(jax.random.key(1), (64, D))
    cb = jax.random.normal(jax.random.key(2), (32, D))
    idx, counts, dw = nearest_codes_xla(z, cb)
    full = jnp.sum((z[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(jnp.argmin(full, axis=1)))
    # counts = histogram of assignments; dw = per-code sums
    ref_counts = np.bincount(np.asarray(idx), minlength=32).astype(np.float32)
    np.testing.assert_allclose(np.asarray(counts), ref_counts, atol=1e-6)
    ref_dw = np.zeros((32, D), np.float32)
    np.add.at(ref_dw, np.asarray(idx), np.asarray(z))
    np.testing.assert_allclose(np.asarray(dw), ref_dw, atol=1e-4)


def test_unique_count():
    x = jnp.asarray([3, 1, 3, 7, 1, 1])
    assert float(unique_count(x)) == 3.0


# ---------- standard VQ ----------

def test_standard_vq_shapes_and_ste():
    q = VectorQuantizer(num_embeddings=32, embedding_dim=D, use_ema=False)
    z = _z()
    vs = q.init({"params": KEY}, z)

    def f(z):
        loss, out, m = q.apply(vs, z)
        return jnp.sum(out), (loss, m)

    (s, (loss, m)), g = jax.value_and_grad(f, has_aux=True)(z)
    # STE: d(sum(out))/dz == 1 everywhere (quantized passes gradient straight through)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)
    assert float(loss) > 0.0
    assert 1.0 <= float(m["perplexity"]) <= 32.0
    assert 0.0 <= float(m["dcr"]) <= 1.0


def test_standard_vq_codebook_gets_gradient():
    q = VectorQuantizer(num_embeddings=32, embedding_dim=D, use_ema=False)
    z = _z()
    vs = q.init({"params": KEY}, z)

    def loss_fn(params):
        loss, out, _ = q.apply({"params": params}, z)
        return loss

    g = jax.grad(loss_fn)(vs["params"])
    assert float(jnp.sum(jnp.abs(g["embedding"]))) > 0.0


def test_vq_perfect_codebook_zero_loss():
    """If z rows ARE codebook rows, quantization is exact and loss ~ 0."""
    cb = jax.random.normal(jax.random.key(3), (32, D))
    z = cb[:16].reshape(4, 4, D)
    q = VectorQuantizer(num_embeddings=32, embedding_dim=D, use_ema=False)
    vs = q.init({"params": KEY}, z)
    vs = {"params": {"embedding": cb}}
    loss, out, _ = q.apply(vs, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=1e-5)
    assert float(loss) < 1e-10


# ---------- EMA VQ ----------

def test_ema_vq_state_updates_only_when_training():
    q = VectorQuantizer(num_embeddings=16, embedding_dim=D, use_ema=True)
    z = _z()
    vs = q.init({"params": KEY}, z)
    assert "qstats" in vs and "params" not in vs  # EMA codebook is not a param
    # eval: no mutation requested, state unchanged
    loss, out, m = q.apply(vs, z, train=False)
    # train: qstats mutates
    (loss2, out2, m2), mutated = q.apply(vs, z, train=True, mutable=["qstats"])
    old = vs["qstats"]["ema_cluster_size"]
    new = mutated["qstats"]["ema_cluster_size"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_ema_vq_converges_to_cluster_means():
    """Feeding the same two clusters repeatedly, EMA codebook entries approach
    the cluster means (the reference's decay-0.99 Laplace-smoothed update)."""
    k = 4
    q = VectorQuantizer(num_embeddings=k, embedding_dim=2, use_ema=True, decay=0.5)
    c0, c1 = jnp.asarray([5.0, 5.0]), jnp.asarray([-5.0, -5.0])
    data = jnp.concatenate([
        c0 + 0.01 * jax.random.normal(jax.random.key(1), (64, 2)),
        c1 + 0.01 * jax.random.normal(jax.random.key(2), (64, 2)),
    ]).reshape(1, 128, 2)
    vs = q.init({"params": KEY}, data)
    state = vs
    for _ in range(50):
        (_, _, _), mut = q.apply(state, data, train=True, mutable=["qstats"])
        state = {"qstats": mut["qstats"]}
    emb = np.asarray(state["qstats"]["embedding"])
    d0 = np.abs(emb - np.asarray(c0)).sum(-1).min()
    d1 = np.abs(emb - np.asarray(c1)).sum(-1).min()
    assert d0 < 0.2 and d1 < 0.2


def test_ema_commitment_only_loss():
    """EMA branch must not produce gradients pulling the codebook (loss is
    commitment-only, vqvae.py:55-57) — there are no codebook params at all."""
    q = VectorQuantizer(num_embeddings=16, embedding_dim=D, use_ema=True)
    z = _z()
    vs = q.init({"params": KEY}, z)
    loss, _, _ = q.apply(vs, z, train=False)
    assert float(loss) > 0.0


# ---------- RVQ ----------

def test_rvq_residual_reduces_error():
    z = _z()
    errs = []
    for n in [1, 4]:
        q = ResidualVQ(num_quantizers=n, num_embeddings=64, embedding_dim=D, use_ema=False)
        vs = q.init({"params": KEY}, z)
        _, out, _ = q.apply(vs, z)
        errs.append(float(jnp.mean((out - z) ** 2)))
    assert errs[1] < errs[0]  # more residual layers => better fit


def test_rvq_metrics_averaged():
    q = ResidualVQ(num_quantizers=3, num_embeddings=16, embedding_dim=D, use_ema=False)
    z = _z()
    vs = q.init({"params": KEY}, z)
    _, _, m = q.apply(vs, z)
    assert 0.0 <= float(m["dcr"]) <= 1.0


# ---------- FSQ ----------

def test_fsq_round_ste_and_zero_loss():
    q = FSQ(levels=(8, 5, 5, 5), input_dim=D)
    z = _z()
    vs = q.init({"params": KEY}, z)
    loss, out, m = q.apply(vs, z)
    assert float(loss) == 0.0
    assert out.shape == z.shape
    assert float(m["perplexity"]) >= 1.0

    def f(z):
        _, out, _ = q.apply(vs, z)
        return jnp.sum(out)

    g = jax.grad(f)(z)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_fsq_index_basis():
    """Index = sum(z_i * basis_i) with basis [1, L0, L0*L1, ...] (vqvae.py:122).
    For z_hard in range, the map grid->index is a bijection."""
    import itertools
    levels = (3, 2, 2)
    basis = np.array([1, 3, 6])
    codes = np.array(list(itertools.product(range(3), range(2), range(2))))
    idx = (codes * basis[None]).sum(-1)
    assert len(set(idx.tolist())) == 12 and idx.max() == 11


def test_fsq_bounded_stays_within_nominal_grid():
    """bounded=True (opt-in, Mentzer-style tanh squash): every quantized level
    takes one of exactly L integer values even for huge pre-round projections,
    so unique/nominal <= 1.0 by construction (round-2 VERDICT item 2)."""
    levels = (8, 5, 5, 5)
    q = FSQ(levels=levels, input_dim=D, bounded=True)
    z = _z() * 50.0  # force extreme projections
    vs = q.init({"params": KEY}, z)
    loss, out, m = q.apply(vs, z)
    assert float(loss) == 0.0 and out.shape == z.shape

    # recover the rounded values by re-applying project_in + bound
    import numpy as _np
    kin = _np.asarray(vs["params"]["project_in"]["kernel"])
    bin_ = _np.asarray(vs["params"]["project_in"]["bias"])
    zp = _np.asarray(z).reshape(-1, D) @ kin + bin_
    lv = _np.asarray(levels, _np.float32)
    half = (lv - 1.0) * (1.0 - 1e-3) / 2.0  # official-FSQ bound (see FSQ)
    offset = _np.where(lv % 2 == 0, 0.5, 0.0)
    shift = _np.tan(offset / half)
    zb = _np.round(_np.tanh(zp + shift) * half - offset)
    for d, L in enumerate(levels):
        vals = _np.unique(zb[:, d])
        assert len(vals) <= L, (d, vals)
        lo = -(L // 2)
        assert vals.min() >= lo and vals.max() <= lo + L - 1, (d, vals)
    # nominal capacity is never exceeded
    assert float(m["perplexity"]) <= float(_np.prod(levels))
    assert float(m["dcr"]) >= 0.0

    # gradients still flow through the tanh+round STE
    def f(z):
        _, out, _ = q.apply(vs, z)
        return jnp.sum(out)

    g = jax.grad(f)(_z())
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_fsq_bounded_binary_levels_stay_alive():
    """Regression: L=2 levels made the old arctanh(1)=inf shift collapse the
    dimension to ONE constant code with zero gradient; the official-FSQ
    tan/(1-eps) bound keeps binary FSQ finite, 2-valued, and trainable."""
    levels = (2, 2, 2, 2)
    q = FSQ(levels=levels, input_dim=D, bounded=True)
    z = _z()
    vs = q.init({"params": KEY}, z)
    _, out, m = q.apply(vs, z)
    assert np.isfinite(np.asarray(out)).all()
    assert float(m["perplexity"]) >= 2.0  # more than one reachable code

    # gradient must flow through every binary dimension (tanh not saturated)
    def f(zz):
        return q.apply(vs, zz)[1].sum()

    g = np.asarray(jax.grad(f)(z))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-6


# ---------- LFQ ----------

def test_lfq_sign_quantization_and_entropy_loss_sign():
    q = LFQ(input_dim=D, codebook_dim=10)
    z = _z()
    vs = q.init({"params": KEY}, z)
    loss, out, m = q.apply(vs, z)
    # entropy in [0, log 2] per bit; loss = -mean(H)*0.1 must be <= 0
    assert float(loss) <= 0.0
    assert float(loss) >= -np.log(2.0) * 0.1 - 1e-6
    assert 1.0 <= float(m["perplexity"]) <= 1024.0


def test_lfq_norm_keeps_presign_responsive():
    """norm=True (opt-in): LayerNorm on the pre-sign projection keeps the
    entropy term alive even when the encoder output scale explodes — the
    measured round-2 failure had |z_e| ~ O(1000), sigmoid saturated, entropy
    loss = -0.000 (scripts/diag_lfq.py)."""
    q_ref = LFQ(input_dim=D, codebook_dim=10)
    q_norm = LFQ(input_dim=D, codebook_dim=10, norm=True)
    z = _z() * 1000.0  # simulate the runaway scale
    vs_ref = q_ref.init({"params": KEY}, z)
    vs_norm = q_norm.init({"params": KEY}, z)
    loss_ref, _, _ = q_ref.apply(vs_ref, z)
    loss_norm, _, _ = q_norm.apply(vs_norm, z)
    # saturated reference formulation: entropy ~ 0 -> loss ~ -0.0
    assert abs(float(loss_ref)) < 1e-3
    # normalized: entropy stays near the ln(2) ceiling -> loss strongly negative
    assert float(loss_norm) < -0.03
    # and the entropy gradient into z is alive only in the normed variant
    def presign_entropy(q, vs, z):
        loss, _, _ = q.apply(vs, z)
        return loss
    g_norm = jax.grad(lambda z: presign_entropy(q_norm, vs_norm, z))(z)
    assert float(jnp.abs(g_norm).sum()) > 0


# ---------- Hybrid ----------

def test_hybrid_composition():
    q = HybridVQ(hidden_dim=D, fsq_levels=(8, 5, 5, 5), vq_codebook_size=32)
    z = _z()
    vs = q.init({"params": KEY}, z)
    (loss, out, m), mut = q.apply(vs, z, train=True, mutable=["qstats"])
    assert out.shape == z.shape
    assert "rvq_ppl" in m
    assert "qstats" in mut  # RVQ EMA state threaded
    # hybrid should reconstruct better than FSQ alone (RVQ refines residual)
    fsq = FSQ(levels=(8, 5, 5, 5), input_dim=D)
    fvs = fsq.init({"params": KEY}, z)
    _, fout, _ = fsq.apply(fvs, z)
    # (on random init this may not hold strictly; check it's at least finite/comparable)
    assert np.isfinite(float(jnp.mean((out - z) ** 2)))


# ---------- Identity ----------

def test_identity_passthrough():
    q = IdentityVQ()
    z = _z()
    vs = q.init({"params": KEY}, z)
    loss, out, m = q.apply(vs, z)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(z))
    assert float(loss) == 0.0 and float(m["perplexity"]) == 1.0 and float(m["dcr"]) == 0.0
