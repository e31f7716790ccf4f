"""Golden-value parity vs an independent PyTorch realization of the quantizer
math (SURVEY.md §4: 'golden-value parity tests against small fixed inputs').

The torch side below is written from the VQ-VAE equations (van den Oord 2017;
EMA variant per Sonnet/appendix): squared-L2 nearest-code assignment,
commitment/codebook losses, Laplace-smoothed EMA update, FSQ round-STE —
the same math the reference implements. Inputs and codebooks are fixed; both
frameworks must agree numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bridgerl_tpu.ops import VectorQuantizer, FSQ

B, T, D, K = 4, 6, 16, 32


@pytest.fixture(scope="module")
def data(rng):
    z = rng.normal(size=(B, T, D)).astype(np.float32)
    cb = rng.normal(size=(K, D)).astype(np.float32)
    return z, cb


def torch_vq_forward(z_np, cb_np, commitment=0.25):
    """Plain-torch standard VQ: distances -> argmin -> losses -> STE output."""
    z = torch.tensor(z_np, requires_grad=True)
    cb = torch.tensor(cb_np, requires_grad=True)
    flat = z.reshape(-1, D)
    d = (flat.pow(2).sum(1, keepdim=True) + cb.pow(2).sum(1)
         - 2.0 * flat @ cb.t())
    idx = d.argmin(1)
    zq = cb[idx].reshape(z.shape)
    e_latent = torch.mean((zq.detach() - z) ** 2)
    q_latent = torch.mean((zq - z.detach()) ** 2)
    loss = q_latent + commitment * e_latent
    out = z + (zq - z).detach()
    return loss, out, idx, z, cb


def test_standard_vq_matches_torch(data):
    z_np, cb_np = data
    t_loss, t_out, t_idx, t_z, t_cb = torch_vq_forward(z_np, cb_np)

    q = VectorQuantizer(num_embeddings=K, embedding_dim=D, use_ema=False)
    vs = {"params": {"embedding": jnp.asarray(cb_np)}}
    j_loss, j_out, _ = q.apply(vs, jnp.asarray(z_np))

    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), atol=1e-5)


def test_standard_vq_gradients_match_torch(data):
    """Backward parity: dL/dz (STE + commitment) and dL/dcodebook."""
    z_np, cb_np = data
    t_loss, _, _, t_z, t_cb = torch_vq_forward(z_np, cb_np)
    t_loss.backward()

    q = VectorQuantizer(num_embeddings=K, embedding_dim=D, use_ema=False)

    def loss_fn(z, cb):
        loss, _, _ = q.apply({"params": {"embedding": cb}}, z)
        return loss

    gz, gcb = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(z_np), jnp.asarray(cb_np))
    np.testing.assert_allclose(np.asarray(gz), t_z.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gcb), t_cb.grad.numpy(), atol=1e-5)


def test_ema_update_matches_torch(data):
    """One EMA fold: decay, Laplace smoothing, embedding = ema_w/cluster_size."""
    z_np, cb_np = data
    decay = 0.99
    flat = torch.tensor(z_np).reshape(-1, D)
    cb = torch.tensor(cb_np)
    d = (flat.pow(2).sum(1, keepdim=True) + cb.pow(2).sum(1) - 2 * flat @ cb.t())
    idx = d.argmin(1)
    onehot = torch.zeros(len(idx), K).scatter_(1, idx[:, None], 1.0)
    cs0 = torch.zeros(K)
    w0 = torch.tensor(np.linspace(-1, 1, K * D).reshape(K, D).astype(np.float32))
    cs1 = cs0 * decay + (1 - decay) * onehot.sum(0)
    w1 = w0 * decay + (1 - decay) * (onehot.t() @ flat)
    n = cs1.sum()
    cluster = (cs1 + 1e-5) / (n + K * 1e-5) * n
    emb1 = w1 / cluster[:, None]

    q = VectorQuantizer(num_embeddings=K, embedding_dim=D, use_ema=True, decay=decay)
    vs = {"qstats": {
        "embedding": jnp.asarray(cb_np),
        "ema_cluster_size": jnp.zeros(K),
        "ema_w": jnp.asarray(w0.numpy()),
    }}
    (_, _, _), mut = q.apply(vs, jnp.asarray(z_np), train=True, mutable=["qstats"])
    np.testing.assert_allclose(np.asarray(mut["qstats"]["ema_cluster_size"]),
                               cs1.numpy(), atol=1e-5)
    # unused codes divide by the Laplace floor (~1e-5) amplifying w0 to ~1e4,
    # so the comparison must be relative, not absolute
    np.testing.assert_allclose(np.asarray(mut["qstats"]["embedding"]),
                               emb1.numpy(), rtol=2e-3, atol=1e-3)


def test_fsq_round_ste_matches_torch(data):
    """FSQ core: round with straight-through — forward values and dz."""
    z_np, _ = data
    zp = torch.tensor(z_np[..., :4], requires_grad=True)  # projected dim = 4
    z_hard = zp + (torch.round(zp) - zp).detach()
    (z_hard.sum()).backward()
    # jax equivalent of the inner round-STE
    f = lambda x: jnp.sum(x + jax.lax.stop_gradient(jnp.round(x) - x))
    g = jax.grad(f)(jnp.asarray(z_np[..., :4]))
    np.testing.assert_allclose(np.asarray(g), zp.grad.numpy(), atol=1e-6)
    hard_j = jnp.asarray(z_np[..., :4])
    hard_j = hard_j + jax.lax.stop_gradient(jnp.round(hard_j) - hard_j)
    np.testing.assert_allclose(np.asarray(hard_j), z_hard.detach().numpy(), atol=1e-6)
