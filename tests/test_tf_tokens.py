"""Multi-token transformer latent (tf_tokens=k, opt-in vs the reference's
single mean-pooled token — vqvae.py:458, 488).

k=1 must stay byte-identical to the reference-semantics model (same param
tree, same forward); k>1 raises the latent rate: (B, k, hidden) latents,
k tokens per window in every code stream, and the full decode loop works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.ops import decode_codes


def test_k1_param_tree_and_id_unchanged():
    e1 = make_experiment("transformer", "hybrid", window=10, hidden_dim=16,
                         ff_dim=32, d_model=32)
    ek = make_experiment("transformer", "hybrid", window=10, hidden_dim=16,
                         ff_dim=32, d_model=32, tf_tokens=5)
    assert e1.id == "transformer_hybrid" and ek.id == "transformer_hybrid_K5"
    assert ek.name.endswith("_K5")
    m1, v1 = init_model(e1.model, jax.random.key(0))
    mk, vk = init_model(ek.model, jax.random.key(0))
    # identical param trees: the token count is a pooling choice, not capacity
    p1 = set(traverse_util.flatten_dict(v1["params"]))
    pk = set(traverse_util.flatten_dict(vk["params"]))
    assert p1 == pk


def test_k_tokens_shapes_and_codes():
    exp = make_experiment("transformer", "hybrid", window=10, hidden_dim=16,
                          ff_dim=32, d_model=32, tf_tokens=5)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 10, 29), jnp.float32)
    out, mods = model.apply(variables, x_robot=x, train=False,
                            mutable=["intermediates"])
    assert out["robot"]["z_e"].shape == (4, 5, 16)
    assert out["robot"]["recon"].shape == (4, 10, 29)
    flat = traverse_util.flatten_dict(mods["intermediates"])
    for k, v in flat.items():
        if k[-1] == "codes":
            assert v[0].shape == (4, 5), k


def test_k_tokens_decode_loop():
    exp = make_experiment("transformer", "rvq", window=10, hidden_dim=16,
                          ff_dim=32, d_model=32, tf_tokens=2, n_layers=2,
                          codebook_size=32)
    model, variables = init_model(exp.model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(2), (3, 10, 29), jnp.float32)
    out, mods = model.apply(variables, x_robot=x, train=False,
                            mutable=["intermediates"])
    flat = traverse_util.flatten_dict(mods["intermediates"])
    codes = {"/".join(k[:-1]): v[0] for k, v in flat.items() if k[-1] == "codes"}
    z_q = decode_codes(exp.model, variables, codes)
    recon2 = model.apply(variables, z_q, method="decode_latent")
    np.testing.assert_allclose(np.asarray(out["robot"]["recon"]),
                               np.asarray(recon2), rtol=1e-5, atol=1e-6)


def test_invalid_tf_tokens_rejected():
    with pytest.raises(ValueError, match="tf_tokens"):
        make_experiment("transformer", "hybrid", window=10, tf_tokens=3)
    with pytest.raises(ValueError, match="tf_tokens"):
        make_experiment("transformer", "hybrid", window=10, tf_tokens=0)


def test_k_tokens_student_stage_trains():
    """Teacher -> student transfer works at k>1 (z_e alignment on (B,k,h))."""
    import dataclasses
    from bridgerl_tpu.data import PairedDataset
    from bridgerl_tpu.train import Trainer

    rng = np.random.default_rng(0)
    robot = rng.normal(size=(64, 10, 29)).astype(np.float32)
    human = rng.normal(size=(64, 10, 126)).astype(np.float32)
    ds = PairedDataset.from_numpy(robot, human)
    exp = make_experiment("transformer", "hybrid", window=10, hidden_dim=16,
                          ff_dim=32, d_model=32, tf_tokens=5, epochs=1,
                          batch_size=32, codebook_data_init=False)

    def run(e, tmp):
        e = dataclasses.replace(e, log_dir=tmp + "/r", checkpoint_dir=tmp + "/c")
        Trainer(e, verbose=False).train_seed(ds, 42)
        return e

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        t = run(exp, tmp)
        ck = f"{t.checkpoint_dir}/{t.ckpt_name(42, 'best')}.ckpt"
        s = make_experiment("transformer", "hybrid", window=10, hidden_dim=16,
                            ff_dim=32, d_model=32, tf_tokens=5, epochs=1,
                            batch_size=32, mode="student", teacher_ckpt=ck)
        s = dataclasses.replace(s, log_dir=tmp + "/r", checkpoint_dir=tmp + "/c")
        hist = Trainer(s, verbose=False).train_seed(ds, 42)
        assert np.isfinite(hist["val_align"][-1])
