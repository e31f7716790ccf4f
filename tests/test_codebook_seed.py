"""Data-dependent codebook seeding (train/codebook_seed.py).

Reproduces the round-3 W64-transformer failure mode in miniature: latents in
a tiny ball far from the U(-1/K,1/K) code init collapse the nearest-code
search to one winner (PPL ~1); seeding the codebook from encoder outputs
restores discrimination. Also pins the structural contract: only FIRST-stage
EMA codebooks are reseeded (residual stages keep their residual-scale init),
ema_w mirrors the embedding, cluster sizes are 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bridgerl_tpu.config import ModelConfig
from bridgerl_tpu.models import init_model
from bridgerl_tpu.ops.codebook import nearest_codes
from bridgerl_tpu.ops.quantizers import perplexity_from_counts
from bridgerl_tpu.train.codebook_seed import seed_codebook_variables


def _setup(method="hybrid"):
    cfg = ModelConfig(arch="resnet", method=method, window_size=16,
                      human_input_dim=6, robot_input_dim=4, hidden_dim=8,
                      codebook_size=32)
    model, variables = init_model(cfg, jax.random.key(0))
    # a real-ish batch: small windows whose encoder outputs land in a tight
    # ball away from the origin (the measured W64 collapse geometry)
    x = 0.05 * jax.random.normal(jax.random.key(1), (64, 16, 4)) + 1.0
    return model, variables, x


def _first_stage(qstats):
    node = qstats
    while isinstance(node, dict) and "embedding" not in node:
        # descend into the single child chain until the first EMA VQ dict
        for k in sorted(node.keys()):
            if k == "vq_0" or isinstance(node[k], dict):
                node = node[k]
                break
    return node


def test_seeding_places_codes_on_the_data():
    model, variables, x = _setup()
    seeded = seed_codebook_variables(model, variables, x)
    z = model.apply(seeded, x, method=model.encode_robot)
    flat = np.asarray(z, np.float32).reshape(-1, z.shape[-1])

    emb = np.asarray(_first_stage(seeded["qstats"])["embedding"])
    # every seeded code sits within jitter distance of some latent sample
    d = np.linalg.norm(emb[:, None, :] - flat[None, :, :], axis=-1).min(axis=1)
    assert d.max() < 0.05 * np.linalg.norm(flat, axis=1).mean()

    st = _first_stage(seeded["qstats"])
    np.testing.assert_allclose(np.asarray(st["ema_w"]), emb, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st["ema_cluster_size"]), 1.0)


def test_seeding_cures_winner_take_all():
    model, variables, x = _setup()

    def batch_ppl(v):
        z = model.apply(v, x, method=model.encode_robot)
        flat = jnp.reshape(z.astype(jnp.float32), (-1, z.shape[-1]))
        emb = _first_stage(v["qstats"])["embedding"]
        _, counts, _ = nearest_codes(flat, emb)
        return float(perplexity_from_counts(counts))

    before = batch_ppl(variables)
    after = batch_ppl(seed_codebook_variables(model, variables, x))
    assert after > 8.0, f"seeded ppl {after} (before {before})"
    assert after > 2.0 * before


def test_residual_stages_untouched():
    model, variables, x = _setup(method="rvq")
    seeded = seed_codebook_variables(model, variables, x)

    def stages(v):
        out = {}
        def walk(node, name=""):
            if isinstance(node, dict):
                if "embedding" in node:
                    out[name] = np.asarray(node["embedding"])
                else:
                    for k, c in node.items():
                        walk(c, k)
        walk(v["qstats"])
        return out

    s0, s1 = stages(variables), stages(seeded)
    assert set(s0) == set(s1) and len(s0) >= 2
    changed = {k for k in s0 if not np.allclose(s0[k], s1[k])}
    assert changed == {"vq_0"}, f"reseeded stages: {changed}"


def test_noop_for_codebook_free_methods():
    model, variables, x = _setup(method="fsq")
    seeded = seed_codebook_variables(model, variables, x)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)),
                               variables, seeded))


def test_vq_norm_removes_common_mode_and_adds_no_params():
    cfg = ModelConfig(arch="resnet", method="hybrid", window_size=16,
                      human_input_dim=6, robot_input_dim=4, hidden_dim=8,
                      codebook_size=32)
    model0, v0 = init_model(cfg, jax.random.key(0))
    cfgN = ModelConfig(**{**cfg.__dict__, "vq_norm": True})
    modelN, vN = init_model(cfgN, jax.random.key(0))

    # parameter-free: identical param tree (checkpoints interchangeable)
    t0 = jax.tree_util.tree_structure(v0["params"])
    tN = jax.tree_util.tree_structure(vN["params"])
    assert t0 == tN

    x = 0.05 * jax.random.normal(jax.random.key(1), (32, 16, 4)) + 1.0
    z = np.asarray(modelN.apply(vN, x, method=modelN.encode_robot), np.float32)
    flat = z.reshape(-1, z.shape[-1])
    np.testing.assert_allclose(flat.mean(axis=-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.std(axis=-1), 1.0, atol=1e-2)

    # forward still runs end-to-end with the norm in the graph
    out = modelN.apply(vN, x, None, train=False)
    assert out["robot"]["recon"].shape == x.shape


def test_merge_matching_variables_transfers_only_matching_leaves():
    import flax
    from bridgerl_tpu.train.checkpoint import merge_matching_variables

    base = dict(arch="resnet_no_down", window_size=8, human_input_dim=6,
                robot_input_dim=4, hidden_dim=8, codebook_size=16)
    _, v_ae = init_model(ModelConfig(method="ae", **base), jax.random.key(3))
    _, v_hy = init_model(ModelConfig(method="hybrid", **base), jax.random.key(4))

    src = flax.serialization.to_state_dict(v_ae)
    merged = merge_matching_variables(v_hy, src)

    def leaves(v, top):
        return {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_flatten_with_path(v[top])[0]}

    m, a, h = leaves(merged, "params"), leaves(v_ae, "params"), leaves(v_hy, "params")
    moved = kept = 0
    for k in m:
        if k in a and a[k].shape == m[k].shape:
            np.testing.assert_array_equal(m[k], a[k]); moved += 1
        else:
            np.testing.assert_array_equal(m[k], h[k]); kept += 1
    assert moved > 0 and kept > 0, (moved, kept)  # encoders moved, quantizer kept


def test_seeding_strides_evenly_over_the_batch():
    """Regression: the old index formula (arange(K)*n)//n reduced to
    arange(K) — the first K rows, not an even stride. With latents whose
    value encodes their batch position, the seeded codes must span the whole
    sample range (and never index out of bounds when n < K)."""
    from bridgerl_tpu.train.codebook_seed import _seed_qstats

    K, Dd = 32, 4
    n = 4 * K
    flat = jnp.tile(jnp.arange(n, dtype=jnp.float32)[:, None], (1, Dd))
    node = {"embedding": jnp.zeros((K, Dd)), "ema_w": jnp.zeros((K, Dd)),
            "ema_cluster_size": jnp.zeros((K,))}
    emb = np.asarray(_seed_qstats(node, "", flat)["embedding"])
    # last code comes from the tail of the batch, not row K-1
    assert emb[-1, 0] > 0.9 * n, emb[-1, 0]
    assert emb[0, 0] < 0.1 * n

    # n < K: every index stays in bounds (max (K-1)*n//K <= n-1)
    small = flat[:8]
    emb2 = np.asarray(_seed_qstats(node, "", small)["embedding"])
    assert np.isfinite(emb2).all()
    assert emb2[:, 0].max() <= float(small[-1, 0]) + 1.0  # on the data, jittered
