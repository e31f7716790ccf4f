"""Serving-artifact tests: StableHLO export/load roundtrip.

The reference has no serving story (deployment re-imports the model class and
re-loads torch checkpoints, scripts/deployment/export_motion.py:112-151); the
serving artifact is the TPU-native superset. These tests pin its contract:

- numerics: artifact outputs == direct model apply with baked-in stats
- batch polymorphism: one export serves any request batch size
- self-containment: loading uses only the zip (no checkpoint / config files)
- format gating: unknown artifacts are rejected, identity stats fall back
"""

import dataclasses
import json
import os
import zipfile
from pathlib import Path

import numpy as np
import pytest

from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.data import PairedDataset, generate_synthetic_dataset
from bridgerl_tpu.export.serialize import (
    FORMAT_TAG,
    export_serving_artifact,
    load_serving_artifact,
    make_serving_fns,
)
from bridgerl_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_artifact(tmp_path_factory):
    """One trained tiny checkpoint exported to a serving zip, shared across
    tests (training + two platform lowerings is the slow part)."""
    tmp_path = tmp_path_factory.mktemp("serving")
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
    out = str(tmp_path / "serving.zip")
    meta = export_serving_artifact(ckpt, out, data_dir=data_dir)
    return {"zip": out, "meta": meta, "ckpt": ckpt, "data_dir": data_dir,
            "tmp": tmp_path}


def _direct_fns(info, ref_normalize=False):
    """Ground truth: the same closures the exporter froze, run live."""
    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.export.serialize import _load_stats_pair

    model, variables, exp = load_model_from_checkpoint(info["ckpt"])
    src = info["data_dir"] if ref_normalize else None
    robot_stats = _load_stats_pair(src, "mean.npy", "std.npy",
                                   exp.model.robot_input_dim)
    human_stats = _load_stats_pair(src, "human_mean.npy",
                                   "human_std.npy", exp.model.human_input_dim)
    return make_serving_fns(model, variables, robot_stats, human_stats), exp


def test_artifact_meta(tiny_artifact):
    meta = tiny_artifact["meta"]
    assert meta["format"] == FORMAT_TAG
    assert set(meta["functions"]) == {"retarget", "robot_recon"}
    assert meta["functions"]["retarget"]["input"] == ["b", 10, 126]
    assert meta["functions"]["retarget"]["output"] == ["b", 10, 29]
    assert meta["functions"]["robot_recon"]["input"] == ["b", 10, 29]
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]
    # config JSON embedded for provenance
    cfg = json.loads(meta["config_json"])
    assert cfg["model"]["arch"] == "resnet_no_down"


def test_roundtrip_matches_direct_apply(tiny_artifact):
    """Artifact outputs must equal the live model (weights + stats baked in)."""
    mod = load_serving_artifact(tiny_artifact["zip"])
    direct, exp = _direct_fns(tiny_artifact)
    rng = np.random.default_rng(1)
    xh = rng.normal(size=(3, 10, 126)).astype(np.float32)
    xr = rng.normal(size=(3, 10, 29)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mod.retarget(xh)),
                               np.asarray(direct["retarget"](xh)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mod.robot_recon(xr)),
                               np.asarray(direct["robot_recon"](xr)),
                               rtol=2e-5, atol=2e-5)
    assert mod.window_size == 10


def test_batch_polymorphism(tiny_artifact):
    """One artifact serves any batch size — the symbolic `b` dimension."""
    mod = load_serving_artifact(tiny_artifact["zip"])
    for b in (1, 4, 17):
        out = mod.retarget(np.zeros((b, 10, 126), np.float32))
        assert out.shape == (b, 10, 29)


def test_self_contained(tiny_artifact):
    """Loading must need only the zip: move it, delete nothing else matters."""
    moved = str(tiny_artifact["tmp"] / "elsewhere" / "artifact.zip")
    os.makedirs(os.path.dirname(moved), exist_ok=True)
    with open(tiny_artifact["zip"], "rb") as f:
        blob = f.read()
    with open(moved, "wb") as f:
        f.write(blob)
    mod = load_serving_artifact(moved)
    out = mod.robot_recon(np.zeros((2, 10, 29), np.float32))
    assert np.all(np.isfinite(np.asarray(out)))


def test_unknown_format_rejected(tmp_path):
    bad = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format": "not-a-bridgerl-artifact"}))
    with pytest.raises(ValueError, match="unknown artifact format"):
        load_serving_artifact(bad)


def test_stats_identity_fallback(tmp_path):
    """Missing stats files fall back to identity, like the reference loader
    (export_motion.py:16-23)."""
    from bridgerl_tpu.export.serialize import _load_stats_pair
    mean, std = _load_stats_pair(str(tmp_path), "mean.npy", "std.npy", 7)
    np.testing.assert_array_equal(mean, np.zeros(7, np.float32))
    np.testing.assert_array_equal(std, np.ones(7, np.float32))


def test_ae_artifact_has_no_codes_fn(tiny_artifact):
    """method='ae' has no discrete codes; the artifact must not export them."""
    assert "motion_codes" not in tiny_artifact["meta"]["functions"]


def test_default_is_raw_ref_normalize_restores_stats(tiny_artifact):
    """Models train on RAW windows (reference train_ablation.py:80-112); the
    default artifact must be raw-in/raw-out, and --ref_normalize must
    reproduce the reference deployment's (x-mean)/std wrapping — the measured
    20x-recon-MSE train/inference mismatch (docs/REF_EXACT.md)."""
    from bridgerl_tpu.export.serialize import export_serving_artifact

    assert tiny_artifact["meta"]["ref_normalize"] is False
    refzip = str(tiny_artifact["tmp"] / "refnorm.zip")
    meta = export_serving_artifact(tiny_artifact["ckpt"], refzip,
                                   data_dir=tiny_artifact["data_dir"],
                                   platforms=("cpu",), ref_normalize=True)
    assert meta["ref_normalize"] is True
    raw_mod = load_serving_artifact(tiny_artifact["zip"])
    ref_mod = load_serving_artifact(refzip)
    x = np.random.default_rng(2).normal(size=(2, 10, 29)).astype(np.float32)
    raw_out = np.asarray(raw_mod.robot_recon(x))
    ref_out = np.asarray(ref_mod.robot_recon(x))
    assert not np.allclose(raw_out, ref_out)
    # the reference-mode artifact equals the live normalize->model->denorm
    direct, _ = _direct_fns(tiny_artifact, ref_normalize=True)
    np.testing.assert_allclose(ref_out, np.asarray(direct["robot_recon"](x)),
                               rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def hybrid_artifact(tmp_path_factory):
    """Fresh-init hybrid artifact — the codes contract needs no training."""
    import jax
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train.checkpoint import save_checkpoint

    tmp_path = tmp_path_factory.mktemp("serving_hybrid")
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16)
    model, variables = init_model(exp.model, jax.random.key(0))
    ckpt = str(tmp_path / "hybrid_init.ckpt")
    save_checkpoint(ckpt, epoch=0, variables=variables, config=exp)
    out = str(tmp_path / "serving_hybrid.zip")
    meta = export_serving_artifact(ckpt, out, data_dir=str(tmp_path / "nostats"))
    return {"zip": out, "meta": meta, "model": model, "variables": variables}


def test_motion_codes_streams(hybrid_artifact):
    """Hybrid exports one int32 (b, T) stream per quantizer stage, and the
    artifact's codes equal a direct mutable-apply extraction."""
    import jax

    sig = hybrid_artifact["meta"]["functions"]["motion_codes"]
    assert isinstance(sig["output"], dict)
    streams = set(sig["output"])
    assert any("fsq" in s for s in streams)
    assert sum("vq_" in s for s in streams) == 4  # hybrid's 4 RVQ layers

    mod = load_serving_artifact(hybrid_artifact["zip"])
    x = np.random.default_rng(4).normal(size=(3, 10, 126)).astype(np.float32)
    codes = mod.motion_codes(x)
    assert set(codes) == streams
    for v in codes.values():
        assert v.shape == (3, 10) and v.dtype == np.int32

    # ground truth: run the live model with intermediates mutable
    model, variables = hybrid_artifact["model"], hybrid_artifact["variables"]
    _, mods = model.apply(variables, x_human=jax.numpy.asarray(x), train=False,
                          mutable=["intermediates"])
    from flax import traverse_util
    flat = traverse_util.flatten_dict(mods["intermediates"])
    direct = {"/".join(k[:-1]): np.asarray(v[0], np.int32)
              for k, v in flat.items() if k[-1] == "codes"}
    for name in streams:
        np.testing.assert_array_equal(np.asarray(codes[name]), direct[name])


def test_intermediates_never_in_checkpoint_state():
    """init_model must strip the sown codes: they are outputs, not state."""
    import jax
    from bridgerl_tpu.models import init_model
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16)
    _, variables = init_model(exp.model, jax.random.key(0))
    assert "intermediates" not in variables


# ---------- HTTP serving host ----------

@pytest.fixture(scope="module")
def serving_http(tiny_artifact):
    """ServingApp + live HTTP server on an ephemeral port."""
    import threading
    from bridgerl_tpu.export.server import make_server

    srv = make_server(tiny_artifact["zip"], port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _post(srv, path, body, ctype):
    import urllib.request
    host, port = srv.server_address
    req = urllib.request.Request(f"http://{host}:{port}{path}", data=body,
                                 headers={"Content-Type": ctype}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_http_npy_roundtrip(serving_http, tiny_artifact):
    """octet-stream request: .npy in, .npy out, numerics == direct artifact."""
    import io
    mod_direct = load_serving_artifact(tiny_artifact["zip"])
    x = np.random.default_rng(2).normal(size=(3, 10, 126)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, x)
    status, body, ctype = _post(serving_http, "/v1/retarget", buf.getvalue(),
                                "application/octet-stream")
    assert status == 200 and ctype == "application/octet-stream"
    out = np.load(io.BytesIO(body), allow_pickle=False)
    np.testing.assert_allclose(out, np.asarray(mod_direct.retarget(x)),
                               rtol=2e-5, atol=2e-5)


def test_http_json_roundtrip(serving_http):
    """JSON request gets a JSON response with the right shape."""
    x = np.zeros((2, 10, 29), np.float32)
    status, body, ctype = _post(serving_http, "/v1/robot_recon",
                                json.dumps({"windows": x.tolist()}).encode(),
                                "application/json")
    assert status == 200 and ctype == "application/json"
    out = np.asarray(json.loads(body)["windows"], np.float32)
    assert out.shape == (2, 10, 29) and np.all(np.isfinite(out))


def test_http_health_meta_and_errors(serving_http):
    import urllib.request
    host, port = serving_http.server_address
    with urllib.request.urlopen(f"http://{host}:{port}/healthz", timeout=10) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["window"] == 10
    with urllib.request.urlopen(f"http://{host}:{port}/meta", timeout=10) as r:
        assert json.loads(r.read())["format"] == FORMAT_TAG
    # wrong shape -> 400; unknown function -> 404
    import io
    buf = io.BytesIO()
    np.save(buf, np.zeros((2, 10, 5), np.float32))
    status, body, _ = _post(serving_http, "/v1/retarget", buf.getvalue(),
                            "application/octet-stream")
    assert status == 400 and b"expects" in body
    status, _, _ = _post(serving_http, "/v1/nope", b"{}", "application/json")
    assert status == 404
    # JSON body without "windows" is a 400 (malformed request), not a 404
    status, body, _ = _post(serving_http, "/v1/retarget", b"{}",
                            "application/json")
    assert status == 400 and b"windows" in body


def test_http_malformed_bodies_get_400(serving_http):
    """Every easy-to-produce malformed body must yield an HTTP 400, never a
    dropped socket (regression: empty body -> EOFError, .npz body ->
    AttributeError, scalar JSON -> TypeError all used to escape the
    handler)."""
    import io
    # empty octet body
    status, _, _ = _post(serving_http, "/v1/retarget", b"",
                         "application/octet-stream")
    assert status == 400
    # .npz where a single .npy array is expected
    buf = io.BytesIO()
    np.savez(buf, windows=np.zeros((1, 10, 126), np.float32))
    status, body, _ = _post(serving_http, "/v1/retarget", buf.getvalue(),
                            "application/octet-stream")
    assert status == 400 and b".npy" in body
    # random bytes
    status, _, _ = _post(serving_http, "/v1/retarget", b"\x00\x01garbage",
                         "application/octet-stream")
    assert status == 400
    # scalar / non-object JSON
    for payload in (b"5", b"[1,2]", b"null"):
        status, _, _ = _post(serving_http, "/v1/retarget", payload,
                             "application/json")
        assert status == 400, payload
    # ragged "windows" nested lists
    status, _, _ = _post(serving_http, "/v1/retarget",
                         json.dumps({"windows": [[1, 2], [3]]}).encode(),
                         "application/json")
    assert status == 400


def test_client_and_streaming_import_dependency_light():
    """The deployment-host contract: `export.client` (urllib + numpy) and
    `export.streaming` (numpy) import WITHOUT pulling jax/flax or the model
    stack (regression: the package __init__ used to eagerly import
    motion_export -> flax)."""
    import subprocess
    import sys
    code = (
        "import sys\n"
        # the axon host hook preloads jax via sitecustomize; measure what OUR
        # imports ADD, which is what a vanilla deployment host would see
        "pre = {m for m in ('jax', 'flax', 'torch') if m in sys.modules}\n"
        "from bridgerl_tpu.export.client import ServingClient\n"
        "from bridgerl_tpu.export.streaming import StreamingRetargeter\n"
        "from bridgerl_tpu.export import ServingClient as SC2\n"
        "heavy = [m for m in ('jax', 'flax', 'torch')\n"
        "         if m in sys.modules and m not in pre]\n"
        "assert not heavy, f'heavy imports leaked: {heavy}'\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=str(Path(__file__).resolve().parents[1]))
    assert r.returncode == 0, r.stderr


def test_http_motion_codes_npz(hybrid_artifact):
    """POST human windows, get one npz member per code stream back."""
    import io
    import threading
    from bridgerl_tpu.export.server import make_server

    srv = make_server(hybrid_artifact["zip"], port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        x = np.zeros((2, 10, 126), np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        status, body, _ = _post(srv, "/v1/motion_codes", buf.getvalue(),
                                "application/octet-stream")
        assert status == 200
        npz = np.load(io.BytesIO(body), allow_pickle=False)
        assert set(npz.files) == set(
            hybrid_artifact["meta"]["functions"]["motion_codes"]["output"])
        for k in npz.files:
            assert npz[k].shape == (2, 10) and npz[k].dtype == np.int32
    finally:
        srv.shutdown()
        srv.server_close()


def test_client_roundtrip(serving_http, tiny_artifact):
    """ServingClient speaks the wire protocol end-to-end."""
    from bridgerl_tpu.export.client import ServingClient, ServingError

    host, port = serving_http.server_address
    c = ServingClient(f"http://{host}:{port}")
    assert c.health()["ok"] and c.meta()["format"] == FORMAT_TAG
    mod_direct = load_serving_artifact(tiny_artifact["zip"])
    x = np.random.default_rng(5).normal(size=(2, 10, 126)).astype(np.float32)
    np.testing.assert_allclose(c.retarget(x), np.asarray(mod_direct.retarget(x)),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ServingError) as ei:
        c.retarget(np.zeros((2, 10, 5), np.float32))
    assert ei.value.status == 400 and "expects" in str(ei.value)


def test_client_motion_codes(hybrid_artifact):
    import threading
    from bridgerl_tpu.export.client import ServingClient
    from bridgerl_tpu.export.server import make_server

    srv = make_server(hybrid_artifact["zip"], port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        codes = ServingClient(f"http://{host}:{port}").motion_codes(
            np.zeros((2, 10, 126), np.float32))
        assert set(codes) == set(
            hybrid_artifact["meta"]["functions"]["motion_codes"]["output"])
        assert all(v.shape == (2, 10) for v in codes.values())
    finally:
        srv.shutdown()
        srv.server_close()


def test_decode_codes_inverts_motion_codes(hybrid_artifact):
    """decode_codes(motion_codes(x)) == retarget(x): the frozen artifact's
    token streams fully determine its output motion."""
    mod = load_serving_artifact(hybrid_artifact["zip"])
    sig = hybrid_artifact["meta"]["functions"]["decode_codes"]
    assert isinstance(sig["input"], dict) and sig["dtype"] == "int32"
    assert sig["output"] == ["b", 10, 29]

    x = np.random.default_rng(7).normal(size=(3, 10, 126)).astype(np.float32)
    codes = mod.motion_codes(x)
    decoded = np.asarray(mod.decode_codes(codes))
    np.testing.assert_allclose(decoded, np.asarray(mod.retarget(x)),
                               rtol=2e-5, atol=2e-5)


def test_http_decode_codes_roundtrip(hybrid_artifact):
    """Full wire loop: windows -> codes -> decoded motion over HTTP."""
    import threading
    from bridgerl_tpu.export.client import ServingClient, ServingError
    from bridgerl_tpu.export.server import make_server

    srv = make_server(hybrid_artifact["zip"], port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        c = ServingClient(f"http://{host}:{port}")
        x = np.random.default_rng(9).normal(size=(2, 10, 126)).astype(np.float32)
        codes = c.motion_codes(x)
        decoded = c.decode_codes(codes)
        np.testing.assert_allclose(decoded, c.retarget(x), rtol=2e-5, atol=2e-5)
        # missing stream -> 400, not a dropped socket
        broken = {k: v for k, v in list(codes.items())[1:]}
        with pytest.raises(ServingError) as ei:
            c.decode_codes(broken)
        assert ei.value.status == 400 and "missing" in str(ei.value)
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture(scope="module")
def generator_artifact(tmp_path_factory):
    """Tiny conditioned prior + tiny VQ frozen into a generator artifact."""
    import jax
    import jax.numpy as jnp
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.models.token_prior import (
        MotionTokenPrior, PriorConfig, flatten_vocab_sizes)
    from bridgerl_tpu.ops import code_vocab_sizes
    from bridgerl_tpu.train.checkpoint import save_checkpoint
    from bridgerl_tpu.train.prior import save_prior_checkpoint
    from bridgerl_tpu.export.serialize import export_generator_artifact

    tmp = tmp_path_factory.mktemp("generator")
    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1)
    model, variables = init_model(exp.model, jax.random.key(0))
    vq_ckpt = str(tmp / "vq.ckpt")
    save_checkpoint(vq_ckpt, epoch=0, variables=variables, config=exp)

    sizes = sorted(code_vocab_sizes(exp.model).items())
    pcfg = PriorConfig(
        streams=tuple(n for n, _ in sizes),
        vocab_sizes=flatten_vocab_sizes(sizes, tokens_per_stream=10),
        tokens_per_stream=10, window=10, stride=5,
        d_model=16, n_heads=2, n_layers=1, ff_dim=32, max_len=8,
        class_names=("walk", "jump"))
    prior = MotionTokenPrior(pcfg)
    pv = prior.init({"params": jax.random.key(1), "dropout": jax.random.key(1)},
                    jnp.zeros((1, 8, len(pcfg.vocab_sizes)), jnp.int32),
                    train=False, class_ids=jnp.zeros((1,), jnp.int32))
    prior_ckpt = str(tmp / "prior.ckpt")
    save_prior_checkpoint(prior_ckpt, pv, pcfg)

    out = str(tmp / "generator.zip")
    meta = export_generator_artifact(vq_ckpt, prior_ckpt, out,
                                     data_dir=str(tmp / "nostats"),
                                     n_positions=6, n_samples=2,
                                     temperature=1.0)
    return {"zip": out, "meta": meta}


def test_generator_artifact_guided(generator_artifact, tmp_path):
    """Overlap-consistency guided sampling freezes into the artifact too
    (the guided rollout decodes candidate windows INSIDE the loop)."""
    from bridgerl_tpu.export.serialize import export_generator_artifact

    meta = generator_artifact["meta"]
    out = str(tmp_path / "generator_guided.zip")
    meta_g = export_generator_artifact(
        meta["source_checkpoint"], meta["source_prior"], out,
        data_dir=str(tmp_path / "nostats"), n_positions=6, n_samples=2,
        temperature=1.0, guide_candidates=4)
    assert meta_g["guide_candidates"] == 4
    mod = load_serving_artifact(out)
    m = np.asarray(mod.generate(7, action="walk"))
    assert m.shape == (2, 35, 29) and np.isfinite(m).all()
    np.testing.assert_array_equal(m, np.asarray(mod.generate(7, action="walk")))


def test_generator_artifact(generator_artifact):
    """One frozen program: threefry key -> novel raw motion; per-action
    functions, deterministic per seed, action changes the sample."""
    meta = generator_artifact["meta"]
    assert set(meta["functions"]) == {"generate_walk", "generate_jump"}
    mod = load_serving_artifact(generator_artifact["zip"])
    m1 = np.asarray(mod.generate(7, action="walk"))
    # T = stride*(N-1)+W = 5*5+10
    assert m1.shape == (2, 35, 29) and np.isfinite(m1).all()
    np.testing.assert_array_equal(
        m1, np.asarray(mod.generate(7, action="walk")))
    m2 = np.asarray(mod.generate(7, action="jump"))
    assert not np.array_equal(m1, m2)
    with pytest.raises(KeyError, match="generate_run"):
        mod.generate(0, action="run")


def test_http_generator_seed_json(generator_artifact):
    """POST {'seed': N} -> npy motion; bad key shape -> 400."""
    import io
    import threading
    from bridgerl_tpu.export.server import make_server

    srv = make_server(generator_artifact["zip"], port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        status, body, _ = _post(srv, "/v1/generate_walk",
                                json.dumps({"seed": 7}).encode(),
                                "application/json")
        assert status == 200
        out = np.asarray(json.loads(body)["windows"], np.float32)
        assert out.shape == (2, 35, 29)
        mod = load_serving_artifact(generator_artifact["zip"])
        np.testing.assert_allclose(out, np.asarray(mod.generate(7, "walk")),
                                   rtol=1e-6, atol=1e-6)
        buf = io.BytesIO()
        np.save(buf, np.zeros((3,), np.uint32))
        status, body, _ = _post(srv, "/v1/generate_walk", buf.getvalue(),
                                "application/octet-stream")
        assert status == 400 and b"threefry" in body
    finally:
        srv.shutdown()
        srv.server_close()


def test_batch_bucketing_pads_and_slices(tiny_artifact):
    """Bucketed batches (3 -> pad 4) return exactly b rows, same numerics."""
    from bridgerl_tpu.export.server import ServingApp, _bucket
    assert [_bucket(b) for b in (1, 2, 3, 5, 8, 17)] == [1, 2, 4, 8, 8, 32]
    mod = load_serving_artifact(tiny_artifact["zip"])
    app = ServingApp(mod, bucket_batches=True)
    x = np.random.default_rng(3).normal(size=(3, 10, 126)).astype(np.float32)
    np.testing.assert_allclose(app.call("retarget", x),
                               np.asarray(mod.retarget(x)), rtol=2e-5, atol=2e-5)


def test_generator_artifact_slot_ar(tmp_path):
    """A slot-AR prior (per-slot re-apply inside the sampling fori_loop)
    freezes into the same generator-artifact contract."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.models.token_prior import (
        MotionTokenPrior, PriorConfig, flatten_vocab_sizes)
    from bridgerl_tpu.ops import code_vocab_sizes
    from bridgerl_tpu.train.checkpoint import save_checkpoint
    from bridgerl_tpu.train.prior import save_prior_checkpoint
    from bridgerl_tpu.export.serialize import export_generator_artifact

    exp = make_experiment("resnet_no_down", "hybrid", window=10, hidden_dim=16,
                          num_res_layers=1)
    model, variables = init_model(exp.model, jax.random.key(0))
    vq_ckpt = str(tmp_path / "vq.ckpt")
    save_checkpoint(vq_ckpt, epoch=0, variables=variables, config=exp)

    sizes = sorted(code_vocab_sizes(exp.model).items())
    pcfg = PriorConfig(
        streams=tuple(n for n, _ in sizes),
        vocab_sizes=flatten_vocab_sizes(sizes, tokens_per_stream=10),
        tokens_per_stream=10, window=10, stride=5,
        d_model=16, n_heads=2, n_layers=1, ff_dim=32, max_len=8,
        slot_ar=True, depth_layers=1)
    prior = MotionTokenPrior(pcfg)
    pv = prior.init({"params": jax.random.key(1), "dropout": jax.random.key(1)},
                    jnp.zeros((1, 8, len(pcfg.vocab_sizes)), jnp.int32),
                    train=False)
    prior_ckpt = str(tmp_path / "prior_ar.ckpt")
    save_prior_checkpoint(prior_ckpt, pv, pcfg)

    out = str(tmp_path / "generator_ar.zip")
    meta = export_generator_artifact(vq_ckpt, prior_ckpt, out,
                                     data_dir=str(tmp_path / "nostats"),
                                     n_positions=4, n_samples=2)
    assert "generate" in meta["functions"]
    mod = load_serving_artifact(out)
    m = np.asarray(mod.generate(3))
    assert m.shape == (2, 5 * 3 + 10, 29) and np.isfinite(m).all()
    np.testing.assert_array_equal(m, np.asarray(mod.generate(3)))
