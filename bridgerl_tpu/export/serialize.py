"""Serving artifacts: freeze a trained retargeter into portable StableHLO.

The reference has no serving story — deployment re-loads torch checkpoints
inside Python and needs the model class importable (reference
scripts/deployment/export_motion.py:112-151 rebuilds DualMotionVQVAE and
sniffs dims from weight shapes). The TPU-native inversion: `jax.export`
lowers the jitted inference functions ONCE to StableHLO; the serialized
artifact then executes on any host with plain jax — no bridgerl_tpu code,
no checkpoint, no config. Weights AND normalization stats are constants in
the graph (raw motion in, raw motion out), the batch dimension stays
symbolic so one artifact serves any request size, and both `cpu` and `tpu`
lowerings are embedded so the same file serves a laptop and a pod worker.

Artifact layout (one .zip):
    meta.json      — format tag, config JSON, per-function signatures,
                     provenance (source checkpoint, jax version, platforms)
    <fn>.bin       — serialized ``jax.export.Exported`` per function

Exported functions (all float32 in, channel-last, batch-polymorphic):
    retarget     (b, W, 126) raw human 6D-rotation windows -> (b, W, 29) raw
                 robot joint positions (the product path: human encoder ->
                 shared quantizer -> robot decoder, models/dual_vqvae.py)
    robot_recon  (b, W, 29) raw robot windows -> (b, W, 29) reconstruction
                 (the export/replay path)
    motion_codes (b, W, 126) raw human windows -> dict of int32 (b, T')
                 discrete code streams (one per quantizer stage, e.g.
                 "quantizer/fsq" + "quantizer/rvq/vq_0..3" for hybrid) — the
                 VQ "motion tokens" downstream policy learning consumes;
                 absent for method="ae" (no codes to emit)
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_TAG = "bridgerl-serving-v1"


def _load_stats_pair(data_dir: Optional[str], mean_name: str, std_name: str,
                     dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Saved per-dim stats with the reference's identity fallback
    (export_motion.py:16-23), broadcast to full width so they bake into the
    graph at a fixed shape. ``data_dir=None`` requests identity stats."""
    try:
        if data_dir is None:
            raise FileNotFoundError
        mean = np.load(os.path.join(data_dir, mean_name)).astype(np.float32)
        std = np.load(os.path.join(data_dir, std_name)).astype(np.float32)
    except FileNotFoundError:
        mean, std = np.zeros(dim, np.float32), np.ones(dim, np.float32)
    return np.broadcast_to(mean, (dim,)).copy(), np.broadcast_to(std, (dim,)).copy()


def make_serving_fns(model, variables, robot_stats, human_stats) -> Dict[str, Callable]:
    """Raw-in/raw-out inference closures; weights + stats become constants
    when exported."""
    r_mean, r_std = (jnp.asarray(a) for a in robot_stats)
    h_mean, h_std = (jnp.asarray(a) for a in human_stats)

    def retarget(x_human):
        norm = (x_human - h_mean) / h_std
        out = model.apply(variables, x_human=norm, train=False)
        return out["human"]["retargeted"].astype(jnp.float32) * r_std + r_mean

    def robot_recon(x_robot):
        norm = (x_robot - r_mean) / r_std
        out = model.apply(variables, x_robot=norm, train=False)
        return out["robot"]["recon"].astype(jnp.float32) * r_std + r_mean

    def motion_codes(x_human):
        norm = (x_human - h_mean) / h_std
        _, mods = model.apply(variables, x_human=norm, train=False,
                              mutable=["intermediates"])
        from flax import traverse_util
        flat = traverse_util.flatten_dict(mods["intermediates"])
        # sow stores a 1-tuple per call; name streams by their module path
        return {"/".join(k[:-1]): v[0].astype(jnp.int32)
                for k, v in sorted(flat.items()) if k[-1] == "codes"}

    def decode_codes_fn(codes):
        from ..ops.code_decode import decode_codes
        z_q = decode_codes(model.cfg, variables, codes)
        out = model.apply(variables, z_q, method="decode_latent")
        return out.astype(jnp.float32) * r_std + r_mean

    fns = {"retarget": retarget, "robot_recon": robot_recon}
    cfg = model.cfg
    if getattr(cfg, "method", None) != "ae":
        fns["motion_codes"] = motion_codes
        # decode needs an invertible index space: every method except the
        # unbounded-FSQ variants (ops/code_decode.py docstring)
        if not (cfg.method in ("fsq", "hybrid") and not cfg.fsq_bounded):
            fns["decode_codes"] = decode_codes_fn
    return fns


def export_serving_artifact(
    ckpt_path: str,
    out_path: str,
    data_dir: str = "data/processed",
    platforms: Sequence[str] = ("cpu", "tpu"),
    ref_normalize: bool = False,
) -> Dict[str, Any]:
    """Freeze the checkpoint's model into a self-contained serving artifact.

    Returns the artifact metadata (also written as meta.json inside the zip).
    """
    from .motion_export import load_model_from_checkpoint

    model, variables, exp = load_model_from_checkpoint(ckpt_path)
    return build_serving_artifact(model, variables, exp, out_path,
                                  data_dir=data_dir, platforms=platforms,
                                  source=os.path.abspath(ckpt_path),
                                  ref_normalize=ref_normalize)


def export_fresh_artifact(
    out_path: str,
    arch: str = "transformer",
    method: str = "hybrid",
    window: int = 10,
    data_dir: Optional[str] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Dict[str, Any]:
    """Freeze a fresh-init model of the given config — the shared builder
    behind bench_serving.py and demo_stream_retarget.py's no-checkpoint
    paths. ``data_dir=None`` bakes identity normalization stats; weight
    values don't change the compiled program, so the artifact is
    shape/speed-identical to a trained one."""
    from ..config import make_experiment
    from ..models import init_model

    exp = make_experiment(arch, method, window=window)
    model, variables = init_model(exp.model, jax.random.key(0))
    # fresh-init benches keep the old contract: a data_dir means "bake its
    # stats" (stat values don't change the compiled program's speed)
    return build_serving_artifact(model, variables, exp, out_path,
                                  data_dir=data_dir, platforms=platforms,
                                  source="<fresh-init>",
                                  ref_normalize=data_dir is not None)


def build_serving_artifact(
    model, variables, exp, out_path: str,
    data_dir: Optional[str] = "data/processed",
    platforms: Sequence[str] = ("cpu", "tpu"),
    source: str = "<in-memory>",
    ref_normalize: bool = False,
) -> Dict[str, Any]:
    """Freeze an in-memory (model, variables, config) triple — the shared
    engine behind export_serving_artifact and fresh-init benchmarks.

    ``ref_normalize=True`` bakes the saved dataset stats into the frozen
    graph, reproducing the reference deployment's normalize-at-inference
    (export_motion.py:47-53). That is a measured train/inference mismatch —
    models train on RAW windows (reference train_ablation.py:80-112), and
    feeding them normalized inputs costs 20x recon MSE / halves motion
    dynamics (docs/REF_EXACT.md) — so the default bakes identity stats
    (raw in, raw out, the training distribution).
    """
    W = exp.model.window_size
    r_dim = exp.model.robot_input_dim
    h_dim = exp.model.human_input_dim
    stats_src = data_dir if ref_normalize else None
    robot_stats = _load_stats_pair(stats_src, "mean.npy", "std.npy", r_dim)
    human_stats = _load_stats_pair(stats_src, "human_mean.npy", "human_std.npy", h_dim)
    fns = make_serving_fns(model, variables, robot_stats, human_stats)
    in_dims = {"retarget": h_dim, "robot_recon": r_dim, "motion_codes": h_dim}

    meta: Dict[str, Any] = {
        "format": FORMAT_TAG,
        "config_json": exp.to_json(),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "source_checkpoint": source,
        "ref_normalize": ref_normalize,
        "functions": {},
    }
    def _sig(aval) -> list:
        return [d if isinstance(d, int) else str(d) for d in aval.shape]

    blobs: Dict[str, bytes] = {}
    for name, fn in fns.items():
        if name == "decode_codes":
            # dict of (b, T') int32 streams; T' comes from an abstract trace
            # of motion_codes (no device work)
            streams = jax.eval_shape(
                fns["motion_codes"],
                jax.ShapeDtypeStruct((1, W, h_dim), jnp.float32))
            b = jax.export.symbolic_shape("b")[0]
            arg = {k: jax.ShapeDtypeStruct((b, int(v.shape[1])), jnp.int32)
                   for k, v in streams.items()}
            in_sig = {k: ["b", int(v.shape[1])] for k, v in streams.items()}
            in_dtype = "int32"
        else:
            shape = jax.export.symbolic_shape(f"b, {W}, {in_dims[name]}")
            arg = jax.ShapeDtypeStruct(shape, jnp.float32)
            in_sig = ["b", W, in_dims[name]]
            in_dtype = "float32"
        exported = jax.export.export(jax.jit(fn), platforms=tuple(platforms))(arg)
        blobs[name] = exported.serialize()
        # the Exported already carries the output avals — no second trace
        out_aval = jax.tree_util.tree_unflatten(
            exported.out_tree, list(exported.out_avals))
        out_sig = ({k: _sig(v) for k, v in out_aval.items()}
                   if isinstance(out_aval, dict) else _sig(out_aval))
        meta["functions"][name] = {
            "input": in_sig,
            "output": out_sig,
            "dtype": in_dtype,
        }

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        for name, blob in blobs.items():
            zf.writestr(f"{name}.bin", blob)
    os.replace(tmp, out_path)
    return meta


GENERATOR_TAG = "bridgerl-generator-v1"


def export_generator_artifact(
    vq_ckpt: str,
    prior_ckpt: str,
    out_path: str,
    data_dir: str = "data/processed",
    *,
    n_positions: int = 32,
    n_samples: int = 4,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    guide_candidates: int = 0,
    guide_dyn: float = 0.0,
    platforms: Sequence[str] = ("cpu", "tpu"),
    ref_normalize: bool = False,
) -> Dict[str, Any]:
    """Freeze prior + decoder + overlap-add into ONE generative program.

    The artifact's functions map a raw threefry key (2,) uint32 to
    (n_samples, stride*(N-1)+W, D) novel raw motion — prior sampling, code
    decode, robot decoder, de-normalization and stitching all inside the
    frozen StableHLO. Unconditioned priors export a single ``generate``;
    class-conditioned priors export one ``generate_{action}`` per class.
    Loading needs ONLY plain jax (ServingModule), like the retargeting
    artifact.
    """
    from ..train.prior import load_prior_checkpoint, make_generation_fn
    from .motion_export import load_model_from_checkpoint

    model, variables, exp = load_model_from_checkpoint(vq_ckpt)
    prior_model, prior_vars, pcfg = load_prior_checkpoint(prior_ckpt)
    stats = _load_stats_pair(data_dir if ref_normalize else None,
                             "mean.npy", "std.npy",
                             exp.model.robot_input_dim)
    gen = make_generation_fn(model, variables, exp, prior_model, prior_vars,
                             stats[0], stats[1], n_positions=n_positions,
                             n_samples=n_samples, temperature=temperature,
                             top_k=top_k, guide_candidates=guide_candidates,
                             guide_dyn=guide_dyn)

    def keyed(class_ids):
        def fn(key_data):
            key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
            return gen(key, class_ids)
        return fn

    fns: Dict[str, Callable] = {}
    if pcfg.class_names:
        for ci, name in enumerate(pcfg.class_names):
            fns[f"generate_{name}"] = keyed(
                jnp.full((n_samples,), ci, jnp.int32))
    else:
        fns["generate"] = keyed(None)

    T = pcfg.stride * (n_positions - 1) + pcfg.window
    meta: Dict[str, Any] = {
        "format": GENERATOR_TAG,
        "config_json": exp.to_json(),
        "prior_config_json": pcfg.to_json(),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "source_checkpoint": os.path.abspath(vq_ckpt),
        "source_prior": os.path.abspath(prior_ckpt),
        "n_samples": n_samples,
        "n_positions": n_positions,
        "temperature": temperature,
        "top_k": top_k,
        "guide_candidates": guide_candidates,
        "guide_dyn": guide_dyn,
        "ref_normalize": ref_normalize,
        "functions": {},
    }
    blobs: Dict[str, bytes] = {}
    arg = jax.ShapeDtypeStruct((2,), jnp.uint32)   # threefry key data
    for name, fn in fns.items():
        exported = jax.export.export(jax.jit(fn), platforms=tuple(platforms))(arg)
        blobs[name] = exported.serialize()
        meta["functions"][name] = {
            "input": [2], "dtype": "uint32", "kind": "generator",
            "output": [n_samples, T, exp.model.robot_input_dim],
        }

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        for name, blob in blobs.items():
            zf.writestr(f"{name}.bin", blob)
    os.replace(tmp, out_path)
    return meta


@dataclass
class ServingModule:
    """A loaded serving artifact: metadata + jitted callables.

    ``fns[name]`` replays the embedded StableHLO through jax on whatever
    backend is active — bridgerl_tpu model code is NOT needed (and not used).
    """

    meta: Dict[str, Any]
    fns: Dict[str, Callable]

    def __getitem__(self, name: str) -> Callable:
        return self.fns[name]

    def retarget(self, x_human) -> jax.Array:
        return self.fns["retarget"](jnp.asarray(x_human, jnp.float32))

    def robot_recon(self, x_robot) -> jax.Array:
        return self.fns["robot_recon"](jnp.asarray(x_robot, jnp.float32))

    def motion_codes(self, x_human) -> Dict[str, jax.Array]:
        """Discrete per-stage code streams (absent for method='ae')."""
        return self.fns["motion_codes"](jnp.asarray(x_human, jnp.float32))

    def decode_codes(self, codes: Dict[str, Any]) -> jax.Array:
        """Code streams -> raw robot motion windows (the motion_codes
        inverse; absent for 'ae' and unbounded-FSQ variants)."""
        return self.fns["decode_codes"](
            {k: jnp.asarray(v, jnp.int32) for k, v in codes.items()})

    def generate(self, seed: int, action: Optional[str] = None) -> jax.Array:
        """Generator artifacts only: sample novel raw motion from a seed."""
        name = f"generate_{action}" if action else "generate"
        if name not in self.fns:
            raise KeyError(
                f"{name!r} not in this artifact; functions: "
                f"{sorted(self.fns)}")
        kd = jax.random.key_data(jax.random.key(seed, impl="threefry2x32"))
        return self.fns[name](jnp.asarray(kd, jnp.uint32))

    @property
    def window_size(self) -> int:
        fn = self.meta["functions"].get("retarget")
        if fn is not None:
            return int(fn["input"][1])
        # generator artifact: the window lives in the prior config
        return int(json.loads(self.meta["prior_config_json"])["window"])


def load_serving_artifact(path: str) -> ServingModule:
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta.get("format") not in (FORMAT_TAG, GENERATOR_TAG):
            raise ValueError(f"{path}: unknown artifact format {meta.get('format')!r}")
        fns: Dict[str, Callable] = {}
        for name in meta["functions"]:
            exported = jax.export.deserialize(bytearray(zf.read(f"{name}.bin")))
            # jit the call so repeated serving requests at one batch size
            # compile once; symbolic b still admits any batch size.
            fns[name] = jax.jit(exported.call)
    return ServingModule(meta=meta, fns=fns)
