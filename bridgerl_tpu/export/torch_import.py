"""Import reference PyTorch checkpoints into bridgerl variables.

The reference trains `DualMotionVQVAE` in torch and ships `.pth` checkpoints
(`{run}_last/best.pth` wrapper dicts with ``model_state_dict`` +  a plain
``config`` dict, `scripts/train_ablation.py:276-284`; `_final.pth` is a bare
``state_dict``, :364). A user switching to this framework brings those files;
this module converts them losslessly into our flax variable tree so every
downstream surface (export, serving, replay, eval) runs the SAME trained
model on TPU.

Key-space being mapped (reference `models/vqvae.py:508-617` naming):
``human_encoder.* / robot_encoder.* / quantizer.* / robot_decoder.*``, with
arch-specific interiors (nn.Sequential numeric indices for conv towers,
``transformer.layers.{i}`` for the transformer, ``layers.{i}`` for RVQ).

Layout conventions converted (all verified against torch forwards in
tests/test_torch_import.py):

- Linear ``(out, in)``            -> Dense kernel ``(in, out)``  (transpose)
- Conv1d ``(out, in, k)``         -> Conv kernel ``(k, in, out)``
- ConvTranspose1d ``(in, out, k)``-> ConvTranspose kernel ``(k, in, out)``
  with a FLIP along k (torch's transposed conv is the adjoint of its
  cross-correlation; flax's is fractionally-strided cross-correlation)
- MHA packed ``in_proj_weight (3d, d)`` -> per-head q/k/v kernels
  ``(d, heads, head_dim)`` (head-major feature order on both sides)
- BatchNorm weight/bias -> scale/bias; running stats -> ``batch_stats``
- EMA-VQ embedding + ema_w/ema_cluster_size buffers -> ``qstats`` collection

Semantics flags: imported experiments force ``fsq_bounded=False`` and
``lfq_norm=False`` — those are this repo's measured training improvements and
change the forward math; a reference checkpoint was trained without them
(reference FSQ round is unbounded, LFQ has no pre-sign norm).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

Path = Tuple[str, ...]
Source = Tuple[str, Callable[[np.ndarray], np.ndarray]]

_SKIP_SUFFIXES = ("num_batches_tracked", "pe.pe", "_levels", "_basis")


# ---------------------------------------------------------------- transforms

def _t(w: np.ndarray) -> np.ndarray:           # Linear
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:        # Conv1d
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convt(w: np.ndarray) -> np.ndarray:       # ConvTranspose1d (adjoint flip)
    return np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])


def _proj1x1(w: np.ndarray) -> np.ndarray:     # Conv1d k=1 -> Dense
    return np.ascontiguousarray(w[:, :, 0].T)


def _copy(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)


def _qkv(slot: int, n_heads: int) -> Callable[[np.ndarray], np.ndarray]:
    """Slice q/k/v out of torch's packed in_proj and shape it flax-style."""

    def fn(w: np.ndarray) -> np.ndarray:
        d = w.shape[-1] if w.ndim == 2 else w.shape[0] // 3
        part = w[slot * d: (slot + 1) * d]
        if part.ndim == 2:   # weight (d, d) -> (d, heads, head_dim)
            return np.ascontiguousarray(part.T.reshape(d, n_heads, d // n_heads))
        return np.ascontiguousarray(part.reshape(n_heads, d // n_heads))

    fn.kind = ("qkv", slot)
    return fn


def _out_proj(n_heads: int) -> Callable[[np.ndarray], np.ndarray]:
    def fn(w: np.ndarray) -> np.ndarray:
        d = w.shape[0]
        return np.ascontiguousarray(w.T.reshape(n_heads, d // n_heads, d))

    fn.kind = ("outproj",)
    return fn


# inverses of the simple transforms, keyed by function identity (the packed
# qkv / out_proj closures invert via their `kind` tag in
# export_torch_state_dict — they merge/split a shared torch tensor)

def _inv_convt(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[::-1].transpose(1, 2, 0))


_INVERSE: Dict[Callable, Callable] = {}


def _register_inverses() -> None:
    _INVERSE[_t] = lambda w: np.ascontiguousarray(w.T)
    _INVERSE[_conv] = lambda w: np.ascontiguousarray(w.transpose(2, 1, 0))
    _INVERSE[_convt] = _inv_convt
    _INVERSE[_proj1x1] = lambda w: np.ascontiguousarray(w.T[:, :, None])
    _INVERSE[_copy] = _copy


_register_inverses()


# ------------------------------------------------------------- tower tables

def _resblock(dst: Path, src: str, stats: Path) -> Dict[Path, Source]:
    """ResBlock1D: net.{0 conv,1 bn,3 conv,4 bn} (vqvae.py:265-278)."""
    m: Dict[Path, Source] = {}
    for j, (tconv, tbn) in enumerate([("net.0", "net.1"), ("net.3", "net.4")]):
        m[dst + (f"Conv_{j}", "kernel")] = (f"{src}.{tconv}.weight", _conv)
        m[dst + (f"Conv_{j}", "bias")] = (f"{src}.{tconv}.bias", _copy)
        m[dst + (f"BatchNorm_{j}", "scale")] = (f"{src}.{tbn}.weight", _copy)
        m[dst + (f"BatchNorm_{j}", "bias")] = (f"{src}.{tbn}.bias", _copy)
        m[stats + (f"BatchNorm_{j}", "mean")] = (f"{src}.{tbn}.running_mean", _copy)
        m[stats + (f"BatchNorm_{j}", "var")] = (f"{src}.{tbn}.running_var", _copy)
    return m


def _conv_encoder(tower: str, arch: str, n_res: int) -> Dict[Path, Source]:
    """simple/resnet Encoder (vqvae.py:293-325): Sequential numeric indices."""
    p: Path = ("params", tower)
    s: Path = ("batch_stats", tower)
    m: Dict[Path, Source] = {}
    if arch == "simple":
        for j, idx in enumerate((0, 2)):
            m[p + (f"Conv_{j}", "kernel")] = (f"{tower}.model.{idx}.weight", _conv)
            m[p + (f"Conv_{j}", "bias")] = (f"{tower}.model.{idx}.bias", _copy)
        return m
    # resnet: [0 conv, 1 act, 2..2+n res, conv, act, res_final]
    m[p + ("Conv_0", "kernel")] = (f"{tower}.model.0.weight", _conv)
    m[p + ("Conv_0", "bias")] = (f"{tower}.model.0.bias", _copy)
    for i in range(n_res):
        m.update(_resblock(p + (f"res_{i}",), f"{tower}.model.{2 + i}",
                           s + (f"res_{i}",)))
    tail = 2 + n_res
    m[p + ("Conv_1", "kernel")] = (f"{tower}.model.{tail}.weight", _conv)
    m[p + ("Conv_1", "bias")] = (f"{tower}.model.{tail}.bias", _copy)
    m.update(_resblock(p + ("res_final",), f"{tower}.model.{tail + 2}",
                       s + ("res_final",)))
    return m


def _conv_decoder(arch: str, n_res: int) -> Dict[Path, Source]:
    """simple/resnet Decoder (vqvae.py:327-365)."""
    tower = "robot_decoder"
    p: Path = ("params", tower)
    s: Path = ("batch_stats", tower)
    m: Dict[Path, Source] = {}
    if arch == "simple":
        for j, idx in enumerate((0, 2)):
            m[p + (f"ConvTranspose_{j}", "kernel")] = (
                f"{tower}.model.{idx}.weight", _convt)
            m[p + (f"ConvTranspose_{j}", "bias")] = (
                f"{tower}.model.{idx}.bias", _copy)
        return m
    # resnet: [0..n-1 res, up, conv, act, res_mid, up, conv]
    for i in range(n_res):
        m.update(_resblock(p + (f"res_{i}",), f"{tower}.model.{i}",
                           s + (f"res_{i}",)))
    m[p + ("Conv_0", "kernel")] = (f"{tower}.model.{n_res + 1}.weight", _conv)
    m[p + ("Conv_0", "bias")] = (f"{tower}.model.{n_res + 1}.bias", _copy)
    m.update(_resblock(p + ("res_mid",), f"{tower}.model.{n_res + 3}",
                       s + ("res_mid",)))
    m[p + ("Conv_1", "kernel")] = (f"{tower}.model.{n_res + 5}.weight", _conv)
    m[p + ("Conv_1", "bias")] = (f"{tower}.model.{n_res + 5}.bias", _copy)
    return m


def _nodown_encoder(tower: str, n_res: int) -> Dict[Path, Source]:
    """NoDownsampleEncoder (vqvae.py:370-391): named add_module children."""
    p: Path = ("params", tower)
    s: Path = ("batch_stats", tower)
    m: Dict[Path, Source] = {
        p + ("Conv_0", "kernel"): (f"{tower}.model.0.weight", _conv),
        p + ("Conv_0", "bias"): (f"{tower}.model.0.bias", _copy),
        p + ("final_conv", "kernel"): (f"{tower}.model.final_conv.weight", _conv),
        p + ("final_conv", "bias"): (f"{tower}.model.final_conv.bias", _copy),
    }
    for i in range(n_res):
        m.update(_resblock(p + (f"res_{i}",), f"{tower}.model.res_{i}",
                           s + (f"res_{i}",)))
    return m


def _nodown_decoder(n_res: int) -> Dict[Path, Source]:
    """NoDownsampleDecoder (vqvae.py:393-410)."""
    tower = "robot_decoder"
    p: Path = ("params", tower)
    s: Path = ("batch_stats", tower)
    m: Dict[Path, Source] = {
        p + ("out_conv", "kernel"): (f"{tower}.model.out_conv.weight", _conv),
        p + ("out_conv", "bias"): (f"{tower}.model.out_conv.bias", _copy),
    }
    for i in range(n_res):
        m.update(_resblock(p + (f"res_{i}",), f"{tower}.model.res_{i}",
                           s + (f"res_{i}",)))
    return m


def _transformer_tower(tower: str, n_layers: int, n_heads: int) -> Dict[Path, Source]:
    """TransformerMotionEncoder/Decoder (vqvae.py:429-499): input_proj + N
    nn.TransformerEncoderLayer (packed qkv, post-LN, relu FF) + output_proj."""
    p: Path = ("params", tower)
    m: Dict[Path, Source] = {}
    for proj in ("input_proj", "output_proj"):
        m[p + (proj, "kernel")] = (f"{tower}.{proj}.weight", _t)
        m[p + (proj, "bias")] = (f"{tower}.{proj}.bias", _copy)
    for i in range(n_layers):
        src = f"{tower}.transformer.layers.{i}"
        dst = p + (f"layer_{i}",)
        for slot, name in enumerate(("query", "key", "value")):
            m[dst + ("self_attn", name, "kernel")] = (
                f"{src}.self_attn.in_proj_weight", _qkv(slot, n_heads))
            m[dst + ("self_attn", name, "bias")] = (
                f"{src}.self_attn.in_proj_bias", _qkv(slot, n_heads))
        m[dst + ("self_attn", "out", "kernel")] = (
            f"{src}.self_attn.out_proj.weight", _out_proj(n_heads))
        m[dst + ("self_attn", "out", "bias")] = (
            f"{src}.self_attn.out_proj.bias", _copy)
        for ff, lin in (("ff1", "linear1"), ("ff2", "linear2")):
            m[dst + (ff, "kernel")] = (f"{src}.{lin}.weight", _t)
            m[dst + (ff, "bias")] = (f"{src}.{lin}.bias", _copy)
        for norm in ("norm1", "norm2"):
            m[dst + (norm, "scale")] = (f"{src}.{norm}.weight", _copy)
            m[dst + (norm, "bias")] = (f"{src}.{norm}.bias", _copy)
    return m


def _ema_vq(dst: Path, src: str) -> Dict[Path, Source]:
    return {
        dst + ("embedding",): (f"{src}.embedding.weight", _copy),
        dst + ("ema_w",): (f"{src}.ema_w", _copy),
        dst + ("ema_cluster_size",): (f"{src}.ema_cluster_size", _copy),
    }


def _quantizer(method: str, n_layers: int) -> Dict[Path, Source]:
    """Quantizer zoo key maps (vqvae.py:10-259; construction 540-560)."""
    m: Dict[Path, Source] = {}
    if method == "ae":
        return m
    if method == "standard":
        m[("params", "quantizer", "embedding")] = (
            "quantizer.embedding.weight", _copy)
    elif method == "ema":
        m.update(_ema_vq(("qstats", "quantizer"), "quantizer"))
    elif method == "rvq":
        for i in range(n_layers):
            m.update(_ema_vq(("qstats", "quantizer", f"vq_{i}"),
                             f"quantizer.layers.{i}"))
    elif method in ("fsq", "lfq"):
        for proj in ("project_in", "project_out"):
            m[("params", "quantizer", proj, "kernel")] = (
                f"quantizer.{proj}.weight", _proj1x1)
            m[("params", "quantizer", proj, "bias")] = (
                f"quantizer.{proj}.bias", _copy)
    elif method == "hybrid":
        for proj in ("project_in", "project_out"):
            m[("params", "quantizer", "fsq", proj, "kernel")] = (
                f"quantizer.fsq.{proj}.weight", _proj1x1)
            m[("params", "quantizer", "fsq", proj, "bias")] = (
                f"quantizer.fsq.{proj}.bias", _copy)
        for i in range(4):   # HybridVQ hard-codes a 4-layer EMA RVQ (:211-217)
            m.update(_ema_vq(("qstats", "quantizer", "rvq", f"vq_{i}"),
                             f"quantizer.vq.layers.{i}"))
    else:
        raise ValueError(f"unknown method {method!r}")
    return m


def build_key_map(arch: str, method: str, *, n_tf_layers: int = 4,
                  n_heads: int = 4, num_res_layers: int = 4,
                  rvq_layers: int = 4) -> Dict[Path, Source]:
    """Full map: our variable path -> (torch state_dict key, transform)."""
    m: Dict[Path, Source] = {}
    if arch == "transformer":
        for tower in ("human_encoder", "robot_encoder", "robot_decoder"):
            m.update(_transformer_tower(tower, n_tf_layers, n_heads))
    elif arch == "resnet_no_down":
        for tower in ("human_encoder", "robot_encoder"):
            m.update(_nodown_encoder(tower, num_res_layers))
        m.update(_nodown_decoder(num_res_layers))
    elif arch in ("simple", "resnet"):
        for tower in ("human_encoder", "robot_encoder"):
            m.update(_conv_encoder(tower, arch, num_res_layers))
        m.update(_conv_decoder(arch, num_res_layers))
    else:
        raise ValueError(f"unknown arch {arch!r}")
    m.update(_quantizer(method, rvq_layers))
    return m


# --------------------------------------------------------------- conversion

def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop DataParallel's 'module.' wrapper (export_motion.py:122-124)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def split_payload(payload: Any) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(state_dict, meta) from either a wrapper dict or a bare state_dict.

    Wrapper: {'epoch', 'model_state_dict', 'optimizer_state_dict',
    'best_loss', 'config'} (train_ablation.py:276-284); `_final.pth` saves the
    bare state_dict (:357-364).
    """
    if isinstance(payload, dict) and "model_state_dict" in payload:
        meta = {"epoch": int(payload.get("epoch", 0)),
                "best_loss": float(payload.get("best_loss", float("inf"))),
                "config": payload.get("config") or {}}
        return strip_module_prefix(dict(payload["model_state_dict"])), meta
    if not isinstance(payload, dict):
        raise ValueError(f"unsupported checkpoint payload: {type(payload)}")
    return strip_module_prefix(dict(payload)), {"epoch": 0,
                                                "best_loss": float("inf"),
                                                "config": {}}


def sniff_spec(sd: Dict[str, np.ndarray],
               config: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Recover (arch, method, dims, window...) from key names + shapes.

    Mirrors the reference's own weight-shape sniffing (export_motion.py:
    129-132, analyze_latent_space.py:216-231) but reads the checkpoint's
    embedded config dict first when present.
    """
    config = config or {}
    spec: Dict[str, Any] = {}

    if "human_encoder.input_proj.weight" in sd:
        spec["arch"] = "transformer"
        w = sd["human_encoder.input_proj.weight"]
        spec["d_model"], spec["human_input_dim"] = int(w.shape[0]), int(w.shape[1])
        spec["robot_input_dim"] = int(sd["robot_encoder.input_proj.weight"].shape[1])
        spec["hidden_dim"] = int(sd["human_encoder.output_proj.weight"].shape[0])
        spec["ff_dim"] = int(
            sd["human_encoder.transformer.layers.0.linear1.weight"].shape[0])
        layer_ids = {int(m.group(1)) for k in sd
                     if (m := re.match(r"human_encoder\.transformer\.layers\.(\d+)\.", k))}
        spec["n_tf_layers"] = max(layer_ids) + 1
    elif "human_encoder.model.final_conv.weight" in sd:
        spec["arch"] = "resnet_no_down"
        w = sd["human_encoder.model.0.weight"]
        spec["hidden_dim"], spec["human_input_dim"] = int(w.shape[0]), int(w.shape[1])
        spec["robot_input_dim"] = int(sd["robot_encoder.model.0.weight"].shape[1])
    elif "human_encoder.model.2.net.0.weight" in sd:
        spec["arch"] = "resnet"
        w = sd["human_encoder.model.0.weight"]
        spec["hidden_dim"], spec["human_input_dim"] = int(w.shape[0]), int(w.shape[1])
        spec["robot_input_dim"] = int(sd["robot_encoder.model.0.weight"].shape[1])
    elif "human_encoder.model.0.weight" in sd:
        spec["arch"] = "simple"
        w = sd["human_encoder.model.0.weight"]
        spec["hidden_dim"], spec["human_input_dim"] = int(w.shape[0]), int(w.shape[1])
        spec["robot_input_dim"] = int(sd["robot_encoder.model.0.weight"].shape[1])
    else:
        raise ValueError("cannot identify encoder arch from state_dict keys")

    if "quantizer.fsq.project_in.weight" in sd:
        spec["method"] = "hybrid"
    elif "quantizer.layers.0.embedding.weight" in sd:
        spec["method"] = "rvq"
        spec["codebook_size"] = int(sd["quantizer.layers.0.embedding.weight"].shape[0])
        spec["n_layers"] = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(r"quantizer\.layers\.(\d+)\.", k)))
    elif "quantizer.ema_w" in sd:
        spec["method"] = "ema"
        spec["codebook_size"] = int(sd["quantizer.embedding.weight"].shape[0])
    elif "quantizer.embedding.weight" in sd:
        spec["method"] = "standard"
        spec["codebook_size"] = int(sd["quantizer.embedding.weight"].shape[0])
    elif "quantizer.project_in.weight" in sd:
        out_dim = int(sd["quantizer.project_in.weight"].shape[0])
        # FSQ projects to len(levels)=4 dims, LFQ to codebook_dim=10
        # (vqvae.py:548, 550); the embedded config wins when present.
        spec["method"] = "lfq" if out_dim == 10 else "fsq"
    else:
        spec["method"] = "ae"

    # the checkpoint's own config dict overrides shape heuristics
    for key in ("arch", "method", "window"):
        if config.get(key) is not None:
            spec[key] = config[key]
    if config.get("hidden_dim") is not None:
        spec["hidden_dim"] = config["hidden_dim"]
    return spec


def convert_state_dict(sd: Dict[str, np.ndarray], template: Dict[str, Any],
                       key_map: Dict[Path, Source]) -> Dict[str, Any]:
    """Fill a flax variable template from a torch state_dict.

    Every template leaf must be covered by key_map and present in sd (shape-
    checked); every unmapped sd key must be a known skippable buffer —
    anything else raises so partial imports can't pass silently.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    leaf_paths = [tuple(getattr(k, "key", getattr(k, "name", k)) for k in path)
                  for path, _ in flat]

    used: set = set()
    out: Dict[Path, np.ndarray] = {}
    missing = []
    for path, leaf in zip(leaf_paths, (l for _, l in flat)):
        if path not in key_map:
            missing.append(path)
            continue
        src_key, fn = key_map[path]
        if src_key not in sd:
            missing.append(path)
            continue
        arr = fn(np.asarray(sd[src_key], dtype=np.float32))
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"{'/'.join(path)}: converted {src_key} has shape {arr.shape},"
                f" expected {tuple(leaf.shape)}")
        out[path] = arr
        used.add(src_key)
    if missing:
        raise ValueError(
            "unmapped/absent template leaves (arch/method mismatch?): "
            + ", ".join("/".join(p) for p in missing[:8]))

    extra = [k for k in sd if k not in used
             and not k.endswith(_SKIP_SUFFIXES)]
    if extra:
        raise ValueError(f"torch keys with no destination: {extra[:8]}")

    result: Dict[str, Any] = {}
    for path, arr in out.items():
        node = result
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = arr
    return result


def import_torch_checkpoint(payload: Any, *, window: Optional[int] = None,
                            overrides: Optional[Dict[str, Any]] = None):
    """torch payload -> (ExperimentConfig, variables, meta).

    ``window`` is required when the checkpoint's config dict doesn't record it
    (the transformer decoder bakes seq_len = window, vqvae.py:570).
    """
    from ..config import make_experiment
    from ..models import init_model
    import jax

    sd, meta = split_payload(payload)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    spec = sniff_spec(sd, meta["config"])
    if window is not None:
        spec["window"] = window
    if "window" not in spec:
        raise ValueError(
            "window not recorded in the checkpoint config; pass window=")

    arch, method = spec.pop("arch"), spec.pop("method")
    win = spec.pop("window")
    model_kwargs = dict(spec)
    model_kwargs.update(overrides or {})
    # reference forward semantics: no bounded FSQ / LFQ pre-sign norm (this
    # repo's training-time improvements; a torch checkpoint predates them)
    model_kwargs.setdefault("fsq_bounded", False)
    model_kwargs.setdefault("lfq_norm", False)
    mode = (meta["config"].get("mode") or "teacher") if meta["config"] else "teacher"
    exp = make_experiment(arch, method, window=int(win), mode=mode, **model_kwargs)

    _, template = init_model(exp.model, jax.random.key(0))
    key_map = build_key_map(
        arch, method, n_tf_layers=exp.model.n_tf_layers,
        n_heads=exp.model.n_heads, num_res_layers=exp.model.num_res_layers,
        rvq_layers=exp.model.n_layers)
    variables = convert_state_dict(sd, template, key_map)
    return exp, variables, meta


def load_pth(path: str) -> Any:
    """torch.load with the safe loader first (reference wrapper dicts are
    plain tensors + primitives), pickle fallback only on demand."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints embed a plain config dict; some torch
        # versions still route dicts through pickle. The file is the user's
        # own checkpoint, but surface the downgrade.
        print("[torch_import] weights_only load failed; retrying with "
              "full pickle (trusted-source checkpoints only)")
        return torch.load(path, map_location="cpu", weights_only=False)


# ------------------------------------------------- reverse: export to torch

def _lookup(variables: Dict[str, Any], path: Path) -> np.ndarray:
    node: Any = variables
    for part in path:
        try:
            node = node[part]
        except (KeyError, TypeError):
            raise KeyError(
                f"variables missing {'/'.join(path)} (arch/method mismatch?)")
    return np.asarray(node, dtype=np.float32)


def export_torch_state_dict(variables: Dict[str, Any], arch: str, method: str,
                            *, n_tf_layers: int = 4, n_heads: int = 4,
                            num_res_layers: int = 4,
                            rvq_layers: int = 4) -> Dict[str, np.ndarray]:
    """Our variable tree -> a reference-format torch state_dict (numpy values).

    The exact inverse of the import mapping, so TPU-trained weights run in the
    reference's own torch deployment scripts (export_motion.py loads with
    strict=False, so the buffer constants the reference modules rebuild at
    init — PE tables, FSQ/LFQ index bases — need not be shipped).
    """
    key_map = build_key_map(arch, method, n_tf_layers=n_tf_layers,
                            n_heads=n_heads, num_res_layers=num_res_layers,
                            rvq_layers=rvq_layers)
    sd: Dict[str, np.ndarray] = {}
    for path, (tkey, fn) in key_map.items():
        arr = _lookup(variables, path)
        kind = getattr(fn, "kind", None)
        if kind is None:
            sd[tkey] = _INVERSE[fn](arr)
        elif kind[0] == "outproj":
            d = arr.shape[-1]
            sd[tkey] = np.ascontiguousarray(arr.reshape(d, d).T)
        else:  # ("qkv", slot): merge into the packed in_proj tensor
            slot = kind[1]
            if arr.ndim == 3:   # kernel (d, h, hd) -> rows (d, d)
                d = arr.shape[0]
                part = np.ascontiguousarray(arr.reshape(d, d).T)
            else:               # bias (h, hd) -> (d,)
                d = arr.size
                part = np.ascontiguousarray(arr.reshape(-1))
            buf = sd.setdefault(
                tkey, np.zeros((3 * d,) + part.shape[1:], np.float32))
            buf[slot * d: (slot + 1) * d] = part
    return sd
