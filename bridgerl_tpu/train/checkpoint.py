"""Checkpointing: train-state pytrees + config, teacher->student transfer.

Reproduces the reference's checkpoint contract (scripts/train_ablation.py:276-291,
357-364) with JAX-native serialization:

- `{run_name}_last.ckpt` every epoch: {epoch, variables, opt_state, best_loss, config}
- `{run_name}_best.ckpt` on improvement
- `{run_name}_final.ckpt` bare variables at the end
- config travels inside the checkpoint and is recovered by consumers
- teacher->student transfer: drop every `human_encoder` subtree, merge into a
  fresh student, freeze all non-human_encoder params (string key matching in
  the reference, train_ablation.py:167-180; pytree path filtering here).

Format: a single msgpack file written atomically (tmp + rename), holding the
state dict plus the ExperimentConfig JSON. No torch, no pickle.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import numpy as np

from ..config import ExperimentConfig


def _to_host(tree):
    # single batched device->host transfer: per-leaf np.asarray costs one
    # round-trip per leaf, which dominates on tunneled TPU runtimes
    return jax.device_get(tree)


def save_checkpoint(
    path: str,
    *,
    epoch: int,
    variables: Dict[str, Any],
    opt_state: Any = None,
    best_loss: float = float("inf"),
    config: Optional[ExperimentConfig] = None,
    patience_counter: int = 0,
) -> None:
    payload = {
        "epoch": np.int64(epoch),
        "variables": flax.serialization.to_state_dict(_to_host(variables)),
        "opt_state": flax.serialization.to_state_dict(_to_host(opt_state)) if opt_state is not None else {},
        "best_loss": np.float64(best_loss),
        # persisted so a kill/resume cycle early-stops at the same epoch an
        # uninterrupted run would (the counter used to reset to 0 on resume)
        "patience_counter": np.int64(patience_counter),
        "config_json": config.to_json() if config is not None else "",
    }
    data = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    out = {
        "epoch": int(payload["epoch"]),
        "variables": payload["variables"],
        "opt_state": payload["opt_state"],
        "best_loss": float(payload["best_loss"]),
        # absent in pre-round-3 checkpoints: default 0 (the old behavior)
        "patience_counter": int(payload.get("patience_counter", 0)),
        "config": None,
    }
    if payload.get("config_json"):
        out["config"] = ExperimentConfig.from_json(payload["config_json"])
    return out


def restore_variables(template: Dict[str, Any], state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a variables pytree from its state dict using a freshly-initialized
    template (shapes/structure come from the template, values from the dict)."""
    return flax.serialization.from_state_dict(template, state_dict)


def restore_opt_state(template: Any, state_dict: Dict[str, Any]) -> Any:
    return flax.serialization.from_state_dict(template, state_dict)


# ---- teacher -> student transfer ----

def resolve_teacher_ckpt(pattern: str, seed: int) -> str:
    """Per-seed teacher pairing: a literal path is shared by every seed; a
    pattern containing ``{seed}`` resolves per seed — the reference pairs each
    student run with its own seed's teacher checkpoint
    (scripts/train_ablation.py:152-180)."""
    return pattern.format(seed=seed) if "{seed}" in pattern else pattern



def merge_matching_variables(target: Dict[str, Any],
                             source: Dict[str, Any]) -> Dict[str, Any]:
    """Copy every `source` leaf whose path exists in `target` with the same
    shape; everything else keeps the fresh init. Cross-architecture transfer
    init — e.g. an ae-pretrained encoder/decoder into a quantized model whose
    quantizer stays freshly initialized (the round-3 W64-transformer cure:
    pretrain without the quantizer so latents spread, then quantize them).
    `source` is a checkpoint's raw variables state dict."""
    if isinstance(target, dict):
        if not isinstance(source, dict):
            return target
        return {k: (merge_matching_variables(v, source[k]) if k in source else v)
                for k, v in target.items()}
    src = source
    if getattr(src, "shape", None) == tuple(getattr(target, "shape", ())):
        import jax.numpy as jnp
        return jnp.asarray(src, dtype=getattr(target, "dtype", None))
    return target


def is_human_encoder_path(path: Tuple) -> bool:
    return any(getattr(k, "key", getattr(k, "name", None)) == "human_encoder" for k in path)


def merge_teacher_into_student(
    student_vars: Dict[str, Any], teacher_vars: Dict[str, Any]
) -> Dict[str, Any]:
    """Copy every teacher leaf EXCEPT human_encoder subtrees into the student
    (train_ablation.py:172-175). Works across all collections (params,
    batch_stats, qstats)."""

    def merge(path, s_leaf, t_leaf):
        if t_leaf is None or is_human_encoder_path(path):
            return s_leaf
        return t_leaf

    # teacher/student trees share structure (same model config); tolerate
    # teacher missing collections by merging per present collection.
    out = dict(student_vars)
    for col, s_tree in student_vars.items():
        if col in teacher_vars:
            out[col] = jax.tree_util.tree_map_with_path(
                lambda p, s, t: merge(p, s, t), s_tree, teacher_vars[col]
            )
    return out


def trainable_mask(params: Dict[str, Any], mode: str) -> Dict[str, Any]:
    """Per-leaf boolean mask for the optimizer: teacher trains everything;
    student trains only human_encoder (train_ablation.py:177-183)."""
    if mode == "teacher":
        return jax.tree_util.tree_map(lambda _: True, params)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_human_encoder_path(path), params
    )
