#!/usr/bin/env python
"""Export a bridgerl .ckpt as a reference-format PyTorch checkpoint (.pth).

The reverse of scripts/import_torch_ckpt.py: TPU-trained weights packaged so
the reference repo's own torch consumers (export_motion.py, Isaac deployment,
analyze_latent_space.py) load them directly — they use strict=False loads and
rebuild constant buffers (PE tables, FSQ/LFQ bases) at module init, so only
the learned tensors travel:

    python scripts/export_torch_ckpt.py --ckpt checkpoints/..._best.ckpt \
        --out exported_for_torch.pth
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="bridgerl .ckpt path")
    p.add_argument("--out", required=True, help="output .pth path")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # honors BRIDGERL_PLATFORM=cpu

    import jax
    import torch

    from bridgerl_tpu.export.torch_import import export_torch_state_dict
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train.checkpoint import load_checkpoint, restore_variables

    ck = load_checkpoint(args.ckpt)
    if ck["config"] is None:
        raise SystemExit("checkpoint has no embedded config; cannot export")
    exp = ck["config"]
    m = exp.model
    if getattr(m, "tf_tokens", 1) != 1:
        # the weights would map, but the reference model always mean-pools to
        # ONE token (vqvae.py:458) — a K>1 checkpoint run through the torch
        # modules would silently compute different semantics
        raise SystemExit(
            f"tf_tokens={m.tf_tokens}: multi-token latents have no torch "
            f"counterpart in the reference; only tf_tokens=1 exports")
    _, template = init_model(m, jax.random.key(0))
    variables = restore_variables(template, ck["variables"])

    sd = export_torch_state_dict(
        variables, m.arch, m.method, n_tf_layers=m.n_tf_layers,
        n_heads=m.n_heads, num_res_layers=m.num_res_layers,
        rvq_layers=m.n_layers)
    payload = {
        "epoch": ck["epoch"],
        "model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
        "optimizer_state_dict": {},
        "best_loss": ck["best_loss"],
        # the dict shape the reference's train driver embeds
        # (train_ablation.py:276-284, 399-418)
        "config": {"arch": m.arch, "method": m.method,
                   "window": m.window_size, "mode": exp.train.mode,
                   "hidden_dim": m.hidden_dim, "id": exp.id, "name": exp.name},
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    torch.save(payload, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors, {m.arch}+{m.method} "
          f"W{m.window_size})")


if __name__ == "__main__":
    main()
