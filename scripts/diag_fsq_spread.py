#!/usr/bin/env python
"""Diagnose the FSQ latent-spread drift (round-2 VERDICT weak #2 / item 2).

The reference's FSQ publishes DCR == 0.0 with unique codes ~1.36x the nominal
prod(8,5,5,5)=1000 grid (README.md:356); round-2 runs here sit at ~4.2-4.6x
(dcr -3.2/-3.6). Both implementations round an UNBOUNDED projection
(reference models/vqvae.py:118-122 — no tanh), so the spread is set by the
learned scale of `project_in(z_e)`. This script measures, for a trained
checkpoint:

  - per-level min/max/std of the pre-round projection zp
  - the occupied integer range per level vs the nominal level count
  - unique-code count vs nominal capacity
  - the robot-encoder z_e scale feeding the quantizer

Runs on CPU from a saved checkpoint + processed data dir.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train.checkpoint import load_checkpoint, restore_variables

    ck = load_checkpoint(args.ckpt)
    exp = ck["config"]
    cfg = exp.model
    print(f"ckpt: {args.ckpt}\narch={cfg.arch} method={cfg.method} "
          f"W={cfg.window_size} torch_init={cfg.torch_init}")

    model, template = init_model(cfg, jax.random.key(0))
    variables = restore_variables(template, ck["variables"])

    # only the robot windows are needed; mmap and slice the first batch
    import os
    g1 = np.load(os.path.join(args.data_dir, "g1_train.npy"), mmap_mode="r")
    x = jnp.asarray(np.array(g1[: args.batch], np.float32))

    # encoder output feeding the quantizer
    z_e = model.apply(variables, x, train=False,
                      method=lambda m, xr, train: m.robot_encoder(xr, train=train))
    z = np.asarray(z_e, np.float32)
    print(f"\nz_e: shape={z.shape} std={z.std():.3f} "
          f"absmax={np.abs(z).max():.2f} mean={z.mean():+.3f}")

    # FSQ projection (hybrid: quantizer/fsq; fsq: quantizer)
    qp = variables["params"]["quantizer"]
    fsq = qp.get("fsq", qp)
    kin = np.asarray(fsq["project_in"]["kernel"], np.float32)
    bin_ = np.asarray(fsq["project_in"]["bias"], np.float32)
    zp = z.reshape(-1, z.shape[-1]) @ kin + bin_
    levels = list(cfg.fsq_levels)
    nominal = int(np.prod(levels))
    zr = np.round(zp)

    print(f"\nproject_in kernel scale: std={kin.std():.4f} (fan_in={kin.shape[0]})")
    print(f"{'lvl':>4} {'nominal':>8} {'zp_std':>8} {'zp_min':>8} {'zp_max':>8} "
          f"{'occ_int_range':>14} {'occupied/nominal':>17}")
    occupied = []
    for d, L in enumerate(levels):
        vals = np.unique(zr[:, d])
        occ = len(vals)
        occupied.append(occ)
        print(f"{L:>4} {L:>8} {zp[:, d].std():>8.2f} {zp[:, d].min():>8.2f} "
              f"{zp[:, d].max():>8.2f} {occ:>14d} {occ / L:>17.2f}")

    basis = np.array([int(np.prod(levels[:i])) for i in range(len(levels))], np.float32)
    idx = (zr * basis).sum(-1).astype(np.int64)
    uniq = len(np.unique(idx))
    print(f"\nunique codes: {uniq} / nominal {nominal} = {uniq / nominal:.2f}x "
          f"(reference class: 1.36x, README.md:356)")
    print(f"product of occupied per-level ranges: {int(np.prod(occupied))}")
    print(json.dumps({"uniq": uniq, "nominal": nominal,
                      "ratio": round(uniq / nominal, 3),
                      "z_e_std": round(float(z.std()), 4),
                      "zp_std": [round(float(zp[:, d].std()), 3) for d in range(len(levels))]}))


if __name__ == "__main__":
    main()
