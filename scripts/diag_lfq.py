#!/usr/bin/env python
"""Diagnose the LFQ collapse (round-2 VERDICT weak #3 / item 3).

Round-2 LFQ runs: PPL 406 -> 46 of 1024, recon plateaus at 0.311 (~= the
variance of the raw joint data, i.e. mean-prediction), vs the reference's
PPL 164.2 / recon 4.8x-best (README.md:357). Hypotheses measured here:

  H1 frozen bits: the per-bit pre-sign projection z_e has |mean| >> std for
     most bits, so sign() is constant -> few unique codes (PPL 46 ~ 2^5.5
     suggests ~5-6 live bits of 10).
  H2 saturated entropy gradient: the entropy regularizer's gradient
     sigmoid'(z) ~ 0 for |z| >> 0, so frozen bits receive no revival signal.
  H3 low latent information: binarization destroys most of z_e's variance
     (compare z_q reconstruction of z_e by the codebook's least squares).

Outputs per-bit mean/std/flip-rate, unique-code count, entropy-gradient
magnitude, and the fraction of z_e variance expressible through the 10-bit
bottleneck. CPU, loads only robot windows.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_dir", default="data/dense_w64")
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train.checkpoint import load_checkpoint, restore_variables

    ck = load_checkpoint(args.ckpt)
    cfg = ck["config"].model
    print(f"ckpt: {args.ckpt}\narch={cfg.arch} method={cfg.method} W={cfg.window_size}")

    model, template = init_model(cfg, jax.random.key(0))
    variables = restore_variables(template, ck["variables"])

    import os
    g1 = np.load(os.path.join(args.data_dir, "g1_train.npy"), mmap_mode="r")
    x = jnp.asarray(np.array(g1[: args.batch], np.float32))

    z_e = model.apply(variables, x, train=False,
                      method=lambda m, xr, train: m.robot_encoder(xr, train=train))
    z = np.asarray(z_e, np.float32)
    print(f"z_e: shape={z.shape} std={z.std():.3f} mean={z.mean():+.3f}")

    qp = variables["params"]["quantizer"]
    kin = np.asarray(qp["project_in"]["kernel"], np.float32)
    bin_ = np.asarray(qp["project_in"]["bias"], np.float32)
    zp = z.reshape(-1, z.shape[-1]) @ kin + bin_  # (N, bits) pre-sign
    bits = zp > 0

    print(f"\n{'bit':>4} {'mean':>8} {'std':>8} {'|m|/std':>8} {'p(+1)':>7} "
          f"{'H(bit)':>7} {'|dH/dz|':>9}")
    live = 0
    for b in range(zp.shape[1]):
        m, s = zp[:, b].mean(), zp[:, b].std()
        pb = bits[:, b].mean()
        h = 0.0 if pb in (0.0, 1.0) else -(pb * np.log2(pb) + (1 - pb) * np.log2(1 - pb))
        sig = 1 / (1 + np.exp(-zp[:, b]))
        # d(-H)/dz = z * sigmoid'(z)-ish magnitude proxy: sigmoid'(z)
        grad = (sig * (1 - sig)).mean()
        alive = 0.02 < pb < 0.98
        live += alive
        print(f"{b:>4} {m:>8.2f} {s:>8.2f} {abs(m)/max(s,1e-9):>8.2f} {pb:>7.3f} "
              f"{h:>7.3f} {grad:>9.4f} {'' if alive else '  FROZEN'}")

    basis = 2 ** np.arange(zp.shape[1])
    idx = (bits.astype(np.int64) * basis).sum(-1)
    uniq = len(np.unique(idx))
    print(f"\nlive bits: {live}/{zp.shape[1]}  unique codes: {uniq}/1024 "
          f"(2^live = {2**live})")

    # H3: variance of z_e recoverable from the binary code via least squares
    zq = np.where(bits, 1.0, -1.0).astype(np.float32)
    zf = z.reshape(-1, z.shape[-1])
    A = np.concatenate([zq, np.ones((len(zq), 1), np.float32)], 1)
    W, *_ = np.linalg.lstsq(A, zf, rcond=None)
    resid = zf - A @ W
    evr = 1.0 - resid.var() / zf.var()
    print(f"z_e variance expressible through the 10-bit code (lstsq): {evr:.3f}")


if __name__ == "__main__":
    main()
