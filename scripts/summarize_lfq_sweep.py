#!/usr/bin/env python
"""Summarize the LFQ sweep arms (abruns/lfq/{arm}) — round-2 VERDICT item 3."""

import glob
import json
import sys

import numpy as np

ARMS = ("base", "norm", "ent0", "ent5", "norm_ent0", "lecun",
        # pre-defaults-flip arm names (round-3 A/B flipped torch_init on by
        # default, so the tinit arms folded into base/norm):
        "tinit", "norm_tinit")


def summarize(run_dir: str):
    logs = sorted(glob.glob(f"{run_dir}/results/log_resnet_lfq_seed_*.json"))
    if not logs:
        return None
    d = json.load(open(logs[0]))
    v, p, e = d.get("val_recon", []), d.get("perplexity", []), d.get("train_vq_loss", [])
    if not v:
        return None
    return {
        "epochs": len(v),
        "best": float(min(v)),
        "final": float(np.mean(v[-5:])),
        "ppl": float(np.mean(p[-5:])) if p else float("nan"),
        "ent_final": float(np.mean(e[-5:])) if e else float("nan"),
    }


def main():
    print("| arm | epochs | best val_recon | final val_recon | final PPL | "
          "final entropy loss |")
    print("|---|---|---|---|---|---|")
    rows = {}
    for arm in ARMS:
        r = summarize(f"abruns/lfq/{arm}")
        rows[arm] = r
        if r is None:
            print(f"| {arm} | — | — | — | — | — |")
        else:
            print(f"| {arm} | {r['epochs']} | {r['best']:.4g} | {r['final']:.4g} "
                  f"| {r['ppl']:.1f} | {r['ent_final']:.4f} |")
    print()
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
