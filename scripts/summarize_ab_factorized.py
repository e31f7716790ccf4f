#!/usr/bin/env python
"""Summarize the factorized ref-exact A/B (abruns/ab3/{arm}) into the
per-flag delta table for docs/REF_EXACT.md (round-2 VERDICT item 1).

Each arm trained the flagship transformer+hybrid teacher on the pinned dense
W10 set, batch 1024, f32, seeds {42, 1024}. Reported per arm: mean-over-seeds
best/final val_recon, final FSQ PPL (unique-code count — also the latent-
spread signal for VERDICT item 2), final val_vel, and the delta vs the
default arm.
"""

import glob
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARMS = ("default", "torch_init", "cold_ema", "ref_vel", "ref_exact")


def summarize(run_dir: str):
    logs = sorted(glob.glob(f"{run_dir}/results/log_transformer_hybrid_seed_*.json"))
    if not logs:
        return None
    per_seed = []
    for lp in logs:
        d = json.load(open(lp))
        v, p = d.get("val_recon", []), d.get("perplexity", [])
        vel = d.get("val_vel", [])
        if not v:
            continue
        per_seed.append({
            "seed": lp.rsplit("_seed_", 1)[1].split(".")[0],
            "epochs": len(v),
            "best": float(min(v)),
            "final": float(np.mean(v[-5:])),
            "ppl": float(np.mean(p[-5:])) if p else float("nan"),
            "vel": float(np.mean(vel[-5:])) if vel else float("nan"),
        })
    if not per_seed:
        return None
    return {
        "n_seeds": len(per_seed),
        "epochs": min(r["epochs"] for r in per_seed),
        "best": float(np.mean([r["best"] for r in per_seed])),
        "final": float(np.mean([r["final"] for r in per_seed])),
        "ppl": float(np.mean([r["ppl"] for r in per_seed])),
        "vel": float(np.mean([r["vel"] for r in per_seed])),
        "per_seed": per_seed,
    }


def main():
    rows = {arm: summarize(f"abruns/ab3/{arm}") for arm in ARMS}
    base = rows.get("default")
    print("| arm | seeds | epochs | best val_recon | final val_recon | "
          "Δbest vs default | final PPL | final val_vel |")
    print("|---|---|---|---|---|---|---|---|")
    for arm in ARMS:
        r = rows[arm]
        if r is None:
            print(f"| {arm} | — | — | — | — | — | — | — |")
            continue
        delta = ""
        if base and arm != "default":
            delta = f"{(r['best'] - base['best']) / base['best'] * 100:+.1f}%"
        print(f"| {arm} | {r['n_seeds']} | {r['epochs']} | {r['best']:.4g} "
              f"| {r['final']:.4g} | {delta} | {r['ppl']:.1f} | {r['vel']:.4g} |")
    print()
    print(json.dumps({a: ({k: v for k, v in r.items() if k != "per_seed"}
                          if r else None) for a, r in rows.items()}, indent=1))


if __name__ == "__main__":
    main()
