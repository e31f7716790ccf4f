#!/usr/bin/env python
"""Summarize the ref-exact A/B arms (abruns/{default,ref_exact}) and the bf16
arm (abruns/bf16) into markdown rows for docs/REF_EXACT.md / BENCH notes."""

import glob
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def summarize(run_dir: str):
    logs = sorted(glob.glob(f"{run_dir}/results/log_*teacher*.json")) or \
        sorted(glob.glob(f"{run_dir}/results/log_*.json"))
    if not logs:
        return None
    d = json.load(open(logs[0]))
    v, p = d.get("val_recon", []), d.get("perplexity", [])
    if not v:
        return None
    ppl1_epochs = sum(1 for x in p if x <= 1.5)
    return {
        "run": run_dir,
        "epochs": len(v),
        "final_val_recon": float(np.mean(v[-5:])),
        "best_val_recon": float(min(v)),
        "final_ppl": float(np.mean(p[-5:])) if p else float("nan"),
        "epochs_at_ppl_1": ppl1_epochs,
    }


def main():
    rows = [summarize(f"abruns/{arm}") for arm in ("default", "ref_exact", "bf16")]
    print("| arm | epochs | best val_recon | final val_recon | final PPL | epochs at PPL<=1.5 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if r is None:
            continue
        print(f"| {r['run'].split('/')[-1]} | {r['epochs']} | {r['best_val_recon']:.4g} "
              f"| {r['final_val_recon']:.4g} | {r['final_ppl']:.1f} | {r['epochs_at_ppl_1']} |")


if __name__ == "__main__":
    main()
