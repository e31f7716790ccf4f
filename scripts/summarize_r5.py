#!/usr/bin/env python
"""Round-5 evidence tables: seed replication + dynamics A/B summaries.

Reads abruns/prior_scale2/scaling.json (ladder + tagged replication arms)
and abruns/prior_dynamics/dynamics.json (energy-tilt A/B) and prints the
markdown tables for docs/ROUND5.md, with verdicts judged against the
measured trainer-seed yardstick (CE std ~0.125 nats, docs/ROUND4.md).

    python scripts/summarize_r5.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

YARDSTICK_CE_STD = 0.125  # nats, trainer-seed noise (docs/ROUND4.md)


def fmt_stats(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.3f}"
    return (f"{np.mean(vals):.3f} ± {np.std(vals):.3f} "
            f"(n={len(vals)}: {', '.join(f'{v:.3f}' for v in vals)})")


def pick(rep, *path):
    for k in path:
        if rep is None:
            return None
        rep = rep.get(k)
    return rep


def truth_mean(rep):
    c = pick(rep, "prompted_val_P8", "truth_mse_by_offset")
    return float(np.mean(c)) if c else None


def main():
    repo = Path(__file__).resolve().parents[1]
    scaling = json.loads(
        (repo / "abruns/prior_scale2/scaling.json").read_text())
    dyn_path = repo / "abruns/prior_dynamics/dynamics.json"
    dynamics = json.loads(dyn_path.read_text()) if dyn_path.exists() else {}

    def arm(key):
        return scaling.get(key)

    def dyn(key):
        return dynamics.get(key)

    # ---------------- ss25 replication (takes640, select=val) ----------
    print("## ss25 replication (takes640, select=val, 3 trainer seeds)\n")
    groups = {
        "control": ["takes640", "takes640_s43", "takes640_s44"],
        "ss25": ["takes640_ss25", "takes640_ss25_s43", "takes640_ss25_s44"],
    }
    rows = {}
    for name, keys in groups.items():
        reps = [arm(k) for k in keys]
        rows[name] = {
            "ce": [pick(r, "val_ce_best") for r in reps],
            "vel": [pick(r, "free_run", "vel_ratio") for r in reps],
            "truth": [truth_mean(r) for r in reps],
            "nn": [pick(r, "prompted_val_P8", "nn_mse_by_offset") for r in reps],
        }
    print("| arm | grouped-val CE | free vel | held-out truth-MSE (mean) |")
    print("|---|---|---|---|")
    for name, d in rows.items():
        print(f"| {name} | {fmt_stats(d['ce'])} | {fmt_stats(d['vel'])} | "
              f"{fmt_stats(d['truth'])} |")
    ce_c = [v for v in rows["control"]["ce"] if v is not None]
    ce_s = [v for v in rows["ss25"]["ce"] if v is not None]
    tr_c = [v for v in rows["control"]["truth"] if v is not None]
    tr_s = [v for v in rows["ss25"]["truth"] if v is not None]
    if len(ce_c) >= 2 and len(ce_s) >= 2:
        dce = np.mean(ce_s) - np.mean(ce_c)
        dtr = ((np.mean(tr_s) - np.mean(tr_c)) / np.mean(tr_c) * 100
               if tr_c and tr_s else float("nan"))
        print(f"\nCE delta (ss25 - control): {dce:+.3f} nats "
              f"({abs(dce) / YARDSTICK_CE_STD:.1f} sigma of the 0.125 "
              f"yardstick); truth-MSE delta {dtr:+.1f}%\n")

    # ---------------- do30 replication (takes1280) ---------------------
    print("## do30 replication (takes1280, select=val, 3 trainer seeds)\n")
    do10 = [arm("takes1280"), dyn("lam0_seed43"), arm("takes1280_s44")]
    do30 = [arm("takes1280_do30"), arm("takes1280_do30_s43"),
            arm("takes1280_do30_s44")]
    print("| arm | grouped-val CE | free vel | held-out truth-MSE (mean) |")
    print("|---|---|---|---|")
    for name, reps in [("do 0.1", do10), ("do 0.3", do30)]:
        ce = [pick(r, "val_ce_best") for r in reps]
        vel = [pick(r, "free_run", "vel_ratio")
               or pick(r, "free_unguided", "vel_ratio") for r in reps]
        tr = [truth_mean(r) for r in reps]
        print(f"| {name} | {fmt_stats(ce)} | {fmt_stats(vel)} | "
              f"{fmt_stats(tr)} |")
    ce10 = [pick(r, "val_ce_best") for r in do10 if r]
    ce30 = [pick(r, "val_ce_best") for r in do30 if r]
    if len(ce10) >= 2 and len(ce30) >= 2:
        d = np.mean(ce30) - np.mean(ce10)
        print(f"\nCE delta (do30 - do10): {d:+.3f} nats "
              f"({abs(d) / YARDSTICK_CE_STD:.1f} sigma)\n")

    # ---------------- energy-tilt dynamics A/B -------------------------
    if dynamics:
        print("## Energy-tilt dynamics A/B (takes1280, g8+dyn0.2 policy)\n")
        print("| arm | val CE | guided vel | guided overlap | unguided vel "
              "| truth-MSE (mean) |")
        print("|---|---|---|---|---|---|")
        for key in sorted(dynamics):
            r = dynamics[key]
            print(f"| {key} | {r['val_ce_best']:.3f} "
                  f"| {pick(r, 'free_guided', 'vel_ratio'):.3f} "
                  f"| {pick(r, 'free_guided', 'overlap_disagreement'):.3f} "
                  f"| {pick(r, 'free_unguided', 'vel_ratio'):.3f} "
                  f"| {truth_mean(r):.3f} |")
        lam_vals = sorted({r["lam"] for r in dynamics.values()})
        for metric, path in [("guided vel", ("free_guided", "vel_ratio")),
                             ("guided overlap",
                              ("free_guided", "overlap_disagreement")),
                             ("val CE", ("val_ce_best",))]:
            parts = []
            for lam in lam_vals:
                vals = [pick(r, *path) for r in dynamics.values()
                        if r["lam"] == lam]
                parts.append(f"lam{lam:g}: {fmt_stats(vals)}")
            print(f"- {metric}: " + " | ".join(parts))
        print("\nSuccess band (verdict #3): guided vel >= 0.5 at "
              "overlap <= 0.15.")


if __name__ == "__main__":
    main()
