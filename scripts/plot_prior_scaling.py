#!/usr/bin/env python
"""Render the prior corpus-scaling curves (docs/ROUND3.md study) to PNG.

Reads abruns/prior_scale/scaling.json (select=train arms) and
abruns/prior_scale_val/scaling.json (select=val arms), merges per take
count (val preferred where both exist — it is the recommended regime at
scale), and draws two panels over the take-count axis:

  left  — grouped-val CE at epoch 0 and at its best epoch, vs the uniform
          floor (log-vocab mean of the 5 code streams = 6.37 nats);
  right — held-out prompted-continuation truth-MSE (mean over offsets) vs
          the per-arm retrieval floor (real val windows' nn distance to the
          train bank) and the frozen-tokenizer recon floor.

Style follows bridgerl_tpu/eval/plots.py (same validated palette/ink/grid).

    python scripts/plot_prior_scaling.py          # -> plots/prior_scaling.png
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from bridgerl_tpu.eval.plots import GRID, INK, INK_2, PALETTE  # noqa: E402

UNIFORM_CE = 6.37  # mean log-vocab over the 5 hybrid code streams


def load_arms(repo: Path) -> dict:
    arms: dict = {}
    # same frozen K4 teacher everywhere (chain_scaling_val.sh, queue_r3/r4
    # specs) -> one take-count axis; select=val dirs load last and win ties
    # (prior_scale2's takes640 replicates prior_scale_val's: CE 4.001/4.00)
    for sub in ("prior_scale", "prior_scale_val", "prior_scale2"):
        f = repo / "abruns" / sub / "scaling.json"
        if f.exists():
            for k, v in json.loads(f.read_text()).items():
                n = k.removeprefix("takes")
                if not n.isdigit():
                    continue  # tagged arms (capacity/ss variants) aren't
                    # points on the take-count axis
                arms[int(n)] = v
    return dict(sorted(arms.items()))


def main() -> None:
    repo = Path(__file__).resolve().parents[1]
    arms = load_arms(repo)
    if len(arms) < 2:
        raise SystemExit("need >=2 scaling arms in abruns/prior_scale*/scaling.json")

    takes = np.array(list(arms.keys()))
    ce0 = [a["val_ce_epoch0"] for a in arms.values()]
    ce_best = [a["val_ce_best"] for a in arms.values()]
    truth = [float(np.mean(a["prompted_val_P8"]["truth_mse_by_offset"]))
             for a in arms.values()]
    nn_floor = [a["val_nn_floor"] for a in arms.values()]
    recon_floor = [a["recon_floor"] for a in arms.values()]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.4, 4.0), dpi=140)
    for ax in (ax1, ax2):
        ax.set_xscale("log", base=2)
        ax.set_xticks(takes, [str(t) for t in takes])
        ax.set_xlabel("training takes (log2)", color=INK_2)
        ax.grid(True, color=GRID, linewidth=0.7)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=INK_2)

    c_main, c_alt = PALETTE[0], PALETTE[1]
    ax1.plot(takes, ce0, "o--", color=c_alt, lw=2, ms=7, label="epoch 0")
    ax1.plot(takes, ce_best, "o-", color=c_main, lw=2, ms=7, label="best epoch")
    ax1.axhline(UNIFORM_CE, color=INK_2, lw=1.2, ls=":")
    ax1.text(takes[0], UNIFORM_CE + 0.08, "uniform (6.37)", color=INK_2, fontsize=8)
    ax1.set_ylabel("grouped-val CE (nats)", color=INK)
    ax1.set_title("generalization onset", color=INK, fontsize=11)
    ax1.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    ax2.plot(takes, truth, "o-", color=c_main, lw=2, ms=7,
             label="generated continuation")
    ax2.plot(takes, nn_floor, ":", color=INK_2, lw=1.2)
    ax2.text(takes[-1], nn_floor[-1] - 0.028, "retrieval floor\n(val nn to train bank)",
             color=INK_2, fontsize=8, ha="right", va="top")
    ax2.plot(takes, recon_floor, ":", color=INK_2, lw=1.2)
    ax2.text(takes[-2], recon_floor[-1] + 0.008, "tokenizer recon floor",
             color=INK_2, fontsize=8, ha="center")
    ax2.set_ylabel("held-out truth-MSE (prompted P=8)", color=INK)
    ax2.set_title("held-out continuation error", color=INK, fontsize=11)
    ax2.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    fig.suptitle("Motion-token prior: corpus scaling (frozen K4 tokenizer, ar_ph4)",
                 color=INK, fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    out = repo / "plots" / "prior_scaling.png"
    out.parent.mkdir(exist_ok=True)
    fig.savefig(out)
    print(f"[INFO] wrote {out}")


if __name__ == "__main__":
    main()
