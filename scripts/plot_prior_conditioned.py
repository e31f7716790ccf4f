#!/usr/bin/env python
"""Render the action-conditioned prior scaling ladder to PNG.

Reads abruns/prior_cond/conditioned.json (scripts/exp_prior_conditioned.py)
and draws two panels over the takes-per-class axis:

  left  — conditioned vs unconditioned grouped-val CE (the gap is the
          conditioning information gain in nats on held-out takes);
  right — held-out prior-as-classifier accuracy (argmin-CE over class
          tokens) and code-space histogram match of conditioned samples,
          vs the 1/7 chance floor.

Style follows bridgerl_tpu/eval/plots.py (same validated palette/ink/grid).

    python scripts/plot_prior_conditioned.py   # -> plots/prior_conditioned.png
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


def main() -> None:
    repo = Path(__file__).resolve().parents[1]
    f = repo / "abruns" / "prior_cond" / "conditioned.json"
    data = json.loads(f.read_text())
    arms = {int(k.removeprefix("perclass")): v for k, v in data.items()
            if k.removeprefix("perclass").isdigit()}
    arms = dict(sorted(arms.items()))
    if len(arms) < 2:
        raise SystemExit("need >=2 arms in abruns/prior_cond/conditioned.json")

    per = np.array(list(arms.keys()))
    cond = [a["cond_val_ce_best"] for a in arms.values()]
    uncond = [a["uncond_val_ce_best"] for a in arms.values()]
    acc_val = [a["classifier_accuracy_val"] for a in arms.values()]
    acc_tr = [a["classifier_accuracy_train"] for a in arms.values()]
    hist = [a["histogram_match"]["accuracy"] for a in arms.values()]
    n_cls = max(a["histogram_match"]["n_classes"] for a in arms.values())

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.4, 4.0), dpi=140)
    for ax in (ax1, ax2):
        ax.set_xscale("log", base=2)
        ax.set_xticks(per, [str(t) for t in per])
        ax.set_xlabel("labeled takes per class (log2)", color=INK_2)
        ax.grid(True, color=GRID, linewidth=0.7)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=INK_2)

    c_main, c_alt, c_3 = PALETTE[0], PALETTE[1], PALETTE[2]
    ax1.plot(per, uncond, "o--", color=c_alt, lw=2, ms=7, label="unconditioned")
    ax1.plot(per, cond, "o-", color=c_main, lw=2, ms=7, label="class-conditioned")
    ax1.set_ylabel("grouped-val CE (nats)", color=INK)
    ax1.set_title("conditioning information gain", color=INK, fontsize=11)
    ax1.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    ax2.plot(per, acc_val, "o-", color=c_main, lw=2, ms=7,
             label="classifier (held-out takes)")
    ax2.plot(per, acc_tr, "o--", color=c_alt, lw=1.6, ms=5,
             label="classifier (train takes)")
    ax2.plot(per, hist, "s-", color=c_3, lw=2, ms=6,
             label="sample histogram match")
    ax2.axhline(1.0 / n_cls, color=INK_2, lw=1.2, ls=":")
    ax2.text(per[0], 1.0 / n_cls + 0.02, f"chance (1/{n_cls})",
             color=INK_2, fontsize=8)
    ax2.set_ylim(0, 1.05)
    ax2.set_ylabel("accuracy", color=INK)
    ax2.set_title("what the class token encodes", color=INK, fontsize=11)
    ax2.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    fig.suptitle("Action-conditioned motion-token prior: labeled-corpus "
                 "scaling (frozen K4 tokenizer)", color=INK, fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    out = repo / "plots" / "prior_conditioned.png"
    out.parent.mkdir(exist_ok=True)
    fig.savefig(out)
    print(f"[INFO] wrote {out}")


if __name__ == "__main__":
    main()
