#!/usr/bin/env python
"""Generative-stack throughput: motions/s/chip for the frozen generation
program (prior sampling + code decode + VQ decoder + overlap-add as ONE
jitted graph — train/prior.make_generation_fn), unguided vs
overlap-consistency guided (g8) vs guided+dyn.

The quality flagship's training perf is covered by bench_quality.py; this
covers the serving-side question the guided-sampling adoption raises: what
does best-of-N candidate decoding cost per generated motion? Guided decodes
candidates x positions windows in-graph, so the expected slowdown is ~Nx on
the decoder part of the step.

    python scripts/bench_generation.py \
        --ckpt abruns/k4/checkpoints/..._best.ckpt \
        --prior abruns/prior_scale2/prior_takes1280.ckpt

Prints one JSON line per arm; block-per-call timing (tunneled-TPU rule).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--prior", required=True)
    p.add_argument("--num", type=int, default=32, help="motions per call")
    p.add_argument("--positions", type=int, default=32)
    p.add_argument("--reps", type=int, default=4, help="timed calls per arm")
    p.add_argument("--out", default="abruns/bench_generation.json")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from bridgerl_tpu.export.motion_export import load_model_from_checkpoint
    from bridgerl_tpu.train.prior import (
        load_prior_checkpoint,
        make_generation_fn,
    )

    model, variables, exp = load_model_from_checkpoint(args.ckpt)
    prior_model, prior_vars, pcfg = load_prior_checkpoint(args.prior)
    mean = np.zeros(1, np.float32)
    std = np.ones(1, np.float32)

    arms = {
        "unguided": dict(guide_candidates=0),
        "guided_g8": dict(guide_candidates=8),
        "guided_g8_dyn": dict(guide_candidates=8, guide_dyn=0.2),
    }
    frames = pcfg.stride * (args.positions - 1) + pcfg.window
    results = {}
    for name, kw in arms.items():
        gen = jax.jit(make_generation_fn(
            model, variables, exp, prior_model, prior_vars, mean, std,
            n_positions=args.positions, n_samples=args.num, **kw))
        key = jax.random.key(0)
        t0 = time.time()
        jax.block_until_ready(gen(key))           # compile + warm
        compile_s = time.time() - t0
        times = []
        for r in range(args.reps):
            key = jax.random.fold_in(key, r)
            t0 = time.time()
            jax.block_until_ready(gen(key))       # block EVERY call
            times.append(time.time() - t0)
        dt = float(np.median(times))
        row = {
            "arm": name, "motions_per_sec_per_chip": round(args.num / dt, 2),
            "frames_per_sec_per_chip": round(args.num * frames / dt, 1),
            "batch": args.num, "positions": args.positions,
            "frames_per_motion": frames,
            "median_call_s": round(dt, 4), "compile_s": round(compile_s, 1),
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        results = {**json.loads(out.read_text()), **results}
    out.write_text(json.dumps(results, indent=1))
    print(f"[INFO] bench_generation -> {out}", flush=True)


if __name__ == "__main__":
    main()
