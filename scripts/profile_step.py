#!/usr/bin/env python
"""Profile the flagship training step: jax.profiler trace + compiled cost
analysis. Run on an otherwise-idle chip; feeds the round-2 perf work."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--attn_packing", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--trace_dir", type=str, default=None,
                   help="jax.profiler trace output dir (optional)")
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train import (TrainState, make_optimizer,
                                    make_train_epoch, split_variables)

    exp = make_experiment("transformer", "hybrid", window=10, mode="teacher",
                          batch_size=args.batch, compute_dtype=args.dtype,
                          attn_packing=args.attn_packing, dropout=args.dropout)
    model, variables = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(variables)
    tx = make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))

    n = args.batch
    robot = jax.random.normal(jax.random.key(1), (n, 10, 29), jnp.float32)
    human = jax.random.normal(jax.random.key(2), (n, 10, 126), jnp.float32)
    idx = jnp.arange(n).reshape(1, n)
    keys = jax.random.split(jax.random.key(3), 1)

    fn = make_train_epoch(model, tx, exp, mesh=None, jit=False)
    jfn = jax.jit(fn)  # no donation: we re-call with the same state

    lowered = jfn.lower(state, robot, human, idx, keys)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        print(f"[cost] flops/step={flops:.3e} bytes/step={bytes_:.3e} "
              f"arith_intensity={flops / max(bytes_, 1):.1f} flop/byte")
        print(f"[cost] per window: {flops / args.batch:.3e} flops, "
              f"{bytes_ / args.batch:.3e} bytes")
    except Exception as e:
        print(f"[cost] cost_analysis unavailable: {e}")

    # timed steps (host-fetch sync per call; see bench.py note)
    import time
    state2, logs = jfn(state, robot, human, idx, keys)
    float(logs["train_loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        _, logs = jfn(state, robot, human, idx, keys)
        float(logs["train_loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"[time] {dt * 1e3:.2f} ms/step -> {args.batch / dt:,.0f} windows/s")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(2):
                _, logs = jfn(state, robot, human, idx, keys)
                float(logs["train_loss"])
        print(f"[trace] written to {args.trace_dir}")


if __name__ == "__main__":
    main()
