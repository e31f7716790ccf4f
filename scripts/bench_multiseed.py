#!/usr/bin/env python
"""Multiseed vmap throughput benchmark (round-2 VERDICT item 5).

Measures aggregate windows/sec/chip of the vmapped S-seed program vs the
single-seed rate of the same config (sequential seed execution has the same
work rate as one seed, so speedup = aggregate_vmap / single_rate).

Default arms:
  small grid model (resnet W64, batch 512): S in {2, 4, 8}
  flagship (transformer+hybrid W10, batch 8192 @ microbatch 512): S = 2

Run on the real chip with nothing else on it; appends markdown to stderr.
"""

import argparse

import numpy as np
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prng", type=str, default="rbg")
    p.add_argument("--small_seeds", type=int, nargs="+", default=[2, 4, 8])
    p.add_argument("--flagship_seeds", type=int, nargs="+", default=[2])
    p.add_argument("--skip_small", action="store_true")
    p.add_argument("--skip_flagship", action="store_true")
    args = p.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", args.prng)
    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import bench

    rows = []

    def record(label, S, agg, single):
        row = {"config": label, "seeds": S,
               "aggregate_windows_per_sec_per_chip": round(agg, 1),
               "single_seed_rate": round(single, 1),
               "vmap_vs_sequential": round(agg / single, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if not args.skip_small:
        small = dict(arch="resnet", method="ema", window=64, batch=512,
                     n_windows=16384, epochs_timed=4)
        single = float(np.median(bench.bench_training(attn_packing=1, dropout=0.0, **small)[0]))
        for S in args.small_seeds:
            agg = bench.bench_multiseed(seeds=tuple(range(S)), attn_packing=1,
                                        dropout=0.0, **small)
            record("resnet+ema W64 b512", S, agg, single)

    if not args.skip_flagship:
        flag = dict(arch="transformer", method="hybrid", window=10,
                    batch=8192, accum_chunks=16, n_windows=32768,
                    epochs_timed=4, attn_packing=8)
        single = float(np.median(bench.bench_training(**flag)[0]))
        for S in args.flagship_seeds:
            agg = bench.bench_multiseed(seeds=tuple(range(S)), **flag)
            record("flagship W10 b8192@micro512", S, agg, single)

    print("\n| config | S | aggregate win/s/chip | single-seed rate | "
          "vmap vs sequential |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['config']} | {r['seeds']} | "
              f"{r['aggregate_windows_per_sec_per_chip']:,.0f} | "
              f"{r['single_seed_rate']:,.0f} | {r['vmap_vs_sequential']}x |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
