#!/usr/bin/env python
"""Throughput sweep over batch size / attention packing / dtype variants.

Produces the batch-curve evidence for the round-2 perf work (VERDICT task 3):
one JSON line per point plus a final markdown table on stderr. Run on the real
chip with nothing else on it.
"""

import argparse

import numpy as np
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[2048, 4096, 8192, 16384])
    p.add_argument("--packings", type=int, nargs="+", default=[8])
    p.add_argument("--dtypes", type=str, nargs="+", default=["bfloat16"])
    p.add_argument("--dropout", type=float, nargs="+", default=[0.1])
    p.add_argument("--accums", type=int, nargs="+", default=[1],
                   help="gradient-accumulation chunk counts to sweep")
    p.add_argument("--fused", type=int, nargs="+", default=[0],
                   help="fused Pallas attention on/off (1/0) variants")
    p.add_argument("--cheap", type=int, nargs="+", default=[0],
                   help="uint8-bit dropout masks on/off (1/0) variants")
    p.add_argument("--reuse", type=int, nargs="+", default=[0],
                   help="reuse one dropout mask per optimizer batch (1/0)")
    p.add_argument("--int8", type=int, nargs="+", default=[0],
                   help="int8 MXU forward on the FF matmuls (1/0) variants")
    p.add_argument("--n_windows", type=int, default=65536)
    p.add_argument("--epochs_timed", type=int, default=6)
    p.add_argument("--prng", type=str, default="rbg")
    args = p.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", args.prng)
    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import bench

    rows = []
    for batch, pack, dt, drop, accum, fused, cheap, reuse, int8 in \
            itertools.product(
            args.batches, args.packings, args.dtypes, args.dropout,
            args.accums, args.fused, args.cheap, args.reuse, args.int8):
        if batch % pack != 0 or batch > args.n_windows or batch % accum != 0:
            continue
        rates, loss = bench.bench_training(
            batch=batch, attn_packing=pack, compute_dtype=dt,
            n_windows=args.n_windows, epochs_timed=args.epochs_timed,
            dropout=drop, accum_chunks=accum, fused_attention=bool(fused),
            cheap_dropout=bool(cheap), reuse_dropout_mask=bool(reuse),
            int8_ff=bool(int8))
        rate = float(np.median(rates))
        row = {"batch": batch, "attn_packing": pack, "dtype": dt,
               "dropout": drop, "accum_chunks": accum, "fused": fused,
               "cheap": cheap, "reuse": reuse, "int8": int8,
               "windows_per_sec_per_chip": round(rate, 1),
               "final_loss": round(loss, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| batch | pack | dtype | dropout | accum | fused | cheap | reuse | int8 | windows/s/chip |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['batch']} | {r['attn_packing']} | {r['dtype']} | "
              f"{r['dropout']} | {r['accum_chunks']} | {r['fused']} | "
              f"{r['cheap']} | {r['reuse']} | {r['int8']} | "
              f"{r['windows_per_sec_per_chip']:,.0f} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
