#!/usr/bin/env python
"""Serving-path throughput/latency bench: StableHLO artifact inference.

Measures the frozen `retarget` function (raw human windows -> raw robot
joints) across request batch sizes — per-call blocking, warmup discarded —
on whatever platform is active (TPU by default; BRIDGERL_PLATFORM=cpu to
force CPU). Weight values don't affect inference speed, so when --ckpt is
absent a fresh-init model of the given config is exported; a trained
checkpoint produces the identical program.

The reference has no serving bench (its run_benchmark.py is 0 bytes and
deployment re-loads torch checkpoints in-process), so these numbers are
net-new surface. Results belong in perf_battery.md.

    python scripts/bench_serving.py --arch transformer --method hybrid \
        --window 10 --batches 1 64 512 4096 --iters 30
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="trained checkpoint; omit to bench a fresh-init model")
    p.add_argument("--artifact", type=str, default=None,
                   help="pre-built serving zip (skips export)")
    p.add_argument("--arch", type=str, default="transformer")
    p.add_argument("--method", type=str, default="hybrid")
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--data_dir", type=str, default="./data/processed")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 64, 512, 4096])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--stream", action="store_true",
                   help="also bench StreamingRetargeter per-frame push latency")
    p.add_argument("--stream_step", type=int, default=None,
                   help="streaming stride (default window // 2)")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np
    from bridgerl_tpu.export import load_serving_artifact

    if args.artifact:
        art = args.artifact
    else:
        tmp = tempfile.mkdtemp()
        art = os.path.join(tmp, "bench_serving.zip")
        if args.ckpt:
            from bridgerl_tpu.export import export_serving_artifact
            export_serving_artifact(args.ckpt, art, data_dir=args.data_dir)
        else:
            # identity stats (data_dir=None): weight/stat values don't
            # change the compiled program, only its constants
            from bridgerl_tpu.export.serialize import export_fresh_artifact
            export_fresh_artifact(art, arch=args.arch, method=args.method,
                                  window=args.window)
    mod = load_serving_artifact(art)
    W = mod.window_size
    h_dim = mod.meta["functions"]["retarget"]["input"][2]
    platform = jax.devices()[0].platform
    print(f"platform={platform} artifact={art} window={W}", file=sys.stderr)

    rows = []
    for b in args.batches:
        x = np.random.default_rng(0).normal(size=(b, W, h_dim)).astype(np.float32)
        for _ in range(args.warmup):
            mod.retarget(x).block_until_ready()
        # block per call: tunneled-TPU async dispatch inflates loop-end timing
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            mod.retarget(x).block_until_ready()
            times.append(time.perf_counter() - t0)
        lat_ms = 1e3 * float(np.median(times))
        p99_ms = 1e3 * float(np.percentile(times, 99))
        rows.append({"batch": b, "median_ms": round(lat_ms, 3),
                     "p99_ms": round(p99_ms, 3),
                     "windows_per_s": round(b / (lat_ms / 1e3))})
        print(json.dumps({"bench": "serving_retarget", "platform": platform,
                          **rows[-1]}))
    best = max(rows, key=lambda r: r["windows_per_s"])
    print(json.dumps({"bench": "serving_retarget_best", "platform": platform,
                      **best}))

    if args.stream:
        from bridgerl_tpu.export.streaming import StreamingRetargeter
        S = args.stream_step or max(W // 2, 1)
        n_frames = args.warmup * S + W + args.iters * S  # iters*S timed pushes
        feed = np.random.default_rng(1).normal(
            size=(n_frames, h_dim)).astype(np.float32)
        sr = StreamingRetargeter(lambda x: np.asarray(mod.retarget(x)),
                                 window=W, step=S, in_dim=h_dim)
        push_times = []
        for i, frame in enumerate(feed):
            t0 = time.perf_counter()
            sr.push(frame)
            push_times.append(time.perf_counter() - t0)
        sr.flush()
        # skip warmup region (first windows compile/claim the device)
        times = np.asarray(push_times[args.warmup * S + W:])
        print(json.dumps({
            "bench": "serving_stream_push", "platform": platform,
            "window": W, "step": S,
            "median_push_ms": round(1e3 * float(np.median(times)), 3),
            "p99_push_ms": round(1e3 * float(np.percentile(times, 99)), 3),
            "amortized_frame_ms": round(1e3 * float(np.mean(times)), 3),
            "latency_frames": sr.latency_frames,
        }))


if __name__ == "__main__":
    main()
