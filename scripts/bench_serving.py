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


def _fresh_artifact(arch: str, method: str, window: int, out: str) -> None:
    """Export a fresh-init model of the flagship config shape."""
    import jax
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.export.serialize import make_serving_fns
    from bridgerl_tpu.export import serialize as ser
    from bridgerl_tpu.models import init_model
    import jax.numpy as jnp
    import numpy as np
    import zipfile

    exp = make_experiment(arch, method, window=window)
    model, variables = init_model(exp.model, jax.random.key(0))
    r_dim, h_dim = exp.model.robot_input_dim, exp.model.human_input_dim
    ident = lambda d: (np.zeros(d, np.float32), np.ones(d, np.float32))
    fns = make_serving_fns(model, variables, ident(r_dim), ident(h_dim))
    in_dims = {"retarget": h_dim, "robot_recon": r_dim}
    meta = {"format": ser.FORMAT_TAG, "config_json": exp.to_json(),
            "platforms": ["cpu", "tpu"], "jax_version": jax.__version__,
            "source_checkpoint": "<fresh-init>", "functions": {}}
    blobs = {}
    for name, fn in fns.items():
        shape = jax.export.symbolic_shape(f"b, {window}, {in_dims[name]}")
        arg = jax.ShapeDtypeStruct(shape, jnp.float32)
        blobs[name] = jax.export.export(jax.jit(fn), platforms=("cpu", "tpu"))(arg).serialize()
        meta["functions"][name] = {"input": ["b", window, in_dims[name]],
                                   "output": ["b", window, r_dim], "dtype": "float32"}
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta))
        for name, blob in blobs.items():
            zf.writestr(f"{name}.bin", blob)


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
            _fresh_artifact(args.arch, args.method, args.window, art)
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


if __name__ == "__main__":
    main()
