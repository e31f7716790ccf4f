"""Benchmark harness: W10 VQ-VAE training windows/sec/chip.

Fills the reference's empty scripts/run_benchmark.py niche. Measures the
north-star metric from BASELINE.md: windows/sec/chip for W=10, 29-DoF teacher
training of the flagship transformer+hybrid model, dataset HBM-resident,
whole epoch as one XLA program. Headline config (perf battery round 2):
global batch 16384 at the compute-optimal microbatch 512 (gradient
accumulation, one AdamW step per global batch), attention packing 8, bf16
compute, rbg PRNG — the measured optimum of the batch x microbatch x packing
x dtype x PRNG x fused-attention sweep recorded in perf_battery.md.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/50000}
plus secondary metrics on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_WINDOWS_PER_SEC_PER_CHIP = 50_000.0


LAST_COMMITTED_HEADLINE = 219_638.0  # round-5 clean capture (suspect:false);
# honest band 217-223k (see perf_battery.md round-5 section)


def chip_busy_pids():
    """PIDs of other python processes likely holding the single TPU claim.

    The tunneled axon worker serves ONE client; benching while a training
    queue holds the chip produced the anomalous round-4 capture (184k with
    bf16 slower than f32). Scan /proc cmdlines (no pgrep -f) for the known
    TPU entry points.
    """
    import os
    import re

    me = os.getpid()
    hot = re.compile(r"run_queue|run_batch|train_ablation|train_prior"
                     r"|exp_prior|run_benchmark|bench_serving|__graft_entry__")
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().replace(b"\0", b" ")
        except OSError:
            continue
        if b"python" in cmd and hot.search(cmd.decode("utf-8", "replace")):
            pids.append(int(pid))
    return pids


def wait_for_free_chip(max_wait_s: float) -> bool:
    """Block until no known TPU holder is running (capture hygiene,
    round-4 verdict weak #1). Returns True if the chip looks free."""
    t0 = time.time()
    while True:
        busy = chip_busy_pids()
        if not busy:
            return True
        if time.time() - t0 >= max_wait_s:
            print(f"[bench] WARNING: chip holders still alive after "
                  f"{max_wait_s:.0f}s wait: pids {busy} — capture may be "
                  "CONTENDED", file=sys.stderr, flush=True)
            return False
        print(f"[bench] chip held by pids {busy}; waiting...",
              file=sys.stderr, flush=True)
        time.sleep(30)


def bench_training(arch="transformer", method="hybrid", window=10, batch=4096,
                   n_windows=65536, epochs_timed=8, compute_dtype="bfloat16",
                   attn_packing=8, dropout=0.1, accum_chunks=1,
                   fused_attention=False, cheap_dropout=False,
                   reuse_dropout_mask=False, int8_ff=False, repeats=1,
                   **config_over):
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.models import init_model
    from bridgerl_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_epoch,
        split_variables,
    )

    exp = make_experiment(arch, method, window=window, mode="teacher",
                          batch_size=batch, compute_dtype=compute_dtype,
                          attn_packing=attn_packing, dropout=dropout,
                          accum_chunks=accum_chunks,
                          fused_attention=fused_attention,
                          cheap_dropout=cheap_dropout,
                          reuse_dropout_mask=reuse_dropout_mask,
                          int8_ff=int8_ff, **config_over)
    model, variables = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(variables)
    tx = make_optimizer(exp, params)
    state = TrainState(params, rest, tx.init(params))

    key = jax.random.key(1)
    robot = jax.random.normal(key, (n_windows, window, 29), jnp.float32)
    human = jax.random.normal(key, (n_windows, window, 126), jnp.float32)

    nb = n_windows // batch
    idx = jnp.arange(nb * batch).reshape(nb, batch)
    keys = jax.random.split(jax.random.key(2), nb)

    train_epoch = make_train_epoch(model, tx, exp, mesh=None)

    # warmup/compile. NOTE: on tunneled TPU runtimes jax.block_until_ready
    # does NOT synchronize (observed 30M "windows/s" artifacts); a host value
    # fetch is the only reliable barrier, used for warmup and per-epoch timing.
    for _ in range(2):
        state, logs = train_epoch(state, robot, human, idx, keys)
        float(logs["train_loss"])

    # >=1 independently timed repetitions (round-4 verdict: a single pass
    # has no variance signal; median of >=3 is the headline protocol)
    rates = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for _ in range(epochs_timed):
            state, logs = train_epoch(state, robot, human, idx, keys)
            float(logs["train_loss"])  # hard sync
        dt = time.perf_counter() - t0
        rates.append(epochs_timed * nb * batch / dt / jax.device_count())
    return rates, float(logs["train_loss"])


def bench_multiseed(arch="transformer", method="hybrid", window=10, batch=2048,
                    seeds=(0, 1, 2, 3), n_windows=32768, epochs_timed=4,
                    compute_dtype="bfloat16", attn_packing=8, dropout=0.1,
                    hidden_dim=64, **model_over):
    """Aggregate windows/sec/chip of the vmapped multiseed program: S seeds
    train simultaneously in ONE XLA program sharing the HBM-resident dataset
    (train/multiseed.py — the replacement for the reference's sequential seed
    loop, scripts/train_ablation.py:427-437). Round-2 VERDICT item 5: this
    path had tests but no measured throughput."""
    from bridgerl_tpu.config import make_experiment
    from bridgerl_tpu.train import make_train_epoch, make_optimizer
    from bridgerl_tpu.train.multiseed import init_states_vmapped
    from bridgerl_tpu.models import init_model

    S = len(seeds)
    exp = make_experiment(arch, method, window=window, mode="teacher",
                          seeds=tuple(seeds), batch_size=batch,
                          compute_dtype=compute_dtype, attn_packing=attn_packing,
                          dropout=dropout, hidden_dim=hidden_dim, **model_over)
    model, _ = init_model(exp.model, jax.random.key(0))
    states = init_states_vmapped(exp, list(seeds))
    tx = make_optimizer(exp, jax.tree_util.tree_map(lambda x: x[0], states.params))
    epoch_fn = make_train_epoch(model, tx, exp, None, jit=False)
    vm_epoch = jax.jit(jax.vmap(epoch_fn, in_axes=(0, None, None, 0, 0)),
                       donate_argnums=(0,))

    key = jax.random.key(1)
    robot = jax.random.normal(key, (n_windows, window, 29), jnp.float32)
    human = jax.random.normal(key, (n_windows, window, 126), jnp.float32)
    nb = n_windows // batch
    idx = jnp.broadcast_to(jnp.arange(nb * batch).reshape(1, nb, batch),
                           (S, nb, batch))
    keys = jnp.stack([jax.random.split(jax.random.key(3 + s), nb) for s in seeds])

    for _ in range(2):
        states, logs = vm_epoch(states, robot, human, idx, keys)
        float(np.asarray(logs["train_loss"]).mean())  # hard sync

    t0 = time.perf_counter()
    for _ in range(epochs_timed):
        states, logs = vm_epoch(states, robot, human, idx, keys)
        float(np.asarray(logs["train_loss"]).mean())
    dt = time.perf_counter() - t0

    windows = epochs_timed * nb * batch * S
    return windows / dt / jax.device_count()


def bench_replay(frames: int = 20000) -> float:
    """G1 kinematic replay steps/sec (secondary north-star metric)."""
    from bridgerl_tpu.sim import G1ReplayScene

    scene = G1ReplayScene()
    return scene.benchmark_steps_per_sec(frames=frames)


def main():
    import jax as _jax

    # TPU-native RBG PRNG: dropout mask generation via threefry costs ~25% of
    # the step (63k -> 84k windows/s measured); rbg is the standard TPU choice.
    _jax.config.update("jax_default_prng_impl", "rbg")
    from bridgerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # Capture hygiene (round-4 verdict weak #1): the r4 number of record was
    # taken while a training queue held the single tunneled-TPU claim and
    # under-reported the repo by 17%. Refuse to time against a busy chip
    # without saying so.
    import os

    wait_s = float(os.environ.get("BRIDGERL_BENCH_WAIT", "900"))
    chip_free = wait_for_free_chip(wait_s)

    cheap = "--cheap" in sys.argv  # uint8-bit dropout masks (perf_battery.md)
    rates, loss = bench_training(compute_dtype="bfloat16", batch=16384,
                                 accum_chunks=32, cheap_dropout=cheap,
                                 repeats=3)
    rate = float(np.median(rates))
    if "--no_f32" in sys.argv:
        rate_f32, loss_f32 = -1.0, float("nan")
    else:
        f32_rates, loss_f32 = bench_training(compute_dtype="float32",
                                             batch=16384, accum_chunks=32,
                                             epochs_timed=4)
        rate_f32 = float(np.median(f32_rates))
    try:
        replay_sps = bench_replay()
    except Exception as e:  # keep the primary metric robust
        replay_sps = -1.0
        print(f"[bench] replay bench failed: {e}", file=sys.stderr)

    # Plausibility guards: bf16 must beat f32 (perf_battery.md shows it does
    # everywhere on this model), and the median must sit near the last
    # committed headline — otherwise flag the capture loudly instead of
    # letting a noisy number become the round's record.
    suspect = []
    if rate_f32 > 0 and rate < rate_f32:
        suspect.append(f"bf16 {rate:,.0f} < f32 {rate_f32:,.0f} "
                       "(physically implausible; chip likely contended)")
    drift = abs(rate - LAST_COMMITTED_HEADLINE) / LAST_COMMITTED_HEADLINE
    if drift > 0.15:
        suspect.append(f"median {rate:,.0f} is {drift:.0%} off the last "
                       f"committed headline {LAST_COMMITTED_HEADLINE:,.0f}")
    if not chip_free:
        suspect.append("another TPU holder was alive during the capture")

    result = {
        "metric": "W10 VQ-VAE training windows/sec/chip (transformer+hybrid teacher, batch 16384 @ microbatch 512)",
        "value": round(rate, 1),
        "unit": "windows/sec/chip",
        "vs_baseline": round(rate / BASELINE_WINDOWS_PER_SEC_PER_CHIP, 3),
        "median_of": len(rates),
        "min": round(min(rates), 1),
        "max": round(max(rates), 1),
        "suspect": bool(suspect),
    }
    print(json.dumps(result))
    print(f"[bench] devices={jax.devices()} bf16_loss={loss:.4f} "
          f"bf16_reps={[f'{r:,.0f}' for r in rates]} "
          f"f32_rate={rate_f32:,.0f} f32_loss={loss_f32:.4f} "
          f"g1_replay_steps_per_sec={replay_sps:,.0f}", file=sys.stderr)
    for s in suspect:
        print(f"[bench] SUSPECT CAPTURE: {s}", file=sys.stderr)


if __name__ == "__main__":
    main()
