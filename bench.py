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


def bench_training(arch="transformer", method="hybrid", window=10, batch=4096,
                   n_windows=65536, epochs_timed=8, compute_dtype="bfloat16",
                   attn_packing=8, dropout=0.1, accum_chunks=1,
                   fused_attention=False, cheap_dropout=False,
                   reuse_dropout_mask=False, int8_ff=False, **config_over):
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

    t0 = time.perf_counter()
    for _ in range(epochs_timed):
        state, logs = train_epoch(state, robot, human, idx, keys)
        float(logs["train_loss"])  # hard sync
    dt = time.perf_counter() - t0

    windows = epochs_timed * nb * batch
    n_chips = jax.device_count()
    return windows / dt / n_chips, float(logs["train_loss"])


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
    cheap = "--cheap" in sys.argv  # uint8-bit dropout masks (perf_battery.md)
    rate, loss = bench_training(compute_dtype="bfloat16", batch=16384,
                                accum_chunks=32, cheap_dropout=cheap)
    if "--no_f32" in sys.argv:
        rate_f32, loss_f32 = -1.0, float("nan")
    else:
        rate_f32, loss_f32 = bench_training(compute_dtype="float32",
                                            batch=16384, accum_chunks=32,
                                            epochs_timed=4)
    try:
        replay_sps = bench_replay()
    except Exception as e:  # keep the primary metric robust
        replay_sps = -1.0
        print(f"[bench] replay bench failed: {e}", file=sys.stderr)
    result = {
        "metric": "W10 VQ-VAE training windows/sec/chip (transformer+hybrid teacher, batch 16384 @ microbatch 512)",
        "value": round(rate, 1),
        "unit": "windows/sec/chip",
        "vs_baseline": round(rate / BASELINE_WINDOWS_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(result))
    print(f"[bench] devices={jax.devices()} bf16_loss={loss:.4f} "
          f"f32_rate={rate_f32:,.0f} f32_loss={loss_f32:.4f} "
          f"g1_replay_steps_per_sec={replay_sps:,.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
