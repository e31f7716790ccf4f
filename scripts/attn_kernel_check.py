#!/usr/bin/env python
"""Hardware bring-up check for the fused Pallas attention kernel.

Run this BEFORE enabling --fused_attention anywhere on a shared chip: a
faulting Mosaic kernel crashes the whole TPU worker (taking concurrent jobs
with it; recovery ~5 min). Escalates tiny -> flagship shapes, checks parity
against the stock flax kernel, exercises the dropout + custom-VJP paths, and
micro-times fused vs flax. Exit 0 = safe to use."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from bridgerl_tpu.models.layers import block_diagonal_mask
    from bridgerl_tpu.ops.pallas.attention import fused_attention_fn

    print("platform:", jax.devices()[0].platform, flush=True)

    # Parity gate: on TPU both the stock flax kernel and the fused kernel run
    # their matmuls at the MXU's default precision (bf16 multiplies, f32
    # accumulate), so each deviates ~1e-2 from the exact f64 answer while
    # differing from EACH OTHER by ~1e-3 (different rounding order: flax
    # scales q before the matmul, the kernel scales scores after). The
    # correctness bar is therefore "no worse than the stock kernel's own
    # truncation error" vs a precision='highest' reference — not an absolute
    # epsilon (measured: both exactly 0.0137 from exact at flagship shapes).
    for B, P, note in ((8, 2, "tiny"), (64, 8, "small"), (512, 8, "flagship")):
        S, H, Dh = P * 10, 4, 64
        q, k, v = (jax.random.normal(jax.random.key(i), (B, S, H, Dh), jnp.float32)
                   for i in range(3))
        mask = block_diagonal_mask(P, 10)
        truth = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True,
                                         precision="highest")
        ref = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
        got = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
        e_ref = float(jnp.abs(ref - truth).max())
        e_fus = float(jnp.abs(got - truth).max())
        print(f"[{note}] B={B} S={S} fwd err vs highest: "
              f"flax {e_ref:.2e} fused {e_fus:.2e}", flush=True)
        assert e_fus <= 2.0 * e_ref + 1e-5, f"forward mismatch at {note}"

        def loss(fn, *a, **kw):
            return jnp.sum(fn(*a, mask=mask, deterministic=True, **kw) ** 2)

        gt = jax.grad(lambda *a: loss(nn.dot_product_attention, *a,
                                      precision="highest"), (0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: loss(nn.dot_product_attention, *a), (0, 1, 2))(q, k, v)
        gg = jax.grad(lambda *a: loss(fused_attention_fn, *a), (0, 1, 2))(q, k, v)
        e_ref = max(float(jnp.abs(a - b).max()) for a, b in zip(gr, gt))
        e_fus = max(float(jnp.abs(a - b).max()) for a, b in zip(gg, gt))
        print(f"[{note}] grad err vs highest: flax {e_ref:.2e} "
              f"fused {e_fus:.2e}", flush=True)
        assert e_fus <= 2.0 * e_ref + 1e-5, f"grad mismatch at {note}"

    # dropout path: determinism given seed + unbiasedness + finite grads
    rng = jax.random.key(7)
    o1 = fused_attention_fn(q, k, v, mask=mask, dropout_rng=rng,
                            dropout_rate=0.1, deterministic=False)
    o2 = fused_attention_fn(q, k, v, mask=mask, dropout_rng=rng,
                            dropout_rate=0.1, deterministic=False)
    assert bool(jnp.all(o1 == o2)), "dropout not deterministic given seed"
    ratio = float(jnp.mean(o1) / jnp.mean(ref))
    print(f"dropout deterministic; mean ratio {ratio:.3f}", flush=True)
    g = jax.grad(lambda q: jnp.sum(fused_attention_fn(
        q, k, v, mask=mask, dropout_rng=rng, dropout_rate=0.1,
        deterministic=False) ** 2))(q)
    assert bool(jnp.all(jnp.isfinite(g))), "dropout grads not finite"

    # micro-timing fused vs flax, fwd+bwd at flagship attention shapes
    def timeit(f, n=8):
        gfn = jax.jit(jax.grad(lambda q: jnp.sum(f(q, k, v) ** 2)))
        float(gfn(q).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            float(gfn(q).sum())
        return (time.perf_counter() - t0) / n * 1e3

    t_ref = timeit(lambda q, k, v: nn.dot_product_attention(
        q, k, v, mask=mask, deterministic=True))
    t_fus = timeit(lambda q, k, v: fused_attention_fn(
        q, k, v, mask=mask, deterministic=True))
    print(f"fwd+bwd ms/call: flax {t_ref:.2f} fused {t_fus:.2f} "
          f"({t_ref / max(t_fus, 1e-9):.2f}x)", flush=True)
    print("ATTN KERNEL CHECK OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
