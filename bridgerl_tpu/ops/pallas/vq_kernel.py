"""Pallas TPU kernel: fused nearest-codebook search + assignment statistics.

The reference's hottest custom op is the VQ lookup (models/vqvae.py:34-52):
it materializes an (N, K) distance matrix in HBM, argmins it, materializes an
(N, K) one-hot matrix, and runs two more matmuls for the EMA statistics. This
kernel fuses the whole chain tile-by-tile in VMEM:

    per N-tile:  scores = -2 x @ cb^T + ||cb||^2      (MXU)
                 idx    = argmin(scores)               (VPU)
                 onehot = iota == idx (never in HBM)
                 counts += sum(onehot)                 (accumulated across grid)
                 dw     += onehot^T @ x                (MXU, accumulated)

HBM traffic drops from O(N*K) for the distance+onehot matrices to O(N*D +
K*D): the (N, K) intermediates never leave VMEM. Interface matches
ops.codebook.nearest_codes_xla, so `use_pallas_backend()` swaps it in under
every quantizer without touching model code.

STATUS (v5e, measured): correct (bit-identical indices/stats vs the XLA
backend on hardware) but NOT the default. At this model's shapes
(N~40960, D=64, K=512) the XLA path runs 0.71 ms/call vs 25.5 ms for this
kernel with the Mosaic-compilable tiling (tile_n=128; larger tiles blow the
register allocator: 178MB vreg spills full-tile, 128MB with dynamic lane
slicing, 54MB scoped-vmem static-unrolled at tile 512). XLA already keeps the
fused distance matmul on the MXU and the (N, K) intermediates fuse away; with
D=64 the op is compute-trivial. The kernel remains available via
`use_pallas_backend()` for large-K/large-D regimes and as the base for a
future fully-fused quantizer step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codebook import nearest_codes_xla, set_nearest_codes_backend

# Largest tile the Mosaic register allocator handles without spilling past
# the scoped-VMEM budget (see STATUS in the module docstring).
TILE_N = 128


K_CHUNK = 128  # lane width: the streaming granularity over the codebook axis


def _vq_assign_kernel(n_ref, x_ref, cb_ref, idx_ref, counts_ref, dw_ref):
    """Chunk-streamed per-tile assignment.

    All work runs in (TN, 128) lane chunks over the codebook with STATIC
    slices (python-unrolled loop). Two formulations that failed on Mosaic:
    a full-(TN, K)-tile version spilled 178MB of vregs, and a fori_loop with
    dynamic lane-dim slicing of a VMEM scratch spilled 128MB — dynamic lane
    indexing materializes the whole buffer in registers. Static lane slices
    keep live values at a few (TN, 128) tiles.
    """
    i = pl.program_id(0)
    tile_n = x_ref.shape[0]
    K = cb_ref.shape[0]
    n_chunks = K // K_CHUNK

    x = x_ref[:]                                 # (TN, D)
    chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_n, K_CHUNK), 1)

    # ---- streamed scores + first-argmin over static K chunks ----
    best_score = jnp.full((tile_n, 1), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((tile_n, 1), jnp.int32)
    for c in range(n_chunks):
        cb_c = cb_ref[c * K_CHUNK:(c + 1) * K_CHUNK, :]          # (128, D) static
        s = jnp.sum(cb_c * cb_c, axis=1)[None, :] - 2.0 * jnp.dot(
            x, cb_c.T, preferred_element_type=jnp.float32)        # (TN, 128)
        cmin = jnp.min(s, axis=1, keepdims=True)
        cand = jnp.where(s <= cmin, chunk_iota, K)
        cidx = jnp.min(cand, axis=1, keepdims=True) + c * K_CHUNK
        better = cmin < best_score
        best_score = jnp.where(better, cmin, best_score)
        best_idx = jnp.where(better, cidx, best_idx)

    # mask rows past the true N (the caller pads N up to a TILE_N multiple)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + i * tile_n
    valid = row_ids < n_ref[0, 0]
    valid_f = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)     # (TN, 1)
    idx = jnp.where(valid, best_idx, 0)
    idx_ref[:] = idx

    # ---- streamed one-hot statistics over static K chunks ----
    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for c in range(n_chunks):
        oh = jnp.where(chunk_iota + c * K_CHUNK == idx, 1.0, 0.0).astype(jnp.float32)
        oh = oh * valid_f                                         # (TN, 128)
        counts_ref[:, c * K_CHUNK:(c + 1) * K_CHUNK] += jnp.sum(oh, axis=0)[None, :]
        dw_ref[c * K_CHUNK:(c + 1) * K_CHUNK, :] += jax.lax.dot_general(
            oh, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (128, D)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def nearest_codes_pallas(
    flat: jax.Array, codebook: jax.Array, tile_n: int = TILE_N
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused (indices, counts, dw) with the XLA-backend interface."""
    N, D = flat.shape
    K = codebook.shape[0]
    n_pad = -(-N // tile_n) * tile_n
    x = flat.astype(jnp.float32)
    if n_pad != N:
        x = jnp.pad(x, ((0, n_pad - N), (0, 0)))
    grid = (n_pad // tile_n,)

    idx2, counts2, dw = pl.pallas_call(
        _vq_assign_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),               # n scalar (2D)
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * K * D,  # scores + dw matmuls
            bytes_accessed=(n_pad * D + K * D) * 4 + n_pad * 4 + K * (D + 1) * 4,
            transcendentals=0,
        ),
        # Mosaic's unrolled-chunk buffering wants far more scoped VMEM than the
        # 16MB default; v5e has 128MB VMEM, give the kernel most of it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray([[N]], jnp.int32), x, codebook.astype(jnp.float32))

    return idx2[:N, 0], counts2[0], dw


def _supported(flat: jax.Array, codebook: jax.Array) -> bool:
    N, D = flat.shape
    K = codebook.shape[0]
    # MXU-friendly bounds; anything else takes the XLA path
    return K % 128 == 0 and K <= 4096 and D <= 512


def nearest_codes_auto(flat: jax.Array, codebook: jax.Array):
    """Pallas when shapes fit the kernel; XLA fallback otherwise."""
    if _supported(flat, codebook):
        return nearest_codes_pallas(flat, codebook)
    return nearest_codes_xla(flat, codebook)


def use_pallas_backend() -> bool:
    """Register the fused kernel as the framework-wide nearest_codes backend.

    Returns False (and leaves the XLA backend) on non-TPU platforms.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    set_nearest_codes_backend(nearest_codes_auto)
    return True


def use_xla_backend() -> None:
    set_nearest_codes_backend(nearest_codes_xla)
