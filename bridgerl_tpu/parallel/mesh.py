"""Device mesh + sharding helpers: the framework's distribution layer.

Replaces the reference's `nn.DataParallel` (scripts/train_ablation.py:189) with
the idiomatic TPU recipe: ONE `jax.sharding.Mesh` with a `data` axis; params
replicated, batch sharded via `NamedSharding`; gradients/batch-norm stats/EMA
codebook statistics become batch-global automatically because `jit` traces the
global program and XLA inserts the ICI collectives (SURVEY.md §5.8). Multi-host
scale-out over DCN needs only `jax.distributed.initialize` + the same program —
executed for real by tests/test_distributed_smoke.py (two CPU processes, one
global mesh, one full training step, Gloo collectives across the process
boundary) and by the 3-epoch sharded-vs-unsharded equivalence assertion in
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int = 3, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], x: jax.Array, axis: str = DATA_AXIS) -> jax.Array:
    """Inside-jit constraint pinning a batch to the data axis (no-op without mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim, axis))


def put_replicated(mesh: Optional[Mesh], tree):
    """Place a pytree fully replicated on the mesh (params, small stats)."""
    if mesh is None:
        return tree
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
