"""On-device paired dataset: HBM-resident arrays, deterministic split, batching.

TPU-native replacement for the reference's TensorDataset + DataLoader(num_workers=4)
stack (scripts/train_ablation.py:104-112). The whole dataset — (N, W, 29) robot +
(N, W, 126) human windows — is a few hundred MB at most, so it lives in HBM once
and batches are pure on-device gathers; there is no host round-trip per step.

Split semantics mirror the reference's random 90/10 `random_split` but with a
deterministic JAX permutation keyed by seed (torch-RNG bitwise parity is
impossible; statistical parity is the contract — SURVEY.md §7 'Hard parts').
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PairedDataset:
    """Paired robot/human windows resident on device."""

    robot: jax.Array  # (N, W, Dr)
    human: jax.Array  # (N, W, Dh)

    @classmethod
    def from_numpy(cls, robot: np.ndarray, human: np.ndarray, sharding=None) -> "PairedDataset":
        n = min(len(robot), len(human))  # truncate-to-min, train_ablation.py:95-97
        robot, human = robot[:n], human[:n]
        if sharding is not None:
            robot = jax.device_put(jnp.asarray(robot, jnp.float32), sharding)
            human = jax.device_put(jnp.asarray(human, jnp.float32), sharding)
        else:
            robot = jnp.asarray(robot, jnp.float32)
            human = jnp.asarray(human, jnp.float32)
        return cls(robot=robot, human=human)

    def __len__(self) -> int:
        return self.robot.shape[0]

    @property
    def robot_dim(self) -> int:
        return int(self.robot.shape[-1])

    @property
    def human_dim(self) -> int:
        return int(self.human.shape[-1])


def split_indices(n: int, val_fraction: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic host-side train/val index split (90/10 by default)."""
    rng = np.random.default_rng(np.uint32(seed))
    perm = rng.permutation(n)
    train_size = int((1.0 - val_fraction) * n)
    return perm[:train_size], perm[train_size:]


def train_val_split(
    ds: PairedDataset, val_fraction: float, seed: int
) -> Tuple[PairedDataset, PairedDataset]:
    tr, va = split_indices(len(ds), val_fraction, seed)
    tr_d = jnp.asarray(tr)
    va_d = jnp.asarray(va)
    return (
        PairedDataset(ds.robot[tr_d], ds.human[tr_d]),
        PairedDataset(ds.robot[va_d], ds.human[va_d]),
    )


def epoch_batch_indices(key: jax.Array, n: int, batch_size: int, *, drop_remainder: bool = True) -> jax.Array:
    """Shuffled (num_batches, batch_size) index matrix for one epoch, on device.

    With drop_remainder the result feeds a `lax.scan` over batches (static
    shapes). The tail is dropped as in typical TPU input pipelines; with the
    reference's batch sizes (512-4096) and N in the tens of thousands this
    matches its DataLoader semantics closely (torch keeps a short last batch;
    over hundreds of epochs the distributional effect is nil).
    """
    perm = jax.random.permutation(key, n)
    num_batches = n // batch_size if drop_remainder else -(-n // batch_size)
    if not drop_remainder and n % batch_size:
        pad = num_batches * batch_size - n
        perm = jnp.concatenate([perm, perm[:pad]])
    return perm[: num_batches * batch_size].reshape(num_batches, batch_size)


def iterate_batches(
    ds: PairedDataset, key: jax.Array, batch_size: int
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Host-level iterator over on-device batches (gathers stay on device)."""
    idx = epoch_batch_indices(key, len(ds), batch_size)
    for b in range(idx.shape[0]):
        sel = idx[b]
        yield ds.robot[sel], ds.human[sel]


def normalize(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return (x - mean) / std


def denormalize(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return x * std + mean
