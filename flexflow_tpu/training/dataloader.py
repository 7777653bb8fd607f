"""SingleDataLoader — batched, shuffled, optionally mesh-sharded data feed.

TPU-native equivalent of the reference's dataloader
(/root/reference/src/dataloader/dataloader.cc, include/flexflow/dataloader.h:34
— full dataset attached once, ``next_batch`` index-launch copies per-shard
slices). Here the full arrays stay in host memory; each ``next_batch`` yields
a batch (optionally ``jax.device_put`` with a data-axis sharding so every DP
shard receives only its rows — the analog of the replica-dim partitioned
copy).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from flexflow_tpu.parallel.mesh import DATA_AXIS


class SingleDataLoader:
    def __init__(
        self,
        arrays: Sequence[np.ndarray],
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        mesh=None,
        drop_last: bool = True,
    ):
        self.arrays = [np.asarray(a) for a in arrays]
        n = self.arrays[0].shape[0]
        assert all(a.shape[0] == n for a in self.arrays)
        self.num_samples = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.mesh = mesh
        self.drop_last = drop_last
        self._epoch = 0

    @property
    def num_batches(self) -> int:
        if self.drop_last:
            return self.num_samples // self.batch_size
        return -(-self.num_samples // self.batch_size)

    def epoch(self) -> Iterator[List]:
        """One pass over the data (reference: reset + next_batch loop)."""
        idx = np.arange(self.num_samples)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        shardings = None
        if self.mesh is not None:
            shardings = [
                NamedSharding(self.mesh, P(DATA_AXIS, *(None,) * (a.ndim - 1)))
                for a in self.arrays
            ]
        stop = (
            self.num_samples - self.batch_size + 1
            if self.drop_last
            else self.num_samples
        )
        for i in range(0, stop, self.batch_size):
            sel = idx[i:i + self.batch_size]
            batch = [a[sel] for a in self.arrays]
            if shardings is not None:
                batch = [
                    jax.device_put(b, s) for b, s in zip(batch, shardings)
                ]
            yield batch

    def __iter__(self):
        return self.epoch()
