"""Grain-backed host input pipeline (SURVEY.md §2.5: "Grain/tf.data host
pipeline for decode + fused on-device XLA transforms, double-buffered HBM
prefetch").

Same yield contract as data.pipeline.make_loader — (images f32 NHWC,
labels i32 NHW[, extras...]) numpy batches — so `prefetch_to_device` and the
train loop are loader-agnostic. Differences from the thread-pool loader:

  * deterministic global shuffle + per-record RNG come from Grain's
    IndexSampler (seeded, epoch-aware), not our (seed, epoch, idx) hashing;
  * multi-host sharding is first-class: pass `shard_index`/`shard_count`
    (jax.process_index/count under --multihost) and each host reads only
    its records — the reference's DataLoader has no equivalent;
  * worker processes (worker_count) decouple augmentation from the train
    loop on multi-core hosts (this rig has 1 core — default in-process).

Select with `--data_loader grain` on the CLI.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def make_grain_loader(
    dataset,
    *,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    num_workers: int = 0,
    num_epochs: int | None = None,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator[tuple[np.ndarray, ...]]:
    import grain.python as grain

    class _Source:
        """RandomAccessDataSource of record indices (the sample itself is
        materialized in the transform, where Grain hands us the RNG)."""

        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            return int(i)

    class _Load(grain.RandomMapTransform):
        def random_map(self, idx, rng: np.random.Generator):
            out = dataset.__getitem__(int(idx), rng)
            img = np.asarray(out[0], np.float32)
            lbl = np.asarray(out[1], np.int32)
            return (img, lbl) + tuple(
                np.asarray(o, np.float32) for o in out[2:])

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardOptions(shard_index=shard_index,
                                         shard_count=shard_count,
                                         drop_remainder=shard_count > 1),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[_Load(),
                    grain.Batch(batch_size=batch_size,
                                drop_remainder=drop_last)],
        worker_count=num_workers,
    )
    for batch in loader:
        yield tuple(np.asarray(col) for col in batch)
