"""Grain-backed data loading (BASELINE.json:5: "data loading moves to a
tf.data/Grain pipeline with length-bucketing").

The bucketing *plan* (which utterances form which static-shape batch) is
computed up front by the same logic as ``BucketBatcher``; Grain contributes
what the pure-Python loader lacks: parallel worker processes that load +
collate whole batches off the training thread, with prefetch, plus
deterministic per-epoch shuffling and multi-host sharding via
``grain.sharding.ShardOptions`` (each host reads only its shard of batches -
the DCN side of the data path, SURVEY.md section 2 "Distributed
communication backend").
"""

from __future__ import annotations

import numpy as np

from multi_speaker_tts_tpu.data.datasets import BucketBatcher, PatternDataset, collate_tts


class _BatchPlanSource:
    """Random-access source over a precomputed bucketing plan; one record =
    one fully collated, statically-shaped batch."""

    def __init__(self, batcher: BucketBatcher, seed: int = 0):
        self.batcher = batcher
        # Materialize the epoch plan once (deterministic under the seed).
        self.plan = []
        rng = np.random.default_rng(seed)
        for shape, idxs in batcher.assignment.items():
            idxs = list(idxs)
            rng.shuffle(idxs)
            bs = batcher.batch_size
            for k in range(0, len(idxs), bs):
                chunk = idxs[k : k + bs]
                if len(chunk) < bs:
                    chunk = (chunk * bs)[:bs]
                self.plan.append((shape, chunk))

    def __len__(self) -> int:
        return len(self.plan)

    def __getitem__(self, i: int):
        (tb, mb), chunk = self.plan[i]
        patterns = [self.batcher.ds[j] for j in chunk]
        batch = collate_tts(
            patterns, tb, mb, self.batcher.mel_dim, self.batcher.r,
            self.batcher.ref_window, np.random.default_rng(i),
            self.batcher.spect_dim,
        )
        batch["bucket"] = np.asarray([tb, mb], np.int32)
        return batch


def make_grain_loader(
    batcher: BucketBatcher,
    worker_count: int = 4,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    num_epochs: int | None = None,
):
    """Grain DataLoader yielding collated batches with worker parallelism.

    ``shard_index/shard_count``: multi-host data sharding (each host consumes
    a disjoint subset of batches).
    """
    import grain.python as gp

    source = _BatchPlanSource(batcher, seed)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=False
        ),
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        worker_count=worker_count,
        read_options=gp.ReadOptions(prefetch_buffer_size=max(2, worker_count)),
    )
