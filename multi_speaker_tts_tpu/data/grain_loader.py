"""Grain-backed data loading (BASELINE.json:5: "data loading moves to a
tf.data/Grain pipeline with length-bucketing").

The bucketing *plan* (which utterances form which static-shape batch) is
computed per epoch by the same logic as ``BucketBatcher``; Grain contributes
what the pure-Python loader lacks: parallel worker processes that load +
collate whole batches off the training thread, with prefetch, plus
deterministic multi-host sharding via ``grain.sharding.ShardOptions`` (each
host reads only its shard of batches - the DCN side of the data path,
SURVEY.md section 2 "Distributed communication backend").

Epoch semantics: the source's index space is ``epoch_len * virtual_epochs``
records; record i belongs to virtual epoch ``i // epoch_len``, whose plan is
built lazily (and cached) with an epoch-keyed rng - so batch *membership*,
batch *order*, and the GE2E ref-mel crop rng all vary per epoch, exactly like
the in-process ``BucketBatcher`` path. The sampler iterates sequentially
(shuffling already happened inside the plan), which also makes multi-host
sharding a plain disjoint partition of batches.
"""

from __future__ import annotations

import numpy as np

from multi_speaker_tts_tpu.data.datasets import BucketBatcher, collate_tts

# Number of distinct epoch plans before the cycle repeats; effectively
# "never" for real runs while keeping __len__ a sane integer.
VIRTUAL_EPOCHS = 2**16


class _BatchPlanSource:
    """Random-access source over epoch-keyed bucketing plans; one record =
    one fully collated, statically-shaped batch (this host's row slice).

    Multi-host sharding (``shard_index/shard_count``) slices *rows*, not
    records: every host walks the identical plan - so the static bucket
    shape each host feeds its jitted step is the same at every global step
    (bucket-shape lockstep; a per-host record split could hand host 0 a
    (32, 256) program and host 1 a (16, 128) one and deadlock the SPMD
    step) - and collates only its ``batch_size/shard_count`` rows. Per-item
    crop rngs are keyed (seed, epoch, pos, row) so the assembled global
    batch is bit-identical to the single-host batch.
    """

    def __init__(self, batcher: BucketBatcher, seed: int = 0,
                 virtual_epochs: int = VIRTUAL_EPOCHS,
                 shard_index: int = 0, shard_count: int = 1):
        if batcher.batch_size % shard_count != 0:
            raise ValueError(
                f"batch_size ({batcher.batch_size}) must be divisible by "
                f"shard_count ({shard_count})"
            )
        self.batcher = batcher
        self.seed = seed
        self.virtual_epochs = virtual_epochs
        self.shard_index = shard_index
        self.shard_count = shard_count
        # Batch count per epoch is plan-independent: chunk counts depend only
        # on bucket membership sizes, which are fixed.
        bs = batcher.batch_size
        self.epoch_len = sum(
            -(-len(idxs) // bs) for idxs in batcher.assignment.values()
        )
        self._plan_cache: dict[int, list] = {}

    def _plan(self, epoch: int) -> list:
        """Build (or fetch) the shuffled batch plan for one virtual epoch."""
        plan = self._plan_cache.get(epoch)
        if plan is not None:
            return plan
        rng = np.random.default_rng([self.seed, epoch])
        plan = []
        bs = self.batcher.batch_size
        for shape in sorted(self.batcher.assignment.keys()):
            idxs = list(self.batcher.assignment[shape])
            rng.shuffle(idxs)
            for k in range(0, len(idxs), bs):
                chunk = idxs[k : k + bs]
                if len(chunk) < bs:
                    chunk = (chunk * bs)[:bs]
                plan.append((shape, chunk))
        rng.shuffle(plan)
        # Keep only the current + previous epoch (workers walk epochs in
        # order; prefetch can straddle one boundary).
        self._plan_cache = {
            e: p for e, p in self._plan_cache.items() if e >= epoch - 1
        }
        self._plan_cache[epoch] = plan
        return plan

    def __len__(self) -> int:
        return self.epoch_len * self.virtual_epochs

    def __getitem__(self, i: int):
        epoch, pos = divmod(i, self.epoch_len)
        (tb, mb), chunk = self._plan(epoch)[pos]
        local_bs = self.batcher.batch_size // self.shard_count
        lo = self.shard_index * local_bs
        rows = range(lo, lo + local_bs)
        patterns = [self.batcher.ds[chunk[r]] for r in rows]
        item_rngs = [
            np.random.default_rng([self.seed, epoch, pos, r]) for r in rows
        ]
        batch = collate_tts(
            patterns, tb, mb, self.batcher.mel_dim, self.batcher.r,
            self.batcher.ref_window, item_rngs, self.batcher.spect_dim,
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

    ``shard_index/shard_count``: multi-host data sharding - every host walks
    the same plan (same bucket shape per global step) and collates its
    disjoint ``batch_size/shard_count`` row slice; assemble the global batch
    with ``parallel.multihost.global_batch_from_local``. ``num_epochs``
    counts passes over the *dataset* (each with fresh batch membership/
    order/crops); None = run forever (the Trainer's long-lived loader).
    """
    import grain.python as gp

    source = _BatchPlanSource(
        batcher, seed, virtual_epochs=num_epochs or VIRTUAL_EPOCHS,
        shard_index=shard_index, shard_count=shard_count,
    )
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.NoSharding(),  # sharding is by rows, in the source
        # Order/membership shuffling lives in the epoch-keyed plan; the
        # sampler walks indices sequentially so epoch boundaries are honest.
        shuffle=False,
        num_epochs=1 if num_epochs else None,
        seed=seed,
    )
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        worker_count=worker_count,
        read_options=gp.ReadOptions(prefetch_buffer_size=max(2, worker_count)),
    )
