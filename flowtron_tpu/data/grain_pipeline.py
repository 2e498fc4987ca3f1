"""grain-based input pipeline (data_config.use_grain = true).

The TPU-ecosystem alternative to the first-party BatchIterator +
PrefetchIterator (collate.py): Google grain drives the per-sample host
work (wav decode, STFT, beta-binomial prior — reference:data.py:169-185)
through its deterministic, checkpoint-friendly MapDataset graph with
thread-pool prefetch and optional multiprocess workers.

Keeps the exact semantics the trainer already relies on:
- per-process sharding by stride (multi-host: every process loads a
  disjoint 1/process_count slice — the reference DistributedSampler
  role, reference:train.py:74-75),
- DataCollate padding/gate rules unchanged (it is the batch_fn),
- fresh shuffle order per epoch (seeded, reproducible),
- drop_last on train, keep-all on validation.
"""

import numpy as np


class _SourceAdapter:
    """Data -> grain RandomAccessDataSource (len + getitem protocol)."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, i):
        return self._dataset[int(i)]


class GrainLoader:
    """Epoch-iterable over grain with the BatchIterator interface
    (len() = batches per epoch; each __iter__ is one epoch with a fresh
    deterministic shuffle)."""

    def __init__(self, dataset, batch_size, collate_fn, shuffle=True,
                 seed=1234, drop_last=True, num_shards=1, shard_index=0,
                 num_threads=2, prefetch=4, num_workers=0):
        import grain

        self._grain = grain
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._epoch = 0

        n = len(dataset)
        # equal shard length on every process (multi-host lockstep):
        # truncate to the minimum shard size
        shard_len = n // num_shards if num_shards > 1 else n
        self._shard_len = shard_len
        self._len = (shard_len // batch_size if drop_last
                     else -(-shard_len // batch_size))

    def __len__(self):
        return self._len

    def _build(self, epoch):
        grain = self._grain
        ds = grain.MapDataset.source(_SourceAdapter(self.dataset))
        if self.shuffle:
            # shuffle the GLOBAL index stream (same permutation on every
            # process), then shard — keeps multi-host epochs disjoint,
            # like BatchIterator
            ds = ds.shuffle(seed=self.seed + epoch)
        if self.num_shards > 1:
            ds = ds[self.shard_index::self.num_shards][:self._shard_len]
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last,
                      batch_fn=self.collate_fn)
        it = ds.to_iter_dataset(grain.ReadOptions(
            num_threads=self.num_threads,
            prefetch_buffer_size=self.prefetch))
        if self.num_workers > 0:
            it = it.mp_prefetch(grain.MultiprocessingOptions(
                num_workers=self.num_workers))
        return it

    def __iter__(self):
        it = self._build(self._epoch)
        self._epoch += 1
        return iter(it)
