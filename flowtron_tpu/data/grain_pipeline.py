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


class _PermutedView:
    """Index-mapped view: position i -> dataset[idx[i]] (the per-epoch
    permutation/shard/wrap plan computed in numpy)."""

    def __init__(self, dataset, idx):
        self._dataset = dataset
        self._idx = np.asarray(idx)

    def __len__(self):
        return len(self._idx)

    def __getitem__(self, i):
        return self._dataset[int(self._idx[int(i)])]


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
        # ceil + wrap-around padding, matching BatchIterator — truncating
        # to the floor would silently drop tail samples (and produce ZERO
        # validation batches when num_shards > n)
        if num_shards > 1 and n < num_shards:
            raise ValueError(
                f"dataset has {n} samples but num_shards={num_shards}; "
                f"every process needs at least one sample")
        shard_len = -(-n // num_shards) if num_shards > 1 else n
        self._shard_len = shard_len
        self._len = (shard_len // batch_size if drop_last
                     else -(-shard_len // batch_size))

    def __len__(self):
        return self._len

    def _build(self, epoch):
        grain = self._grain
        # permutation + sharding in numpy with BatchIterator's exact
        # semantics: shuffle the GLOBAL index stream (same seeded
        # permutation on every process), stride-shard it, pad to the
        # common ceil length by wrapping the shard's own head
        # (np.resize). grain's built-in shuffle/repeat can't express the
        # wrap — .repeat() reshuffles its second epoch, which would leak
        # other shards' samples into the padding.
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index::self.num_shards]
            idx = np.resize(idx, self._shard_len)
        ds = grain.MapDataset.source(_PermutedView(self.dataset, idx))
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
