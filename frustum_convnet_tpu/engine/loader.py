"""Host-side batch loader: shuffling, multi-host sharding, threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory, drop_last)`` (`/root/reference/train/train_net_det.py:262-286`)
with a TPU-appropriate design:

* deterministic per-epoch shuffling from a seeded generator (seed 3 + epoch);
* every host reads only its ``jax.process_index()`` shard of each global
  batch (multi-host data parallelism needs no other change);
* a background thread assembles the next batches while the device computes
  (the analogue of dataloader workers — collation here is cheap numpy
  stacking, so one thread suffices and avoids fork overhead);
* static shapes: ``drop_last`` always on for training.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from frustum_convnet_tpu.data.provider import collate_batch


class BatchLoader:
    def __init__(self, dataset, batch_size: int, num_scales: int,
                 shuffle: bool = False, drop_last: bool = False, seed: int = 3,
                 augment_rng: bool = True, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.global_batch = batch_size
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.local_batch = batch_size // process_count
        self.num_scales = num_scales
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.augment_rng = augment_rng
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch
        return (n + self.global_batch - 1) // self.global_batch

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield collated numpy batches for one epoch (prefetched)."""
        order_rng = np.random.default_rng(self.seed + epoch)
        n = len(self.dataset)
        order = order_rng.permutation(n) if self.shuffle else np.arange(n)

        num_batches = len(self)
        q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=self.prefetch)

        def worker():
            item_rng = np.random.default_rng((self.seed, epoch, self.process_index))
            try:
                for b in range(num_batches):
                    sel = order[b * self.global_batch:(b + 1) * self.global_batch]
                    # this host's contiguous sub-shard of the global batch
                    lo = self.process_index * self.local_batch
                    sel = sel[lo:lo + self.local_batch]
                    items = [self.dataset.__getitem__(int(i), item_rng) for i in sel]
                    q.put(collate_batch(items, self.num_scales))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
