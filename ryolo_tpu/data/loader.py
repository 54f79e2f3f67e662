"""Batching + prefetch: the TPU-side replacement for torch DataLoader.

The reference collates ragged per-image target lists by concatenation
(``datasets/base_dataset.py:161-167``) — the classic dynamic-shape pattern
XLA cannot jit.  Here every batch is **fixed shape**:

  * ``images``  (B, S, S, 3) float32 RGB in [0, 1]
  * ``tgt``     (B, T, 6)   ``[cls, x, y, w, h, θ]`` normalized
  * ``tgt_csl`` (B, T, 180) CSL bins (csl mode only)
  * ``tgt_mask``(B, T)      bool validity

with T = ``max_targets`` (overflow truncated, counted in ``n_dropped``).
A small thread pool overlaps cv2 decode/augment with device compute
(replaces ``num_workers=8`` of ``lib/load.py:19``; cv2 releases the GIL).

``load_data`` keeps the reference dispatch contract (``lib/load.py:9-21``).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, Optional

import numpy as np

from ryolo_tpu.data.datasets import (
    CustomDataset,
    DOTADataset,
    UCASAODDataset,
)


class Batch(dict):
    """Dict batch with attribute access."""

    __getattr__ = dict.__getitem__


class DataLoader:
    def __init__(self, dataset, batch_size: int, csl: bool,
                 shuffle: bool = True, max_targets: int = 300,
                 seed: int = 42, drop_last: bool = False,
                 workers: int = 4, prefetch: int = 2,
                 shard: Optional[tuple] = None):
        """``shard=(host_id, n_hosts)`` splits the (epoch-shuffled) sample
        order across hosts for multi-host data parallelism: each host loads
        a disjoint 1/n_hosts slice per epoch (SURVEY §5.8 host-sharded
        loading; the per-host batch then shards over that host's devices).
        All hosts see the same length (shorter shards repeat their tail) so
        collective steps stay in lockstep.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.csl = csl
        self.shuffle = shuffle
        self.max_targets = max_targets
        self.seed = seed
        self.drop_last = drop_last
        self.workers = workers
        self.prefetch = prefetch
        self.epoch = 0
        self.n_dropped = 0
        if shard is not None:
            host, n_hosts = shard
            if not (0 <= host < n_hosts):
                raise ValueError(f"bad shard {shard}")
        self.shard = shard

    def _shard_len(self):
        n = len(self.dataset)
        if self.shard is None:
            return n
        return (n + self.shard[1] - 1) // self.shard[1]  # padded: lockstep

    def __len__(self):
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _sample(self, index: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index])
        )
        return self.dataset.get_sample(index, rng)

    def _collate(self, samples):
        B = len(samples)
        T = self.max_targets
        s = self.dataset.img_size
        images = np.zeros((B, s, s, 3), np.float32)
        tgt = np.zeros((B, T, 6), np.float32)
        csl = np.zeros((B, T, 180), np.float32) if self.csl else None
        mask = np.zeros((B, T), bool)
        paths = []
        for b, (path, img, labels) in enumerate(samples):
            paths.append(path)
            images[b] = img
            n = min(len(labels), T)
            if len(labels) > T:
                self.n_dropped += len(labels) - T
            if n:
                tgt[b, :n] = labels[:n, 1:7]
                if self.csl:
                    csl[b, :n] = labels[:n, 7:]
                mask[b, :n] = True
        out = Batch(images=images, tgt=tgt, tgt_mask=mask, paths=paths)
        if self.csl:
            out["tgt_csl"] = csl
        return out

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, 0xB00])
            ).shuffle(order)
        if self.shard is not None:
            host, n_hosts = self.shard
            per = self._shard_len()
            # strided split of the shared shuffle (same seed on every host),
            # wrapped so every host yields exactly `per` samples
            idx = (host + np.arange(per) * n_hosts) % n
            order = order[idx]
            n = per
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]

        batches = [
            order[i:i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]

        with cf.ThreadPoolExecutor(max_workers=self.workers) as pool:
            # Pipeline: keep `prefetch` batches in flight.
            pending = []
            it = iter(batches)

            def submit_next():
                try:
                    idxs = next(it)
                except StopIteration:
                    return False
                pending.append([pool.submit(self._sample, i) for i in idxs])
                return True

            for _ in range(self.prefetch + 1):
                if not submit_next():
                    break
            while pending:
                futs = pending.pop(0)
                samples = [f.result() for f in futs]
                submit_next()
                yield self._collate(samples)


DATASETS = {
    "UCAS_AOD": UCASAODDataset,
    "DOTA": DOTADataset,
    "custom": CustomDataset,
}


def load_data(data_dir, class_names, dataset_type, hyp, csl, img_size=608,
              batch_size=4, augment=False, shuffle=True, max_targets=300,
              drop_last=False, seed=42, workers=4, shard=None):
    """Dataset + loader factory, mirroring ``lib/load.py:9-21``'s contract.

    ``shard=(host_id, n_hosts)`` enables host-sharded loading for multi-host
    data parallelism (each host feeds its own devices a disjoint slice).
    """
    if dataset_type not in DATASETS:
        raise NotImplementedError(f"dataset type {dataset_type!r} not supported")
    dataset = DATASETS[dataset_type](
        data_dir, class_names, hyp, img_size=img_size, augment=augment, csl=csl
    )
    loader = DataLoader(dataset, batch_size, csl=csl, shuffle=shuffle,
                        max_targets=max_targets, drop_last=drop_last,
                        seed=seed, workers=workers, shard=shard)
    return dataset, loader
