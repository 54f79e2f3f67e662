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
                 shard: Optional[tuple] = None,
                 device_augment: bool = False,
                 device_cache: bool = False):
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
            if n_hosts > 1 and len(dataset) % n_hosts and not (
                    shuffle or getattr(dataset, "augment", False)):
                # Shorter shards wrap their tail to stay in lockstep —
                # correct for (shuffled, augmented) training, but an eval
                # pass would then score the wrapped samples twice.
                import warnings

                warnings.warn(
                    f"DataLoader(shard={shard}): dataset length "
                    f"{len(dataset)} is not divisible by n_hosts; the "
                    "wrapped tail samples will be DOUBLE-COUNTED. Sharded "
                    "loading is intended for training — for eval, pad the "
                    "dataset or evaluate unsharded.",
                    stacklevel=2,
                )
        self.shard = shard
        # device-side augmentation: samples are render SPECS (tiles +
        # affines), rendered on device by
        # ryolo_tpu.data.device_augment.render_specs; E extra spec slots
        # hold mixup partners (overflow falls back to host rendering via
        # an identity spec — exact, just slower, P ≈ 0.3% at B=8)
        self.device_augment = device_augment
        if device_augment and not getattr(dataset, "augment", False):
            raise ValueError("device_augment requires an augmenting dataset")
        # device_cache: specs reference rows of a device-RESIDENT tile bank
        # (dataset.build_tile_bank()) instead of shipping tile pixels —
        # per-batch image traffic becomes (B, T) int32 indices.  A batch
        # whose mixup draws exceed the partner slots falls back to the
        # pixel-spec layout for that batch (exact; ~0.3%/batch at B=8,
        # mixup 0.15), so consumers must dispatch on the batch's keys
        # (device_augment.render_batch does).
        self.device_cache = device_cache
        if device_cache and not device_augment:
            raise ValueError("device_cache requires device_augment")
        self.extra_slots = max(1, -(-batch_size * 2 // 5))  # ceil(0.4·B)

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

    def _rng(self, index: int):
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index])
        )

    def _sample(self, index: int):
        if self.device_augment:
            return self.dataset.get_render_spec(index, self._rng(index),
                                                banked=self.device_cache)
        return self.dataset.get_sample(index, self._rng(index))

    def _collate(self, samples):
        B = len(samples)
        T = self.max_targets
        s = self.dataset.img_size
        img_dtype = (np.uint8 if getattr(self.dataset, "image_uint8", False)
                     else np.float32)
        images = np.zeros((B, s, s, 3), img_dtype)
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

    def _pack_labels(self, b, labels, tgt, csl, mask):
        T = self.max_targets
        n = min(len(labels), T)
        if len(labels) > T:
            self.n_dropped += len(labels) - T
        if n:
            tgt[b, :n] = labels[:n, 1:7]
            if self.csl:
                csl[b, :n] = labels[:n, 7:]
            mask[b, :n] = True

    def _identity_spec(self, index):
        """Host-rendered fallback spec (exact; used on mixup-slot overflow)."""
        from ryolo_tpu.data.device_augment import MAX_TILES

        s = self.dataset.img_size
        path, img, labels = self.dataset.get_sample(index, self._rng(index))
        tiles = np.zeros((MAX_TILES, s, s), np.uint32)
        # packed-RGB x-major tile layout (device_augment module docstring);
        # get_sample emits RGB so pack directly (pack_tile_u32 takes BGR)
        u8 = np.round(img * 255.0).astype(np.uint32)
        tiles[0] = (u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16)).T
        region = np.zeros((MAX_TILES, 4), np.float32)
        region[0] = [0, 0, s, s]
        spec = {
            "tiles": tiles, "region": region,
            "offset": np.zeros((MAX_TILES, 2), np.float32),
            "hsv": np.ones((MAX_TILES, 3), np.float32),
            "minv": np.array([[1, 0, 0], [0, 1, 0]], np.float32),
        }
        return path, spec, labels

    def _collate_specs(self, samples, indices):
        """Spec batch: B base slots + E mixup-partner slots (fixed shapes)."""
        from ryolo_tpu.data.device_augment import MAX_TILES

        B = len(samples)
        E = self.extra_slots
        T = self.max_targets
        s = self.dataset.img_size
        BS = B + E
        banked = self.device_cache
        if banked and sum(r is not None for _, _, r, _, _ in samples) > E:
            # partner slots exhausted: banked specs cannot host-render the
            # overflow sample (no pixel channel), so this BATCH falls back
            # to the pixel-spec layout — exact (same per-(seed,epoch,index)
            # rng draws), just pays the tile upload for this one batch
            banked = False
            samples = [
                self.dataset.get_render_spec(i, self._rng(i), banked=False)
                for i in indices
            ]
        tiles = (np.zeros((BS, MAX_TILES), np.int32) if banked
                 else np.zeros((BS, MAX_TILES, s, s), np.uint32))
        region = np.zeros((BS, MAX_TILES, 4), np.float32)
        offset = np.zeros((BS, MAX_TILES, 2), np.float32)
        hsv = np.ones((BS, MAX_TILES, 3), np.float32)
        minv = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32),
                       (BS, 1, 1))
        flip = np.zeros((B, 2), bool)
        mix_idx = np.full((B,), -1, np.int32)
        mix_r = np.zeros((B,), np.float32)
        tgt = np.zeros((B, T, 6), np.float32)
        csl = np.zeros((B, T, 180), np.float32) if self.csl else None
        mask = np.zeros((B, T), bool)
        paths = []

        def put(slot, spec):
            tiles[slot] = spec["tile_idx"] if banked else spec["tiles"]
            region[slot] = spec["region"]
            offset[slot] = spec["offset"]
            hsv[slot] = spec["hsv"]
            minv[slot] = spec["minv"]

        next_extra = B
        for b, ((path, specs, r, flips, labels), idx) in enumerate(
                zip(samples, indices)):
            if r is not None and next_extra >= B + E:
                # partner slots exhausted: host-render this sample (exact)
                path, spec, labels = self._identity_spec(idx)
                specs, r, flips = [spec], None, (False, False)
            paths.append(path)
            put(b, specs[0])
            flip[b] = flips
            if r is not None:
                put(next_extra, specs[1])
                mix_idx[b] = next_extra
                mix_r[b] = r
                next_extra += 1
            self._pack_labels(b, labels, tgt, csl, mask)

        tile_field = "spec_tile_idx" if banked else "spec_tiles"
        out = Batch(spec_region=region, spec_offset=offset,
                    spec_hsv=hsv, spec_minv=minv, spec_flip=flip,
                    spec_mix_idx=mix_idx, spec_mix_r=mix_r,
                    tgt=tgt, tgt_mask=mask, paths=paths,
                    **{tile_field: tiles})
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
                pending.append(
                    (idxs, [pool.submit(self._sample, i) for i in idxs])
                )
                return True

            for _ in range(self.prefetch + 1):
                if not submit_next():
                    break
            while pending:
                idxs, futs = pending.pop(0)
                samples = [f.result() for f in futs]
                submit_next()
                if self.device_augment:
                    yield self._collate_specs(samples, idxs)
                else:
                    yield self._collate(samples)


DATASETS = {
    "UCAS_AOD": UCASAODDataset,
    "DOTA": DOTADataset,
    "custom": CustomDataset,
}


def load_data(data_dir, class_names, dataset_type, hyp, csl, img_size=608,
              batch_size=4, augment=False, shuffle=True, max_targets=300,
              drop_last=False, seed=42, workers=4, shard=None,
              device_augment=False, cache_images=False, image_uint8=False,
              device_cache=False):
    """Dataset + loader factory, mirroring ``lib/load.py:9-21``'s contract.

    ``shard=(host_id, n_hosts)`` enables host-sharded loading for multi-host
    data parallelism (each host feeds its own devices a disjoint slice).
    ``device_augment`` makes the loader emit render SPECS (host does only
    decode + label math; pixels composite on device, see
    ryolo_tpu/data/device_augment.py); ``cache_images`` keeps decoded
    resized sources in RAM.  ``image_uint8`` emits RGB uint8 image batches
    for the un-augmented eval path — the jitted eval step normalizes with
    the same f32 /255 (bit-identical) at 1/4 the upload traffic.
    ``device_cache`` ships NO pixels per batch: the caller uploads
    ``dataset.build_tile_bank()`` once and batches carry bank indices
    (``spec_tile_idx``) — render with
    ``device_augment.render_batch(arrays, n_out, bank=...)``.
    """
    if dataset_type not in DATASETS:
        raise NotImplementedError(f"dataset type {dataset_type!r} not supported")
    dataset = DATASETS[dataset_type](
        data_dir, class_names, hyp, img_size=img_size, augment=augment,
        csl=csl, cache_images=cache_images,
    )
    if image_uint8:
        if augment:
            raise ValueError("image_uint8 is for the un-augmented eval path")
        dataset.image_uint8 = True
    loader = DataLoader(dataset, batch_size, csl=csl, shuffle=shuffle,
                        max_targets=max_targets, drop_last=drop_last,
                        seed=seed, workers=workers, shard=shard,
                        device_augment=device_augment,
                        device_cache=device_cache)
    return dataset, loader
