"""Dataset parsers + per-sample pipeline for rotated-box detection.

Re-design of ``datasets/*.py``: DOTA (8-point polygon + class-name rows,
``datasets/DOTA_dataset.py:19-49``), UCAS-AOD (tab-separated
``class x1..y4``, ``datasets/UCASAOD_dataset.py:20-51``), custom
(``cx cy w h θ label`` rows produced by ``xml2txt.py:20-35`` — the
reference's ``custom_dataset.py`` is stale/broken per SURVEY.md §2.8; the
format is implemented here with the fixed interface), and the label-free
``ImageDataset`` used by detect (``datasets/base_dataset.py:59-81``).

Per-sample output is numpy: ``(path, img_rgb_f32_hwc, labels)`` where
labels are reference-layout rows ``(N, 187)`` CSL = ``[0, cls, x, y, w, h,
θ, 180 bins]`` or ``(N, 7)`` otherwise, with xywh normalized (column 0 is
the batch-index slot filled by the collate).  Randomness is an explicit
``np.random.Generator`` (seeded per (epoch, index) by the loader).
"""

from __future__ import annotations

import glob
import math
import os
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ryolo_tpu.data.augment import (
    filter_by_center,
    horizontal_flip,
    hsv_augment,
    mixup,
    normalize_targets,
    pad_to_square,
    random_warping,
    vertical_flip,
)
from ryolo_tpu.geometry import csl_gaussian_labels_np

PAD_VALUE = (114, 114, 114)


def pack_tile_u32(img_bgr: np.ndarray) -> np.ndarray:
    """(h, w, 3) BGR uint8 -> (w, h) uint32 packed RGB, x-major.

    The device renderer's tile layout (see the layout note in
    :mod:`ryolo_tpu.data.device_augment`): word = R | G<<8 | B<<16, row
    index x (image column), lane index y (image row).
    """
    rgb = img_bgr[:, :, ::-1].astype(np.uint32)
    return (rgb[..., 0] | (rgb[..., 1] << 8) | (rgb[..., 2] << 16)).T


def polys_to_xywha_np(polys: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`ryolo_tpu.geometry.xyxyxyxy2xywha` (``(N, 8)``)."""
    x1, y1, x2, y2, x3, y3, x4, y4 = [polys[:, i] for i in range(8)]
    x = (x1 + x2 + x3 + x4) / 4
    y = (y1 + y2 + y3 + y4) / 4
    w = (np.hypot(x2 - x3, y2 - y3) + np.hypot(x1 - x4, y1 - y4)) / 2
    h = (np.hypot(x1 - x2, y1 - y2) + np.hypot(x4 - x3, y4 - y3)) / 2
    theta = -(np.arctan2(y1 - y2, x1 - x2) + np.arctan2(y4 - y3, x4 - x3)) / 2
    swap = w >= h
    w2 = np.where(swap, h, w)
    h2 = np.where(swap, w, h)
    theta = np.where(swap, np.where(theta > 0, theta - np.pi / 2,
                                    theta + np.pi / 2), theta)
    theta = np.where(theta >= np.pi / 2, theta - np.pi, theta)
    theta = np.where(theta < -np.pi / 2, theta + np.pi, theta)
    return np.stack([x, y, w2, h2, theta], -1)


def xywha_to_polys_np(boxes: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`ryolo_tpu.geometry.xywha2xyxyxyxy` (``(N, 5)`` -> ``(N, 4, 2)``)."""
    x, y, w, h, t = [boxes[:, i] for i in range(5)]
    c, s = np.cos(t), np.sin(t)
    dx = np.stack([-h, h, h, -h], -1) / 2
    dy = np.stack([-w, -w, w, w], -1) / 2
    px = x[:, None] + c[:, None] * dx + s[:, None] * dy
    py = y[:, None] - s[:, None] * dx + c[:, None] * dy
    return np.stack([px, py], -1)


def _anchored_span(anchor: int, extent: int, limit: int, forward: bool):
    """1-D placement of an image side against a canvas.

    The side (length ``extent``) is anchored at canvas coordinate
    ``anchor`` and grows forward or backward, clipped to ``[0, limit]``.
    Returns ``(c1, c2, s1, s2)``: the canvas span and the matching source
    span inside the image (clipping trims the far-from-anchor edge of the
    canvas span and therefore the far edge of the source).
    """
    if forward:
        c1, c2 = anchor, min(anchor + extent, limit)
        s1, s2 = 0, c2 - c1
    else:
        c1, c2 = max(anchor - extent, 0), anchor
        s1, s2 = extent - (c2 - c1), extent
    return c1, c2, s1, s2


def mosaic4_spans(i: int, xc: int, yc: int, w: int, h: int, s: int):
    """Quadrant placement for the 4-mosaic.

    Tile ``i`` occupies the quadrant ``(i & 1)`` right / ``(i >> 1)`` down
    of the mosaic center ``(xc, yc)`` on the 2s×2s canvas, with the corner
    touching the center anchored exactly there.  Same placements as
    ``base_dataset.py:251-265`` (quadrant case table), derived instead of
    enumerated.
    """
    x = _anchored_span(xc, w, 2 * s, forward=bool(i & 1))
    y = _anchored_span(yc, h, 2 * s, forward=bool(i >> 1))
    return x, y


def mosaic9_box(i: int, size, base, prev, s: int):
    """Unclipped canvas box for tile ``i`` of the 9-mosaic ring.

    The first tile sits at the canvas center cell ``[s, s]..[s+w0, s+h0]``;
    the other eight wrap clockwise around it (top, top-right, right,
    bottom-right, bottom, bottom-left, left, top-left).  Each tile anchors
    one corner on the center tile's edge frame — offset along that edge by
    the previous tile's extent for the second tile on a side — and grows
    away from the anchor in the signed directions below.  Reproduces the
    placements of ``base_dataset.py:293-316``.

    Args:
      size: ``(w, h)`` of this tile.
      base: ``(w0, h0)`` of the center tile.
      prev: ``(wp, hp)`` of the previously placed tile.
    """
    w, h = size
    w0, h0 = base
    wp, hp = prev
    left = top = s
    right, bottom = s + w0, s + h0
    anchor_x, anchor_y, grow_x, grow_y = [
        (left, top, 1, 1),            # 0: center
        (left, top, 1, -1),           # 1: top, on the upper edge
        (left + wp, top, 1, -1),      # 2: top-right, shifted past tile 1
        (right, top, 1, 1),           # 3: right, on the right edge
        (right, top + hp, 1, 1),      # 4: bottom-right, below tile 3
        (right, bottom, -1, 1),       # 5: bottom, under the lower edge
        (right - wp, bottom, -1, 1),  # 6: bottom-left, past tile 5
        (left, bottom, -1, -1),       # 7: left, on the left edge
        (left, bottom - hp, -1, -1),  # 8: top-left, above tile 7
    ][i]
    x1 = anchor_x if grow_x > 0 else anchor_x - w
    y1 = anchor_y if grow_y > 0 else anchor_y - h
    return x1, y1, x1 + w, y1 + h


class ImageDataset:
    """Label-free folder dataset for detect (``datasets/base_dataset.py:59-81``)."""

    def __init__(self, folder_path: str, img_size: int = 416, ext: str = "png",
                 image_uint8: bool = False):
        self.files = sorted(glob.glob(os.path.join(folder_path, f"*.{ext}")))
        self.img_size = img_size
        self.image_uint8 = image_uint8

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        path = self.files[index % len(self.files)]
        img = cv2.imread(path)
        img, _ = pad_to_square(img, (self.img_size, self.img_size), PAD_VALUE)
        if self.image_uint8:
            img = np.ascontiguousarray(img[:, :, ::-1])
        else:
            img = np.ascontiguousarray(img[:, :, ::-1],
                                       dtype=np.float32) / 255.0
        return path, img


class BaseDataset:
    """Shared mosaic/letterbox/augment/label pipeline (``base_dataset.py:83-363``)."""

    def __init__(self, hyp, img_size: int, augment: bool, csl: bool,
                 normalized_labels: bool, cache_images: bool = False):
        self.hyp = hyp
        self.img_size = img_size
        self.augment = augment
        self.csl = csl
        self.normalized_labels = normalized_labels
        self.mosaic_border = [-img_size // 2, -img_size // 2]
        self.img_files: List[str] = []
        self.label_files: List[str] = []
        # decoded+resized image cache (BGR uint8): with device-side
        # augmentation the imread/resize is the ONLY remaining host pixel
        # work, so caching it makes the loader label-math-bound (the
        # ultralytics ``--cache ram`` pattern)
        self.cache_images = cache_images
        self._img_cache: dict = {}
        # emit RGB uint8 samples instead of f32/255 (eval/infer path only):
        # the device normalizes with the SAME f32 division, bit-identical,
        # at 1/4 the host->device image traffic (set via load_data)
        self.image_uint8 = False
        # device tile bank (build_tile_bank): (h0, w0), (h, w) per index so
        # index-mode render specs skip host pixel work entirely
        self._bank_sizes: dict = {}

    # -- subclass interface -------------------------------------------------
    def load_files(self, label_path: str):
        """Return ``(polys (N, 8) float32 pixels-or-normalized, labels (N,))``."""
        raise NotImplementedError

    # -- pipeline -----------------------------------------------------------
    def __len__(self):
        return len(self.img_files)

    def _load_resized(self, index: int):
        """imread + resize to ≤ img_size (no HSV), optionally cached.

        Returns ``(img_bgr_u8, (h0, w0), (h, w))`` — the decode-only host
        work that remains when augmentation runs on device.
        """
        cached = self._img_cache.get(index)
        if cached is not None:
            img, size0, size = cached
            return img.copy(), size0, size
        img = cv2.imread(self.img_files[index])
        h, w = img.shape[:2]
        if img.ndim != 3 or img.shape[2] != 3:
            img = np.stack([img, img, img], -1).reshape(h, w, 3)
        r = self.img_size / max(h, w)
        if r != 1:
            interp = cv2.INTER_AREA if (r < 1 and not self.augment) else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(w * r), int(h * r)), interpolation=interp)
        if self.cache_images:
            self._img_cache[index] = (img, (h, w), img.shape[:2])
            return img.copy(), (h, w), img.shape[:2]
        return img, (h, w), img.shape[:2]

    def build_tile_bank(self) -> np.ndarray:
        """Decode+resize the WHOLE dataset once -> (N, 3, s, s) uint8 RGB.

        Rows are PACKED-RGB x-major (``bank[n, x, y]`` = R | G<<8 | B<<16
        of pixel (row y, col x)), content top-left — exactly the tile
        layout the per-spec render path ships (see the layout note in
        :mod:`ryolo_tpu.data.device_augment`: channel-minor uint8 wastes
        125/128 TPU lanes in the canvas paste, and uint8 windows are
        pathological for read-modify-write slices).  A device-resident copy of
        this array turns every later batch's image traffic into (B, T)
        int32 bank indices (see
        :func:`ryolo_tpu.data.device_augment.render_specs_banked`).
        N × s² × 4 bytes of HBM (2.56 MB/image at 800px); the caller
        ``jax.device_put``s it once per training run.
        """
        s = self.img_size
        n = len(self.img_files)
        bank = np.zeros((n, s, s), np.uint32)
        for i in range(n):
            img, size0, size = self._load_resized(i)
            h, w = size
            bank[i, :w, :h] = pack_tile_u32(img)
            self._bank_sizes[i] = (size0, size)
        return bank

    def _tile_meta(self, index: int, banked: bool):
        """((h0, w0), (h, w)) of the resized source; with the bank built the
        lookup costs no pixel work (no decode, no cache memcpy)."""
        if banked:
            return self._bank_sizes[index]
        img, size0, size = self._load_resized(index)
        return size0, size

    def _draw_hsv_gains(self, rng: np.random.Generator) -> np.ndarray:
        """The rng draw of :func:`hsv_augment` without applying it."""
        h, s, v = self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"]
        if not (h or s or v):
            return np.ones(3)
        return 1.0 + rng.uniform(-1, 1, 3) * np.array([h, s, v])

    def load_image(self, index: int, rng: Optional[np.random.Generator]):
        """imread + optional resize to img_size + HSV (``base_dataset.py:172-191``)."""
        img, size0, size = self._load_resized(index)
        if self.augment and rng is not None:
            hsv_augment(img, rng, self.hyp["hsv_h"], self.hyp["hsv_s"],
                        self.hyp["hsv_v"])
        return img, size0, size

    def load_target(self, index, pad, img_size0, img_size, border=None):
        """Polygon labels in padded-image pixels, ``(N, 9)`` ``[cls, x1..y4]``.

        Port of ``base_dataset.py:193-238`` (without the batch-index column;
        the collate adds it).
        """
        label_path = self.label_files[index % len(self.img_files)].rstrip()
        if not os.path.exists(label_path):
            raise FileNotFoundError(f"Label file {label_path} not found")
        polys, labels = self.load_files(label_path)
        if not len(labels):
            return np.zeros((0, 9), np.float32)
        polys = polys.astype(np.float32).copy()
        if not self.normalized_labels:
            h0, w0 = img_size0
            polys[:, 0::2] /= w0
            polys[:, 1::2] /= h0
        h_, w_ = img_size
        polys[:, 0::2] *= w_
        polys[:, 1::2] *= h_
        targets = np.concatenate(
            [labels.astype(np.float32)[:, None], polys], -1
        )
        if border is not None:
            targets = filter_by_center(targets, border)
        targets[:, 1::2] += pad[1]
        targets[:, 2::2] += pad[0]
        return targets

    def load_mosaic(self, index, rng):
        """4-image mosaic on a 2s×2s canvas (behavior of
        ``base_dataset.py:240-280``): each tile anchors the corner nearest
        the mosaic center at ``(xc, yc)`` and is clipped to the canvas —
        see :func:`mosaic4_spans` for the derivation."""
        s = self.img_size
        yc, xc = [int(rng.uniform(-x, 2 * s + x)) for x in self.mosaic_border]
        indices = [index] + list(rng.integers(0, len(self.img_files), 3))
        labels4 = []
        img4 = np.full((s * 2, s * 2, 3), 114, np.uint8)
        for i, idx in enumerate(indices):
            img, (h0, w0), (h, w) = self.load_image(idx, rng)
            (x1a, x2a, x1b, x2b), (y1a, y2a, y1b, y2b) = mosaic4_spans(
                i, xc, yc, w, h, s
            )
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            pad = (y1a - y1b, x1a - x1b)
            labels4.append(
                self.load_target(idx, pad, (h0, w0), (h, w),
                                 border=(x1b, x2b, y1b, y2b))
            )
        return img4, np.concatenate(labels4, 0)

    def load_mosaic9(self, index, rng):
        """9-image mosaic: a ring of 8 tiles around a center tile on a
        3s×3s canvas, randomly cropped to 2s×2s (behavior of
        ``base_dataset.py:282-340``); ring geometry derived in
        :func:`mosaic9_box`."""
        s = self.img_size
        indices = [index] + list(rng.integers(0, len(self.img_files), 8))
        labels9 = []
        img9 = np.full((s * 3, s * 3, 3), 114, np.uint8)
        prev = base = (0, 0)
        for i, idx in enumerate(indices):
            img, (h0, w0), (h, w) = self.load_image(idx, rng)
            if i == 0:
                base = (w, h)
            x1, y1, x2, y2 = mosaic9_box(i, (w, h), base, prev, s)
            cx1, cy1 = max(x1, 0), max(y1, 0)
            img9[cy1:y2, cx1:x2] = img[cy1 - y1:, cx1 - x1:][: y2 - cy1,
                                                             : x2 - cx1]
            prev = (w, h)
            labels9.append(
                self.load_target(idx, (y1, x1), (h0, w0), (h, w),
                                 border=(cx1 - x1, w, cy1 - y1, h))
            )
        labels9 = np.concatenate(labels9, 0)
        yc, xc = [int(rng.uniform(0, s)) for _ in self.mosaic_border]
        img9 = img9[yc:yc + 2 * s, xc:xc + 2 * s]
        labels9 = filter_by_center(labels9, (xc, xc + 2 * s, yc, yc + 2 * s))
        if len(labels9):
            labels9[:, 1::2] -= xc
            labels9[:, 2::2] -= yc
        return img9, labels9

    def get_sample(self, index: int, rng: np.random.Generator):
        """One augmented sample: ``(path, img_rgb_f32, labels (N, 187|7))``.

        Port of ``BaseDataset.__getitem__`` (``base_dataset.py:92-159``).
        """
        hyp = self.hyp
        if self.augment and rng.random() < hyp["mosaic"]:
            if rng.random() < 0.8:
                img, targets = self.load_mosaic(index, rng)
            else:
                img, targets = self.load_mosaic9(index, rng)
            img, targets = random_warping(img, targets, rng, hyp["rotate"],
                                          hyp["scale"], hyp["translate"],
                                          self.mosaic_border)
            if rng.random() < hyp["mixup"]:
                j = int(rng.integers(0, len(self.img_files)))
                if rng.random() < 0.8:
                    img2, targets2 = self.load_mosaic(j, rng)
                else:
                    img2, targets2 = self.load_mosaic9(j, rng)
                img2, targets2 = random_warping(img2, targets2, rng,
                                                hyp["rotate"], hyp["scale"],
                                                hyp["translate"],
                                                self.mosaic_border)
                img, targets = mixup(img, targets, img2, targets2, rng)
        else:
            img, (h0, w0), (h, w) = self.load_image(
                index, rng if self.augment else None
            )
            img, pad = pad_to_square(img, (self.img_size, self.img_size),
                                     PAD_VALUE)
            targets = self.load_target(index, pad, (h0, w0), (h, w))
            if self.augment:
                img, targets = random_warping(img, targets, rng,
                                              hyp["rotate"], hyp["scale"],
                                              hyp["translate"])

        targets = filter_by_center(targets, (0, img.shape[1], 0, img.shape[0]))
        targets = normalize_targets(targets, img.shape[:2])

        if self.augment and rng.random() < hyp["fliplr"]:
            img, targets = horizontal_flip(img, targets)
        if self.augment and rng.random() < hyp["flipud"]:
            img, targets = vertical_flip(img, targets)

        labels = self._finalize_labels(targets)

        if self.image_uint8:
            img = np.ascontiguousarray(img[:, :, ::-1])
        else:
            img = np.ascontiguousarray(img[:, :, ::-1],
                                       dtype=np.float32) / 255.0
        return self.img_files[index], img, labels


    # -- device-side augmentation specs ------------------------------------
    # get_render_spec draws the SAME rng sequence as get_sample but defers
    # all pixel work to ryolo_tpu.data.device_augment.render_specs; only
    # decode/resize and the label math stay on host.  Parity pinned by
    # tests/test_device_augment.py.

    def _warp_params(self, rng, canvas_hw, border):
        """Mirror of ``augment.random_warping``'s draws + matrices.

        Returns ``(rot (2,2), shift (2,), center (2,), minv (2,3))`` where
        ``minv`` maps output pixel coords back to canvas coords.
        """
        hyp = self.hyp
        height = canvas_hw[0] + border[0] * 2
        width = canvas_hw[1] + border[1] * 2
        theta = np.deg2rad(rng.uniform(-hyp["rotate"], hyp["rotate"]))
        sc = rng.uniform(1 - hyp["scale"], 1.1 + hyp["scale"])
        t = hyp["translate"]
        shift = np.array([rng.uniform(0.3 - t, 0.3 + t) * width,
                          rng.uniform(0.3 - t, 0.3 + t) * height])
        rot = sc * np.array([[np.cos(theta), np.sin(theta)],
                             [-np.sin(theta), np.cos(theta)]])
        center = np.array([canvas_hw[1], canvas_hw[0]]) / 2.0
        rinv = rot.T / (sc * sc)  # (s·R)^-1 = Rᵀ/s
        minv = np.concatenate(
            [rinv, (center - rinv @ shift)[:, None]], axis=1
        ).astype(np.float32)
        return rot, shift, center, minv

    def _warp_targets(self, targets, rot, shift, center):
        """Label side of ``random_warping`` (same closed form)."""
        if len(targets):
            targets = targets.copy()
            pts = targets[:, 1:].reshape(-1, 4, 2)
            targets[:, 1:] = (pts @ rot.T + shift - rot @ center).reshape(-1, 8)
        return targets

    def _spec_mosaic(self, index, rng, use9: bool, banked: bool = False):
        """Tiles/regions/offsets + canvas-space labels for a mosaic draw.

        ``banked``: emit bank row indices instead of tile pixels (the
        device-resident tile-bank mode; same rng order, same labels).
        """
        from ryolo_tpu.data.device_augment import MAX_TILES

        s = self.img_size
        tiles = (None if banked
                 else np.zeros((MAX_TILES, s, s), np.uint32))
        tile_idx = np.zeros((MAX_TILES,), np.int32)
        region = np.zeros((MAX_TILES, 4), np.float32)
        offset = np.zeros((MAX_TILES, 2), np.float32)
        hsv = np.ones((MAX_TILES, 3), np.float32)
        labels = []
        if not use9:
            yc, xc = [int(rng.uniform(-x, 2 * s + x))
                      for x in self.mosaic_border]
            indices = [index] + list(rng.integers(0, len(self.img_files), 3))
            for i, idx in enumerate(indices):
                if banked:
                    (h0, w0), (h, w) = self._tile_meta(idx, True)
                else:
                    img, (h0, w0), (h, w) = self._load_resized(idx)
                    # ship packed-RGB x-major (see device_augment layouts)
                    tiles[i, :w, :h] = pack_tile_u32(img)
                hsv[i] = self._draw_hsv_gains(rng)
                tile_idx[i] = idx
                (x1a, x2a, x1b, x2b), (y1a, y2a, y1b, y2b) = mosaic4_spans(
                    i, xc, yc, w, h, s
                )
                region[i] = [x1a, y1a, x2a, y2a]
                offset[i] = [x1a - x1b, y1a - y1b]
                labels.append(
                    self.load_target(idx, (y1a - y1b, x1a - x1b), (h0, w0),
                                     (h, w), border=(x1b, x2b, y1b, y2b))
                )
            targets = np.concatenate(labels, 0)
            crop = (0.0, 0.0)
        else:
            indices = [index] + list(rng.integers(0, len(self.img_files), 8))
            prev = base = (0, 0)
            for i, idx in enumerate(indices):
                if banked:
                    (h0, w0), (h, w) = self._tile_meta(idx, True)
                else:
                    img, (h0, w0), (h, w) = self._load_resized(idx)
                    tiles[i, :w, :h] = pack_tile_u32(img)
                hsv[i] = self._draw_hsv_gains(rng)
                tile_idx[i] = idx
                if i == 0:
                    base = (w, h)
                x1, y1, x2, y2 = mosaic9_box(i, (w, h), base, prev, s)
                cx1, cy1 = max(x1, 0), max(y1, 0)
                region[i] = [cx1, cy1, x2, y2]
                offset[i] = [x1, y1]
                prev = (w, h)
                labels.append(
                    self.load_target(idx, (y1, x1), (h0, w0), (h, w),
                                     border=(cx1 - x1, w, cy1 - y1, h))
                )
            targets = np.concatenate(labels, 0)
            yc, xc = [int(rng.uniform(0, s)) for _ in self.mosaic_border]
            # the host pipeline warps the CROPPED canvas: content outside
            # the crop window becomes border — clip ownership to match.
            # The crop folds into region/offset (NOT minv), so spec canvas
            # coordinates are always [0, 2s)^2 regardless of mosaic mode —
            # pure algebra shift, identical taps; it also lets the
            # separable renderer materialize a fixed-size canvas.
            region[:, 0] = np.clip(region[:, 0], xc, xc + 2 * s) - xc
            region[:, 1] = np.clip(region[:, 1], yc, yc + 2 * s) - yc
            region[:, 2] = np.clip(region[:, 2], xc, xc + 2 * s) - xc
            region[:, 3] = np.clip(region[:, 3], yc, yc + 2 * s) - yc
            offset[:, 0] -= xc
            offset[:, 1] -= yc
            targets = filter_by_center(targets,
                                       (xc, xc + 2 * s, yc, yc + 2 * s))
            if len(targets):
                targets = targets.copy()
                targets[:, 1::2] -= xc
                targets[:, 2::2] -= yc
            crop = (0.0, 0.0)
        return tiles, tile_idx, region, offset, hsv, crop, targets

    @staticmethod
    def _tile_key(tiles, tile_idx):
        return ({"tiles": tiles} if tiles is not None
                else {"tile_idx": tile_idx})

    def get_render_spec(self, index: int, rng: np.random.Generator,
                        banked: bool = False):
        """Device-augmentation twin of :meth:`get_sample`.

        Returns ``(path, specs, mix_r, flips, labels)`` where ``specs`` is
        ``[base]`` or ``[base, mixup_partner]``, ``flips`` is the (lr, ud)
        bool pair, and ``labels`` are the final reference-layout rows —
        identical to what :meth:`get_sample` would produce for the same
        ``(index, rng)``, since both run the same label math in the same
        rng order.

        ``banked``: specs carry ``tile_idx`` bank rows instead of ``tiles``
        pixels (requires :meth:`build_tile_bank` first); rng order and
        labels are unchanged, so the two modes are interchangeable per
        (index, rng).
        """
        if not self.augment:
            raise ValueError("render specs exist for the augment pipeline; "
                             "eval/detect letterboxing stays host-side")
        if banked and not self._bank_sizes:
            raise ValueError("banked render specs need build_tile_bank() "
                             "called first")
        hyp = self.hyp
        s = self.img_size
        mosaic_draw = rng.random() < hyp["mosaic"]
        if mosaic_draw:
            use9 = not (rng.random() < 0.8)
            tiles, tidx, region, offset, hsv, crop, targets = (
                self._spec_mosaic(index, rng, use9, banked)
            )
            rot, shift, center, minv = self._warp_params(
                rng, (2 * s, 2 * s), self.mosaic_border
            )
            targets = self._warp_targets(targets, rot, shift, center)
            minv = minv.copy()
            minv[:, 2] += np.asarray(crop, np.float32)
            specs = [{**self._tile_key(tiles, tidx), "region": region,
                      "offset": offset, "hsv": hsv, "minv": minv}]
            mix_r = None
            if rng.random() < hyp["mixup"]:
                j = int(rng.integers(0, len(self.img_files)))
                use9b = not (rng.random() < 0.8)
                t2, ti2, r2, o2, g2, crop2, targets2 = self._spec_mosaic(
                    j, rng, use9b, banked
                )
                rot2, shift2, center2, minv2 = self._warp_params(
                    rng, (2 * s, 2 * s), self.mosaic_border
                )
                targets2 = self._warp_targets(targets2, rot2, shift2, center2)
                minv2 = minv2.copy()
                minv2[:, 2] += np.asarray(crop2, np.float32)
                specs.append({**self._tile_key(t2, ti2), "region": r2,
                              "offset": o2, "hsv": g2, "minv": minv2})
                mix_r = float(rng.beta(8.0, 8.0))
                targets = np.concatenate([targets, targets2], 0)
        else:
            spec, targets = self._spec_letterbox_warp(index, rng, banked)
            specs = [spec]
            mix_r = None

        targets = filter_by_center(targets, (0, s, 0, s))
        targets = normalize_targets(targets, (s, s))

        flip_lr = self.augment and rng.random() < hyp["fliplr"]
        if flip_lr and len(targets):
            targets = targets.copy()
            targets[:, 1::2] = 1.0 - targets[:, 1::2]
        flip_ud = self.augment and rng.random() < hyp["flipud"]
        if flip_ud and len(targets):
            targets = targets.copy()
            targets[:, 2::2] = 1.0 - targets[:, 2::2]

        labels = self._finalize_labels(targets)
        return (self.img_files[index], specs, mix_r, (flip_lr, flip_ud),
                labels)

    def _spec_letterbox_warp(self, index, rng, banked: bool = False):
        """Non-mosaic augmented spec (letterbox + random warp)."""
        from ryolo_tpu.data.device_augment import MAX_TILES

        s = self.img_size
        tiles = None
        if banked:
            (h0, w0), (h, w) = self._tile_meta(index, True)
        else:
            img, (h0, w0), (h, w) = self._load_resized(index)
            tiles = np.zeros((MAX_TILES, s, s), np.uint32)
            tiles[0, :w, :h] = pack_tile_u32(img)
        gains = self._draw_hsv_gains(rng)
        tile_idx = np.zeros((MAX_TILES,), np.int32)
        tile_idx[0] = index
        region = np.zeros((MAX_TILES, 4), np.float32)
        offset = np.zeros((MAX_TILES, 2), np.float32)
        hsv = np.ones((MAX_TILES, 3), np.float32)
        hsv[0] = gains
        dw, dh = (s - w) / 2, (s - h) / 2
        top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
        region[0] = [left, top, left + w, top + h]
        offset[0] = [left, top]
        targets = self.load_target(index, (dh, dw), (h0, w0), (h, w))
        rot, shift, center, minv = self._warp_params(rng, (s, s), (0, 0))
        targets = self._warp_targets(targets, rot, shift, center)
        return ({**self._tile_key(tiles, tile_idx), "region": region,
                 "offset": offset, "hsv": hsv, "minv": minv}, targets)

    def _finalize_labels(self, targets):
        """Polygon targets -> reference label rows (shared with get_sample)."""
        n = len(targets)
        width = 187 if self.csl else 7
        labels = np.zeros((n, width), np.float32)
        if n:
            rboxes = polys_to_xywha_np(targets[:, 1:])
            labels[:, 1] = targets[:, 0]
            labels[:, 2:7] = rboxes
            if self.csl:
                labels[:, 7:] = csl_gaussian_labels_np(
                    rboxes[:, 4] * 180 / np.pi + 90, sig=6.0
                )
        return labels


class DOTADataset(BaseDataset):
    """DOTA split: ``images/*.png`` + ``annfiles/*.txt`` polygon rows."""

    def __init__(self, data_dir, class_names, hyp, img_size, augment, csl,
                 normalized_labels=False, cache_images=False):
        super().__init__(hyp, img_size, augment, csl, normalized_labels,
                         cache_images=cache_images)
        self.img_files = sorted(
            glob.glob(os.path.join(data_dir, "images", "*.png"))
        )
        self.label_files = [
            p.replace("images", "annfiles").replace(".png", ".txt")
            for p in self.img_files
        ]
        self.category = {
            name.replace(" ", "-"): i for i, name in enumerate(class_names)
        }

    def load_files(self, label_path):
        polys, labels = [], []
        with open(label_path) as f:
            for line in f:
                parts = line.split(" ")
                if len(parts) < 9:
                    continue
                polys.append([float(v) for v in parts[:8]])
                labels.append(self.category[parts[8].strip()])
        if not labels:
            return np.zeros((0, 8), np.float32), np.zeros((0,), np.float32)
        return np.asarray(polys, np.float32), np.asarray(labels, np.float32)


class UCASAODDataset(BaseDataset):
    """UCAS-AOD: per-image ``.txt`` with tab-separated ``class x1..y4``."""

    def __init__(self, data_dir, class_names, hyp, img_size, augment, csl,
                 normalized_labels=False, cache_images=False):
        super().__init__(hyp, img_size, augment, csl, normalized_labels,
                         cache_images=cache_images)
        self.img_files = sorted(glob.glob(os.path.join(data_dir, "*.png")))
        self.label_files = [p.replace(".png", ".txt") for p in self.img_files]
        self.category = {
            name.replace(" ", "-"): i for i, name in enumerate(class_names)
        }

    def load_files(self, label_path):
        polys, labels = [], []
        with open(label_path) as f:
            for line in f:
                parts = line.split("\t")
                if len(parts) < 9:
                    continue
                polys.append([float(v) for v in parts[1:9]])
                labels.append(self.category[parts[0].strip()])
        if not labels:
            return np.zeros((0, 8), np.float32), np.zeros((0,), np.float32)
        return np.asarray(polys, np.float32), np.asarray(labels, np.float32)


class CustomDataset(BaseDataset):
    """labelImg2-style custom format: ``cx cy w h θ label`` rows (pixels,
    θ radians), as produced by ``xml2txt.py:20-35``.  The reference's
    ``custom_dataset.py`` is broken (mismatched interface, SURVEY.md §2.8);
    this implements the format with the standard interface: rows are
    converted to clockwise corner polygons so the shared pipeline applies.
    """

    def __init__(self, data_dir, class_names, hyp, img_size, augment, csl,
                 normalized_labels=False, ext="jpg", cache_images=False):
        super().__init__(hyp, img_size, augment, csl, normalized_labels,
                         cache_images=cache_images)
        self.img_files = sorted(glob.glob(os.path.join(data_dir, f"*.{ext}")))
        if not self.img_files:
            self.img_files = sorted(glob.glob(os.path.join(data_dir, "*.png")))
            ext = "png"
        self.label_files = [p.replace(f".{ext}", ".txt") for p in self.img_files]
        self.category = {
            name.replace(" ", "-"): i for i, name in enumerate(class_names)
        }

    def load_files(self, label_path):
        rows = []
        labels = []
        with open(label_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 6:
                    continue
                x, y, w, h, a = (float(v) for v in parts[:5])
                # wrap θ into [-π/2, π/2) with long-side-h convention
                if w > h:
                    w, h = h, w
                    a += math.pi / 2
                a = (a + math.pi / 2) % math.pi - math.pi / 2
                rows.append([x, y, w, h, a])
                lab = parts[5].strip()
                try:
                    labels.append(float(lab))
                except ValueError:
                    labels.append(self.category[lab.replace(" ", "-")])
        if not labels:
            return np.zeros((0, 8), np.float32), np.zeros((0,), np.float32)
        polys = xywha_to_polys_np(np.asarray(rows, np.float32)).reshape(-1, 8)
        return polys.astype(np.float32), np.asarray(labels, np.float32)
