"""Pin the derived mosaic placement geometry to the reference case tables.

The oracles below are literal transcriptions of the reference's placement
case tables (``/root/reference/datasets/base_dataset.py:251-265`` and
``:293-316``), kept here as test fixtures so the production code can
derive the geometry instead.
"""

import numpy as np
import pytest

from ryolo_tpu.data.datasets import mosaic4_spans, mosaic9_box


def _mosaic4_oracle(i, xc, yc, w, h, s):
    if i == 0:
        x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
        x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
    elif i == 1:
        x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
        x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
    elif i == 2:
        x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
        x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
    else:
        x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
        x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
    return (x1a, x2a, x1b, x2b), (y1a, y2a, y1b, y2b)


def _mosaic9_oracle(i, w, h, w_, h_, wp, hp, s):
    if i == 0:
        c = s, s, s + w, s + h
    elif i == 1:
        c = s, s - h, s + w, s
    elif i == 2:
        c = s + wp, s - h, s + wp + w, s
    elif i == 3:
        c = s + w_, s, s + w_ + w, s + h
    elif i == 4:
        c = s + w_, s + hp, s + w_ + w, s + hp + h
    elif i == 5:
        c = s + w_ - w, s + h_, s + w_, s + h_ + h
    elif i == 6:
        c = s + w_ - wp - w, s + h_, s + w_ - wp, s + h_ + h
    elif i == 7:
        c = s - w, s + h_ - h, s, s + h_
    else:
        c = s - w, s + h_ - hp - h, s, s + h_ - hp
    return c


@pytest.mark.parametrize("seed", range(4))
def test_mosaic4_spans_match_case_table(seed):
    rng = np.random.default_rng(seed)
    s = 64
    for _ in range(50):
        xc, yc = rng.integers(s // 2, 3 * s // 2, 2)
        w, h = rng.integers(8, s + 1, 2)
        for i in range(4):
            got = mosaic4_spans(i, int(xc), int(yc), int(w), int(h), s)
            want = _mosaic4_oracle(i, int(xc), int(yc), int(w), int(h), s)
            assert got == want, (i, xc, yc, w, h)


@pytest.mark.parametrize("seed", range(4))
def test_mosaic9_boxes_match_case_table(seed):
    rng = np.random.default_rng(seed)
    s = 64
    for _ in range(50):
        w_, h_ = (int(v) for v in rng.integers(8, s + 1, 2))
        wp, hp = (int(v) for v in rng.integers(8, s + 1, 2))
        w, h = (int(v) for v in rng.integers(8, s + 1, 2))
        for i in range(9):
            got = mosaic9_box(i, (w, h), (w_, h_), (wp, hp), s)
            want = _mosaic9_oracle(i, w, h, w_, h_, wp, hp, s)
            assert got == want, (i, w, h, w_, h_, wp, hp)
