"""Pallas MXU warp kernel vs the XLA gather renderer.

The kernel (`ryolo_tpu/ops/pallas_warp.py`) computes the same integer tap
values and the same f32 lerp expressions as `device_augment._warp_block`;
outputs may differ only by FMA-contraction ULPs at exact rounding
boundaries, so the pin is max |diff| <= 1 with >= 99.9% of pixels exact
(measured: ~1 pixel per 40k).  On the CPU test mesh the kernel runs in
Pallas interpreter mode (same program the TPU compiles).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_device_augment import HYP, _dataset, _rng, synth  # noqa: F401


def _rand_affine(rng, s):
    """A spec-builder-like inverse affine (rotation/scale/translation)."""
    th = rng.uniform(-np.pi / 4, np.pi / 4)
    sc = rng.uniform(0.5, 1.6)
    rinv = np.array([[np.cos(th), np.sin(th)],
                     [-np.sin(th), np.cos(th)]]).T / sc
    t = rng.uniform(-0.3 * s, 2.2 * s, 2)
    return np.concatenate([rinv, t[:, None]], 1).astype(np.float32)


def _assert_close_int(ref, got, max_bad_frac=1e-3):
    diff = np.abs(ref.astype(np.float64) - got.astype(np.float64))
    assert diff.max() <= 1.0, f"max diff {diff.max()}"
    frac = (diff > 0).mean()
    assert frac <= max_bad_frac, f"{frac:.2e} pixels differ"


def test_kernel_matches_warp_block():
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import _warp_block
    from ryolo_tpu.ops.pallas_warp import warp_canvas_batch

    rng = np.random.default_rng(0)
    s = 64
    C = 2 * s + 2
    canv = rng.integers(0, 256, (4, C, C, 3), dtype=np.uint8)
    minv = np.stack([
        _rand_affine(rng, s),
        _rand_affine(rng, s),
        # identity (letterbox spec) and far off-canvas translation
        np.array([[1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[1, 0, 9000], [0, 1, -9000]], np.float32),
    ])
    ref = np.stack([
        np.asarray(_warp_block(jnp.asarray(canv[k].transpose(2, 1, 0)),
                               jnp.asarray(minv[k]), s))  # planar x-major
        for k in range(4)
    ])
    got = np.asarray(warp_canvas_batch(jnp.asarray(canv),
                                       jnp.asarray(minv), s))
    _assert_close_int(ref, got)
    # the off-canvas spec must be all PAD in both
    assert (ref[3] == 114.0).all() and (got[3] == 114.0).all()


def test_kernel_window_edges():
    """Taps straddling the canvas border (partial PAD ring reads) and
    rotations at the derivative bound still match the gather renderer."""
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import _warp_block
    from ryolo_tpu.ops.pallas_warp import MAX_ROW_NORM, warp_canvas_batch

    rng = np.random.default_rng(7)
    s = 64
    C = 2 * s + 2
    canv = rng.integers(0, 256, (3, C, C, 3), dtype=np.uint8)
    d = MAX_ROW_NORM / 2.0 * 0.999  # |row|_1 right at the bound
    minv = np.stack([
        # shifts placing the output across the canvas edge
        np.array([[1, 0, -31.5], [0, 1, C - 32.5]], np.float32),
        np.array([[0.5, 0.5, -1.0], [-0.5, 0.5, C - 33.0]], np.float32),
        np.array([[d, d, 20.2], [-d, d, 40.7]], np.float32),
    ])
    ref = np.stack([
        np.asarray(_warp_block(jnp.asarray(canv[k].transpose(2, 1, 0)),
                               jnp.asarray(minv[k]), s))  # planar x-major
        for k in range(3)
    ])
    got = np.asarray(warp_canvas_batch(jnp.asarray(canv),
                                       jnp.asarray(minv), s))
    _assert_close_int(ref, got)


def test_fits_predicates():
    from ryolo_tpu.ops.pallas_warp import fits_hyp, fits_pallas_warp

    assert fits_hyp({"scale": 0.5}, 96)
    assert not fits_hyp({"scale": 0.7}, 96)   # sqrt(2)/0.3 > bound
    assert not fits_hyp({"scale": 0.5}, 100)  # not a multiple of 32
    # tiny canvases fit too: the wrapper end-pads past the patch window
    assert fits_hyp({"scale": 0.5}, 32)
    ident = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    assert fits_pallas_warp(ident, 96)
    big = ident.copy()
    big[0, 0, 0] = 5.0
    assert not fits_pallas_warp(big, 96)


def test_render_specs_pallas_matches_canvas(synth):  # noqa: F811
    """Full renderer parity on real loader specs (mosaic4/9, letterbox,
    mixup partners) between method="pallas" and method="canvas"."""
    import jax.numpy as jnp

    import ryolo_tpu.data.device_augment as da

    ds = _dataset(synth)
    n_specs = 0
    for seed in (1, 2, 3):
        for index in range(0, 6, 2):
            _, specs, _, _, _ = ds.get_render_spec(index, _rng(seed, index))
            arrs = {
                k: jnp.asarray(np.stack([sp[k] for sp in specs]))
                for k in ("tiles", "region", "offset", "hsv", "minv")
            }
            n = len(specs)
            flip = jnp.zeros((n, 2), bool)
            mix_idx = jnp.full((n,), -1, jnp.int32)
            mix_r = jnp.zeros((n,), jnp.float32)
            canv = np.asarray(da.render_specs(
                arrs["tiles"], arrs["region"], arrs["offset"], arrs["hsv"],
                arrs["minv"], flip, mix_idx, mix_r, n_out=n,
                method="canvas"))
            pal = np.asarray(da.render_specs(
                arrs["tiles"], arrs["region"], arrs["offset"], arrs["hsv"],
                arrs["minv"], flip, mix_idx, mix_r, n_out=n,
                method="pallas"))
            _assert_close_int(canv * 255.0, pal * 255.0)
            n_specs += n
    assert n_specs >= 9


def test_pick_method_is_canvas_on_cpu():
    from ryolo_tpu.data.device_augment import pick_method

    assert pick_method(HYP, 96) == "canvas"
