"""Pallas TPU kernel: affine bilinear canvas warp via one-hot MXU matmuls.

The device-side augmentation renderer's last stage warps the materialized
mosaic canvas down to the output image (the device equivalent of
``cv2.warpAffine`` in the reference's ``lib/augmentations.py:42-74``).  As
an XLA program that warp is a per-pixel gather, and the TPU gather engine
is byte-bound at ~0.75 GB/s of gathered bytes regardless of locality
(measured; see ROUND3.md "Renderer gather-floor investigation") — ~165 ms
for a 12-spec 800px batch.  This kernel goes below that floor by never
gathering:

  * the output image is processed in 32x32 tiles; an affine map with
    bounded derivative sends each tile into a <=128-wide window of the
    canvas, so ONE dynamic async DMA stages a (3, 128, 128) uint8 patch
    from HBM into VMEM per tile;
  * per-pixel bilinear taps become one-hot row-selection MATMULS on the
    MXU: ``patch(x,y) @ onehot(y_tap)(y,pixel)`` fetches a whole
    x-window of each pixel's two source rows (2 taps x 3 channels = six
    128x128x1024 bf16 matmuls per tile, ~6 MXU cycles/pixel), and the
    x-taps reduce out on the VPU through {0,1} masks.

Exactness: one-hot bf16 weights are exactly {0, 1} and uint8 pixel values
are exact in bf16, so every tap value reaches f32 exactly; tap weights and
the final blend use the same f32 expressions and association as the XLA
renderer.  The kernel output is BIT-IDENTICAL to
``device_augment._warp_block`` (pinned by ``tests/test_pallas_warp.py``).

Derivative bound: each |row|_1 of the output->canvas affine must be <= 4
(window 31*4 + 3 <= 128).  The spec builder draws scale >= 1 - hyp.scale
and any rotation, giving sqrt(2)/(1-scale) <= 2.83 at the reference's
default hyp (scale 0.5, ``data/hyp.yaml``); :func:`fits_pallas_warp` lets
callers pre-check arbitrary specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32            # output tile edge (s must be a multiple)
_PW = 128            # canvas patch window edge (x and y)
_P = TILE * TILE     # pixels per tile
MAX_ROW_NORM = (_PW - 3.0) / (TILE - 1.0)  # |minv row|_1 bound (~4.03)
_PAD = 114.0         # reference border value (device_augment.PAD)


def _warp_kernel(minv_ref, buf_ref, out_ref, patch_ref, sem, *, s: int):
    cbuf = 2 * s + 2                     # canvas buffer dim (pre-pad)
    cp = cbuf + 1                        # padded buffer dim
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    m0 = minv_ref[b, 0]
    m1 = minv_ref[b, 1]
    m2 = minv_ref[b, 2]
    m3 = minv_ref[b, 3]
    m4 = minv_ref[b, 4]
    m5 = minv_ref[b, 5]

    # patch origin: canvas-buffer coords of the tile's min tap, from the
    # affine evaluated at the 4 tile corners (extrema of a linear map)
    xl = (j * TILE).astype(jnp.float32)
    xr = xl + float(TILE - 1)
    yt = (i * TILE).astype(jnp.float32)
    yb = yt + float(TILE - 1)
    cx_min = jnp.minimum(
        jnp.minimum(m0 * xl + m1 * yt, m0 * xr + m1 * yt),
        jnp.minimum(m0 * xl + m1 * yb, m0 * xr + m1 * yb),
    ) + m2
    cy_min = jnp.minimum(
        jnp.minimum(m3 * xl + m4 * yt, m3 * xr + m4 * yt),
        jnp.minimum(m3 * xl + m4 * yb, m3 * xr + m4 * yb),
    ) + m5
    ox = jnp.clip(jnp.floor(cx_min).astype(jnp.int32) + 1, 0, cp - _PW)
    oy = jnp.clip(jnp.floor(cy_min).astype(jnp.int32) + 1, 0, cp - _PW)

    dma = pltpu.make_async_copy(
        buf_ref.at[b, :, pl.ds(ox, _PW), pl.ds(oy, _PW)],
        patch_ref,
        sem,
    )
    dma.start()
    dma.wait()

    # per-pixel canvas coords, lane-major (pixel index on lanes): the very
    # expressions of device_augment._warp_block, so fx/fy/ok match in f32
    p = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    px = (j * TILE + p % TILE).astype(jnp.float32)
    py = (i * TILE + p // TILE).astype(jnp.float32)
    cx = m0 * px + m1 * py + m2
    cy = m3 * px + m4 * py + m5
    xf = jnp.floor(cx)
    yf = jnp.floor(cy)
    fx = cx - xf
    fy = cy - yf
    ok = ((xf >= -1.0) & (xf <= cbuf - 2.0)
          & (yf >= -1.0) & (yf <= cbuf - 2.0))
    # window indices of tap 0 (clip keeps the i32 cast defined for far
    # out-of-canvas pixels; any index outside [0, _PW) yields an all-zero
    # one-hot and the pixel is PAD-masked through `ok`)
    rx = jnp.clip(xf, -2.0, float(cbuf)).astype(jnp.int32) + 1 - ox
    ry = jnp.clip(yf, -2.0, float(cbuf)).astype(jnp.int32) + 1 - oy

    sub = jax.lax.broadcasted_iota(jnp.int32, (_PW, _P), 0)
    ohy0 = (sub == ry).astype(jnp.bfloat16)      # (PW_y, P)
    ohy1 = (sub == ry + 1).astype(jnp.bfloat16)
    ohx0 = (sub == rx).astype(jnp.float32)       # (PW_x, P)
    ohx1 = (sub == rx + 1).astype(jnp.float32)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy

    for ch in range(3):
        pc = patch_ref[ch].astype(jnp.bfloat16)  # (PW_x, PW_y)
        r0 = jnp.dot(pc, ohy0, preferred_element_type=jnp.float32)
        r1 = jnp.dot(pc, ohy1, preferred_element_type=jnp.float32)
        c00 = jnp.sum(ohx0 * r0, axis=0, keepdims=True)
        c01 = jnp.sum(ohx1 * r0, axis=0, keepdims=True)
        c10 = jnp.sum(ohx0 * r1, axis=0, keepdims=True)
        c11 = jnp.sum(ohx1 * r1, axis=0, keepdims=True)
        out = c00 * w00 + c01 * w01 + c10 * w10 + c11 * w11
        out = jnp.where(ok, out, _PAD)
        out_ref[0, 0, ch, :] = jnp.round(out)[0]


def fits_hyp(hyp, out_size: int) -> bool:
    """Static check that every spec a hyp set can draw fits the kernel.

    The spec builder draws scale >= 1 - hyp.scale (datasets._warp_params),
    so the worst-case |minv row|_1 over any rotation is sqrt(2)/(1-scale).
    """
    sc_min = 1.0 - float(hyp.get("scale", 0.5))
    return (out_size % TILE == 0 and 2 * out_size + 3 >= _PW
            and sc_min > 0 and float(np.sqrt(2.0)) / sc_min <= MAX_ROW_NORM)


def fits_pallas_warp(minv, out_size: int) -> bool:
    """Host-side check that specs satisfy the kernel's static bounds."""
    if out_size % TILE != 0 or 2 * out_size + 3 < _PW:
        return False
    rows = np.abs(np.asarray(minv, np.float32)[..., :2]).sum(axis=-1)
    return bool((rows <= MAX_ROW_NORM).all())


def warp_canvas_batch(canvases, minv, out_size: int, interpret=None):
    """Warp (B, C, C, 3) uint8 canvases (C = 2s+2) -> (B, s, s, 3) f32.

    Bit-identical to ``device_augment._warp_block`` applied per spec
    (values rounded to integers in [0, 255], PAD outside the canvas).
    ``minv`` is (B, 2, 3) f32; rows must satisfy :func:`fits_pallas_warp`.
    """
    s = int(out_size)
    B, C = canvases.shape[0], canvases.shape[1]
    if C != 2 * s + 2:
        raise ValueError(f"canvas dim {C} != 2*{s}+2")
    if s % TILE != 0 or C + 1 < _PW:
        raise ValueError(f"out_size {s} unsupported (needs %{TILE}==0, >=64)")
    ny = nx = s // TILE
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    buf = jnp.pad(canvases, ((0, 0), (0, 1), (0, 1), (0, 0)),
                  constant_values=int(_PAD))
    buf = buf.transpose(0, 3, 2, 1)      # (B, 3, x, y) planar, x-major

    out = pl.pallas_call(
        functools.partial(_warp_kernel, s=s),
        grid=(B, ny, nx),
        in_specs=[
            pl.BlockSpec((B, 6), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 3, _P), lambda b, i, j: (b, i * nx + j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * nx, 3, _P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, _PW, _PW), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(minv.astype(jnp.float32).reshape(B, 6), buf)

    out = out.reshape(B, ny, nx, 3, TILE, TILE)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(B, s, s, 3)
