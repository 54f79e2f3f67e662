"""Pallas TPU kernel: affine bilinear canvas warp via one-hot MXU matmuls.

The device-side augmentation renderer's last stage warps the materialized
mosaic canvas down to the output image (the device equivalent of
``cv2.warpAffine`` in the reference's ``lib/augmentations.py:42-74``).  As
an XLA program that warp is a per-pixel gather, and the TPU gather engine
is byte-bound regardless of locality (measured ~216 ms for a 12-spec
800px banked batch; see ROUND3.md "Renderer gather-floor investigation").
This kernel goes below that floor by never gathering:

  * the output image is processed in 32x32 tiles; an affine map with
    bounded derivative sends each tile into a <=96-cell window of the
    canvas, so ONE dynamic async DMA stages a (3, 128, 256) uint8 patch
    from HBM into VMEM per tile.  Mosaic DMAs of tiled HBM memrefs need
    tile-aligned offsets, so the patch origin is rounded down to the
    (sublane, lane) tiling — 32 in x (int8 packs 4 sublanes of 8), 128
    in y — and the window carries the span plus the alignment slack;
  * per-pixel bilinear taps become one-hot row-selection MATMULS on the
    MXU.  The 3 channels stack on the patch's x axis and both y-taps
    ride the SAME matmul through an exact fixed-point packing:
    ``patch(3*x, y) @ (onehot(y0) + 1024*onehot(y1))`` accumulates
    ``v0 + 1024*v1`` (pixel values <=255 < 1024, sum < 2^18, exact in
    f32) — ONE 384x256x1024 bf16 matmul per tile.  The two x-taps
    reduce out on the VPU through {0,1} masks before a single exact
    divmod-by-1024 unpack.

Exactness: one-hot bf16 weights are exactly {0, 1, 1024} and uint8 pixel
values are exact in bf16, so every tap value reaches f32 exactly; tap
weights and the final blend use the same f32 expressions and association
as the XLA renderer.  The kernel output matches
``device_augment._warp_block`` (pinned by ``tests/test_pallas_warp.py``).

Derivative bound: each |row|_1 of the output->canvas affine must be <=
(SPAN-2)/(TILE-1) ~= 3.03 so a tile's taps span at most SPAN=96 canvas
cells.  The spec builder draws scale >= 1 - hyp.scale and any rotation,
giving sqrt(2)/(1-scale) <= 2.83 at the reference's default hyp (scale
0.5, ``data/hyp.yaml``); :func:`fits_pallas_warp` lets callers pre-check
arbitrary specs, and :func:`pick_method` falls back to the gather
renderer for hyps that do not fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32            # output tile edge (s must be a multiple)
_SPAN = 96           # max canvas cells a tile's taps may span per axis
_AX = 32             # x (sublane) DMA alignment for int8 (8 sublanes x 4 pack)
_AY = 128            # y (lane) DMA alignment
_PWX = _SPAN + _AX   # patch window, x (128)
_PWY = _SPAN + 160   # patch window, y (256: span + lane alignment, rounded
#                      up to the next 128 multiple so the DMA size tiles)
_P = TILE * TILE     # pixels per tile
MAX_ROW_NORM = (_SPAN - 2.0) / (TILE - 1.0)  # |minv row|_1 bound (~3.03)
_PAD = 114.0         # reference border value (device_augment.PAD)


def _patch_origin(minv_ref, b, i, j, xb: int, yb: int):
    """Patch origin: canvas-buffer coords of tile (b, i, j)'s min tap.

    From the affine evaluated at the 4 tile corners (extrema of a linear
    map), rounded down to the int8 memref tiling so the DMA slice is
    provably tile-aligned (the buffer is end-padded past cbuf+1+window,
    so the clip never truncates a window that holds valid taps).
    """
    m0 = minv_ref[b, 0]
    m1 = minv_ref[b, 1]
    m2 = minv_ref[b, 2]
    m3 = minv_ref[b, 3]
    m4 = minv_ref[b, 4]
    m5 = minv_ref[b, 5]
    xl = (j * TILE).astype(jnp.float32)
    xr = xl + float(TILE - 1)
    yt = (i * TILE).astype(jnp.float32)
    yb_ = yt + float(TILE - 1)
    cx_min = jnp.minimum(
        jnp.minimum(m0 * xl + m1 * yt, m0 * xr + m1 * yt),
        jnp.minimum(m0 * xl + m1 * yb_, m0 * xr + m1 * yb_),
    ) + m2
    cy_min = jnp.minimum(
        jnp.minimum(m3 * xl + m4 * yt, m3 * xr + m4 * yt),
        jnp.minimum(m3 * xl + m4 * yb_, m3 * xr + m4 * yb_),
    ) + m5
    ox = jnp.clip(jnp.floor(cx_min).astype(jnp.int32) + 1, 0, xb - _PWX)
    oy = jnp.clip(jnp.floor(cy_min).astype(jnp.int32) + 1, 0, yb - _PWY)
    ox = pl.multiple_of((ox // _AX) * _AX, _AX)
    oy = pl.multiple_of((oy // _AY) * _AY, _AY)
    return ox, oy


def _patch_dma(buf_ref, patch_ref, sem, minv_ref, b, i, j, slot,
               xb: int, yb: int):
    ox, oy = _patch_origin(minv_ref, b, i, j, xb, yb)
    return pltpu.make_async_copy(
        buf_ref.at[b, :, pl.ds(ox, _PWX), pl.ds(oy, _PWY)],
        patch_ref.at[slot],
        sem.at[slot],
    )


def _warp_kernel(minv_ref, active_ref, buf_ref, out_ref, patch_ref, sem,
                 *, s: int, xb: int, yb: int, nb: int, ny: int, nx: int):
    """Grid step (b, i, j): one output tile, DOUBLE-BUFFERED patch DMA.

    A single patch buffer serializes every grid step behind its own DMA
    (~5,700 sequential DMA+compute pairs per batch — grid-latency bound,
    not matmul bound).  Step n instead waits the patch PREFETCHED at step
    n-1 into slot n%2 while slot (n+1)%2 fills for step n+1, so transfer
    and matmul overlap.  Every started DMA is waited exactly once at its
    own step (inactive specs included — skipping a wait would let a later
    start land on an in-flight slot).
    """
    cbuf = 2 * s + 2                     # canvas buffer dim (pre-pad)
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n = (b * ny + i) * nx + j            # flat sequential step index
    slot = jax.lax.rem(n, 2)

    @pl.when(n == 0)
    def _first():                        # prologue: own patch, slot 0
        _patch_dma(buf_ref, patch_ref, sem, minv_ref, b, i, j, 0,
                   xb, yb).start()

    @pl.when(n + 1 < nb * ny * nx)
    def _prefetch():                     # next tile's patch, other slot
        j2 = j + 1
        i2 = jnp.where(j2 == nx, i + 1, i)
        j2 = jnp.where(j2 == nx, 0, j2)
        b2 = jnp.where(i2 == ny, b + 1, b)
        i2 = jnp.where(i2 == ny, 0, i2)
        _patch_dma(buf_ref, patch_ref, sem, minv_ref, b2, i2, j2,
                   jax.lax.rem(n + 1, 2), xb, yb).start()

    _patch_dma(buf_ref, patch_ref, sem, minv_ref, b, i, j, slot,
               xb, yb).wait()

    # inactive spec (an unreferenced mixup-partner slot): PAD-fill the
    # output tile and skip the matmul — its pixels are never consumed
    # (device_augment._mix_flip_tail masks them out)
    act = active_ref[b]

    @pl.when(act == 0)
    def _pad_tile():
        out_ref[0, 0, :, :] = jnp.full((3, _P), _PAD, jnp.bfloat16)

    @pl.when(act != 0)
    def _warp_tile():
        _warp_tile_body(minv_ref, out_ref, patch_ref.at[slot], b, i, j,
                        cbuf, s, xb, yb)


def _warp_tile_body(minv_ref, out_ref, patch_ref, b, i, j, cbuf,
                    s: int, xb: int, yb: int):
    m0 = minv_ref[b, 0]
    m1 = minv_ref[b, 1]
    m2 = minv_ref[b, 2]
    m3 = minv_ref[b, 3]
    m4 = minv_ref[b, 4]
    m5 = minv_ref[b, 5]
    ox, oy = _patch_origin(minv_ref, b, i, j, xb, yb)

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
    # out-of-canvas pixels; any index outside the window yields an
    # all-zero one-hot and the pixel is PAD-masked through `ok`)
    rx = jnp.clip(xf, -2.0, float(cbuf)).astype(jnp.int32) + 1 - ox
    ry = jnp.clip(yf, -2.0, float(cbuf)).astype(jnp.int32) + 1 - oy

    # both y-taps in one matmul operand: entries in {0, 1, 1024} (exact in
    # bf16; ry+1 != ry so 1025 can't occur), accumulating v0 + 1024*v1
    # exactly (v <= 255, sum < 2^18).  Built through f32: Mosaic can't
    # relayout an i1 mask to the bf16 (16, 128) tiling for a bf16 select.
    suby = jax.lax.broadcasted_iota(jnp.int32, (_PWY, _P), 0)
    ohy = ((suby == ry).astype(jnp.float32)
           + (suby == ry + 1).astype(jnp.float32) * 1024.0
           ).astype(jnp.bfloat16)                        # (PW_y, P)
    dx = jax.lax.broadcasted_iota(jnp.int32, (_PWX, _P), 0) - rx

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy

    # Mosaic has no unsigned->float cast; hop through int32 (exact).  The
    # 3 channels stack along x so ONE matmul serves the whole tile.
    pc = (patch_ref[:].reshape(3 * _PWX, _PWY)
          .astype(jnp.int32).astype(jnp.bfloat16))
    r = jnp.dot(pc, ohy, preferred_element_type=jnp.float32)  # (3*PWX, P)
    zero = jnp.zeros((), jnp.float32)
    for ch in range(3):
        rc = r[ch * _PWX:(ch + 1) * _PWX]
        c0 = jnp.sum(jnp.where(dx == 0, rc, zero), axis=0,
                     keepdims=True)                    # v00 + 1024*v10
        c1 = jnp.sum(jnp.where(dx == 1, rc, zero), axis=0,
                     keepdims=True)                    # v01 + 1024*v11
        v10 = jnp.floor(c0 * (1.0 / 1024.0))           # exact: c < 2^18
        v00 = c0 - 1024.0 * v10
        v11 = jnp.floor(c1 * (1.0 / 1024.0))
        v01 = c1 - 1024.0 * v11
        out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
        out = jnp.where(ok, out, _PAD)
        # bf16 stores: rounded pixel values are integers in [0, 255] —
        # exact in bf16 (8 effective mantissa bits) — and the output
        # relayout chain (tile-blocked -> NHWC, ~4 ms/batch in f32)
        # halves its bytes; consumers upcast to f32 exactly
        out_ref[0, 0, ch, :] = jnp.round(out)[0].astype(jnp.bfloat16)


def fits_hyp(hyp, out_size: int) -> bool:
    """Static check that every spec a hyp set can draw fits the kernel.

    The spec builder draws scale >= 1 - hyp.scale (datasets._warp_params),
    so the worst-case |minv row|_1 over any rotation is sqrt(2)/(1-scale).
    """
    sc_min = 1.0 - float(hyp.get("scale", 0.5))
    return (out_size % TILE == 0
            and sc_min > 0 and float(np.sqrt(2.0)) / sc_min <= MAX_ROW_NORM)


def fits_pallas_warp(minv, out_size: int) -> bool:
    """Host-side check that specs satisfy the kernel's static bounds."""
    if out_size % TILE != 0:
        return False
    rows = np.abs(np.asarray(minv, np.float32)[..., :2]).sum(axis=-1)
    return bool((rows <= MAX_ROW_NORM).all())


def warp_canvas_batch(canvases, minv, out_size: int, interpret=None):
    """Warp (B, C, C, 3) uint8 canvases (C = 2s+2) -> (B, s, s, 3) f32.

    Channel-minor legacy entry (kept for the layout-agnostic tests):
    transposes to the planar (B, 3, x, y) layout the kernel wants and
    defers to :func:`warp_canvas_planar`.  The production renderer builds
    its canvases planar from the start and calls the planar entry
    directly — no relayout on the hot path.
    """
    out = warp_canvas_planar(canvases.transpose(0, 3, 2, 1), minv,
                             out_size, interpret=interpret)
    return out.astype(jnp.float32)  # legacy f32 contract (values exact)


def warp_canvas_planar(canvases, minv, out_size: int, interpret=None,
                       active=None):
    """Warp (B, 3, C, C) PLANAR x-major uint8 canvases -> (B, s, s, 3)
    bfloat16 (EXACT: every value is a rounded integer in [0, 255], which
    bf16 represents exactly — upcasting gives the identical f32).

    ``canvases[b, c, X, Y]`` holds canvas cell (x, y) = (X-1, Y-1) of
    channel c (the exact ``device_augment._canvas_one`` output layout,
    which is also the kernel's DMA patch layout).  Matches
    ``device_augment._warp_block`` applied per spec (values rounded to
    integers in [0, 255], PAD outside the canvas).  ``minv`` is (B, 2, 3)
    f32; rows must satisfy :func:`fits_pallas_warp`.

    ``active`` ((B,) bool/int, optional): specs with a zero entry skip
    the DMA + matmul and PAD-fill their output (used for unreferenced
    mixup-partner slots, whose pixels are never consumed).
    """
    s = int(out_size)
    B, C = canvases.shape[0], canvases.shape[2]
    if canvases.shape[1] != 3 or C != 2 * s + 2:
        raise ValueError(f"canvas shape {canvases.shape} != (B, 3, "
                         f"{2 * s + 2}, {2 * s + 2})")
    if s % TILE != 0:
        raise ValueError(f"out_size {s} unsupported (needs %{TILE}==0)")
    ny = nx = s // TILE
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # end-pad each spatial axis past cbuf+1+window so aligned patch
    # origins never truncate a window that holds valid taps (valid tap
    # cells reach at most cbuf+1; see kernel origin derivation)
    xb = C + 1 + _PWX
    yb = C + 1 + _PWY
    buf = jnp.pad(canvases, ((0, 0), (0, 0), (0, xb - C), (0, yb - C)),
                  constant_values=int(_PAD))

    if active is None:
        active = jnp.ones((B,), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, s=s, xb=xb, yb=yb, nb=B, ny=ny,
                          nx=nx),
        grid=(B, ny, nx),
        in_specs=[
            pl.BlockSpec((B, 6), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B,), lambda b, i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 3, _P), lambda b, i, j: (b, i * nx + j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * nx, 3, _P), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 3, _PWX, _PWY), jnp.uint8),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(minv.astype(jnp.float32).reshape(B, 6),
      jnp.asarray(active).astype(jnp.int32), buf)

    out = out.reshape(B, ny, nx, 3, TILE, TILE)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(B, s, s, 3)
