"""Device-side augmentation: the mosaic/warp/HSV pixel pipeline as XLA ops.

TPU-first re-design of the reference's host-side hot path
(``datasets/base_dataset.py:92-159`` + ``lib/augmentations.py:8-74``): the
host keeps only image DECODE (+resize) and the (cheap) label math; every
per-pixel operation — mosaic-4/-9 compositing, the random affine warp, HSV
jitter, mixup blending, flips, letterbox borders and the final /255
normalize — runs as ONE batched jitted program on device.

The key re-design: the reference materializes a 2s×2s (mosaic-4) or 3s×3s
(mosaic-9) canvas and then warps it down to s×s
(``base_dataset.py:240-340`` then ``lib/augmentations.py:42-74``).  The
default ("taps") renderer never builds that canvas: for every output pixel
the inverse affine gives a canvas coordinate, each of its 4 bilinear taps
resolves which tile owns that canvas cell (mosaic paste order = last write
wins) and gathers the source pixel directly.  Its cost floor is the XLA
TPU gather engine (~0.75 GB/s of gathered bytes measured, independent of
locality), and 4 × 3-byte taps per output pixel is byte-minimal for exact
bilinear — ~200 ms for a 12-spec batch at 800px.  The alternative
"canvas" renderer (bit-identical; see the section comment below)
materializes the canvas with cheap row-granular gathers and fetches all
four taps in ONE packed uint32x4 gather — measurably the same speed
(byte-bound), but it is the substrate a Pallas warp kernel (matmul-based
resampling, no gather) would plug into.

Host-side spec construction lives in
:meth:`ryolo_tpu.data.datasets.BaseDataset.get_render_spec`, which draws
the SAME rng sequence as the numpy pipeline (parity pinned by
``tests/test_device_augment.py``).

Layouts (B specs per batch, T = MAX_TILES tile slots, s = img_size):
  * ``tiles``   (B, T, s, s) uint32 — decoded sources, PACKED-RGB x-major
    (``tiles[b, t, x, y]`` holds R | G<<8 | B<<16 of pixel (row y, col x)),
    content top-left (device-cache mode replaces this with ``tile_idx``
    (B, T) int32 rows into a dataset-wide device-resident bank — see
    :func:`render_specs_banked`).  The packing is load-bearing for TPU:
    a channel-minor uint8 array tiles its 3-wide minor dim onto the
    128-lane axis (3/128 lane utilization — the r4 paste's 108 window
    update-slices cost 0.109 ms EACH, ~22 ms of the 45 ms render), and
    uint8 read-modify-write slices are themselves pathological (measured
    231 vs 6.9 ms/batch for the same paste on packed u32 —
    scripts/prof_paste.py).  One u32 word also carries the paste OWNER id
    in its top byte, halving the RMW chain (no separate owner map).
  * ``region``  (B, T, 4) f32 — canvas-space ownership box [x1, y1, x2, y2)
    (zero-area for unused slots; later slots overwrite earlier ones)
  * ``offset``  (B, T, 2) f32 — canvas→source translation (sx = cx - ox)
  * ``hsv``     (B, T, 3) f32 — per-tile HSV gains (h, s, v), 1 = identity
  * ``minv``    (B, 2, 3) f32 — output→canvas inverse affine
  * ``flip``    (B, 2) bool — (fliplr, flipud), applied after the warp
  * ``mix_idx`` (B,) int32 — spec index blended in (−1 = no mixup)
  * ``mix_r``   (B,) f32 — mixup beta weight
Rendered output: (n_out, s, s, 3) float32 RGB in [0, 1] for spec slots
[0, n_out) (slots ≥ n_out exist only as mixup partners).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_TILES = 9          # mosaic-9 is the widest layout
PAD = 114.0            # reference letterbox/border value


# ---------------------------------------------------------------------------
# HSV jitter on gathered taps (uint8 semantics of lib/augmentations.py:8-20)
# ---------------------------------------------------------------------------

def _rgb_to_hsv_u8(rgb):
    """uint8-valued RGB (as f32) -> cv2-convention HSV (H∈[0,180), S,V∈[0,255]).

    Matches ``cv2.cvtColor(..., COLOR_BGR2HSV)`` on 8-bit images: H is
    degrees/2 rounded to integer, S = round(255·(max-min)/max).
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(d > 0, h * 30.0, 0.0)          # degrees / 2
    h = jnp.where(h < 0, h + 180.0, h)
    h = jnp.round(h)
    h = jnp.where(h >= 180.0, 0.0, h)            # cv2 wraps 180 -> 0
    s = jnp.round(jnp.where(mx > 0, 255.0 * d / jnp.where(mx > 0, mx, 1.0),
                            0.0))
    return h, s, mx


def _hsv_to_rgb_u8(h, s, v):
    """Inverse of :func:`_rgb_to_hsv_u8` (cv2 8-bit convention)."""
    h6 = h / 30.0                                # sector in [0, 6)
    i = jnp.floor(h6)
    f = h6 - i
    sf = s / 255.0
    p = v * (1.0 - sf)
    q = v * (1.0 - sf * f)
    t = v * (1.0 - sf * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t],
                   v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p],
                   p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v],
                   q)
    return jnp.stack([jnp.round(r), jnp.round(g), jnp.round(b)], axis=-1)


def hsv_jitter(rgb, gains):
    """Per-pixel HSV jitter with the reference's uint8-LUT semantics.

    ``lib/augmentations.py:8-20`` builds uint8 LUTs ``int(v·gain)`` (hue
    wraps mod 180, sat/val clip at 255) and applies them channelwise; the
    closed form below floors the same products.  ``gains`` broadcasts
    against ``rgb[..., 0]``.
    """
    h, s, v = _rgb_to_hsv_u8(rgb)
    h = jnp.floor(h * gains[..., 0]) % 180.0
    s = jnp.clip(jnp.floor(s * gains[..., 1]), 0.0, 255.0)
    v = jnp.clip(jnp.floor(v * gains[..., 2]), 0.0, 255.0)
    return _hsv_to_rgb_u8(h, s, v)


def _hsv_jitter_planar(r, g, b, gh, gs, gv):
    """:func:`hsv_jitter` on channel PLANES (the very same f32 expressions
    in the same order, so results are bit-identical; the stacked form's
    minor-3 layout wastes 125/128 TPU lanes).  Returns (r, g, b) planes."""
    # _rgb_to_hsv_u8 on planes
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(d > 0, h * 30.0, 0.0)
    h = jnp.where(h < 0, h + 180.0, h)
    h = jnp.round(h)
    h = jnp.where(h >= 180.0, 0.0, h)
    s = jnp.round(jnp.where(mx > 0, 255.0 * d / jnp.where(mx > 0, mx, 1.0),
                            0.0))
    v = mx
    # the jitter (hsv_jitter body)
    h = jnp.floor(h * gh) % 180.0
    s = jnp.clip(jnp.floor(s * gs), 0.0, 255.0)
    v = jnp.clip(jnp.floor(v * gv), 0.0, 255.0)
    # _hsv_to_rgb_u8 on planes
    h6 = h / 30.0
    i = jnp.floor(h6)
    f = h6 - i
    sf = s / 255.0
    p = v * (1.0 - sf)
    q = v * (1.0 - sf * f)
    t = v * (1.0 - sf * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    ro = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4],
                    [v, q, p, p, t], v)
    go = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4],
                    [t, v, v, q, p], p)
    bo = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4],
                    [p, p, t, v, v], q)
    return jnp.round(ro), jnp.round(go), jnp.round(bo)


# ---------------------------------------------------------------------------
# The renderer
# ---------------------------------------------------------------------------

def _render_one(tile_rows, slot_rows, region, offset, hsv, minv,
                out_size: int):
    """Render one spec (T tile slots) to an (s, s, 3) f32 image in [0, 255].

    For each output pixel, the inverse affine gives a float canvas coord;
    each of its 4 bilinear taps independently resolves the owning tile
    (last overlapping slot wins — mosaic paste order) and gathers the
    HSV-jittered source pixel, so tile seams blend exactly like warping
    the materialized canvas would.

    ``tile_rows`` is the gather source — (R, s, s) uint32 packed-RGB
    x-major rows (``tile_rows[r, x, y]``), either this spec's own T tiles
    or the whole device-resident dataset bank — and ``slot_rows`` (T,)
    maps each spec slot to its row, so the banked and per-spec paths share
    one gather (bit-identical outputs).
    """
    s = out_size
    T = region.shape[0]
    flat = tile_rows.reshape(-1)  # (R*s*s,) packed words

    # output pixel grid -> canvas coords (cv2 warpAffine convention:
    # integer pixel centers, dst(x,y) = src(Minv @ (x, y, 1)))
    ox = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    oy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    cx = minv[0, 0] * ox + minv[0, 1] * oy + minv[0, 2]
    cy = minv[1, 0] * ox + minv[1, 1] * oy + minv[1, 2]

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0

    def tap(qx, qy):
        """Canvas integer tap -> (s, s, 3) color + (s, s) validity."""
        # owner = highest slot whose region contains the tap
        inside = (
            (qx[None] >= region[:, None, None, 0])
            & (qx[None] < region[:, None, None, 2])
            & (qy[None] >= region[:, None, None, 1])
            & (qy[None] < region[:, None, None, 3])
        )  # (T, s, s)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (T, s, s), 0)
        owner = jnp.max(jnp.where(inside, slot_ids, -1), axis=0)  # (s, s)
        valid = owner >= 0
        o = jnp.maximum(owner, 0)
        # per-slot scalars resolve through SELECT chains over the T static
        # slots, NOT jnp.take: XLA lowers even a 9-row table lookup with an
        # (s, s) index to a full s^2-row gather (~65 ms each at 800px on
        # TPU — profiled at 16 of the renderer's 20 gathers, 4x its actual
        # pixel-gather work); the selects are ~free VPU ops.
        offx = jnp.zeros_like(qx)
        offy = jnp.zeros_like(qy)
        row = jnp.zeros(qx.shape, jnp.int32)
        g = jnp.ones(qx.shape + (3,), jnp.float32)
        for k in range(T):
            sel = o == k
            offx = jnp.where(sel, offset[k, 0], offx)
            offy = jnp.where(sel, offset[k, 1], offy)
            row = jnp.where(sel, slot_rows[k], row)
            g = jnp.where(sel[..., None], hsv[k], g)
        sx = jnp.clip(qx - offx, 0, s - 1)
        sy = jnp.clip(qy - offy, 0, s - 1)
        # one packed word per tap (this is the readable-spec path; the
        # production canvas/pallas paths never per-pixel gather)
        lin = (row * s + sx.astype(jnp.int32)) * s + sy.astype(jnp.int32)
        col = _unpack_rgb(jnp.take(flat, lin, axis=0))
        # identity gains skip the (quantizing) HSV round-trip entirely,
        # like the reference's early-out (lib/augmentations.py:31-32)
        ident = jnp.all(g == 1.0, axis=-1, keepdims=True)
        col = jnp.where(ident, col, hsv_jitter(col, g))
        return jnp.where(valid[..., None], col, PAD), valid

    c00, _ = tap(x0, y0)
    c01, _ = tap(x0 + 1, y0)
    c10, _ = tap(x0, y0 + 1)
    c11, _ = tap(x0 + 1, y0 + 1)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    out = (c00 * w00[..., None] + c01 * w01[..., None]
           + c10 * w10[..., None] + c11 * w11[..., None])
    # cv2.warpAffine fills fully-out-of-canvas pixels with the border value
    # (taps outside every region already return PAD, matching the canvas's
    # 114 background inside it).
    return jnp.round(out)


# ---------------------------------------------------------------------------
# Canvas + packed-block renderer (bit-identical alternative)
# ---------------------------------------------------------------------------
#
# The tap renderer above pays FOUR per-pixel gathers (one per bilinear
# tap).  This path restructures the same computation so only ONE
# per-pixel gather remains, bit-identically.  Measured on TPU the two are
# the same speed (~200 ms for a 12-spec 800px batch): the gather engine
# is BYTE-bound (~0.75 GB/s of gathered bytes), and one 16-byte packed
# row costs what four 3-byte rows do.  It is kept because the
# canvas-materialization machinery (row-granular shifts + ownership fold
# + owner-select HSV) is the substrate for a future Pallas matmul-based
# warp kernel, which is the only route below the gather floor:
#
#   1. materialize the mosaic canvas (the very array the host pipeline
#      builds, ``base_dataset.py:240-340``) GATHER-FREE: each tile is one
#      contiguous s×s window read-modify-write (``dynamic_update_slice``)
#      at its integer canvas offset, masked to its region, ascending slot
#      order (= paste order, so last-write-wins is the ownership fold),
#      then per-tile HSV jitter through an owner-id select.  A canvas
#      cell equals what the tap renderer's owner-resolution + tile gather
#      + HSV produces for that cell, so everything downstream is exact.
#   2. pack each cell's 2x2 neighbourhood into one (4,) uint32 row
#      (RGB per pixel in the low 24 bits); the four bilinear taps of an
#      output pixel then arrive in ONE {1,4}-uint32 gather instead of
#      four {1,3}-uint8 ones.
#
# Large-slice tricks do NOT work instead: gathers with long slices and a
# vmapped dynamic_slice both lower to a sequential per-line loop on this
# backend (~7 us/line — measured slower than the per-pixel gather).

_PAD_U8 = int(PAD)


def _paste_canvas(tile_rows, slot_rows, region, offset, out_size: int):
    """One spec -> ``(C, C) uint32`` canvas: packed RGB + owner id.

    Buffer cell ``[X, Y]`` (X = qx + 1 for canvas cell qx, x-major) holds
    ``R | G<<8 | B<<16 | owner<<24``; cells outside every region hold PAD
    with owner id T, exactly like the unowned taps of the 4-tap path.
    The single u32 word per cell is load-bearing twice over: uint8
    read-modify-write slices are pathological on TPU (measured 231 vs
    6.9 ms/batch for this paste, scripts/prof_paste.py), and carrying the
    owner in the top byte halves the RMW chain (no separate owner map).

    Assembly is GATHER-FREE: each slot's tile is pasted as one contiguous
    (s, s) window read-modify-write at its integer canvas offset
    (``dynamic_update_slice``), masked to the slot's region.  Ascending
    slot order = the mosaic paste order, so last-write-wins reproduces the
    reference's paste ownership exactly; inside its region a window cell's
    source index is the window coordinate itself (``q - offset ∈ [0, s)``
    by spec construction, datasets.get_render_spec), so pixels are
    bit-identical to the gather formulation.  The buffer carries an s-wide
    margin so the window never clips (offsets lie in (-s, 2s)).
    """
    s = out_size
    T = region.shape[0]
    C = 2 * s + 2
    CB = C + 2 * s  # s-wide margins: any window start lands in-bounds

    offx = offset[:, 0].astype(jnp.int32)
    offy = offset[:, 1].astype(jnp.int32)

    pad_word = _PAD_U8 | (_PAD_U8 << 8) | (_PAD_U8 << 16) | (T << 24)
    buf = jnp.full((CB, CB), pad_word, jnp.uint32)
    wx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    wy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)

    # Occupancy-proportional paste: used slots are always a PREFIX of the
    # slot axis (mosaic-4 fills 0-3, mosaic-9 0-8, letterbox just 0 —
    # datasets._spec_mosaic/_spec_letterbox_warp), so a dynamic-trip
    # fori_loop pastes only the live windows (zero-area regions would be
    # all-masked no-op RMWs; at the reference's 0.8/0.2 mosaic-4/9 mix
    # that is 5/9 of the paste traffic skipped).
    n_used = jnp.sum((region[:, 2] > region[:, 0])
                     & (region[:, 3] > region[:, 1]), dtype=jnp.int32)

    def body(k, buf):
        tile = jax.lax.dynamic_index_in_dim(tile_rows, slot_rows[k],
                                            axis=0, keepdims=False)
        tile = tile | (k.astype(jnp.uint32) << 24)
        reg = jax.lax.dynamic_index_in_dim(region, k, axis=0,
                                           keepdims=False)
        ox = jax.lax.dynamic_index_in_dim(offx, k, keepdims=False)
        oy = jax.lax.dynamic_index_in_dim(offy, k, keepdims=False)
        # window covers canvas cells q = offset_k + (wx, wy), i.e. exactly
        # the cells whose source pixel is tile[wx, wy]
        qx = wx + ox.astype(jnp.float32)
        qy = wy + oy.astype(jnp.float32)
        inside = ((qx >= reg[0]) & (qx < reg[2])
                  & (qy >= reg[1]) & (qy < reg[3]))
        px = ox + 1 + s  # buffer coords: X = qx + 1 + s (margin)
        py = oy + 1 + s
        cur = jax.lax.dynamic_slice(buf, (px, py), (s, s))
        cur = jnp.where(inside, tile, cur)
        return jax.lax.dynamic_update_slice(buf, cur, (px, py))

    buf = jax.lax.fori_loop(0, n_used, body, buf)
    return jax.lax.slice(buf, (s, s), (s + C, s + C))


def _hsv_canvas(core, hsv, T: int):
    """Per-tile HSV through the owner byte (selects, not gathers).

    ``core`` (C, C) uint32 packed RGB + owner.  Unpacks to channel
    PLANES, jitters, and emits the (3, C, C) planar uint8 canvas the warp
    stage consumes.  NOTE (r4, measured): applying HSV per-slot before
    ownership resolves is bit-identical but does up to 2-4.5× the pixel
    work (overlapping / clip-duplicated cells); canvas-level HSV touches
    each cell once.
    """
    own = (core >> 24).astype(jnp.int32)
    one = jnp.ones(core.shape, jnp.float32)
    gh, gs, gv = one, one, one
    for k in range(T):
        sel = own == k
        gh = jnp.where(sel, hsv[k, 0], gh)
        gs = jnp.where(sel, hsv[k, 1], gs)
        gv = jnp.where(sel, hsv[k, 2], gv)
    r = (core & 0xFF).astype(jnp.float32)
    g = ((core >> 8) & 0xFF).astype(jnp.float32)
    b = ((core >> 16) & 0xFF).astype(jnp.float32)
    # identity gains skip the (quantizing) HSV round-trip entirely,
    # like the reference's early-out (lib/augmentations.py:31-32)
    ident = (gh == 1.0) & (gs == 1.0) & (gv == 1.0)
    rj, gj, bj = _hsv_jitter_planar(r, g, b, gh, gs, gv)
    r = jnp.where(ident, r, rj)
    g = jnp.where(ident, g, gj)
    b = jnp.where(ident, b, bj)
    return jnp.stack([jnp.round(r), jnp.round(g), jnp.round(b)],
                     axis=0).astype(jnp.uint8)


def _canvas_one(tile_rows, slot_rows, region, offset, hsv, out_size: int):
    """One spec -> (3, C, C) uint8 planar HSV-jittered canvas, C = 2s+2."""
    core = _paste_canvas(tile_rows, slot_rows, region, offset, out_size)
    return _hsv_canvas(core, hsv, region.shape[0])


def _pack_blocks(canvas):
    """(3, C, C) planar uint8 canvas -> (C*C, 4) uint32 2x2-block table.

    Row (x*C + y) holds the packed RGB (low 24 bits) of cells (x, y),
    (x+1, y), (x, y+1), (x+1, y+1) — i.e. the (c00, c01, c10, c11)
    bilinear taps of an output pixel whose floor cell is (x, y); the +1
    neighbours at the outer edge read the PAD value (one extra PAD
    row/col — those cells are the ring anyway, and per-tap validity
    masks handle everything further out).
    """
    C = canvas.shape[1]
    cp = jnp.pad(canvas, ((0, 0), (0, 1), (0, 1)),
                 constant_values=_PAD_U8).astype(jnp.uint32)
    packed = cp[0] | (cp[1] << 8) | (cp[2] << 16)   # (C+1, C+1) [X, Y]
    blocks = jnp.stack(
        [packed[:C, :C], packed[1:, :C], packed[:C, 1:], packed[1:, 1:]],
        axis=-1,
    )
    return blocks.reshape(C * C, 4)


def _unpack_rgb(word):
    """uint32 word -> (..., 3) float32 RGB."""
    return jnp.stack(
        [(word & 0xFF).astype(jnp.float32),
         ((word >> 8) & 0xFF).astype(jnp.float32),
         ((word >> 16) & 0xFF).astype(jnp.float32)],
        axis=-1,
    )


def _warp_block(canvas, minv, out_size: int):
    """Affine bilinear warp of the canvas — ONE gather per output pixel.

    Bit-identical to four independent taps: the gathered uint32 quad IS
    the four tap values, and out-of-buffer taps substitute PAD through
    explicit validity masks (matching the tap renderer's unowned-tap
    semantics, since every in-buffer non-content cell already holds PAD).
    """
    s = out_size
    C = canvas.shape[1]
    table = _pack_blocks(canvas)

    ox = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    oy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    cx = minv[0, 0] * ox + minv[0, 1] * oy + minv[0, 2]
    cy = minv[1, 0] * ox + minv[1, 1] * oy + minv[1, 2]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0

    bx = jnp.clip(x0.astype(jnp.int32) + 1, 0, C - 1)     # buffer coords
    by = jnp.clip(y0.astype(jnp.int32) + 1, 0, C - 1)
    quad = jnp.take(table, bx * C + by, axis=0)           # (s, s, 4) u32

    # If the block index did not clip, all four quad entries ARE the four
    # tap cells (ring/pad cells included, which hold PAD like unowned
    # taps).  If it did clip, every true tap lies at cell <= -1 or
    # >= 2s+1, where the tap renderer yields PAD — so one mask suffices.
    ok = ((x0 >= -1.0) & (x0 <= C - 2.0)
          & (y0 >= -1.0) & (y0 <= C - 2.0))

    c00 = _unpack_rgb(quad[..., 0])
    c01 = _unpack_rgb(quad[..., 1])
    c10 = _unpack_rgb(quad[..., 2])
    c11 = _unpack_rgb(quad[..., 3])
    out = (c00 * ((1 - fx) * (1 - fy))[..., None]
           + c01 * (fx * (1 - fy))[..., None]
           + c10 * ((1 - fx) * fy)[..., None]
           + c11 * (fx * fy)[..., None])
    out = jnp.where(ok[..., None], out, PAD)
    return jnp.round(out)


def _render_one_canvas(tile_rows, slot_rows, region, offset, hsv, minv,
                       out_size: int):
    canvas = _canvas_one(tile_rows, slot_rows, region, offset, hsv,
                         out_size)
    return _warp_block(canvas, minv, out_size)


def _render_pallas(make_canvas, B: int, n_out: int, mix_idx, minv,
                   out_size: int):
    """Batch renderer for method="pallas": XLA canvases + MXU warp kernel.

    ``make_canvas(b)`` builds spec b's (3, C, C) planar uint8 canvas (the
    exact `_canvas_one` output — already the kernel's (b, channel, x, y)
    patch layout, so no relayout sits between paste and warp); the warp
    stage then runs as the Pallas one-hot-matmul kernel
    (`ryolo_tpu.ops.pallas_warp`) instead of `_warp_block`'s per-pixel
    gather — ~3x below the TPU gather floor.  Output matches the gather
    renderers within 1 unit on <0.01% of pixels (FMA-contraction ULPs at
    rounding boundaries; tests/test_pallas_warp.py).

    Mixup-partner slots (b >= n_out) that no base slot's ``mix_idx``
    references are SKIPPED: their canvas build runs as a ``lax.cond``
    no-op and the warp kernel PAD-fills their tiles without DMA or
    matmul work.  Exact: `_mix_flip_tail` never consumes an unreferenced
    partner's pixels (``jnp.where(has_mix, ...)`` discards them), and at
    the reference mixup rate 0.15 only ~1.2 of the E = ceil(0.4·B)
    partner slots are live per batch — the skip removes ~23% of the
    renderer's device time.
    """
    from ryolo_tpu.ops.pallas_warp import warp_canvas_planar

    C = 2 * out_size + 2
    slot = jnp.arange(B, dtype=jnp.int32)
    active = (slot < n_out) | jnp.any(
        jnp.asarray(mix_idx)[None, :n_out] == slot[:, None], axis=1)
    pad = jnp.full((3, C, C), _PAD_U8, jnp.uint8)
    canvases = []
    for b in range(B):
        if b < n_out:  # base slots are always live
            canvases.append(make_canvas(b))
        else:
            canvases.append(
                jax.lax.cond(active[b], lambda b=b: make_canvas(b),
                             lambda: pad))
    return warp_canvas_planar(jnp.stack(canvases), minv, out_size,
                              active=active)


@functools.partial(jax.jit,
                   static_argnames=("n_out", "method", "out_dtype"))
def render_specs(tiles, region, offset, hsv, minv, flip, mix_idx, mix_r,
                 n_out: int, method: str = "taps", out_dtype: str = "f"):
    """Render a batch of specs -> (n_out, s, s, 3) float32 RGB in [0, 1].

    Spec slots ≥ ``n_out`` are mixup partners only.  See module docstring
    for layouts.
    """
    s = tiles.shape[3]
    T = tiles.shape[1]
    B = region.shape[0]
    rows = jnp.arange(T, dtype=jnp.int32)
    # canvas-based paths unroll over specs: the paste's per-spec
    # dynamic_update_slice starts would lower to scatters under vmap
    if method == "pallas":
        imgs = _render_pallas(
            lambda b: _canvas_one(tiles[b], rows, region[b], offset[b],
                                  hsv[b], s),
            B, n_out, mix_idx, minv, s)
    elif method == "canvas":
        imgs = jnp.stack([
            _render_one_canvas(tiles[b], rows, region[b], offset[b],
                               hsv[b], minv[b], s)
            for b in range(B)
        ])
    else:
        imgs = jax.vmap(
            lambda t, r, o, g, m: _render_one(t, rows, r, o, g, m, s)
        )(tiles, region, offset, hsv, minv)      # (B, s, s, 3) in [0,255]
    return _mix_flip_tail(imgs, flip, mix_idx, mix_r, n_out, out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_out", "method", "out_dtype"))
def render_specs_banked(bank, tile_idx, region, offset, hsv, minv, flip,
                        mix_idx, mix_r, n_out: int,
                        method: str = "taps", out_dtype: str = "f"):
    """:func:`render_specs` gathering tiles from a device-RESIDENT bank.

    ``bank`` is the whole decoded dataset — (N, s, s) uint32 packed-RGB
    x-major, each row an image resized to fit s×s with content top-left
    (exactly the tile layout the per-spec path ships) — uploaded ONCE;
    ``tile_idx``
    (B, T) int32 names each spec slot's bank row.  Per-batch host→device
    traffic drops from the (B, T, s, s, 3) tile pixels (~140 MB at 800px
    B=8) to a few KB of spec scalars, which is what makes device-side
    augmentation a win even on low-bandwidth (tunnel-attached) hosts.
    Outputs are bit-identical to :func:`render_specs` on the same specs
    and ``method``: both paths run the same program, only the source rows
    differ.
    """
    s = bank.shape[2]
    B = region.shape[0]
    # canvas-based paths unroll over specs (see render_specs)
    if method == "pallas":
        imgs = _render_pallas(
            lambda b: _canvas_one(bank, tile_idx[b], region[b], offset[b],
                                  hsv[b], s),
            B, n_out, mix_idx, minv, s)
    elif method == "canvas":
        imgs = jnp.stack([
            _render_one_canvas(bank, tile_idx[b], region[b], offset[b],
                               hsv[b], minv[b], s)
            for b in range(B)
        ])
    else:
        imgs = jax.vmap(
            lambda ti, r, o, g, m: _render_one(bank, ti, r, o, g, m, s)
        )(tile_idx, region, offset, hsv, minv)
    return _mix_flip_tail(imgs, flip, mix_idx, mix_r, n_out, out_dtype)


def pick_method(hyp, out_size: int) -> str:
    """Production renderer selection for a training run.

    The Pallas MXU warp (`ryolo_tpu.ops.pallas_warp`) replaces the
    byte-bound per-pixel warp gather whenever the hyp's worst-case warp
    derivative fits its static 96-cell tap span — the kernel bound is
    MAX_ROW_NORM = (SPAN-2)/(TILE-1) ≈ 3.03, and the reference defaults
    satisfy it: scale 0.5 -> sqrt(2)/0.5 ≈ 2.83 ≤ 3.03 — and the backend
    is a TPU; otherwise the canvas gather renderer runs.
    """
    from ryolo_tpu.ops.pallas_warp import fits_hyp

    if jax.default_backend() == "tpu" and fits_hyp(hyp, out_size):
        return "pallas"
    return "canvas"


def render_batch(arrays, n_out: int, bank=None, method: str = "taps",
                 out_dtype=None):
    """Dispatch a loader spec batch (dict of jax arrays) to the renderer.

    Banked batches carry ``spec_tile_idx`` (needs ``bank``); pixel batches
    carry ``spec_tiles`` (the bank-overflow fallback emits these even when
    the loader runs in device-cache mode).  ``method``: "canvas" (the
    production canvas + packed-block path) or "taps" (the 4-tap reference
    implementation) — the two are bit-identical; "taps" exists as the
    plainly-readable semantics spec and for differential testing.

    ``out_dtype``: cast the rendered images inside the jitted render
    program (fuses into the flip/mix tail).  Pass the train step's compute
    dtype (bf16): the model casts its input to that dtype at the first
    conv anyway, so the values are bit-identical while the standalone
    in-step convert of the full-resolution image (profiled ~4 ms/step
    @800px B8 — the 3-channel minor layout converts pathologically) and
    half the renderer→step HBM traffic disappear.
    """
    common = (arrays["spec_region"], arrays["spec_offset"],
              arrays["spec_hsv"], arrays["spec_minv"], arrays["spec_flip"],
              arrays["spec_mix_idx"], arrays["spec_mix_r"])
    dt = jnp.dtype(out_dtype).name if out_dtype is not None else "f"
    if "spec_tile_idx" in arrays:
        if bank is None:
            raise ValueError("banked spec batch needs the uploaded tile bank")
        return render_specs_banked(bank, arrays["spec_tile_idx"], *common,
                                   n_out=n_out, method=method, out_dtype=dt)
    return render_specs(arrays["spec_tiles"], *common, n_out=n_out,
                        method=method, out_dtype=dt)


def _mix_flip_tail(imgs, flip, mix_idx, mix_r, n_out: int,
                   out_dtype: str = "f"):
    # ``imgs`` carries rounded integers in [0, 255] — in f32 (gather
    # renderers) or bf16 (Pallas warp output; bf16 holds these integers
    # EXACTLY).  All value-producing math runs in f32 on exact upcasts, so
    # results are bit-identical across the two carriers; selects/flips
    # stay in the carrier dtype (permutations/selection only), which
    # halves their bytes on the bf16 path.
    dt = imgs.dtype
    base = imgs[:n_out]
    has_mix = mix_idx[:n_out] >= 0
    partner = jnp.take(imgs, jnp.maximum(mix_idx[:n_out], 0), axis=0)
    r = mix_r[:n_out][:, None, None, None]
    # reference mixup: float blend then uint8 truncation
    # (lib/augmentations.py:23-27); the floor output is again an integer
    # in [0, 255], exact in bf16
    mixed = jnp.floor(base.astype(jnp.float32) * r
                      + partner.astype(jnp.float32) * (1.0 - r)).astype(dt)
    out = jnp.where(has_mix[:, None, None, None], mixed, base)

    do_lr = flip[:n_out, 0][:, None, None, None]
    do_ud = flip[:n_out, 1][:, None, None, None]
    out = jnp.where(do_lr, out[:, :, ::-1, :], out)
    out = jnp.where(do_ud, out[:, ::-1, :, :], out)
    out = out.astype(jnp.float32) / 255.0
    # same rounding as the consumer's own input cast (f32 /255 then cast)
    return out.astype(jnp.dtype(out_dtype)) if out_dtype != "f" else out
