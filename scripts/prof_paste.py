"""Microbench: canvas-paste formulations for the device renderer.

Times one spec's 9-slot paste (the hot RMW loop of
ryolo_tpu.data.device_augment._paste_canvas) under different buffer
encodings on the attached TPU, to pick the fastest exact formulation:

  a. planar-u8:   (3, CB, CB) uint8 + separate (CB, CB) int32 owner map
                  (the r5 planar layout — 2 RMW pairs per slot)
  b. packed-u32:  (CB, CB) uint32 holding RGB in the low 24 bits and the
                  owner id in the top byte — ONE RMW pair per slot
  c. packed-u32-aligned: (b) with the window start rounded down to the
                  (8, 128) u32 tiling and a widened (s+8, s+128) window
                  (tests whether unaligned lane offsets are the cost)

Chained + fetch-forced per CLAUDE.md (offsets derive from the previous
iteration's checksum so the tunnel cannot dedup or skip).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--specs", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    s = args.img
    T = 9
    B = args.specs
    CB = 4 * s + 2

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(0, 255, (T, 3, s, s), dtype=np.uint8))
    offs = jnp.asarray(rng.integers(-s + 2, 2 * s - 2, (B, T, 2)),
                       jnp.int32)
    region = jnp.asarray(
        np.sort(rng.integers(0, 2 * s, (B, T, 2, 2)), axis=2)
        .transpose(0, 1, 3, 2).reshape(B, T, 4).astype(np.float32))

    wx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    wy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)

    def paste_u8(off, reg, k0):
        buf = jnp.full((3, CB, CB), 114, jnp.uint8)
        obuf = jnp.full((CB, CB), T, jnp.int32)
        for k in range(T):
            tile = tiles[k]
            qx = wx + (off[k, 0] + k0).astype(jnp.float32)
            qy = wy + off[k, 1].astype(jnp.float32)
            inside = ((qx >= reg[k, 0]) & (qx < reg[k, 2])
                      & (qy >= reg[k, 1]) & (qy < reg[k, 3]))
            px = off[k, 0] + k0 + 1 + s
            py = off[k, 1] + 1 + s
            cur = jax.lax.dynamic_slice(buf, (0, px, py), (3, s, s))
            curo = jax.lax.dynamic_slice(obuf, (px, py), (s, s))
            cur = jnp.where(inside[None], tile, cur)
            curo = jnp.where(inside, k, curo)
            buf = jax.lax.dynamic_update_slice(buf, cur, (0, px, py))
            obuf = jax.lax.dynamic_update_slice(obuf, curo, (px, py))
        return buf, obuf

    packed_tiles = (tiles[:, 0].astype(jnp.uint32)
                    | (tiles[:, 1].astype(jnp.uint32) << 8)
                    | (tiles[:, 2].astype(jnp.uint32) << 16))

    def paste_u32(off, reg, k0):
        buf = jnp.full((CB, CB), 114 | (114 << 8) | (114 << 16)
                       | (T << 24), jnp.uint32)
        for k in range(T):
            tile = packed_tiles[k] | jnp.uint32(k << 24)
            qx = wx + (off[k, 0] + k0).astype(jnp.float32)
            qy = wy + off[k, 1].astype(jnp.float32)
            inside = ((qx >= reg[k, 0]) & (qx < reg[k, 2])
                      & (qy >= reg[k, 1]) & (qy < reg[k, 3]))
            px = off[k, 0] + k0 + 1 + s
            py = off[k, 1] + 1 + s
            cur = jax.lax.dynamic_slice(buf, (px, py), (s, s))
            cur = jnp.where(inside, tile, cur)
            buf = jax.lax.dynamic_update_slice(buf, cur, (px, py))
        return buf,

    AX, AY = 8, 128  # (sublane, lane) tiling for 32-bit types
    wxa = jax.lax.broadcasted_iota(jnp.float32, (s + AX, s + AY), 0)
    wya = jax.lax.broadcasted_iota(jnp.float32, (s + AX, s + AY), 1)
    # tiles padded low so the shifted window read stays in-bounds
    ptiles_pad = jnp.pad(packed_tiles, ((0, 0), (AX, 0), (AY, 0)))

    def paste_u32_aligned(off, reg, k0):
        buf = jnp.full((CB, CB), 114 | (114 << 8) | (114 << 16)
                       | (T << 24), jnp.uint32)
        for k in range(T):
            px = off[k, 0] + k0 + 1 + s
            py = off[k, 1] + 1 + s
            pxa = (px // AX) * AX
            pya = (py // AY) * AY
            dx, dy = px - pxa, py - pya
            # window cell (i, j) -> canvas q = (pxa + i, pya + j) - (1+s)
            qx = wxa + (pxa - 1 - s).astype(jnp.float32)
            qy = wya + (pya - 1 - s).astype(jnp.float32)
            inside = ((qx >= reg[k, 0]) & (qx < reg[k, 2])
                      & (qy >= reg[k, 1]) & (qy < reg[k, 3])
                      # stay inside the tile's span
                      & (qx >= (px - 1 - s)) & (qx < (px - 1 - s + s))
                      & (qy >= (py - 1 - s)) & (qy < (py - 1 - s + s)))
            tile = (jax.lax.dynamic_slice(
                ptiles_pad[k] | jnp.uint32(k << 24),
                (AX - dx, AY - dy), (s + AX, s + AY)))
            cur = jax.lax.dynamic_slice(buf, (pxa, pya),
                                        (s + AX, s + AY))
            cur = jnp.where(inside, tile, cur)
            buf = jax.lax.dynamic_update_slice(buf, cur, (pxa, pya))
        return buf,

    for name, fn in (("planar-u8", paste_u8), ("packed-u32", paste_u32),
                     ("packed-u32-aligned", paste_u32_aligned)):
        @jax.jit
        def run(off, reg, chk, fn=fn):
            k0 = (chk.astype(jnp.int32) % 3) - 1
            acc = jnp.float32(0)
            for b in range(B):
                outs = fn(off[b], reg[b], k0)
                acc = acc + outs[0][..., s + 7, s + 9].astype(
                    jnp.float32).sum()
            return chk + 1.0 + acc * 1e-9

        chk = jnp.float32(1 + int.from_bytes(os.urandom(4), "little")
                          % (1 << 20) / 1024.0)
        chk = run(offs, region, chk)
        assert np.isfinite(float(chk))  # compile + forced warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            chk = run(offs, region, chk)
        assert np.isfinite(float(chk))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:20s} {ms:8.2f} ms/batch ({B} specs x {T} slots)",
              flush=True)


if __name__ == "__main__":
    main()
