"""Reusable conv blocks in Flax (NHWC, TPU-native layouts).

Functional re-design of the reference's ``model/utils.py`` building blocks
(`Conv` ``model/utils.py:6-32``, `Bottleneck` ``:35-46``, `CSP` ``:49-64``,
`C5` ``:67-80``, `C3` ``:83-95``, `ELAN1/2` ``:98-143``, `MaxConv`
``:146-160``, `ImplicitA/M` ``:163-186``, `RepConv` ``:189-215``,
`SPP/SPPF/SPPCSPC` ``:218-282``).  Differences from the reference are purely
representational:

  * NHWC activations / HWIO kernels (MXU/XLA-native) instead of NCHW.
  * ``train`` flag threads batch-norm mode; running stats live in the
    ``batch_stats`` collection.
  * compute dtype is configurable (bfloat16 on TPU); params stay float32.

Submodule names intentionally mirror the reference attribute names so the
``.pth`` checkpoint converter is a mechanical rename+transpose.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ryolo_tpu.nn.fused_bn import FusedBatchNorm

Dtype = Any

def _chain_barrier(x, deploy: bool):
    """Barrier between chained 3x3 convs in deploy graphs.

    Without it XLA nests each chain producer's convolution inside the
    consumer's kOutput fusion; the nested pair re-computes halo overlap
    per output tile and ran measurably slower (800px detect step 17.0 ->
    16.6 ms/batch with the split, A/B on the TPU).  Training graphs are
    left alone (the barrier would pin rematerialization choices).
    """
    return jax.lax.optimization_barrier(x) if deploy else x


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS: dict[str, Callable] = {
    "mish": mish,
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.1),
    "swish": jax.nn.silu,
    "linear": lambda x: x,
}


def max_pool_same(x, k: int):
    """k×k stride-1 max pool with same-size output (-inf padding), NHWC.

    Windows 9 and 13 run as cascaded 5-pools (max is associative and the
    -inf pad composes, so ``pool5∘pool5 == pool9`` and ``pool5³ == pool13``
    elementwise-exactly — the SPPF trick, ``model/utils.py:247-261``,
    applied to SPP/SPPCSPC's 5/9/13 pyramid).  Forward values are
    bit-identical; the payoff is the backward: XLA lowers max-pool grad to
    ``select_and_scatter``, whose cost scales with the window AREA
    (profiled 4.1 + 3.9 ms/step of the @800px train step for the single
    9/13 windows; the cascade does 2-3 window-5 passes instead, 50/75 vs
    81/169 compares).  Gradient tie-ROUTING can differ on exactly-equal
    window maxima (first-max of the composition vs of the flat window) —
    gradients have no cross-framework parity contract (the reference's
    torch maxpool routes ties differently from XLA anyway).
    """
    if k == 9:
        return max_pool_same(max_pool_same(x, 5), 5)
    if k == 13:
        return max_pool_same(max_pool_same(max_pool_same(x, 5), 5), 5)
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


def upsample2x(x):
    """Nearest-neighbor 2x upsample (torch ``nn.Upsample(scale_factor=2)``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class S2DStem(nn.Module):
    """Deploy-only exact space-to-depth reparametrization of a conv stem.

    The first convolution of every detector here sees 3 input channels at
    full image resolution — on the MXU that occupies 3 of 128 lanes (the
    profiled v7 stem ran at 1.4 % utilization and cost ~18 % of the whole
    detect step including its input-layout copy).  This module computes the
    SAME function as ``conv3x3s1(C0) -> act -> conv3x3s2(C1) -> act``: the
    first conv becomes a 4×4 stride-2 conv with (1,2) padding whose 4·C0
    output channels are the 2×2 space-to-depth packing of the original
    stride-1 output (operating on the raw input — no device-side relayout
    copies), the second a 2×2 conv with asymmetric (1,0) padding producing
    the original stride-2 output exactly.  Kernels are scattered from the
    fused originals by ``ryolo_tpu.nn.deploy._s2d_scatter_s1/_s2``.
    """

    c0: int  # original first-conv output channels
    c1: int  # original second-conv output channels
    act: str = "swish"
    dtype: Dtype = jnp.float32
    # packed=True consumes HOST-packed 2×2 space-to-depth input
    # (B, S/2, S/2, 4·3) — see pack_input_s2d; conv0 then runs 3×3 stride-1
    # over 12 channels (K = 108 of 128 MXU reduction lanes) and XLA's ~1 ms
    # batch-minor input relayout for the 3-channel conv disappears.
    # (Packing ON DEVICE was profiled at ~2.4 ms of layout copies — a net
    # loss — so the packed layout must come from the input pipeline, where
    # it replaces the NHWC write of the letterbox at equal byte count.)
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ACTIVATIONS[self.act]
        if self.packed:
            x = nn.Conv(4 * self.c0, (3, 3), strides=(1, 1),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name="conv0")(x)
        else:
            # The packed-border synthesis is exact only when the stride-2
            # grid tiles the input; odd sizes would silently change border
            # activations
            if x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError(
                    f"S2DStem requires even spatial dims, got {x.shape[1:3]}"
                    " (detector inputs are multiples of 32)"
                )
            # conv0: 4x4 stride-2 pad (1,2) over the RAW input — computes
            # the S2D packing of the original stride-1 conv's output
            x = nn.Conv(4 * self.c0, (4, 4), strides=(2, 2),
                        padding=[(1, 2), (1, 2)], use_bias=True,
                        dtype=self.dtype, name="conv0")(x)
        x = f(x)
        x = nn.Conv(self.c1, (2, 2), padding=[(1, 0), (1, 0)],
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        return f(x)


def pack_input_s2d(images):
    """HOST-side 2×2 space-to-depth packing of letterboxed images.

    ``(B, S, S, C) -> (B, S/2, S/2, 4C)`` with channel ``(u·2+v)·C + c`` =
    pixel phase (u, v) — the input layout of ``S2DStem(packed=True)``.
    Numpy; meant to run in the input pipeline where it replaces the plain
    NHWC write at equal byte count.
    """
    import numpy as np

    b, h, w, c = images.shape
    xp = images.reshape(b, h // 2, 2, w // 2, 2, c)
    xp = np.ascontiguousarray(xp.transpose(0, 1, 3, 2, 4, 5))
    return xp.reshape(b, h // 2, w // 2, 4 * c)


def _scatter_s1_jnp(w):
    """Differentiable twin of ``deploy._s2d_scatter_s1``: 3×3 stride-1
    kernel -> 4×4 stride-2 kernel whose output channel ``(a·2+b)·C + c``
    is the 2×2 space-to-depth packing of the original conv's output.
    Static placement of the 9 taps (36 slice-sets traced once); autodiff
    gathers the cotangent back onto the original (3,3,cin,cout) kernel."""
    kh, kw, cin, cout = w.shape
    K = jnp.zeros((4, 4, cin, 4 * cout), w.dtype)
    for s in range(4):
        for a in range(2):
            di = s - a
            if not 0 <= di < kh:
                continue
            for t in range(4):
                for b2 in range(2):
                    dj = t - b2
                    if not 0 <= dj < kw:
                        continue
                    g = (a * 2 + b2) * cout
                    K = K.at[s, t, :, g:g + cout].set(w[di, dj])
    return K


def _scatter_s2_jnp(w):
    """Differentiable twin of ``deploy._s2d_scatter_s2``: 3×3 stride-2
    kernel -> 2×2 kernel consuming the S2D grid (pad (1,0) asymmetric)."""
    kh, kw, cin, cout = w.shape
    K = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for dp in range(2):
        for u in range(2):
            di = 2 * dp + u - 1
            if not 0 <= di < kh:
                continue
            for dq in range(2):
                for v in range(2):
                    dj = 2 * dq + v - 1
                    if not 0 <= dj < kw:
                        continue
                    g = (u * 2 + v) * cin
                    K = K.at[dp, dq, g:g + cin, :].set(w[di, dj])
    return K


class _S2DStemHalf(nn.Module):
    """One stem ConvBlock computed on the 2×2 space-to-depth grid.

    Owns the SAME variable tree as the train-mode ``ConvBlock`` it stands
    in for — ``conv/kernel`` (the ORIGINAL (k,k,cin,cout) f32 kernel, same
    lecun-normal init stream) + a real ``bn`` flax BatchNorm — so
    checkpoints, the ``.pth`` converter and the optimizer see no change;
    only the computation runs on the S2D layout.  ``fold > 1`` batch-norms
    a phase-packed tensor: the (…, fold·cout) map reshapes to
    (…, fold, cout) so the stats reduce over (batch, space, phase) — the
    exact same per-channel population as the original layout, summed in a
    different order (the reshape is a free bitcast: the channel dim is
    phase-major).  Scale/bias/running stats keep their (cout,) shapes.
    """

    cout: int           # ORIGINAL conv output channels
    kshape: tuple       # original kernel shape
    scatter: Callable   # differentiable kernel scatter
    strides: tuple
    padding: tuple
    fold: int           # BN phase fold (4 after scatter_s1, else 1)
    act: str
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = _KernelParam(self.kshape, name="conv")()
        kq = self.scatter(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kq, self.strides, list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, c = y.shape
        if self.fold > 1:
            y = y.reshape(b, h, w, self.fold, c // self.fold)
        y = FusedBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        if self.fold > 1:
            y = y.reshape(b, h, w, c)
        return ACTIVATIONS[self.act](y)


class _KernelParam(nn.Module):
    """Declares ``kernel`` exactly as ``nn.Conv`` would (name, shape,
    dtype, lecun-normal init) without running a convolution."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def train_s2d_stem(x, train: bool, c0: int, c1: int, act: str, dtype,
                   n0: str, n1: str):
    """TRAIN-time exact S2D reparametrization of the two-conv stem.

    Computes the same function as ``ConvBlock(c0,3,1)+ConvBlock(c1,3,2)``
    (``model/backbone.py:72-74`` / ``:6-9``) with both convs, the first
    BN and the first activation on the half-resolution 2×2 space-to-depth
    grid — the train-time twin of the deploy-only :class:`S2DStem`.  Why:
    at 800px the original stem's (B,800,800,32) maps waste 3/4 of the
    128-wide VPU lanes and the 3-in-channel conv runs at ~1.4 % MXU
    utilization; profiled @800px B8 the stem's BN-grad reductions + silu
    + first conv cost ~19 ms of a 79.6 ms train step.  The S2D layout
    packs 4 pixel phases into the channel dim (128 full lanes) at
    identical byte counts.

    Exactness: the scattered kernels compute the identical tap sums (extra
    taps are exact zeros), phase-folded BN reduces the identical per-channel
    population (different summation order: f32-rounding-level diffs), and
    the activation is elementwise.  Kernels are derived from the ORIGINAL
    params every step — autodiff routes gradients back through the scatter,
    so optimizer/checkpoint/EMA semantics are untouched.

    Must be called inside a parent module's compact scope (the param tree
    lands at ``{n0}/{conv,bn}``, ``{n1}/{conv,bn}`` — identical to the two
    ConvBlocks it replaces).
    """
    cin = x.shape[-1]
    h0 = _S2DStemHalf(c0, (3, 3, cin, c0), _scatter_s1_jnp, (2, 2),
                      ((1, 2), (1, 2)), 4, act, dtype, name=n0)
    h1 = _S2DStemHalf(c1, (3, 3, c0, c1), _scatter_s2_jnp, (1, 1),
                      ((1, 0), (1, 0)), 1, act, dtype, name=n1)
    return h1(h0(x, train), train)


class ConvBlock(nn.Module):
    """Conv2d(+pad (k-1)/2) -> optional BN -> activation.

    Mirrors ``model/utils.py:6-32``; bias only for detection heads
    (``bias=True, bn=False, activation='linear'``).

    With ``deploy=True, quant=True`` the (BN-folded) conv runs on the int8
    MXU path: per-output-channel symmetric int8 weights (scales produced by
    :func:`ryolo_tpu.nn.deploy.fuse_variables`) with a dynamic per-tensor
    activation scale — the max/round/clip quantize fuses into the previous
    op's epilogue, the conv accumulates in int32 at 2× the bf16 MXU rate,
    and the dequant+bias+activation fuse into this conv's epilogue.
    Detection-head convs (``bn=False``) never quantize.

    ``quant="static"`` replaces the dynamic per-tensor scale with a
    CALIBRATED constant (``ascale`` param, from
    :func:`ryolo_tpu.nn.deploy.calibrate_static_scales`): the full
    activation max-reduce — a mandatory extra HBM pass per quantized conv
    and a fusion barrier — disappears, leaving a pure elementwise quantize
    that fuses into the producer.  The dynamic branch additionally sows
    its observed scale (``intermediates/amax``) so a calibration pass can
    record per-layer activation ranges.
    """

    out_ch: int
    k: int
    stride: int
    act: str
    bn: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: Any = False  # False | True (dynamic scales) | "static"

    # int8 pays only where the MXU is the bottleneck: narrow convs are
    # layout/bandwidth-bound and the quantize epilogues make them SLOWER
    # (microbenched r3: 512ch 1.37x faster, 128ch 1.02x, 64ch 0.97x)
    QUANT_MIN_CH = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.k - 1) // 2
        if (self.quant and self.deploy and self.bn
                and x.shape[-1] >= self.QUANT_MIN_CH
                and self.out_ch >= self.QUANT_MIN_CH):
            kh = kw = self.k
            cin = x.shape[-1]
            kernel_q = self.param(
                "kernel_q",
                lambda key: jnp.zeros((kh, kw, cin, self.out_ch), jnp.int8),
            )
            wscale = self.param(
                "wscale", lambda key: jnp.ones((self.out_ch,), jnp.float32)
            )
            bias = self.param(
                "bias", lambda key: jnp.zeros((self.out_ch,), jnp.float32)
            )
            x32 = x.astype(jnp.float32)
            if self.quant == "static":
                s = self.param(
                    "ascale", lambda key: jnp.ones((), jnp.float32)
                )
            else:
                s = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12)
                # record the observed per-batch scale for calibration
                self.sow("intermediates", "amax", s,
                         init_fn=lambda: jnp.zeros((), jnp.float32),
                         reduce_fn=jnp.maximum)
            q = jnp.clip(jnp.round(x32 * (127.0 / s)), -127.0,
                         127.0).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                q, kernel_q, (self.stride, self.stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (wscale * (s / 127.0)) + bias
            return ACTIVATIONS[self.act](y).astype(self.dtype)
        fold_bn = self.bn and self.deploy  # BN folded into conv at fuse time
        x = nn.Conv(
            self.out_ch,
            (self.k, self.k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.bias or fold_bn,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.bn and not self.deploy:
            x = FusedBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


def parallel_cv12(x, h1: int, h2: int, act: str, train: bool, deploy: bool,
                  dtype, quant: bool = False, name1: str = "cv1",
                  name2: str = "cv2", swap: bool = False):
    """Two parallel same-input 1×1 convs, packed into ONE at deploy time.

    Several blocks (ELAN1/ELAN2 ``model/utils.py:98-143``, CSP ``:49-64``,
    C3 ``:83-95``, SPPCSPC ``:264-282``) open with two 1×1 convs over the
    SAME input.  Training keeps them separate (checkpoint layout parity);
    with ``deploy=True`` they become one conv with channel-concatenated
    kernels (exact — conv is linear in the output-channel axis), so the
    input is read once and a 64-lane pair fills all 128 MXU lanes.
    Params are produced by :func:`ryolo_tpu.nn.deploy.fuse_variables`.

    ``swap`` puts the SECOND output first in the merged kernel: the
    output that feeds a conv chain must be the lane-ALIGNED prefix slice
    (a 64-offset suffix slice fed ELAN's cv3 chain at 38 TF/s vs 56 for
    the aligned case, profiled r3); the other output only feeds a concat,
    where misalignment is absorbed by the copy anyway.  Must match
    ``deploy._CV12_MERGE_PATHS``'s per-block order.
    """
    if deploy:
        y = ConvBlock(h1 + h2, 1, 1, act, dtype=dtype, deploy=True,
                      quant=quant, name=f"{name1}{name2[-1]}")(x, train)
        if swap:  # kernel order [cv2 | cv1]
            return y[..., h2:], y[..., :h2]
        return y[..., :h1], y[..., h1:]
    a = ConvBlock(h1, 1, 1, act, dtype=dtype, name=name1)(x, train)
    b = ConvBlock(h2, 1, 1, act, dtype=dtype, name=name2)(x, train)
    return a, b


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with residual iff shortcut and c_in == c_out (``:35-46``)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    act: str = "mish"
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBlock(c_, 1, 1, self.act, dtype=self.dtype,
                      deploy=self.deploy, quant=self.quant, name="cv1")(x, train)
        y = ConvBlock(self.c2, 3, 1, self.act, dtype=self.dtype,
                      deploy=self.deploy, quant=self.quant, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class CSP(nn.Module):
    """YOLOv4 cross-stage-partial block, mish (``model/utils.py:49-64``)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c1 * self.e)
        y1, y2 = parallel_cv12(x, c_, c_, "mish", train, self.deploy,
                               self.dtype, self.quant)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, e=1.0, act="mish",
                            dtype=self.dtype, deploy=self.deploy,
                            quant=self.quant, name=f"m_{i}")(y1, train)
        y1 = ConvBlock(c_, 1, 1, "mish", dtype=self.dtype,
                       deploy=self.deploy, quant=self.quant,
                       name="cv3")(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBlock(self.c2, 1, 1, "mish", dtype=self.dtype,
                         deploy=self.deploy, quant=self.quant,
                         name="cv4")(y, train)


class C5(nn.Module):
    """Five consecutive leaky convs 1-3-1-3-1 (``model/utils.py:67-80``)."""

    c1: int
    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c1 * self.e)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x = ConvBlock(c_, 1, 1, "leaky", name="cv1", **kw)(x, train)
        x = ConvBlock(self.c1, 3, 1, "leaky", name="cv2", **kw)(x, train)
        x = ConvBlock(c_, 1, 1, "leaky", name="cv3", **kw)(x, train)
        x = ConvBlock(self.c1, 3, 1, "leaky", name="cv4", **kw)(x, train)
        return ConvBlock(self.c2, 1, 1, "leaky", name="cv5", **kw)(x, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs, swish (``model/utils.py:83-95``)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c1 * self.e)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        y1, y2 = parallel_cv12(x, c_, c_, "swish", train, self.deploy,
                               self.dtype, self.quant)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, e=1.0, act="swish",
                            name=f"m_{i}", **kw)(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBlock(self.c2, 1, 1, "swish", name="cv3", **kw)(y, train)


class ELAN1(nn.Module):
    """v7 backbone aggregation block (``model/utils.py:98-118``)."""

    c1: int
    c2: int
    e1: float = 0.5
    e2: float = 0.5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h1 = int(self.c1 * self.e1)
        h2 = int(self.c1 * self.e2)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x1, x2 = parallel_cv12(x, h1, h1, "swish", train, self.deploy,
                               self.dtype, self.quant, swap=True)
        x3 = ConvBlock(h2, 3, 1, "swish", name="cv3", **kw)(x2, train)
        x3 = ConvBlock(h2, 3, 1, "swish", name="cv4", **kw)(
            _chain_barrier(x3, self.deploy), train)
        x4 = ConvBlock(h2, 3, 1, "swish", name="cv5", **kw)(
            _chain_barrier(x3, self.deploy), train)
        x4 = ConvBlock(h2, 3, 1, "swish", name="cv6", **kw)(
            _chain_barrier(x4, self.deploy), train)
        y = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        return ConvBlock(self.c2, 1, 1, "swish", name="cv7", **kw)(y, train)


class ELAN2(nn.Module):
    """v7 neck aggregation block, 6-branch (``model/utils.py:121-143``)."""

    c1: int
    c2: int
    e1: float = 0.5
    e2: float = 0.25
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h1 = int(self.c1 * self.e1)
        h2 = int(self.c1 * self.e2)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x1, x2 = parallel_cv12(x, h1, h1, "swish", train, self.deploy,
                               self.dtype, self.quant, swap=True)
        x3 = ConvBlock(h2, 3, 1, "swish", name="cv3", **kw)(x2, train)
        x4 = ConvBlock(h2, 3, 1, "swish", name="cv4", **kw)(
            _chain_barrier(x3, self.deploy), train)
        x5 = ConvBlock(h2, 3, 1, "swish", name="cv5", **kw)(
            _chain_barrier(x4, self.deploy), train)
        x6 = ConvBlock(h2, 3, 1, "swish", name="cv6", **kw)(
            _chain_barrier(x5, self.deploy), train)
        y = jnp.concatenate([x1, x2, x3, x4, x5, x6], axis=-1)
        return ConvBlock(self.c2, 1, 1, "swish", name="cv7", **kw)(y, train)


class MaxConv(nn.Module):
    """Parallel maxpool/strided-conv downsample (``model/utils.py:146-160``)."""

    c1: int
    e: float = 0.5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c1 * self.e)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        x1 = ConvBlock(c_, 1, 1, "swish", name="cv1", **kw)(x1, train)
        x2 = ConvBlock(c_, 1, 1, "swish", name="cv2", **kw)(x, train)
        x2 = ConvBlock(c_, 3, 2, "swish", name="cv3", **kw)(
            _chain_barrier(x2, self.deploy), train)
        return jnp.concatenate([x1, x2], axis=-1)


class ImplicitA(nn.Module):
    """YOLOR implicit-knowledge additive prior (``model/utils.py:163-173``)."""

    channels: int
    mean: float = 0.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda key: self.mean
            + self.std * jax.random.normal(key, (1, 1, 1, self.channels)),
        )
        return x + imp.astype(x.dtype)


class ImplicitM(nn.Module):
    """YOLOR implicit-knowledge multiplicative prior (``model/utils.py:176-186``)."""

    channels: int
    mean: float = 1.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda key: self.mean
            + self.std * jax.random.normal(key, (1, 1, 1, self.channels)),
        )
        return x * imp.astype(x.dtype)


class RepConv(nn.Module):
    """RepVGG block: 3x3 + 1x1 + identity-BN branches, SiLU (``:189-215``).

    With ``deploy=True`` the three branches collapse into ONE 3x3 biased conv
    (params produced by :func:`ryolo_tpu.nn.deploy.fuse_for_inference`) — the
    RepVGG deploy-time fusion the reference leaves unimplemented
    (``model/utils.py:189-215``), a pure inference win.
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: Any = False  # False | True (dynamic scales) | "static"

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = 1
        if self.deploy:
            if (self.quant and x.shape[-1] >= ConvBlock.QUANT_MIN_CH
                    and self.c2 >= ConvBlock.QUANT_MIN_CH):
                # int8 MXU path, same scheme as ConvBlock
                cin = x.shape[-1]
                kernel_q = self.param(
                    "fused_q",
                    lambda key: jnp.zeros((self.k, self.k, cin, self.c2),
                                          jnp.int8),
                )
                wscale = self.param(
                    "wscale", lambda key: jnp.ones((self.c2,), jnp.float32)
                )
                bias = self.param(
                    "bias", lambda key: jnp.zeros((self.c2,), jnp.float32)
                )
                x32 = x.astype(jnp.float32)
                if self.quant == "static":
                    sa = self.param(
                        "ascale", lambda key: jnp.ones((), jnp.float32)
                    )
                else:
                    sa = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12)
                    self.sow("intermediates", "amax", sa,
                             init_fn=lambda: jnp.zeros((), jnp.float32),
                             reduce_fn=jnp.maximum)
                q = jnp.clip(jnp.round(x32 * (127.0 / sa)), -127.0,
                             127.0).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    q, kernel_q, (self.s, self.s), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * (wscale * (sa / 127.0)) + bias
                return jax.nn.silu(y).astype(self.dtype)
            y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=[(p, p), (p, p)], use_bias=True,
                        dtype=self.dtype, name="fused")(x)
            return jax.nn.silu(y)
        dense = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=[(p, p), (p, p)], use_bias=False,
                        dtype=self.dtype, name="dense_conv")(x)
        dense = FusedBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="dense_bn")(dense)
        one = nn.Conv(self.c2, (1, 1), strides=(self.s, self.s),
                      use_bias=False, dtype=self.dtype, name="px_conv")(x)
        one = FusedBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="px_bn")(one)
        out = dense + one
        if self.c1 == self.c2 and self.s == 1:
            ident = FusedBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="id_bn")(x)
            out = out + ident
        return jax.nn.silu(out)


class SPP(nn.Module):
    """YOLOv4 spatial pyramid pooling 5/9/13, leaky (``model/utils.py:218-244``)."""

    c1: int
    c2: int
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x = ConvBlock(c_, 1, 1, "leaky", name="cv1", **kw)(x, train)
        x = ConvBlock(self.c1, 3, 1, "leaky", name="cv2", **kw)(x, train)
        x = ConvBlock(c_, 1, 1, "leaky", name="cv3", **kw)(x, train)
        y = jnp.concatenate(
            [max_pool_same(x, 13), max_pool_same(x, 9), max_pool_same(x, 5), x],
            axis=-1,
        )
        y = ConvBlock(c_, 1, 1, "leaky", name="cv4", **kw)(y, train)
        y = ConvBlock(self.c1, 3, 1, "leaky", name="cv5", **kw)(y, train)
        return ConvBlock(self.c2, 1, 1, "leaky", name="cv6", **kw)(y, train)


class SPPF(nn.Module):
    """YOLOv5 fast SPP: cascaded maxpool-5 (``model/utils.py:247-261``)."""

    c1: int
    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x = ConvBlock(c_, 1, 1, "swish", name="cv1", **kw)(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return ConvBlock(self.c2, 1, 1, "swish", name="cv2", **kw)(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train)


class SPPCSPC(nn.Module):
    """YOLOv7 CSP-wrapped SPP, pools 5/9/13 (``model/utils.py:264-282``)."""

    c1: int
    c2: int
    e: float = 0.5
    pools: Sequence[int] = (5, 9, 13)
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        kw = dict(dtype=self.dtype, deploy=self.deploy, quant=self.quant)
        x1, y2 = parallel_cv12(x, c_, c_, "swish", train, self.deploy,
                               self.dtype, self.quant)
        x1 = ConvBlock(c_, 3, 1, "swish", name="cv3", **kw)(x1, train)
        x1 = ConvBlock(c_, 1, 1, "swish", name="cv4", **kw)(x1, train)
        y1 = jnp.concatenate([x1] + [max_pool_same(x1, k) for k in self.pools],
                             axis=-1)
        y1 = ConvBlock(c_, 1, 1, "swish", name="cv5", **kw)(y1, train)
        y1 = ConvBlock(c_, 3, 1, "swish", name="cv6", **kw)(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBlock(self.c2, 1, 1, "swish", name="cv7", **kw)(y, train)
