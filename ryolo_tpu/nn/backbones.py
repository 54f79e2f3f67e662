"""Feature-extractor backbones (v4 CSPDarknet-53, v5, v7 ELAN) in Flax.

Structural equivalents of ``model/backbone.py`` (Backbonev4 ``:4-36``,
Backbonev5 ``:39-66``, Backbonev7 ``:69-101``); each returns ``(d3, d4, d5)``
feature maps at strides 8/16/32, with the SPP variant applied to d5.
NHWC throughout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ryolo_tpu.nn.blocks import (
    C3,
    CSP,
    ELAN1,
    SPP,
    SPPCSPC,
    SPPF,
    ConvBlock,
    Dtype,
    MaxConv,
    S2DStem,
    train_s2d_stem,
)


class Backbonev4(nn.Module):
    """CSPDarknet-53 with mish (``model/backbone.py:4-36``)."""

    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False
    packed_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if self.deploy:  # exact S2D reparametrization of cbm0+cbm1
            x = S2DStem(32, 64, act="mish", dtype=d,
                        packed=self.packed_input, name="s2d_stem")(x, train)
        elif x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = train_s2d_stem(x, train, 32, 64, "mish", d, "cbm0", "cbm1")
        else:
            x = ConvBlock(32, 3, 1, "mish", dtype=d, name="cbm0")(x, train)
            x = ConvBlock(64, 3, 2, "mish", dtype=d, name="cbm1")(x, train)
        x = CSP(64, 64, 1, dtype=d, deploy=self.deploy, quant=self.quant, name="csp1")(x, train)
        x = ConvBlock(128, 3, 2, "mish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbm2")(x, train)
        x = CSP(128, 128, 2, dtype=d, deploy=self.deploy, quant=self.quant, name="csp2")(x, train)
        x = ConvBlock(256, 3, 2, "mish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbm3")(x, train)
        d3 = CSP(256, 256, 8, dtype=d, deploy=self.deploy, quant=self.quant, name="csp3")(x, train)
        x = ConvBlock(512, 3, 2, "mish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbm4")(d3, train)
        d4 = CSP(512, 512, 8, dtype=d, deploy=self.deploy, quant=self.quant, name="csp4")(x, train)
        x = ConvBlock(1024, 3, 2, "mish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbm5")(d4, train)
        d5 = CSP(1024, 1024, 4, dtype=d, deploy=self.deploy, quant=self.quant, name="csp5")(x, train)
        d5 = SPP(1024, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="spp")(d5, train)
        return d3, d4, d5


class Backbonev5(nn.Module):
    """YOLOv5 backbone: 6x6 stem, C3 depths 3/6/9/3, SPPF (``:39-66``)."""

    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False
    packed_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        # (the 6x6 stride-2 stem is already a strided conv on the raw
        # input — the v7/v4 S2D rewrite targets the stride-1 first conv)
        x = ConvBlock(64, 6, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs0")(x, train)
        x = ConvBlock(128, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs1")(x, train)
        x = C3(128, 128, 3, dtype=d, deploy=self.deploy, quant=self.quant, name="csp1")(x, train)
        x = ConvBlock(256, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs2")(x, train)
        d3 = C3(256, 256, 6, dtype=d, deploy=self.deploy, quant=self.quant, name="csp2")(x, train)
        x = ConvBlock(512, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs3")(d3, train)
        d4 = C3(512, 512, 9, dtype=d, deploy=self.deploy, quant=self.quant, name="csp3")(x, train)
        x = ConvBlock(1024, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs4")(d4, train)
        d5 = C3(1024, 1024, 3, dtype=d, deploy=self.deploy, quant=self.quant, name="csp4")(x, train)
        d5 = SPPF(1024, 1024, dtype=d, deploy=self.deploy, quant=self.quant, name="spp")(d5, train)
        return d3, d4, d5


class Backbonev7(nn.Module):
    """YOLOv7 backbone: ELAN1 stages with MaxConv downsamples (``:69-101``)."""

    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False
    packed_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if self.deploy:  # exact S2D reparametrization of cbs0+cbs1
            x = S2DStem(32, 64, dtype=d, packed=self.packed_input,
                        name="s2d_stem")(x, train)
        elif x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # train-time S2D twin: same params/variables as the two
            # ConvBlocks below, computed on the space-to-depth grid
            x = train_s2d_stem(x, train, 32, 64, "swish", d, "cbs0", "cbs1")
        else:
            x = ConvBlock(32, 3, 1, "swish", dtype=d, name="cbs0")(x, train)
            x = ConvBlock(64, 3, 2, "swish", dtype=d, name="cbs1")(x, train)
        x = ConvBlock(64, 3, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs2")(x, train)
        from ryolo_tpu.nn.blocks import _chain_barrier
        x = ConvBlock(128, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="cbs3")(_chain_barrier(x, self.deploy), train)
        x = ELAN1(128, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="elan1")(x, train)
        x = MaxConv(256, dtype=d, deploy=self.deploy, quant=self.quant, name="mc1")(x, train)
        d3 = ELAN1(256, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="elan2")(x, train)
        x = MaxConv(512, dtype=d, deploy=self.deploy, quant=self.quant, name="mc2")(d3, train)
        d4 = ELAN1(512, 1024, dtype=d, deploy=self.deploy, quant=self.quant, name="elan3")(x, train)
        x = MaxConv(1024, dtype=d, deploy=self.deploy, quant=self.quant, name="mc3")(d4, train)
        d5 = ELAN1(1024, 1024, e1=0.25, e2=0.25, dtype=d, deploy=self.deploy, quant=self.quant, name="elan4")(x, train)
        d5 = SPPCSPC(1024, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="spp")(d5, train)
        return d3, d4, d5


BACKBONES = {
    "yolov4": Backbonev4,
    "yolov5": Backbonev5,
    "yolov7": Backbonev7,
}
