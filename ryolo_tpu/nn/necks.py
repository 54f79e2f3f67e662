"""PAN necks (FPN-up + PAN-down) for v4/v5/v7 in Flax.

Structural equivalents of ``model/neck.py`` (Neckv4 ``:4-81``, Neckv5
``:84-147``, Neckv7 ``:150-217``).  Input is ``(d5, d4, d3)`` = (stride-32,
-16, -8); output is ``(x6, x5, x4)`` = head tensors at strides (8, 16, 32),
matching the reference's return order (``model/neck.py:81,147,217``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ryolo_tpu.nn.blocks import (
    C3,
    C5,
    ELAN2,
    ConvBlock,
    Dtype,
    ImplicitA,
    ImplicitM,
    MaxConv,
    RepConv,
    upsample2x,
)


class Neckv4(nn.Module):
    """Classic YOLOv4 FPN+PAN with C5 blocks, leaky (``model/neck.py:4-81``)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        # x1 = d5 (s32, 512ch after SPP), x2 = d4 (s16), x3 = d3 (s8)
        d = self.dtype
        up1 = upsample2x(ConvBlock(256, 1, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv7")(x1, train))
        x2 = ConvBlock(256, 1, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv8")(x2, train)
        x2 = jnp.concatenate([x2, up1], axis=-1)
        x2 = C5(512, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="conv9")(x2, train)

        up2 = upsample2x(ConvBlock(128, 1, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv14")(x2, train))
        x3 = ConvBlock(128, 1, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv15")(x3, train)
        x3 = jnp.concatenate([x3, up2], axis=-1)
        x3 = C5(256, 128, dtype=d, deploy=self.deploy, quant=self.quant, name="conv16")(x3, train)

        h6 = ConvBlock(256, 3, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv21")(x3, train)
        x6 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv22")(h6, train)

        x3 = ConvBlock(256, 3, 2, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv23")(x3, train)
        x2 = jnp.concatenate([x3, x2], axis=-1)
        x2 = C5(512, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="conv24")(x2, train)

        h5 = ConvBlock(512, 3, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv29")(x2, train)
        x5 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv30")(h5, train)

        x2 = ConvBlock(512, 3, 2, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv31")(x2, train)
        x1 = jnp.concatenate([x2, x1], axis=-1)
        x1 = C5(1024, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="conv32")(x1, train)

        h4 = ConvBlock(1024, 3, 1, "leaky", dtype=d, deploy=self.deploy, quant=self.quant, name="conv37")(x1, train)
        x4 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv38")(h4, train)
        return x6, x5, x4


class Neckv5(nn.Module):
    """YOLOv5 C3-based FPN+PAN, swish, no shortcut (``model/neck.py:84-147``)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        d = self.dtype
        x1 = ConvBlock(512, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv7")(x1, train)
        x2 = jnp.concatenate([x2, upsample2x(x1)], axis=-1)
        x2 = C3(1024, 512, 3, shortcut=False, dtype=d, deploy=self.deploy, quant=self.quant, name="csp1")(x2, train)
        x2 = ConvBlock(256, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv14")(x2, train)

        x3 = jnp.concatenate([x3, upsample2x(x2)], axis=-1)
        x3 = C3(512, 256, 3, shortcut=False, dtype=d, deploy=self.deploy, quant=self.quant, name="csp2")(x3, train)

        x6 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv15")(x3, train)

        x3 = ConvBlock(256, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv16")(x3, train)
        x2 = jnp.concatenate([x2, x3], axis=-1)
        x2 = C3(512, 512, 3, shortcut=False, dtype=d, deploy=self.deploy, quant=self.quant, name="csp3")(x2, train)

        x5 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv17")(x2, train)

        x2 = ConvBlock(512, 3, 2, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv18")(x2, train)
        x1 = jnp.concatenate([x1, x2], axis=-1)
        x1 = C3(1024, 1024, 3, shortcut=False, dtype=d, deploy=self.deploy, quant=self.quant, name="csp4")(x1, train)

        x4 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv19")(x1, train)
        return x6, x5, x4


class Neckv7(nn.Module):
    """YOLOv7 ELAN2 FPN+PAN with RepConv/Implicit heads (``model/neck.py:150-217``)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    deploy: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        d = self.dtype
        x4 = upsample2x(ConvBlock(256, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv1")(x1, train))
        x2 = ConvBlock(256, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv3")(x2, train)
        x2 = jnp.concatenate([x2, x4], axis=-1)
        x2 = ELAN2(512, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="elan1")(x2, train)

        x5 = upsample2x(ConvBlock(128, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv2")(x2, train))
        x3 = ConvBlock(128, 1, 1, "swish", dtype=d, deploy=self.deploy, quant=self.quant, name="conv4")(x3, train)
        x3 = jnp.concatenate([x3, x5], axis=-1)
        x3 = ELAN2(256, 128, dtype=d, deploy=self.deploy, quant=self.quant, name="elan2")(x3, train)

        h6 = RepConv(128, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="repVgg1")(x3, train)
        if not self.deploy:  # folded into conv5's kernel/bias at fuse time
            h6 = ImplicitA(256, name="ia1")(h6)
        h6 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv5")(h6, train)
        x6 = h6 if self.deploy else ImplicitM(self.out_ch, name="im1")(h6)

        x3 = MaxConv(128, e=1.0, dtype=d, deploy=self.deploy, quant=self.quant, name="mc1")(x3, train)
        x2 = jnp.concatenate([x2, x3], axis=-1)
        x2 = ELAN2(512, 256, dtype=d, deploy=self.deploy, quant=self.quant, name="elan3")(x2, train)

        h5 = RepConv(256, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="repVgg2")(x2, train)
        if not self.deploy:
            h5 = ImplicitA(512, name="ia2")(h5)
        h5 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv6")(h5, train)
        x5 = h5 if self.deploy else ImplicitM(self.out_ch, name="im2")(h5)

        x2 = MaxConv(256, e=1.0, dtype=d, deploy=self.deploy, quant=self.quant, name="mc2")(x2, train)
        x1 = jnp.concatenate([x1, x2], axis=-1)
        x1 = ELAN2(1024, 512, dtype=d, deploy=self.deploy, quant=self.quant, name="elan4")(x1, train)

        h4 = RepConv(512, 1024, dtype=d, deploy=self.deploy, quant=self.quant, name="repVgg3")(x1, train)
        if not self.deploy:
            h4 = ImplicitA(1024, name="ia3")(h4)
        h4 = ConvBlock(self.out_ch, 1, 1, "linear", bn=False, bias=True,
                       dtype=d, deploy=self.deploy, quant=self.quant, name="conv7")(h4, train)
        x4 = h4 if self.deploy else ImplicitM(self.out_ch, name="im3")(h4)
        return x6, x5, x4


NECKS = {
    "yolov4": Neckv4,
    "yolov5": Neckv5,
    "yolov7": Neckv7,
}
