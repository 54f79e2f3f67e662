"""Model assembly: backbone + PAN neck + rotated head, as one Flax module.

Equivalent of ``model/yolo.py:9-72`` (Yolo, ``_make_anchors``,
``_make_rotated_anchors``) with decode fused into the jitted forward.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ryolo_tpu.nn.backbones import BACKBONES
from ryolo_tpu.nn.heads import (decode_csl, decode_csl_defer,
                                decode_kfiou, decode_kfiou_scores,
                                reshape_head)
from ryolo_tpu.nn.necks import NECKS

STRIDES = (8, 16, 32)  # fixed, model/yolo.py:21


def make_anchors(strides: Sequence[int], anchors: Sequence[Sequence[float]]):
    """Per-level (na, 2) anchor wh in grid units (``model/yolo.py:53-61``)."""
    out = []
    for stride, anchor in zip(strides, anchors):
        lvl = [[anchor[i] / stride, anchor[i + 1] / stride]
               for i in range(0, len(anchor), 2)]
        out.append(np.asarray(lvl, np.float32))
    return out


def make_rotated_anchors(strides, anchors, angles_rad):
    """Per-level (na*len(angles), 3) [w, h, θ] anchors (``model/yolo.py:63-72``)."""
    out = []
    for stride, anchor in zip(strides, anchors):
        lvl = []
        for i in range(0, len(anchor), 2):
            for ang in angles_rad:
                lvl.append([anchor[i] / stride, anchor[i + 1] / stride, ang])
        out.append(np.asarray(lvl, np.float32))
    return out


class Yolo(nn.Module):
    """Rotated-box YOLO: ``ver`` ∈ {yolov4, yolov5, yolov7} × ``mode`` ∈ {csl, kfiou}.

    ``__call__(images_nhwc, train=..., decode=False)`` returns the tuple of
    conv-native NHWC head maps ``(B, gs, gs, na·nf)`` in the compute dtype
    (the TRAIN contract — the losses consume this layout directly); with
    ``decode=True`` it returns reference-layout raw heads
    ``(B, na, gs, gs, nf)`` (``model/yololayer.py:25,56``) plus the
    concatenated decoded predictions ``(B, Σ na·gs², nc+6)`` (inference
    contract, ``model/yolo.py:46-51``).
    """

    n_classes: int
    model_config: Any  # {'anchors': 3x[6], 'angles': [6] degrees}
    mode: str = "csl"  # 'csl' | 'kfiou'
    ver: str = "yolov5"
    dtype: Any = jnp.float32
    # Inference-only fused graph (BN folded, RepConv merged, Implicit priors
    # absorbed); params come from ryolo_tpu.nn.deploy.fuse_for_inference.
    deploy: bool = False
    # int8 MXU path for the BN-backed convs (deploy graphs only); params
    # come from fuse_for_inference(quantize=True).
    quant: bool = False
    # deploy-only: consume HOST-packed 2x2 space-to-depth input
    # (B, S/2, S/2, 12) — see blocks.pack_input_s2d / S2DStem(packed=True)
    packed_input: bool = False

    def setup(self):
        if self.mode not in ("csl", "kfiou"):
            raise NotImplementedError(f"Loss mode : {self.mode} not found.")
        if self.ver not in BACKBONES:
            raise NotImplementedError(f"Yolo version : {self.ver} not found.")
        anchors = self.model_config["anchors"]
        angles = [a * math.pi / 180.0 for a in self.model_config["angles"]]
        if self.mode == "csl":
            self.nf = 4 + 180 + 1 + self.n_classes
            self.anchors = make_anchors(STRIDES, anchors)
        else:
            self.nf = 5 + 1 + self.n_classes
            self.anchors = make_rotated_anchors(STRIDES, anchors, angles)
        self.na = len(self.anchors[0])
        out_ch = self.nf * self.na

        self.backbone = BACKBONES[self.ver](dtype=self.dtype,
                                            deploy=self.deploy,
                                            quant=self.quant,
                                            packed_input=self.packed_input,
                                            name="backbone")
        self.neck = NECKS[self.ver](out_ch, dtype=self.dtype,
                                    deploy=self.deploy, quant=self.quant,
                                    name="neck")

    def __call__(self, images, train: bool = False,
                 decode: bool | str = False):
        """``decode``: False = raw heads only; True = additionally return
        row-tensor predictions ``(B, N, nc+6)`` (reference contract);
        ``"defer"`` = additionally return deferred-decode inputs for the
        matching post-process:
          * CSL: ``(rows_no_theta, neck_outs)`` for
            :func:`ryolo_tpu.eval.postprocess.post_process_defer` — theta
            resolves after top-k selection (the full-width 180-bin argmax
            costs ~4.5 ms/step @800px);
          * KFIoU: ``((conf, cls_id), neck_outs)`` for
            :func:`ryolo_tpu.eval.postprocess.post_process_kfiou_defer` —
            the whole box decode resolves after top-k selection.
        """
        d3, d4, d5 = self.backbone(images, train)
        x6, x5, x4 = self.neck(d5, d4, d3, train)
        heads = (x6, x5, x4)
        if not decode:
            # TRAIN contract: the conv-native NHWC maps (B, gs, gs, na·nf)
            # in the compute dtype.  The losses gather candidate rows and
            # view the obj plane directly on this layout (anchor-major
            # channel packing makes (B, gs, gs, na, nf) a free reshape —
            # losses/assign.py), so the full-map transpose + f32 cast the
            # reference layout would cost (~3.5 ms/step @800px B8 incl.
            # backward) never materializes.  Reference-layout raw heads
            # remain available via ``decode=True`` (parity surface).
            return heads
        # decode reads the UNtransposed neck tensors (conv-native layout,
        # heads.py); when the caller drops the raw outputs, jit then
        # dead-code-eliminates the reshape_head transposes entirely
        if decode == "defer":
            # one pinned copy of each head map, shared by the score/box
            # decode and the deferred gathers: without the barrier the
            # decode cluster relays the conv output {2,0,3,1} and the
            # gather copies it BACK to the conv layout (~1 ms/step churn)
            heads_pinned = jax.lax.optimization_barrier(heads)
            if self.mode == "csl":
                dec = decode_csl_defer(heads_pinned, self.anchors, STRIDES,
                                       self.n_classes)
                return heads_pinned, (dec, heads_pinned)
            # kfiou: defer the ENTIRE box decode — only (conf, cls_id) are
            # computed full-width; post_process_kfiou_defer resolves boxes
            # for the selected top-k (the 18-anchor head would otherwise
            # materialize a (B, N, nc+6) tensor ~6x CSL's row count)
            scores = decode_kfiou_scores(heads_pinned, self.na,
                                         self.n_classes)
            return heads_pinned, (scores, heads_pinned)
        # decode=True: reference-layout f32 raw heads (parity/inspection
        # contract, ``model/yololayer.py:25,56``); jit dead-code-eliminates
        # the transposes + casts whenever the caller drops them.
        outs = tuple(reshape_head(x, self.na, self.nf).astype(jnp.float32)
                     for x in heads)
        fn = decode_csl if self.mode == "csl" else decode_kfiou
        dec = fn(heads, self.anchors, STRIDES, self.n_classes)
        return outs, dec
