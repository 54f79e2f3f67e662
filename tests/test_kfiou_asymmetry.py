"""The KFIoU train/infer angle-decode asymmetry (SURVEY.md §7 hard part 6).

The reference decodes θ differently at inference (``(σ−0.5)·0.5236 + θ_a``,
``model/yololayer.py:96``) and in the loss (``norm_angle((σ−0.5)·1.1 + θ_a)``,
``lib/loss.py:390``).  This is intentional(?) reference behavior that must
be preserved, not "fixed" — these tests pin both widths so a future cleanup
cannot silently unify them.
"""

import numpy as np
import jax.numpy as jnp

from ryolo_tpu.nn.heads import decode_kfiou


def test_inference_decode_width_is_0_5236():
    na, gs, nc = 1, 1, 1
    out = np.zeros((1, na, gs, gs, nc + 6), np.float32)
    out[..., 4] = 20.0  # σ -> 1
    anc = [np.array([[2.0, 2.0, 0.3]], np.float32)]
    # decode consumes the RAW neck layout (B, gs, gs, na*nf)
    raw = out.transpose(0, 2, 3, 1, 4).reshape(1, gs, gs, -1)
    dec = np.asarray(decode_kfiou([jnp.asarray(raw)], anc, [8], nc))
    # θ = (1 - 0.5) * 0.5236 + 0.3
    assert abs(dec[0, 0, 4] - (0.5 * 0.5236 + 0.3)) < 1e-4


def test_loss_decode_width_is_1_1_with_norm():
    # the loss-side decode lives in kfiou_loss; probe it through the loss's
    # sensitivity: two anchors at ±π/2 with saturated θ logits must wrap
    # into [-π/2, π/2) (norm_angle applied), unlike the inference decode.
    from ryolo_tpu.geometry import norm_angle

    theta_logit_sat = 1.0  # σ(∞) -> 1
    anchor_angle = np.pi / 2 * 0.99
    loss_theta = float(norm_angle(
        jnp.asarray((theta_logit_sat - 0.5) * 1.1 + anchor_angle)
    ))
    assert -np.pi / 2 <= loss_theta < np.pi / 2
    infer_theta = (theta_logit_sat - 0.5) * 0.5236 + anchor_angle
    assert infer_theta >= np.pi / 2  # inference decode does NOT wrap
    assert abs((loss_theta + np.pi) - ((theta_logit_sat - 0.5) * 1.1
                                       + anchor_angle)) < 1e-6
