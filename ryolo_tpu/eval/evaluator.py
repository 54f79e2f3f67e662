"""Full evaluation loop: the reusable ``test()`` of the TPU build.

Equivalent of ``test.py:167-222``: iterate the val split, jit-fused
forward+decode, val loss, post-process, greedy skew-IoU matching, COCO
mAP@.5:.95 — with the batch-level compute jitted and only per-image
matching on host.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ryolo_tpu.data.loader import load_data
from ryolo_tpu.eval.metrics import calculate_eval_stats, get_batch_statistics
from ryolo_tpu.eval.postprocess import post_process_fixed
from ryolo_tpu.utils.logger import logger


def padded_targets_to_rows(tgt, mask, img_size: int) -> np.ndarray:
    """(B, T, 6) padded targets -> reference rows ``[idx, cls, x, y, w, h, θ]``
    with xywh scaled to pixels (``test.py:200``)."""
    tgt = np.asarray(tgt)
    mask = np.asarray(mask)
    rows = []
    for b in range(tgt.shape[0]):
        sel = tgt[b][mask[b]]
        if not len(sel):
            continue
        out = np.zeros((len(sel), 7), np.float32)
        out[:, 0] = b
        out[:, 1] = sel[:, 0]
        out[:, 2:6] = sel[:, 1:5] * img_size
        out[:, 6] = sel[:, 5]
        rows.append(out)
    if not rows:
        return np.zeros((0, 7), np.float32)
    return np.concatenate(rows, 0)


def evaluate(
    model,
    variables,
    loss_fn: Optional[Callable],
    data: Dict,
    hyp: Dict,
    csl: bool,
    img_size: int,
    batch_size: int,
    conf_thres: float,
    iou_thres: float,
    max_targets: int = 300,
    max_nms: int = 5000,
    max_det: int = 1500,
    progress: bool = True,
) -> Tuple[float, float, float, float, Dict[str, float]]:
    """Run the full mAP protocol on ``data['val']``.

    Returns ``(mp, mr, map50, map50_95, avg_loss_items)`` like
    ``test.py:222``.
    """
    _, loader = load_data(
        data["val"], data["names"], data["type"], hyp, csl,
        img_size=img_size, batch_size=batch_size, augment=False,
        shuffle=False, max_targets=max_targets,
    )

    logger.info("Compute mAP...")

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images, train=False, decode=True)

    iouv = np.linspace(0.5, 0.95, 10)
    niou = len(iouv)
    stats = []
    seen = 0
    total_loss_items: Dict[str, float] = {}
    n_batches = 0

    iterator = loader
    if progress:
        try:
            import tqdm

            iterator = tqdm.tqdm(loader, total=len(loader))
        except ImportError:
            pass

    for batch in iterator:
        images = jnp.asarray(batch["images"])
        seen += images.shape[0]
        n_batches += 1

        outputs, decoded = forward(variables, images)
        if loss_fn is not None:
            _, loss_items = loss_fn(outputs, batch)
            for k, v in loss_items.items():
                total_loss_items[k] = total_loss_items.get(k, 0.0) + float(v)

        dets, valid = post_process_fixed(
            decoded, float(conf_thres), float(iou_thres),
            max_nms=max_nms, max_det=max_det,
        )
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        outputs_list = [dets[b][valid[b]] for b in range(dets.shape[0])]

        target_rows = padded_targets_to_rows(batch["tgt"], batch["tgt_mask"],
                                             img_size)
        stats += get_batch_statistics(outputs_list, target_rows, iouv, niou)

    stats_cat = [np.concatenate(x, 0) for x in zip(*stats)] if stats else []
    nt, p, r, ap50, ap, f1, ap_class, mp, mr, map50, map5095 = (
        calculate_eval_stats(stats_cat, len(data["names"]))
    )

    logger.info(("%20s" + "%12s" * 6) % ("Class", "Images", "Labels",
                                         "Precision", "Recall", "mAP@.5",
                                         "mAP@.5:.95"))
    pf = "%20s" + "%12i" * 2 + "%12.3g" * 4
    logger.info(pf % ("all", seen, nt.sum(), mp, mr, map50, map5095))
    for i, c in enumerate(ap_class):
        logger.info(pf % (data["names"][c], seen, nt[c], p[i], r[i], ap50[i],
                          ap[i]))

    for k in total_loss_items:
        total_loss_items[k] /= max(n_batches, 1)
    return mp, mr, map50, map5095, total_loss_items
