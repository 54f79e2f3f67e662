"""Visual spot-check that augmented images and rotated labels align.

Equivalent of the reference's ``display_inputs.py`` (its only data-pipeline
QA tool, SURVEY.md §4) adapted for headless use: writes annotated samples to
``outputs/display/`` instead of cv2.imshow.
"""

import argparse
import os

import cv2
import numpy as np

from ryolo_tpu.data.datasets import xywha_to_polys_np
from ryolo_tpu.data.loader import load_data
from ryolo_tpu.utils.config import load_yaml


def main(args):
    config = load_yaml(args.config)
    data = load_yaml(args.data)
    _, loader = load_data(
        data["train"], data["names"], data["type"], config["hyp"], False,
        img_size=args.img_size, batch_size=1, augment=True,
    )
    out_dir = os.path.join("outputs", "display")
    os.makedirs(out_dir, exist_ok=True)

    for i, batch in enumerate(loader):
        if i >= args.n:
            break
        img = (batch["images"][0, :, :, ::-1] * 255).astype(np.uint8).copy()
        tgt = batch["tgt"][0][batch["tgt_mask"][0]]
        if len(tgt):
            boxes = tgt[:, 1:6].copy()
            boxes[:, :4] *= img.shape[0]
            polys = xywha_to_polys_np(boxes).astype(np.intp)
            for poly in polys:
                cv2.drawContours(img, [poly], 0, (255, 0, 0), 1)
        name = os.path.basename(batch["paths"][0])
        cv2.imwrite(os.path.join(out_dir, name), img)
        print(f"wrote {name} with {len(tgt)} targets")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="configs/DOTA.yaml")
    parser.add_argument("--config", type=str, default="configs/hyp.yaml")
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--n", type=int, default=8)
    main(parser.parse_args())
