"""Generate a tiny synthetic rotated-box dataset (custom format).

Usage: ``python tests/make_synth_data.py /tmp/synth [n_images] [img_size]``

Creates ``<dir>/{train,val,test}`` with ``.png`` images containing rotated
rectangles of two classes on noisy backgrounds, matching ``.txt`` labels in
the custom format (``cx cy w h theta label``, pixels/radians — the
``xml2txt.py`` output format), and a ``data.yaml``.
"""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ryolo_tpu.data.datasets import xywha_to_polys_np  # noqa: E402


def make_split(out_dir, n_images, img_size, rng, w_range=(0.08, 0.18),
               ratio=(1.5, 3.0), n_classes=2, max_obj=5, min_obj=1):
    os.makedirs(out_dir, exist_ok=True)
    palette = [
        tuple(int(c) for c in rng.integers(30, 255, 3))
        for _ in range(n_classes)
    ]
    palette[:2] = [(40, 200, 40), (40, 40, 220)]  # keep 2-class colors stable
    for i in range(n_images):
        img = rng.integers(0, 60, (img_size, img_size, 3)).astype(np.uint8)
        n_obj = int(rng.integers(min_obj, max_obj))
        rows = []
        for _ in range(n_obj):
            cls = int(rng.integers(0, n_classes))
            w = float(rng.uniform(*w_range) * img_size)
            h = min(w * float(rng.uniform(*ratio)), img_size * 0.45)
            x = float(rng.uniform(h, img_size - h))
            y = float(rng.uniform(h, img_size - h))
            t = float(rng.uniform(-np.pi / 2, np.pi / 2 - 1e-3))
            poly = xywha_to_polys_np(
                np.array([[x, y, w, h, t]], np.float32)
            )[0].astype(np.int32)
            cv2.fillPoly(img, [poly], palette[cls % len(palette)])
            rows.append(f"{x:.2f} {y:.2f} {w:.2f} {h:.2f} {t:.5f} {cls}")
        cv2.imwrite(os.path.join(out_dir, f"im{i:03d}.png"), img)
        with open(os.path.join(out_dir, f"im{i:03d}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")


def class_names(n_classes):
    if n_classes == 2:
        return ["greenbox", "redbox"]
    return [f"class{i}" for i in range(n_classes)]


def main(root, n_images=16, img_size=256, seed=0, w_range=(0.08, 0.18),
         ratio=(1.5, 3.0), n_classes=2, max_obj=5, min_obj=1):
    rng = np.random.default_rng(seed)
    kw = dict(w_range=w_range, ratio=ratio, n_classes=n_classes,
              max_obj=max_obj, min_obj=min_obj)
    make_split(os.path.join(root, "train"), n_images, img_size, rng, **kw)
    make_split(os.path.join(root, "val"), max(n_images // 2, 2), img_size,
               rng, **kw)
    make_split(os.path.join(root, "test"), 2, img_size, rng, **kw)
    names = ", ".join(f"'{n}'" for n in class_names(n_classes))
    with open(os.path.join(root, "data.yaml"), "w") as f:
        f.write(
            "type: custom\n"
            f"train: {root}/train\n"
            f"val: {root}/val\n"
            f"test: {root}/test\n"
            f"names: [{names}]\n"
        )
    print(f"synthetic dataset at {root}")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    main(root, n, s)
