"""Inference CLI — same surface as the reference ``detect.py``
(args at ``detect.py:85-97``): batch detection over an image folder with
per-batch inference/post-process timing and drawn rotated boxes.

TPU pipeline design: the checkpoint is deploy-fused (BN folding + RepConv
merge, ryolo_tpu/nn/deploy.py), forward+decode+NMS run as ONE jitted device
program, and a background thread prefetches/letterboxes the next batch while
the device computes — the host I/O the reference serializes in its hot loop
(``detect.py:54-76``) overlaps compute here.
"""

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp

from ryolo_tpu.utils.platform import apply_env_platform

apply_env_platform()
import numpy as np

from ryolo_tpu.data.datasets import ImageDataset
from ryolo_tpu.nn import Yolo, fuse_for_inference
from ryolo_tpu.utils.checkpoint import import_state_dict, load_pth
from ryolo_tpu.utils.config import load_yaml
from ryolo_tpu.utils.logger import logger
from ryolo_tpu.utils.plot import plot_boxes


class Detect:
    def __init__(self, args):
        self.args = args

    def detect(self):
        args = self.args
        data = load_yaml(args.data)
        config = load_yaml(args.hyp)
        nc = len(data["names"])

        # uint8 letterboxed batches: the jitted step normalizes with the
        # identical f32 /255 (bit-exact) at 1/4 the host->device traffic
        dataset = ImageDataset(data["test"], img_size=args.img_size,
                               ext=args.ext, image_uint8=True)
        if not len(dataset):
            logger.error(f"No .{args.ext} images found under {data['test']}")
            sys.exit(1)

        if not os.path.isfile(args.weight_path):
            logger.error("Model weight not found.")
            sys.exit(1)

        model = Yolo(n_classes=nc, model_config=config["model"],
                     mode=args.mode, ver=args.ver)
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)  # size-independent init
        variables = dict(model.init(jax.random.PRNGKey(0), sample,
                                    train=False))
        variables, n = import_state_dict(load_pth(args.weight_path), variables)
        logger.info(f"Loaded {n} tensors from {args.weight_path}")
        import jax.numpy as _jnp
        dep_dtype = {"f32": _jnp.float32, "bf16": _jnp.bfloat16,
                     "int8": _jnp.bfloat16}[args.dtype]
        packed = args.packed_input and args.ver in ("yolov7", "yolov4")
        model, variables = fuse_for_inference(
            model, variables, dtype=dep_dtype,
            quantize=args.dtype == "int8", packed_input=packed)

        if args.mode == "csl":
            # deferred theta: full-width 180-bin argmax costs ~4.5 ms/step
            # @800px; resolve theta for the top-k candidates only
            from ryolo_tpu.eval.postprocess import post_process_defer

            @jax.jit
            def infer(variables, images):
                if images.dtype == jnp.uint8:
                    images = images.astype(jnp.float32) / 255.0
                _, (dec, neck) = model.apply(variables, images, train=False,
                                             decode="defer")
                dets, valid = post_process_defer(
                    dec, neck, 3, nc, float(args.conf_thres),
                    float(args.nms_thres)
                )
                return dec, dets, valid
        else:
            # fully deferred KFIoU decode: the 18-anchor head computes only
            # (conf, cls_id) full-width; boxes resolve for the top-k
            import math as _math

            from ryolo_tpu.eval.postprocess import post_process_kfiou_defer
            from ryolo_tpu.nn.yolo import STRIDES, make_rotated_anchors

            _angles = [a * _math.pi / 180
                       for a in config["model"]["angles"]]
            _anchors = make_rotated_anchors(
                STRIDES, config["model"]["anchors"], _angles)

            @jax.jit
            def infer(variables, images):
                if images.dtype == jnp.uint8:
                    images = images.astype(jnp.float32) / 255.0
                _, (scores, neck) = model.apply(variables, images,
                                                train=False, decode="defer")
                dets, valid = post_process_kfiou_defer(
                    scores, neck, len(_anchors[0]), _anchors, STRIDES,
                    float(args.conf_thres), float(args.nms_thres)
                )
                return scores, dets, valid

        save_folder = os.path.join("outputs", "inference")
        os.makedirs(save_folder, exist_ok=True)

        bs = args.batch_size

        def load_batch(i):
            items = [dataset[j] for j in range(i, min(i + bs, len(dataset)))]
            paths = [p for p, _ in items]
            images = np.stack([im for _, im in items])
            if packed:  # letterbox emits the S2D-packed layout
                from ryolo_tpu.nn.blocks import pack_input_s2d

                images = pack_input_s2d(images)
            return paths, images

        start = time.time()
        starts = list(range(0, len(dataset), bs))
        with ThreadPoolExecutor(max_workers=2) as pool:
            # Bounded prefetch: at most DEPTH decoded batches in flight, so
            # host memory stays O(DEPTH·batch) however large the folder is
            # (pool.map would eagerly queue every batch with no consumer
            # backpressure).
            DEPTH = 2

            def batches():
                pending = [pool.submit(load_batch, s)
                           for s in starts[:DEPTH]]
                nxt = DEPTH
                while pending:
                    fut = pending.pop(0)
                    if nxt < len(starts):
                        pending.append(pool.submit(load_batch, starts[nxt]))
                        nxt += 1
                    yield fut.result()

            for paths, images in batches():
                images = jnp.asarray(images)
                t0 = time.time()
                decoded, dets, valid = infer(variables, images)
                jax.block_until_ready(decoded)
                t1 = time.time()
                dets = np.asarray(dets)
                valid = np.asarray(valid)
                t2 = time.time()

                boxes = [dets[b][valid[b]] for b in range(len(paths))]
                num = sum(len(b) for b in boxes)
                logger.info("-----------------------------------")
                logger.info("{}-> {} objects found".format(paths, num))
                logger.info("Inference time : " + "%10.4g"
                            % round(t1 - t0, 5))
                logger.info("Post-processing time : " + "%10.4g"
                            % round(t2 - t1, 5))
                logger.info("-----------------------------------")

                for path, box in zip(paths, boxes):
                    plot_boxes(path, box, data["names"], args.img_size,
                               save_folder)

        logger.info("-----------------------------------")
        logger.info("Total detecting time : " + "%10.4g"
                    % round(time.time() - start, 5))
        logger.info("-----------------------------------")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--weight_path", type=str, default="")
    parser.add_argument("--mode", default="csl", nargs="?",
                        choices=["csl", "kfiou"])
    parser.add_argument("--ver", default="yolov5", nargs="?",
                        choices=["yolov4", "yolov5", "yolov7"])
    parser.add_argument("--conf_thres", type=float, default=0.7)
    parser.add_argument("--nms_thres", type=float, default=0.2)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--data", type=str, default="")
    parser.add_argument("--hyp", type=str, default="")
    parser.add_argument("--ext", type=str, default="png",
                        choices=["png", "jpg"])
    parser.add_argument("--dtype", default="f32",
                        choices=["f32", "bf16", "int8"],
                        help="deployed compute dtype (int8 = quantized "
                             "BN-backed convs; decode stays f32)")
    parser.add_argument("--packed_input", action="store_true",
                        help="letterbox emits the 2x2 space-to-depth "
                             "packed layout (faster stem; v7/v4 only)")
    args = parser.parse_args()
    print(args)

    d = Detect(args)
    d.detect()
