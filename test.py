"""Evaluation CLI — same surface as the reference ``test.py``
(args at ``test.py:264-274``): full rotated mAP@.5:.95 protocol with
skew-IoU matching on the val split of a dataset yaml.
"""

import argparse
import math
import os
import sys

import jax
import jax.numpy as jnp

from ryolo_tpu.utils.platform import apply_env_platform

apply_env_platform()

from ryolo_tpu.eval.evaluator import evaluate
from ryolo_tpu.nn import Yolo, fuse_for_inference
from ryolo_tpu.nn.yolo import STRIDES, make_anchors, make_rotated_anchors
from ryolo_tpu.utils.checkpoint import import_state_dict, load_pth
from ryolo_tpu.utils.config import load_yaml
from ryolo_tpu.utils.logger import logger
from train import make_loss_fn


class Test:
    def __init__(self, args):
        self.args = args

    def run(self):
        args = self.args
        config = load_yaml(args.hyp)
        model_cfg, hyp_cfg = config["model"], config["hyp"]
        data = load_yaml(args.data)
        nc = len(data["names"])
        csl = args.mode == "csl"

        if not os.path.isfile(args.weight_path):
            logger.error("Model weight not found.")
            sys.exit(1)

        model = Yolo(n_classes=nc, model_config=model_cfg, mode=args.mode,
                     ver=args.ver)
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)  # size-independent init
        variables = dict(model.init(jax.random.PRNGKey(0), sample,
                                    train=False))
        variables, n = import_state_dict(load_pth(args.weight_path), variables)
        logger.info(f"Loaded {n} tensors from {args.weight_path}")

        if csl:
            anchors = make_anchors(STRIDES, model_cfg["anchors"])
        else:
            angles = [a * math.pi / 180 for a in model_cfg["angles"]]
            anchors = make_rotated_anchors(STRIDES, model_cfg["anchors"],
                                           angles)
        loss_fn = make_loss_fn(args.mode, anchors, nc, hyp_cfg)

        # deploy-fused inference graph (BN fold + RepConv merge): exact to
        # f32 rounding, removes every BN from the compiled eval program
        import jax.numpy as _jnp
        dep_dtype = {"f32": _jnp.float32, "bf16": _jnp.bfloat16,
                     "int8": _jnp.bfloat16}[args.dtype]
        model, variables = fuse_for_inference(
            model, variables, dtype=dep_dtype,
            quantize=args.dtype == "int8")

        evaluate(
            model, variables, loss_fn, data, hyp_cfg, csl, args.img_size,
            args.batch_size, args.conf_thres, args.iou_thres,
            max_targets=args.max_targets,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--weight_path", type=str, default="")
    parser.add_argument("--mode", default="csl", nargs="?",
                        choices=["csl", "kfiou"])
    parser.add_argument("--ver", default="yolov5", nargs="?",
                        choices=["yolov4", "yolov5", "yolov7"])
    parser.add_argument("--conf_thres", type=float, default=0.001)
    parser.add_argument("--iou_thres", type=float, default=0.65)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--data", type=str, default="")
    parser.add_argument("--hyp", type=str, default="")
    parser.add_argument("--max_targets", type=int, default=300)
    parser.add_argument("--dtype", default="f32",
                        choices=["f32", "bf16", "int8"],
                        help="deployed compute dtype (int8 = quantized "
                             "BN-backed convs; decode stays f32)")
    args = parser.parse_args()
    print(args)

    t = Test(args)
    t.run()
