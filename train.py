"""Training CLI — same surface as the reference ``train.py`` (args at
``train.py:248-259``), TPU-native internals: jitted accumulate/apply train
step, optax one-cycle + warmup, reference-format ``best.pth``/``last.pth``
checkpoints, tensorboard logging, per-epoch mAP validation.
"""

import argparse
import math
import os
import shutil
import sys

import numpy as np

import jax
import jax.numpy as jnp

from ryolo_tpu.utils.platform import apply_env_platform

apply_env_platform()

from ryolo_tpu.data.loader import load_data
from ryolo_tpu.eval.evaluator import evaluate
from ryolo_tpu.losses import csl_loss, kfiou_loss
from ryolo_tpu.nn import Yolo
from ryolo_tpu.nn.yolo import STRIDES, make_anchors, make_rotated_anchors
from ryolo_tpu.train.trainer import (
    Trainer,
    fitness,
    one_cycle,
    weights_init_normal,
)
from ryolo_tpu.utils.checkpoint import import_state_dict, load_pth, save_pth
from ryolo_tpu.utils.config import load_yaml, save_opts
from ryolo_tpu.utils.logger import Logger, logger

NBS = 64  # nominal batch size, train.py:150


def make_loss_fn(mode, anchors, nc, hyp):
    if mode == "csl":
        def loss_fn(outputs, batch):
            return csl_loss(outputs, jnp.asarray(batch["tgt"]),
                            jnp.asarray(batch["tgt_csl"]),
                            jnp.asarray(batch["tgt_mask"]), anchors, nc, hyp)
    else:
        def loss_fn(outputs, batch):
            return kfiou_loss(outputs, jnp.asarray(batch["tgt"]),
                              jnp.asarray(batch["tgt_mask"]), anchors, nc,
                              hyp)
    return loss_fn


class Train:
    def __init__(self, args):
        self.args = args
        self.model_path = os.path.join("weights", args.model_name)

    def check_model_path(self):
        """Interactive overwrite prompt (``train.py:55-68``)."""
        if os.path.exists(self.model_path):
            if self.args.yes:
                shutil.rmtree(self.model_path)
            else:
                while True:
                    logger.warning(
                        "Model name exists, do you want to override the previous model?"
                    )
                    inp = input(">> [Y:N]")
                    if inp and inp.lower()[0] == "y":
                        shutil.rmtree(self.model_path)
                        break
                    if inp and inp.lower()[0] == "n":
                        logger.info("Stop training!")
                        sys.exit(0)
        os.makedirs(self.model_path)
        os.makedirs(os.path.join(self.model_path, "logs"))

    def train(self):
        args = self.args
        data = load_yaml(args.data)
        config = load_yaml(args.config)
        model_cfg, hyp_cfg = config["model"], config["hyp"]
        nc = len(data["names"])
        csl = args.mode == "csl"

        if args.resume:
            if not os.path.isdir(self.model_path):
                logger.error(f"--resume: no run directory {self.model_path}")
                sys.exit(1)
        else:
            self.check_model_path()
        save_opts(self.model_path, args, config)
        tb = Logger(os.path.join(self.model_path, "logs"))

        # --dtype bf16: mixed-precision training (bf16 conv/activation
        # compute on the MXU, f32 params/grads/optimizer, f32 loss on the
        # raw head outputs) — the additive TPU knob; default stays f32.
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        model = Yolo(n_classes=nc, model_config=model_cfg, mode=args.mode,
                     ver=args.ver, dtype=dtype)
        rngs = jax.random.PRNGKey(42)
        # init at a tiny image: param/stat shapes are image-size independent
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = dict(model.init(rngs, sample, train=False))
        variables["params"] = weights_init_normal(
            variables["params"], jax.random.PRNGKey(0)
        )

        if args.weights_path:
            logger.info(f"Loading pretrained weights from: {args.weights_path}")
            # backbone+neck only: first 552 ordered entries (train.py:81)
            variables, n = import_state_dict(
                load_pth(args.weights_path), variables, max_entries=552
            )
            logger.info(f"Loaded {n} tensors")

        if csl:
            anchors = make_anchors(STRIDES, model_cfg["anchors"])
        else:
            angles = [a * math.pi / 180 for a in model_cfg["angles"]]
            anchors = make_rotated_anchors(STRIDES, model_cfg["anchors"],
                                           angles)
        loss_fn = make_loss_fn(args.mode, anchors, nc, hyp_cfg)

        # Host-sharded loading under multi-host DP: each process feeds its
        # own devices a disjoint slice of the epoch (SURVEY §5.8).
        shard = (
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1 else None
        )
        train_dataset, train_loader = load_data(
            data["train"], data["names"], data["type"], hyp_cfg, csl,
            img_size=args.img_size, batch_size=args.batch_size, augment=True,
            shuffle=True, max_targets=args.max_targets, drop_last=True,
            shard=shard, device_augment=args.device_augment,
            cache_images=args.cache_images, device_cache=args.device_cache,
        )
        iters_per_epoch = len(train_loader)

        tile_bank = None
        if args.device_cache:
            # decode the whole train split once and pin it to HBM: per-batch
            # image traffic becomes (B, T) int32 bank rows (the mosaic/warp
            # pixels composite on device from the bank)
            bank_np = train_dataset.build_tile_bank()
            logger.info(
                f"Device tile bank: {bank_np.shape[0]} images, "
                f"{bank_np.nbytes / 1e9:.2f} GB HBM"
            )
            tile_bank = jax.device_put(bank_np)
            del bank_np

        trainer = Trainer(model, loss_fn, args.optimizer, args.lr)
        state = trainer.init_state(variables)

        mesh = None
        if args.dp > 1:
            from ryolo_tpu.parallel.mesh import make_mesh, replicate

            if args.batch_size % args.dp:
                logger.error("--dp must divide --batch_size")
                sys.exit(1)
            mesh = make_mesh(args.dp, sp=args.sp)
            state = jax.device_put(state, replicate(mesh))
            logger.info(f"Data-parallel over {args.dp} devices (sp={args.sp})")

        start_epoch = 0
        best_fitness = -1.0
        resume_path = os.path.join(self.model_path, "last.state")
        if args.resume:
            from ryolo_tpu.utils.checkpoint import load_train_state

            if not os.path.isfile(resume_path):
                logger.error(f"--resume: {resume_path} not found "
                             "(run was saved before resume support?)")
                sys.exit(1)
            state, meta = load_train_state(state, resume_path)
            start_epoch = meta["epoch"] + 1
            best_fitness = meta.get("best_fitness", -1.0)
            logger.info(f"Resumed from {resume_path} at epoch {start_epoch}")

        accumulate = max(round(NBS / args.batch_size), 1)  # train.py:151
        nw = max(int(args.epochs * iters_per_epoch * hyp_cfg["warmup_prop"]),
                 1000)  # train.py:160
        lf = one_cycle(1, hyp_cfg["lrf"], int(args.epochs))

        logger.info(f"Image sizes {args.img_size}")
        logger.info(f"Starting training for {args.epochs} epochs...")

        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            total_train_loss = {}

            header = ("\n" + "%10s" * 2) % ("Epoch", "lr")
            first = True
            pbar = train_loader
            try:
                import tqdm

                pbar = tqdm.tqdm(train_loader, total=iters_per_epoch)
            except ImportError:
                pass

            lr = args.lr * lf(epoch)
            for batch_i, batch in enumerate(pbar):
                global_step = iters_per_epoch * epoch + batch_i + 1
                # warmup of lr + accumulation factor (train.py:190-193)
                if global_step <= nw:
                    xi = [0, nw]
                    acc_now = max(
                        1,
                        int(np.interp(global_step, xi,
                                      [1, NBS / args.batch_size]).round()),
                    )
                    lr_now = float(np.interp(global_step, xi,
                                             [0.0, args.lr * lf(epoch)]))
                else:
                    acc_now, lr_now = accumulate, lr

                if args.device_augment:
                    # specs -> images on device (mosaic/warp/HSV/mixup as
                    # XLA ops; host only decoded + did label math; with
                    # --device_cache not even pixels ship — tiles gather
                    # from the resident bank)
                    from ryolo_tpu.data.device_augment import (pick_method,
                                                               render_batch)
                if args.device_augment and mesh is not None:
                    # under a mesh the rendered images must be re-sharded:
                    # render, then shard_batch, then the plain step below
                    sa = {k: jnp.asarray(v) for k, v in batch.items()
                          if k != "paths"}
                    # render straight to the model's compute dtype: the
                    # first conv casts anyway (bit-identical) and the
                    # full-res in-step convert disappears
                    images = render_batch(sa, n_out=args.batch_size,
                                          bank=tile_bank,
                                          method=pick_method(hyp_cfg,
                                                             args.img_size),
                                          out_dtype=model.dtype)
                    batch = {"images": images, "tgt": sa["tgt"],
                             "tgt_mask": sa["tgt_mask"]}
                    if "tgt_csl" in sa:
                        batch["tgt_csl"] = sa["tgt_csl"]

                def run_step():
                    if args.device_augment and mesh is None:
                        # single-chip: render + step as ONE jitted dispatch
                        # (trainer.train_step_rendered) — the KB-sized spec
                        # arrays ride the call as numpy, no eager uploads
                        sa = {k: np.asarray(v) for k, v in batch.items()
                              if k != "paths"}
                        return trainer.train_step_rendered(
                            state, sa, tile_bank, jnp.float32(lr_now),
                            jnp.int32(acc_now), args.batch_size,
                            pick_method(hyp_cfg, args.img_size))
                    if mesh is not None:
                        from ryolo_tpu.parallel.mesh import shard_batch

                        device_batch = shard_batch(batch, mesh,
                                                   spatial=args.sp > 1)
                    else:
                        device_batch = {
                            k: jnp.asarray(v)
                            for k, v in batch.items() if k != "paths"
                        }
                    return trainer.train_step(
                        state, device_batch, jnp.float32(lr_now),
                        jnp.int32(acc_now),
                    )

                if args.profile and epoch == start_epoch and batch_i == 1:
                    # one profiled step (skip step 0 = compile)
                    with jax.profiler.trace(
                        os.path.join(self.model_path, "profile")
                    ):
                        state, loss, items = run_step()
                        jax.block_until_ready(state.params)
                else:
                    state, loss, items = run_step()

                if first:
                    header += "".join("%12s" % k for k in items)
                    logger.info(header)
                    first = False
                desc = ("%10s" + "%10.4g") % (
                    f"{epoch + 1}/{args.epochs}", lr_now
                ) + "".join("%12.4g" % float(v) for v in items.values())
                for k, v in items.items():
                    total_train_loss[k] = total_train_loss.get(k, 0.0) + float(v)
                if hasattr(pbar, "set_description"):
                    pbar.set_description(desc)

            # ---- validation (train.py:225-228) ----
            # Per-epoch eval runs the deploy-FUSED graph (BN folded,
            # RepConv merged — exact to f32 rounding).  One model clone is
            # reused across epochs so the jitted eval step stays cached;
            # only the fused variables are rebuilt from the train state.
            from ryolo_tpu.nn import fuse_variables

            if not hasattr(self, "_eval_model"):
                self._eval_model = model.clone(deploy=True)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}  # for save_pth
            mp, mr, map50, map5095, total_val_loss = evaluate(
                self._eval_model, fuse_variables(variables), loss_fn, data,
                hyp_cfg, csl, args.img_size, args.batch_size * 2,
                conf_thres=0.001, iou_thres=0.65,
                max_targets=args.max_targets, mesh=mesh,
            )

            for k in total_train_loss:
                total_train_loss[k] /= iters_per_epoch

            tb_log = {f"train/{k}": v for k, v in total_train_loss.items()}
            tb_log.update({f"val/{k}": v for k, v in total_val_loss.items()})
            tb_log.update({
                "metrics/mean recall": mr,
                "metrics/mean precision": mp,
                "metrics/mAP@.5": map50,
                "metrics/mAP@.5:.95": map5095,
                "lr": lr_now,
            })
            tb.list_of_scalars_summary(tb_log, epoch)

            fit = fitness(np.array([mp, mr, map50, map5095]))
            if fit > best_fitness:
                best_fitness = fit
                save_pth(variables, args.ver,
                         os.path.join(self.model_path, "best.pth"))
                logger.info("Current best model is saved!")
            save_pth(variables, args.ver,
                     os.path.join(self.model_path, "last.pth"))
            from ryolo_tpu.utils.checkpoint import save_train_state

            save_train_state(
                state, {"epoch": epoch, "best_fitness": float(best_fitness)},
                os.path.join(self.model_path, "last.state"),
            )

        logger.info("Done!")


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=80)
    parser.add_argument("--optimizer", default="SGD", nargs="?",
                        choices=["Adam", "SGD"])
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--weights_path", type=str, default="")
    parser.add_argument("--model_name", type=str, default="trash")
    parser.add_argument("--mode", default="csl", nargs="?",
                        choices=["csl", "kfiou"])
    parser.add_argument("--ver", default="yolov5", nargs="?",
                        choices=["yolov4", "yolov5", "yolov7"])
    parser.add_argument("--data", type=str, default="")
    parser.add_argument("--config", type=str, default="")
    # TPU-build extras (additive; reference surface preserved)
    parser.add_argument("--max_targets", type=int, default=300,
                        help="static per-image target capacity")
    parser.add_argument("--yes", action="store_true",
                        help="overwrite existing model dir without prompting")
    parser.add_argument("--resume", action="store_true",
                        help="resume from weights/<model_name>/last.state")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of one train step")
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                        help="compute dtype (params stay f32)")
    parser.add_argument("--device_augment", action="store_true",
                        help="run mosaic/warp/HSV/mixup on device (host "
                             "does decode + label math only)")
    parser.add_argument("--cache_images", action="store_true",
                        help="cache decoded resized images in host RAM")
    parser.add_argument("--device_cache", action="store_true",
                        help="with --device_augment: pin the decoded train "
                             "split to device HBM (N x s x s x 3 uint8) so "
                             "batches ship only bank indices, no pixels")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel mesh size (devices)")
    parser.add_argument("--sp", type=int, default=1,
                        help="spatial sharding factor within the mesh")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args)
    t = Train(args)
    t.train()
