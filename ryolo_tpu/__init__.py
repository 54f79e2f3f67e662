"""ryolo_tpu — a TPU-native (JAX/XLA/Pallas) oriented-object-detection framework.

A ground-up rebuild of the capabilities of the R-YOLOv4 reference
(rotated-box YOLOv4/v5/v7 with CSL and KFIoU angle regression) designed
for TPU hardware: NHWC layouts, static shapes, jit-fused decode, masked
fixed-shape target assignment, and pallas/XLA rotated-geometry kernels.

Subpackages
-----------
- ``ryolo_tpu.geometry``  — pure-JAX rotated-box math (conversions, Gaussian form)
- ``ryolo_tpu.ops``       — rotated IoU / rotated NMS kernels (XLA + Pallas) and the
                            C++ host oracle used for parity testing
- ``ryolo_tpu.nn``        — Flax building blocks, backbones (v4/v5/v7), PAN necks, heads
- ``ryolo_tpu.losses``    — CSL / KFIoU losses with fixed-shape masked target assignment
- ``ryolo_tpu.data``      — DOTA / UCAS-AOD / custom datasets, augmentation, padded collate
- ``ryolo_tpu.train``     — optax training step, schedules, fitness/checkpoint policy
- ``ryolo_tpu.eval``      — post-processing and the COCO-interp rotated mAP evaluator
- ``ryolo_tpu.parallel``  — jax.sharding mesh utilities for data/spatial parallel runs
- ``ryolo_tpu.utils``     — config, logging, checkpoint interop (.pth <-> pytree), plotting
"""

__version__ = "0.1.0"
