"""Post-processing and rotated-mAP evaluation."""

from ryolo_tpu.eval.evaluator import clear_step_cache  # noqa: F401
from ryolo_tpu.eval.postprocess import post_process, post_process_fixed  # noqa: F401
from ryolo_tpu.eval.metrics import (  # noqa: F401
    ap_per_class,
    calculate_eval_stats,
    compute_ap,
    get_batch_statistics,
)
