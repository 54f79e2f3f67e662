"""Training: optax train state, schedules, fitness policy."""

from ryolo_tpu.train.trainer import (  # noqa: F401
    Trainer,
    fitness,
    one_cycle,
)
