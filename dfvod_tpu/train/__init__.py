"""Training engine — optimizer policies, train/eval steps, schedules.

TPU-native counterpart of the reference's ``main.py:311-435`` (per-fusion
param groups + AdamW + cosine schedule) and ``engine_single.py`` /
``engine_multi.py`` (train_one_epoch / evaluate).
"""
from dfvod_tpu.train.optim import (  # noqa: F401
    build_optimizer,
    label_params,
    param_group_label,
)
from dfvod_tpu.train.engine import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
