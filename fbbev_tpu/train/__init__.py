from fbbev_tpu.train.trainer import (  # noqa: F401
    Trainer, TrainState, make_optimizer, lr_schedule)
from fbbev_tpu.train.ema import ema_update, megvii_ema_decay  # noqa: F401
