from . import losses
from .ema import ema_init, ema_update
from .optim import create_optimizer, warmup_cosine_schedule
from .train_state import (
    TrainState,
    create_train_state,
    make_gimm_eval_step,
    make_gimm_train_step,
    make_gimmvfi_eval_step,
    make_gimmvfi_train_step,
)
