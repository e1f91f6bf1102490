from .optim import make_optimizer, poly_schedule
from .steps import (
    make_eval_step,
    make_kd_train_step,
    make_train_step,
    TrainState,
)
