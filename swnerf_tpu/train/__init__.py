from swnerf_tpu.train.loop import (
    TrainState,
    exp_decay_schedule,
    make_optimizer,
    make_train_step,
    mse,
    mse_to_psnr,
)

__all__ = [
    "TrainState",
    "exp_decay_schedule",
    "make_optimizer",
    "make_train_step",
    "mse",
    "mse_to_psnr",
]
