"""Training: optimizers, LR schedules, train state/step, distillation."""

from pixart_sigma_tpu.training.optim import came, lion, build_optimizer  # noqa: F401
from pixart_sigma_tpu.training.lr_schedule import build_lr_schedule  # noqa: F401
from pixart_sigma_tpu.training.train_state import TrainState, ema_update  # noqa: F401
from pixart_sigma_tpu.training.train_step import make_train_step  # noqa: F401
