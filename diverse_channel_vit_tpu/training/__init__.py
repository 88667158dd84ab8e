"""Training runtime: optimizers, LR/WD schedules, train state, jitted steps.

Counterpart of the reference's ``optimizers.py`` / ``lr_schedulers.py`` /
``trainer.py`` step logic, rebuilt as pure functions over an optax chain —
everything that ran per-batch in Python (scheduler.step_update, wd-schedule
writes, grad clipping, AMP scaler) is folded into the compiled step.
"""

from .optim import make_optimizer
from .schedules import make_lr_schedule, wd_cosine_schedule
from .state import TrainState, create_train_state
from .steps import make_eval_step, make_train_step

__all__ = [
    "make_optimizer",
    "make_lr_schedule",
    "wd_cosine_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
