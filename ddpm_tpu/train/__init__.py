from .checkpoint import latest_epoch, load_checkpoint, resolve_checkpoint, save_checkpoint
from .state import DummyScheduler, TrainState, make_optimizer, warmup_schedule
from .step import draw_input, make_sample_fn, make_train_step
from .trainer import Trainer

__all__ = [
    "Trainer",
    "TrainState",
    "make_optimizer",
    "warmup_schedule",
    "make_train_step",
    "make_sample_fn",
    "draw_input",
    "save_checkpoint",
    "load_checkpoint",
    "latest_epoch",
    "resolve_checkpoint",
    "DummyScheduler",
]
