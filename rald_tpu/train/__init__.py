from rald_tpu.train.schedule import warmup_cosine_schedule
from rald_tpu.train.state import TrainState, create_train_state, ema_update
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.metrics import MetricLogger, SmoothedValue

__all__ = [
    "CheckpointManager",
    "MetricLogger",
    "SmoothedValue",
    "TrainState",
    "create_train_state",
    "ema_update",
    "warmup_cosine_schedule",
]
