from audio2photoreal_tpu.train.state import TrainState, create_train_state
from audio2photoreal_tpu.train import loops, checkpoints, logging

__all__ = ["TrainState", "create_train_state", "loops", "checkpoints", "logging"]
