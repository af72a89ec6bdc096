from audio2photoreal_tpu.core.config import (
    DataConfig,
    DenoiserConfig,
    DiffusionConfig,
    GuideConfig,
    TrainConfig,
    VQConfig,
    load_config,
    save_config,
)
from audio2photoreal_tpu.core.dtypes import DTypePolicy, default_policy

__all__ = [
    "DataConfig",
    "DenoiserConfig",
    "DiffusionConfig",
    "GuideConfig",
    "TrainConfig",
    "VQConfig",
    "load_config",
    "save_config",
    "DTypePolicy",
    "default_policy",
]
