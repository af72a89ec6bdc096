from audio2photoreal_tpu.diffusion.schedules import Schedule, make_schedule, named_betas
from audio2photoreal_tpu.diffusion.respace import respaced_schedule, space_timesteps
from audio2photoreal_tpu.diffusion import gaussian, losses, sampling, tsample

__all__ = [
    "Schedule",
    "make_schedule",
    "named_betas",
    "respaced_schedule",
    "space_timesteps",
    "gaussian",
    "losses",
    "sampling",
    "tsample",
]
