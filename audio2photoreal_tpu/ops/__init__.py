from audio2photoreal_tpu.ops.embeddings import timestep_embedding
from audio2photoreal_tpu.ops.rotary import RotaryTable, apply_rotary, make_rotary_table

__all__ = [
    "timestep_embedding",
    "RotaryTable",
    "apply_rotary",
    "make_rotary_table",
]
