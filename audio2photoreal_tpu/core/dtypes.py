"""Mixed-precision policy for TPU.

The reference hand-rolls fp16 master params with dynamic loss scaling
(reference: diffusion/fp16_util.py:162-246).  On TPU the idiomatic policy is
bfloat16 compute + float32 params/optimizer state — no loss scaling needed —
so the policy here is a simple (param, compute, output) dtype triple applied
at module boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_output(self, x):
        return jnp.asarray(x, self.output_dtype)


def default_policy(name: str = "bfloat16") -> DTypePolicy:
    if name in ("bf16", "bfloat16"):
        return DTypePolicy()
    if name in ("f32", "float32"):
        return DTypePolicy(compute_dtype=jnp.float32)
    raise ValueError(f"unknown dtype policy {name!r}")
