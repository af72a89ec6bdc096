"""audio2photoreal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
audio-driven photoreal avatar generation.

Re-designed from scratch with the capabilities of facebookresearch/audio2photoreal
(conditional diffusion for face codes + body pose, residual-VQ guide tokens, and a
codec-avatar neural renderer), built TPU-first:

- all sampler loops are ``lax.scan`` bodies compiled once,
- classifier-free guidance is one batched forward (cond/uncond stacked),
- conditioning encoders are hoisted out of the denoising scan,
- parallelism is a ``jax.sharding.Mesh`` + ``NamedSharding`` layer (no process
  groups), with XLA collectives over ICI,
- hot kernels are Pallas where XLA fusion is not enough.

Layering (mirrors SURVEY.md §1 of the reference):
  core/      dtypes, config (json sidecar), rng
  parallel/  mesh, shardings, collectives
  ops/       rotary, attention, convs, resampling, grid-sample, embeddings
  diffusion/ schedules, q/p math, respacing, scan samplers, losses
  models/    FiLM denoiser, guide LM (KV cache), residual VQ-VAE, audio encoder
  data/      dataset contract, z-norm, crop/pad, collate
  train/     train states, loops, checkpointing, kv-logging
  render/    LBS, UV geometry, decoders, rasterizer, color pipeline
  apps/      generate / eval / demo CLIs
"""

__version__ = "0.1.0"
