"""End-to-end CPU-mesh drive of the framework through its public API.

This is the project's verification recipe (see .claude/skills/verify):
synthetic person → dataset → DP diffusion train steps → CFG DDIM sampling →
VQ train → guide train/generate → checkpoint + config roundtrip.
Run: PYTHONPATH=. python tools/e2e_drive.py   (takes ~5-10 min on 1 CPU core)
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import tempfile

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.core.config import (
    DataConfig, DenoiserConfig, DiffusionConfig, GuideConfig, TrainConfig, VQConfig,
    load_config, save_config,
)
from audio2photoreal_tpu.data import DataStats, SocialDataset, load_local_data, make_synthetic_person
from audio2photoreal_tpu.diffusion import sampling
from audio2photoreal_tpu.diffusion.respace import maybe_respaced
from audio2photoreal_tpu.models import FiLMDenoiser, GuideTransformer, TemporalVertexCodec, VQState
from audio2photoreal_tpu.models.cfg import cfg_model_fn
from audio2photoreal_tpu.parallel import MeshSpec, create_mesh, shard_batch
from audio2photoreal_tpu.train import checkpoints, loops
from audio2photoreal_tpu.train.logging import KVLogger
from audio2photoreal_tpu.train.state import create_train_state

root = tempfile.mkdtemp()
pdir = make_synthetic_person(root, "SYNTH01", num_scenes=8, frames_per_scene=64)
print("1) synthetic person at", pdir)

scenes = load_local_data(root, "SYNTH01")
stats = DataStats.load(os.path.join(pdir, "data_stats.npz"))
dc = DataConfig(person="SYNTH01", data_format="pose", max_seq_length=48, min_seq_length=32, batch_size=8)
ds = SocialDataset(scenes, stats, dc, "train")
batch = ds.sample_batch(np.random.RandomState(0), 8)
print("2) batch:", {k: v.shape for k, v in batch.items()})

mesh = create_mesh(MeshSpec((-1,), ("data",)))
sbatch = shard_batch(mesh, batch)
print("3) sharded over", mesh)

mcfg = DenoiserConfig(data_format="pose", nfeats=104, latent_dim=32, ff_size=64,
                      num_layers=2, num_heads=2, max_seq_length=48, keyframe_step=30)
dcfg = DiffusionConfig(timestep_respacing="ddim10")
model = FiLMDenoiser(mcfg)
sched_train = maybe_respaced(dcfg.schedule, dcfg.steps, "")
x = jnp.asarray(batch["motion"]); t0 = jnp.zeros((8,), jnp.int32)
params = model.init({"params": jax.random.PRNGKey(0), "cond_drop": jax.random.PRNGKey(1)},
                    x, t0, jnp.asarray(batch["audio"]), jnp.asarray(batch["keyframes"]),
                    jnp.asarray(batch["keyframe_valid"]))
state = create_train_state(params, TrainConfig(lr=1e-4))
step = jax.jit(loops.make_diffusion_train_step(model, sched_train, dcfg))
logger = KVLogger()
losses = []
for i in range(3):
    state, metrics = step(state, sbatch, jax.random.PRNGKey(i))
    losses.append(float(metrics["loss"]))
    logger.log(i, {k: float(v) for k, v in metrics.items()})
print("4) diffusion losses:", [round(l, 3) for l in losses])
assert all(np.isfinite(losses))

sched = maybe_respaced(dcfg.schedule, dcfg.steps, "ddim10")
cond = model.apply(state.params, jnp.asarray(batch["audio"]), jnp.asarray(batch["keyframes"]),
                   jnp.asarray(batch["keyframe_valid"]), method=FiLMDenoiser.encode_conditioning)
mf = cfg_model_fn(lambda p, xx, tt, cc, kk: model.apply(p, xx, tt, cc, kk, method=FiLMDenoiser.denoise),
                  state.params, cond, 2.0)
res = jax.jit(lambda xT, k: sampling.ddim_sample_loop(sched, "xstart", mf, xT, k))(
    jax.random.normal(jax.random.PRNGKey(9), x.shape), jax.random.PRNGKey(10))
assert bool(jnp.all(jnp.isfinite(res.pred_xstart)))
print("5) ddim sample OK", res.pred_xstart.shape)

vcfg = VQConfig(nfeats=104, emb_width=16, code_dim=32, depth=2, kmeans_iters=3)
codec = TemporalVertexCodec(vcfg)
kf = jnp.asarray(batch["keyframes"])
vq = VQState.create(jax.random.PRNGKey(0), vcfg)
vparams = codec.init(jax.random.PRNGKey(1), kf, vq)
vstate = create_train_state(vparams, TrainConfig(lr=1e-3))
vstep = jax.jit(loops.make_vq_train_step(codec))
for i in range(3):
    vstate, vq, m = vstep(vstate, vq, {"keyframes": kf}, jax.random.PRNGKey(i))
assert bool(vq.inited)
print("6) vq:", {k: round(float(v), 4) for k, v in m.items()})

gcfg = GuideConfig(tokens=32, latent_dim=32, ff_size=64, num_layers=2, num_heads=2, vq_depth=2)
guide = GuideTransformer(gcfg)
audio = jnp.asarray(batch["audio"])
gparams = guide.init({"params": jax.random.PRNGKey(3), "cond_drop": jax.random.PRNGKey(4)},
                     jnp.zeros((8, 4), jnp.int32), audio)
gstate = create_train_state(gparams, TrainConfig(lr=2e-4))
tokenize = lambda kfs: codec.apply(vparams, kfs, vq, method=TemporalVertexCodec.encode)
gstep = jax.jit(loops.make_guide_train_step(guide, tokenize, vq_depth=2))
gb = {"keyframes": kf, "keyframe_valid": jnp.asarray(batch["keyframe_valid"]), "audio": audio}
for i in range(2):
    gstate, gm = gstep(gstate, gb, jax.random.PRNGKey(i))
print("7) guide:", {k: round(float(v), 4) for k, v in gm.items()})
gen = guide.apply(gstate.params, audio, 4, jax.random.PRNGKey(5), method=GuideTransformer.generate)
dec = codec.apply(vparams, gen.reshape(8, 2, 2), vq, method=TemporalVertexCodec.decode)
print("8) guide generate + decode:", dec.shape)

ckdir = os.path.join(root, "ckpt")
checkpoints.save(ckdir, int(state.step), {"params": jax.device_get(state.params)})
restored = checkpoints.restore(ckdir, None)
l0 = jax.tree_util.tree_leaves(restored["params"])[0]
o0 = jax.tree_util.tree_leaves(state.params)[0]
assert np.allclose(np.asarray(l0), np.asarray(o0))
save_config(ckdir, denoiser=mcfg, diffusion=dcfg, data=dc)
assert load_config(ckdir)["denoiser"].latent_dim == 32
print("9) checkpoint + config roundtrip OK")
print("ALL OK")
