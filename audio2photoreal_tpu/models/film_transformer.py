"""FiLM-transformer diffusion denoiser (face codes / body pose).

Re-design of the reference FiLMTransformer (model/diffusion.py:82-403) with a
TPU-first split:

- ``encode_conditioning`` runs the EXPENSIVE conditioning path once per
  sample — frozen wav2vec features, (face) lip-regressor + cond pre-encoder,
  (pose) keyframe projection.  The reference recomputes all of this inside
  every one of the 500×2 CFG denoiser calls (model/diffusion.py:285-313 inside
  forward:338) — hoisting it out of the DDIM scan is the single biggest
  inference win.
- ``denoise`` is the cheap per-step body called inside ``lax.scan``: null-
  embedding swap for CFG, time embedding/FiLM, decoder stack, (pose) conv
  post-net.

CFG dropout semantics match the reference: one Bernoulli keep per sample for
the audio cond tokens + pooled cond hidden (model/diffusion.py:364-393), and
an INDEPENDENT Bernoulli keep for the (pose) keyframe tokens
(model/diffusion.py:326-335 encode_keyframes draws its own prob_mask_like) —
so training sees audio-dropped/keyframes-kept combinations and vice versa.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio2photoreal_tpu.core.config import DenoiserConfig, WAV2VEC_SR
from audio2photoreal_tpu.models.audio_encoder import Wav2VecFeatureExtractor, feature_frames
from audio2photoreal_tpu.models.blocks import (
    FiLMDecoderLayer,
    RotaryEncoderLayer,
    hash_drop_mult,
    mish,
)
from audio2photoreal_tpu.models.lip_regressor import LipRegressor
from audio2photoreal_tpu.ops.convs import conv1d, valid_conv1d
from audio2photoreal_tpu.ops.embeddings import sinusoidal_pos_emb
from audio2photoreal_tpu.ops.rotary import make_rotary_table


class CondTokens(NamedTuple):
    """Precomputed conditioning, constant across denoising steps."""

    cond_tokens: jnp.ndarray  # [B, Ta, D] projected (+face-encoded) audio tokens
    pose_tokens: Optional[jnp.ndarray]  # [B, Tk, D] projected keyframes (pose) or None


class FiLMDenoiser(nn.Module):
    cfg: DenoiserConfig

    def setup(self):
        c = self.cfg
        D = c.latent_dim
        cond_dtype = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32
        self.audio_frontend = Wav2VecFeatureExtractor(
            compute_dtype=c.frontend_dtype, name="audio_frontend"
        )
        if c.data_format == "face":
            self.lip_model = LipRegressor(name="lip_model")
            # same compute dtype as the decoder stack — these 2 layers run
            # over ~1.7 tokens per motion frame and were the face trainer's
            # largest stage when left at f32 (70 ms of a 546 ms bs-64 step)
            self.cond_encoder = [
                RotaryEncoderLayer(D, c.num_heads, c.ff_size, c.dropout,
                                   dtype=cond_dtype,
                                   flash=c.flash_attention,
                                   hash_dropout=c.hash_dropout,
                                   name=f"cond_encoder_{i}")
                for i in range(c.cond_encoder_layers)
            ]
        # the residual stream runs in the compute dtype: without an explicit
        # dtype this Dense outputs f32 and every residual add in the decoder
        # stack promotes to f32 — at bs 64 that is ~78 MB of extra HBM per
        # add, ×4 sublayers ×8 layers, in both passes (round-4 probe)
        self.input_projection = nn.Dense(D, dtype=cond_dtype, name="input_projection")
        # compute dtype for the conditioning projection: its input is the
        # [B, ~2000, 2038] frozen-feature concat — at f32 this one matmul
        # (plus the gather/concat feeding it) ran 14 ms of the bs-64 face
        # step (tools/probe_train_stages_face.py)
        self.cond_projection = nn.Dense(D, dtype=cond_dtype, name="cond_projection")
        # dtype matters: without it the norm promotes the [B, ~2000, D]
        # memory to f32 (stats still accumulate f32 inside flax regardless)
        self.norm_cond = nn.LayerNorm(epsilon=1e-5, dtype=cond_dtype, name="norm_cond")
        # time embedding (reference: diffusion.py:120-132)
        self.time_dense = nn.Dense(D * 4, name="time_dense")
        self.to_time_cond = nn.Dense(D, name="to_time_cond")
        self.to_time_tokens = nn.Dense(D * 2, name="to_time_tokens")
        # pooled-cond FiLM path (diffusion.py:174-179)
        self.non_attn_norm = nn.LayerNorm(epsilon=1e-5, name="non_attn_norm")
        self.non_attn_d1 = nn.Dense(D, name="non_attn_d1")
        self.non_attn_d2 = nn.Dense(D, name="non_attn_d2")

        self.emb_len = feature_frames(self.max_audio_samples_16k())
        self.null_cond_embed = self.param(
            "null_cond_embed", nn.initializers.normal(1.0), (1, self.emb_len, D)
        )
        self.null_cond_hidden = self.param(
            "null_cond_hidden", nn.initializers.normal(1.0), (1, D)
        )

        if c.data_format == "pose":
            max_key_len = -(-c.max_seq_length // c.keyframe_step)
            self.null_pose_embed = self.param(
                "null_pose_embed", nn.initializers.normal(1.0), (1, max_key_len, D)
            )
            self.frame_cond_projection = nn.Dense(D, name="frame_cond_projection")
            self.frame_norm_cond = nn.LayerNorm(epsilon=1e-5, name="frame_norm_cond")
            # causal dilated conv post-net, receptive field 25 (diffusion.py:201-224)
            nf = c.nfeats
            self.post_conv_specs = [
                (nf, max(256, nf), 3, 1),
                (max(256, nf), nf, 3, 2),
                (nf, nf, 3, 3),
                (nf, nf, 3, 1),
                (nf, nf, 3, 2),
                (nf, nf, 3, 3),
            ]
            self.post_kernels = [
                self.param(f"post_conv{i}_kernel", nn.initializers.lecun_normal(), (k, cin, cout))
                for i, (cin, cout, k, _) in enumerate(self.post_conv_specs)
            ]
            self.post_biases = [
                self.param(f"post_conv{i}_bias", nn.initializers.zeros, (cout,))
                for i, (_, cout, _, _) in enumerate(self.post_conv_specs)
            ]
            self.final_conv_kernel = self.param(
                "final_conv_kernel", nn.initializers.lecun_normal(), (1, nf, nf)
            )
            self.final_conv_bias = self.param("final_conv_bias", nn.initializers.zeros, (nf,))

        compute_dtype = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32
        layer_cls = FiLMDecoderLayer
        if c.remat:
            # trade FLOPs for HBM: rematerialize each decoder layer on the
            # backward pass (replaces diffusion/nn.py:145-213 CheckpointFunction);
            # arg 4 = `deterministic` (self counts as 0) stays static
            layer_cls = nn.remat(FiLMDecoderLayer, static_argnums=(4,))
        self.layers = [
            layer_cls(
                D,
                c.num_heads,
                c.ff_size,
                c.dropout,
                use_cm=(c.data_format == "pose"),
                dtype=compute_dtype,
                flash=c.flash_attention,
                hash_dropout=c.hash_dropout,
                name=f"decoder_{i}",
            )
            for i in range(c.num_layers)
        ]
        self.final_layer = nn.Dense(c.nfeats, name="final_layer")
        # rotary table sized for the longest stream (audio tokens + 2 t-tokens)
        self.rotary = make_rotary_table(D, max(self.emb_len + 2, c.max_seq_length) + 8)

    def max_audio_samples_16k(self) -> int:
        # max_seq_length frames × 1600 samples @48k → /3 at 16k
        return self.cfg.max_seq_length * 1600 // 3

    # ------------------------------------------------------------------ #
    # conditioning (hoisted out of the sampling scan)
    # ------------------------------------------------------------------ #

    def encode_audio(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, S, 2] raw 48 kHz stereo → [B, Ta, 1024] frozen wav2vec features
        (reference: diffusion.py:285-293).  stop_gradient = frozen."""
        return jax.lax.stop_gradient(self.audio_frontend(audio))

    def encode_lip(self, audio: jnp.ndarray, n_cond: int) -> jnp.ndarray:
        """Channel-0 audio → lip vertices, chunked at 120 frames like the
        reference (diffusion.py:295-313), nearest-exact resized to n_cond."""
        B = audio.shape[0]
        frames = audio[..., 0].reshape(B, -1, 1600)
        T = frames.shape[1]
        chunk = 120
        n_full = T // chunk
        rem = T % chunk
        # the reference chunks over TIME with the batch axis intact
        # (diffusion.py:300-307) and runs the LAST chunk at its true length —
        # padding would leak into the wav2vec group-norm stats and the
        # encoder attention.  Chunks are position-independent (standard PE
        # within each chunk), so they stack into the batch.
        pieces = []
        if n_full:
            stacked = frames[:, : n_full * chunk].reshape(B * n_full, chunk, 1600)
            v = self.lip_model(stacked)  # [B·n, chunk, 338, 3]
            pieces.append(v.reshape(B, n_full * chunk, -1))
        if rem:
            v = self.lip_model(frames[:, n_full * chunk :])
            pieces.append(v.reshape(B, rem, -1))
        verts = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
        verts = jax.lax.stop_gradient(verts)  # [B, T, 1014]
        # nearest-exact interpolation T → n_cond (diffusion.py:309-311)
        idx = jnp.clip(((jnp.arange(n_cond) + 0.5) * T / n_cond).astype(jnp.int32), 0, T - 1)
        return verts[:, idx, :]

    def encode_conditioning(
        self,
        audio: Optional[jnp.ndarray],  # [B, S, 2] raw 48 kHz stereo
        keyframes: Optional[jnp.ndarray] = None,  # [B, Tk, key_dim] (pose)
        keyframe_valid: Optional[jnp.ndarray] = None,  # [B, Tk] 1=valid
        deterministic: bool = True,
        audio_features: Optional[jnp.ndarray] = None,  # [B, Ta, 1024] precomputed
        lip_verts: Optional[jnp.ndarray] = None,  # [B, T, 1014] precomputed (face)
    ) -> CondTokens:
        """``audio_features``/``lip_verts`` bypass the frozen frontends with
        precomputed values (data/feature_cache.py) — the trainer's fast path.
        The frontends are frozen, so this is a pure recompute-vs-reuse trade:
        given ``audio_features == encode_audio(audio)`` the output is
        bit-identical to the raw-audio path."""
        c = self.cfg
        # frozen features go straight into bf16 consumers (cond_projection
        # casts its input to cond_dtype anyway) — casting BEFORE the lip
        # gather and the [B, Ta, 2038] concat halves their HBM traffic with
        # a bit-identical result (cast∘gather == gather∘cast; concat of
        # casts == cast of concat)
        dt = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32
        if audio_features is not None:
            feats = jax.lax.stop_gradient(audio_features).astype(dt)
        else:
            feats = self.encode_audio(audio).astype(dt)
        if c.data_format == "face":
            if lip_verts is not None:
                v = jax.lax.stop_gradient(lip_verts).astype(dt)
                T = v.shape[1]
                n_cond = feats.shape[1]
                idx = jnp.clip(
                    ((jnp.arange(n_cond) + 0.5) * T / n_cond).astype(jnp.int32), 0, T - 1
                )
                lip = v[:, idx, :]
            else:
                lip = self.encode_lip(audio, feats.shape[1]).astype(dt)
            feats = jnp.concatenate([feats, lip], axis=-1)
        cond_tokens = self.cond_projection(feats)
        if c.data_format == "face":
            for layer in self.cond_encoder:
                cond_tokens = layer(cond_tokens, rotary=self.rotary, deterministic=deterministic)

        pose_tokens = None
        if c.data_format == "pose" and keyframes is not None:
            kf = keyframes
            if keyframe_valid is not None:
                kf = kf * keyframe_valid[..., None]  # zero the unknown (diffusion.py:319-320)
            pose_hidden = self.frame_cond_projection(jax.lax.stop_gradient(kf))
            pose_tokens = self.frame_norm_cond(pose_hidden)
        return CondTokens(cond_tokens, pose_tokens)

    # ------------------------------------------------------------------ #
    # per-step denoiser (scan body)
    # ------------------------------------------------------------------ #

    def _stacked_cross_kv_weights(self, dt):
        """All layers' cross-attn K (resp. V) projection weights stacked into
        one [D, L·D] kernel + [L·D] bias (run-time view; the param tree stays
        per-layer for the torch converters)."""
        kw = jnp.concatenate(
            [l.cross_attn.k_proj.variables["params"]["kernel"] for l in self.layers],
            axis=-1,
        ).astype(dt)
        kb = jnp.concatenate(
            [l.cross_attn.k_proj.variables["params"]["bias"] for l in self.layers],
            axis=-1,
        ).astype(dt)
        vw = jnp.concatenate(
            [l.cross_attn.v_proj.variables["params"]["kernel"] for l in self.layers],
            axis=-1,
        ).astype(dt)
        vb = jnp.concatenate(
            [l.cross_attn.v_proj.variables["params"]["bias"] for l in self.layers],
            axis=-1,
        ).astype(dt)
        return kw, kb, vw, vb

    def _split_cross_kvs(self, ks, vs):
        D = self.cfg.latent_dim
        return [
            (ks[..., i * D : (i + 1) * D], vs[..., i * D : (i + 1) * D])
            for i in range(len(self.layers))
        ]

    def build_cond_cache(self, cond: CondTokens, keep_mask: jnp.ndarray):
        """Everything in the denoise step that does NOT depend on (x, t):
        the CFG keep-masked conditioning rows of the memory, their cross-attn
        K/V through ALL layers, the pooled FiLM vector, and the keep-masked
        pose tokens.  The reference recomputes all of it in both CFG branches
        of every one of the 500 DDIM steps (model/cfg_sampler.py:17-33 +
        model/diffusion.py:338-398); here it is computed ONCE per clip and
        the per-step work shrinks to the two t-token rows
        (``denoise_cached``).  Returns a dict pytree safe to close over or
        pass through jit."""
        c = self.cfg
        dt = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32
        keep_e = keep_mask[:, None, None]
        cond_tokens = jnp.where(
            keep_e,
            cond.cond_tokens.astype(dt),
            self.null_cond_embed[:, : cond.cond_tokens.shape[1], :].astype(dt),
        )
        pooled = cond_tokens.astype(jnp.float32).mean(axis=-2)
        cond_hidden = self.non_attn_norm(pooled)
        cond_hidden = self.non_attn_d2(nn.silu(self.non_attn_d1(cond_hidden)))
        cond_hidden = jnp.where(keep_mask[:, None], cond_hidden, self.null_cond_hidden)

        # LayerNorm is row-wise, so norming the conditioning rows alone equals
        # their rows in norm_cond(concat([cond_tokens, t_tokens]))
        mem_cond = self.norm_cond(cond_tokens)
        rot = self.rotary if c.use_rotary else None
        from audio2photoreal_tpu.ops.rotary import apply_rotary

        mem_rot = apply_rotary(mem_cond, rot, 0) if rot is not None else mem_cond
        kw, kb, vw, vb = self._stacked_cross_kv_weights(dt)
        ks = mem_rot.astype(dt) @ kw + kb  # [B, Tm_cond, L·D]
        vs = mem_cond.astype(dt) @ vw + vb

        pose_tokens = None
        if c.data_format == "pose":
            assert cond.pose_tokens is not None
            pose_tokens = jnp.where(
                keep_e,
                cond.pose_tokens.astype(dt),
                self.null_pose_embed[:, : cond.pose_tokens.shape[1], :].astype(dt),
            )
        return {
            "ks": ks,
            "vs": vs,
            "cond_hidden": cond_hidden,
            "pose_tokens": pose_tokens,
            "n_cond": cond_tokens.shape[1],
        }

    def denoise_cached(
        self,
        x: jnp.ndarray,  # [B, T, nfeats]
        t: jnp.ndarray,  # [B] int32
        cache,  # build_cond_cache output
    ) -> jnp.ndarray:
        """The (x, t)-dependent remainder of ``denoise`` against a
        ``build_cond_cache`` result — per step only the two t-token rows are
        normed, rotated, and projected.  Deterministic (sampling) path only;
        numerically identical to ``denoise`` (same ops, reordered;
        test_models::test_cached_cfg_model_fn_matches_uncached)."""
        c = self.cfg
        D = c.latent_dim
        B = x.shape[0]
        dt = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32

        h = self.input_projection(x)
        t_hidden = mish(self.time_dense(sinusoidal_pos_emb(t, D)))
        t_vec = self.to_time_cond(t_hidden) + cache["cond_hidden"]
        t_tokens = self.to_time_tokens(t_hidden).reshape(B, 2, D).astype(dt)

        mem_t = self.norm_cond(t_tokens)
        rot = self.rotary if c.use_rotary else None
        from audio2photoreal_tpu.ops.rotary import apply_rotary

        n_cond = cache["n_cond"]
        mem_t_rot = apply_rotary(mem_t, rot, n_cond) if rot is not None else mem_t
        kw, kb, vw, vb = self._stacked_cross_kv_weights(dt)
        ks = jnp.concatenate([cache["ks"], mem_t_rot.astype(dt) @ kw + kb], axis=1)
        vs = jnp.concatenate([cache["vs"], mem_t.astype(dt) @ vw + vb], axis=1)
        cross_kvs = self._split_cross_kvs(ks, vs)

        for i, layer in enumerate(self.layers):
            h = layer(
                h, None, t_vec, True,
                memory2=cache["pose_tokens"], rotary=rot, cross_kv=cross_kvs[i],
            )
        out = self.final_layer(h)
        if c.data_format == "pose":
            out = self._postnet(out, True)
        return out

    def denoise(
        self,
        x: jnp.ndarray,  # [B, T, nfeats] noisy motion
        t: jnp.ndarray,  # [B] int32 original-schedule timesteps
        cond: CondTokens,
        keep_mask: jnp.ndarray,  # [B] bool — False → null audio conditioning (CFG)
        deterministic: bool = True,
        keep_mask_pose: Optional[jnp.ndarray] = None,  # [B] bool for keyframe
        # tokens; None → same as keep_mask (the sampling path, where both are
        # all-True / all-False)
    ) -> jnp.ndarray:
        c = self.cfg
        D = c.latent_dim
        B = x.shape[0]
        # keep every wide ([B, T|Tm, D]) tensor in the compute dtype: the f32
        # null embeds / t-tokens would otherwise promote the whole memory
        # chain (where → concat → norm → per-layer rotate/K/V) to f32
        dt = jnp.bfloat16 if c.dtype in ("bf16", "bfloat16") else jnp.float32

        h = self.input_projection(x)

        keep_e = keep_mask[:, None, None]
        cond_tokens = jnp.where(
            keep_e,
            cond.cond_tokens.astype(dt),
            self.null_cond_embed[:, : cond.cond_tokens.shape[1], :].astype(dt),
        )
        # pooled-cond path stays f32 (a ~2000-element bf16 accumulation would
        # cost real precision; [B, D] is free)
        pooled = cond_tokens.astype(jnp.float32).mean(axis=-2)
        cond_hidden = self.non_attn_norm(pooled)
        cond_hidden = self.non_attn_d2(nn.silu(self.non_attn_d1(cond_hidden)))
        cond_hidden = jnp.where(keep_mask[:, None], cond_hidden, self.null_cond_hidden)

        # time conditioning (diffusion.py:383-393)
        t_hidden = mish(self.time_dense(sinusoidal_pos_emb(t, D)))
        t_vec = self.to_time_cond(t_hidden) + cond_hidden
        t_tokens = self.to_time_tokens(t_hidden).reshape(B, 2, D).astype(dt)

        memory = self.norm_cond(jnp.concatenate([cond_tokens, t_tokens], axis=-2))

        pose_tokens = None
        if c.data_format == "pose":
            assert cond.pose_tokens is not None
            keep_p = (keep_mask if keep_mask_pose is None else keep_mask_pose)[:, None, None]
            pose_tokens = jnp.where(
                keep_p,
                cond.pose_tokens.astype(dt),
                self.null_pose_embed[:, : cond.pose_tokens.shape[1], :].astype(dt),
            )

        rot = self.rotary if c.use_rotary else None
        cross_kvs = None
        # is_initializing: the k/v params don't exist yet on the init trace —
        # init runs the per-layer path (which creates them), apply fuses
        if not c.remat and not self.is_initializing():
            # FUSED cross-attn K/V: every decoder layer projects the SAME
            # memory stream — rotate it once (instead of L times) and run all
            # L layers' K (and V) projections as ONE [D, L·D] matmul each.
            # Identical math to the per-layer nn.Dense calls (column blocks of
            # a wider gemm); saves 2·(L−1) HBM re-reads of the [B, Tm, D]
            # memory per step in BOTH passes (~2 GB at the bs-64 face point).
            # Under remat the layer body must stay self-contained, so the
            # per-layer path is kept there.
            from audio2photoreal_tpu.ops.rotary import apply_rotary

            mem_rot = apply_rotary(memory, rot, 0) if rot is not None else memory
            kw, kb, vw, vb = self._stacked_cross_kv_weights(dt)
            ks = mem_rot.astype(dt) @ kw + kb  # [B, Tm, L·D]
            vs = memory.astype(dt) @ vw + vb
            cross_kvs = self._split_cross_kvs(ks, vs)

        for i, layer in enumerate(self.layers):
            if cross_kvs is not None:
                h = layer(
                    h, memory, t_vec, deterministic,
                    memory2=pose_tokens, rotary=rot, cross_kv=cross_kvs[i],
                )
            else:
                h = layer(
                    h, memory, t_vec, deterministic,
                    memory2=pose_tokens, rotary=rot,
                )
        out = self.final_layer(h)

        if c.data_format == "pose":
            out = self._postnet(out, deterministic)
        return out

    def _postnet(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """Causal dilated conv stack with averaged skip connections
        (reference: diffusion.py:214-224)."""
        rf = self.cfg.postnet_receptive_field
        out = jnp.pad(x, ((0, 0), (rf - 1, 0), (0, 0)))
        for i, ((cin, cout, k, d), kern, b) in enumerate(
            zip(self.post_conv_specs, self.post_kernels, self.post_biases)
        ):
            y = conv1d(out, kern, b, dilation=d, padding=(0, 0))
            y = nn.leaky_relu(y, negative_slope=0.2)
            if not deterministic:
                # routed through the same dropout policy as the decoder stack:
                # hash-position masks when cfg.hash_dropout, else RNG draws
                key = self.make_rng("dropout")
                if self.cfg.hash_dropout:
                    y = y * hash_drop_mult(key, y.shape, 0.2, y.dtype)
                else:
                    keep = jax.random.bernoulli(key, 0.8, y.shape)
                    y = y * keep / 0.8
            if out.shape[-1] == y.shape[-1]:
                out = (out[:, -y.shape[1]:, :] + y) / 2.0
            else:
                out = y
        out = valid_conv1d(out, self.final_conv_kernel, self.final_conv_bias)
        return out

    # ------------------------------------------------------------------ #
    # training forward = encode + Bernoulli CFG dropout + denoise
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        audio: Optional[jnp.ndarray],
        keyframes: Optional[jnp.ndarray] = None,
        keyframe_valid: Optional[jnp.ndarray] = None,
        cond_drop_prob: float = 0.0,
        deterministic: bool = True,
        audio_features: Optional[jnp.ndarray] = None,
        lip_verts: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cond = self.encode_conditioning(
            audio,
            keyframes,
            keyframe_valid,
            deterministic,
            audio_features=audio_features,
            lip_verts=lip_verts,
        )
        B = x.shape[0]
        if cond_drop_prob > 0.0:
            # two INDEPENDENT draws, matching the reference's separate
            # prob_mask_like calls (diffusion.py:326 keyframes, :367 audio)
            k_audio, k_pose = jax.random.split(self.make_rng("cond_drop"))
            keep = ~jax.random.bernoulli(k_audio, cond_drop_prob, (B,))
            keep_pose = ~jax.random.bernoulli(k_pose, cond_drop_prob, (B,))
        else:
            keep = jnp.ones((B,), bool)
            keep_pose = keep
        return self.denoise(x, t, cond, keep, deterministic, keep_mask_pose=keep_pose)
