"""UV-seam fixups.

Port of visualize/ca_body/utils/seams.py: ``impaint_batch`` (:16-21) copies
precomputed source texels over destination texels; ``resample_tex`` (:23-52)
blends grid-sampled values across the seam by precomputed weights.  The
index/weight tables ship in the static assets.

TPU-native twist: the renderer applies impaint + N resample passes back to
back (mesh_vae_drivable.py:230-252 runs impaint, resample, resample).  Run
sequentially each pass is a full-texture scatter — XLA materialises a copy of
the whole [B, H, W, C] buffer per ``.at[].set`` even when the tables are
EMPTY, which at 1024²·32ch·batch-16 is ~1 GB of HBM traffic per pass.  Since
every index and weight is static, the whole pipeline is a constant sparse
matrix: ``fused_apply`` composes it host-side once (scipy.sparse) into a
per-destination tap table and applies it as ONE gather + ONE scatter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.ops.gridsample import grid_sample_bilinear, take_per_frame


@dataclass
class SeamSampler:
    # impaint copy tables: dst ← src texel indices (flat [N] into H·W)
    impaint_dst: jnp.ndarray  # [N] int32
    impaint_src: jnp.ndarray  # [N] int32
    # resample tables
    resample_uvs: jnp.ndarray  # [M, 2] normalized sample coords in [-1, 1]
    resample_dst: jnp.ndarray  # [M] int32 flat texel index
    resample_weights: jnp.ndarray  # [M] blend weight
    uv_size: int
    # composed tap tables per n_resample (host-side, built lazily)
    _fused: Dict[int, Tuple] = field(default_factory=dict, repr=False, compare=False)

    @property
    def is_empty(self) -> bool:
        return self.impaint_dst.shape[0] == 0 and self.resample_dst.shape[0] == 0

    def impaint(self, tex: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C]: copy src → dst texels (seams.py:16-21)."""
        if self.impaint_dst.shape[0] == 0:
            return tex
        B, H, W, C = tex.shape
        flat = tex.reshape(B, H * W, C)
        src_vals = flat[:, self.impaint_src]
        flat = flat.at[:, self.impaint_dst].set(src_vals)
        return flat.reshape(B, H, W, C)

    def resample(self, tex: jnp.ndarray) -> jnp.ndarray:
        """Blend re-sampled seam texels into the texture (seams.py:23-52)."""
        if self.resample_dst.shape[0] == 0:
            return tex
        B, H, W, C = tex.shape
        grid = jnp.broadcast_to(
            self.resample_uvs[None, :, None, :], (B, self.resample_uvs.shape[0], 1, 2)
        )
        # padding_zero=False clamps to the border, matching the reference's
        # grid_sample(padding_mode="border") (seams.py:26)
        sampled = grid_sample_bilinear(tex, grid, align_corners=False, padding_zero=False)[
            :, :, 0, :
        ]
        flat = tex.reshape(B, H * W, C)
        dst_vals = flat[:, self.resample_dst]
        w = self.resample_weights[None, :, None].astype(tex.dtype)
        blended = dst_vals * (1.0 - w) + sampled.astype(tex.dtype) * w
        # keep the scatter in the texture's dtype — a mixed-dtype .set would
        # upcast (and copy) the whole buffer
        flat = flat.at[:, self.resample_dst].set(blended)
        return flat.reshape(B, H, W, C)

    def __call__(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(self.impaint(tex))

    # ---- fused path ------------------------------------------------------

    def _compose(self, n_resample: int):
        """Compose impaint + n_resample resamples into (dst, taps, weights):
        out[dst[i]] = Σ_k weights[i, k] · x[taps[i, k]], identity elsewhere.

        All tables are static, so the three passes form one constant sparse
        matrix S = R^n · I_imp; rows that differ from identity become the tap
        table.  Mirrors grid_sample_bilinear's align_corners=False +
        border-clamp index math exactly."""
        import scipy.sparse as sp

        W = self.uv_size
        HW = W * W
        imp_dst = np.asarray(self.impaint_dst, np.int64)
        imp_src = np.asarray(self.impaint_src, np.int64)
        r_dst = np.asarray(self.resample_dst, np.int64)
        r_w = np.asarray(self.resample_weights, np.float64)
        uvs = np.asarray(self.resample_uvs, np.float64)  # [-1, 1], (x, y)

        dst = (
            np.unique(np.concatenate([imp_dst, r_dst]))
            if (imp_dst.size or r_dst.size)
            else np.zeros(0, np.int64)
        )
        if dst.size == 0:
            return None

        # Full-HW operators are cheap to BUILD (≤ ~5 nnz/row) but HW×HW
        # products are not — so propagate only the |dst| affected rows:
        # P = I_dst · R^n · A, computed left-to-right (row-restricted).

        # impaint A: modified identity, row d reads e_{src}
        cols = np.arange(HW, dtype=np.int64)
        if imp_dst.size:
            cols[imp_dst] = imp_src
        A = sp.csr_matrix(
            (np.ones(HW), (np.arange(HW, dtype=np.int64), cols)), shape=(HW, HW)
        )

        R = None
        if r_dst.size and n_resample > 0:
            # bilinear taps of one resample pass (border-clamped, matching
            # grid_sample_bilinear align_corners=False, padding_zero=False)
            fx = ((uvs[:, 0] + 1.0) * W - 1.0) * 0.5
            fy = ((uvs[:, 1] + 1.0) * W - 1.0) * 0.5
            x0 = np.floor(fx)
            y0 = np.floor(fy)
            wx = fx - x0
            wy = fy - y0
            cc, vv = [], []
            for dx, dy, w4 in (
                (0, 0, (1 - wx) * (1 - wy)),
                (1, 0, wx * (1 - wy)),
                (0, 1, (1 - wx) * wy),
                (1, 1, wx * wy),
            ):
                xi = np.clip(x0 + dx, 0, W - 1).astype(np.int64)
                yi = np.clip(y0 + dy, 0, W - 1).astype(np.int64)
                cc.append(yi * W + xi)
                vv.append(r_w * w4)
            bil = sp.csr_matrix(
                (np.concatenate(vv), (np.tile(r_dst, 4), np.concatenate(cc))),
                shape=(HW, HW),
            )
            diag = np.ones(HW)
            diag[r_dst] = 1.0 - r_w
            R = sp.diags(diag).tocsr() + bil

        stages = ([R] * n_resample if R is not None else []) + [A]
        P = stages[0][dst]  # [|dst|, HW] — a row slice, not a product
        for M in stages[1:]:
            P = P @ M

        sub = P.tocoo()
        K = max(int(np.bincount(sub.row, minlength=dst.size).max()), 1)
        order = np.argsort(sub.row, kind="stable")
        rows_s, cols_s, data_s = sub.row[order], sub.col[order], sub.data[order]
        counts = np.bincount(rows_s, minlength=dst.size)
        slot = np.arange(rows_s.size) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        taps = np.zeros((dst.size, K), np.int64)
        ws = np.zeros((dst.size, K), np.float64)
        taps[rows_s, slot] = cols_s
        ws[rows_s, slot] = data_s
        # cache as NUMPY — jnp constants minted during a jit trace are
        # tracers and must not outlive it
        return (
            dst.astype(np.int32),
            taps.astype(np.int32),
            ws.astype(np.float32),
        )

    def _buckets(self, n_resample: int):
        """Composed tables bucketed by tap count (host-side, cached):
        [(dst_b, taps_b [Mb, Kb], ws_b [Mb, Kb]), ...] — rows padded to the
        max K waste gather slots; pow2 buckets keep work ∝ actual taps."""
        key = ("buckets", n_resample)
        if key in self._fused:
            return self._fused[key]
        if n_resample not in self._fused:
            self._fused[n_resample] = self._compose(n_resample)
        packed = self._fused[n_resample]
        if packed is None:
            self._fused[key] = None
            return None
        dst, taps, ws = packed
        counts = (ws != 0).sum(1)
        order = np.argsort(counts, kind="stable")
        dst_s, taps_s, ws_s, counts_s = dst[order], taps[order], ws[order], counts[order]
        buckets = []
        start = 0
        kb = 1
        while start < len(dst_s):
            end = int(np.searchsorted(counts_s, kb, side="right"))
            if end > start:
                buckets.append((dst_s[start:end], taps_s[start:end, :kb], ws_s[start:end, :kb]))
                start = end
            kb *= 2
        self._fused[key] = buckets
        return buckets

    def fused_apply(self, tex: jnp.ndarray, n_resample: int = 2) -> jnp.ndarray:
        """impaint → resample×n as one fused gather/scatter pipeline (same
        values as the sequential passes, composed in f32).

        TPU-native layout: the tap pattern is identical for every frame, so
        the texture is viewed TEXEL-GROUP-MAJOR as [HW/g, B, g·C] with
        g·C = lcm(128, C) — every materialised buffer is lane-EXACT (flat
        [B, HW, C] forms lane-pad tiny C up to 42× and OOM at 2048²·batch-16)
        and each tap is ONE row-gather serving the whole batch (B× fewer
        index ops, the TPU gather bottleneck)."""
        if self.is_empty:
            return tex
        B, H, W, C = tex.shape
        t = to_texel_rows(tex)
        t = self.fused_apply_rows(t, B, C, n_resample)
        return from_texel_rows(t, B, H, W, C)

    def _buckets_s2d(self, n_resample: int):
        """Bucketed tables with every texel index permuted to the row order
        of the s2d-layout texel-major view [(H/2·W/2)·4, B·C]: texel (y, x)
        lives at row (⌊y/2⌋·W/2 + ⌊x/2⌋)·4 + ((y&1)·2 | (x&1))."""
        key = ("buckets_s2d", n_resample)
        if key in self._fused:
            return self._fused[key]
        buckets = self._buckets(n_resample)
        if not buckets:
            self._fused[key] = None
            return None
        W = self.uv_size

        def perm(idx):
            y, x = idx // W, idx % W
            return (((y >> 1) * (W >> 1) + (x >> 1)) << 2) | ((y & 1) << 1) | (x & 1)

        out = [(perm(dst_b), perm(taps_b), ws_b) for dst_b, taps_b, ws_b in buckets]
        self._fused[key] = out
        return out

    def fused_apply_s2d(self, x_s2d: jnp.ndarray, n_resample: int = 2) -> jnp.ndarray:
        """``fused_apply`` on a space-to-depth-layout tensor [B, H/2, W/2, 4C]
        ((ry, rx, c) channel blocks) without relayout to dense coordinates:
        the static tap/dst indices are permuted host-side to (s2d-row, phase)
        order, so only the texel-major transpose remains."""
        if self.is_empty:
            return x_s2d
        B, h, w, CP = x_s2d.shape
        C = CP // 4
        t = x_s2d.reshape(B, h * w, 4, C).transpose(1, 2, 0, 3).reshape(h * w * 4, B * C)
        t = self._apply_buckets(t, B, C, self._buckets_s2d(n_resample))
        return t.reshape(h * w, 4, B, C).transpose(2, 0, 1, 3).reshape(B, h, w, CP)

    def fused_apply_rows(
        self, t: jnp.ndarray, B: int, C: int, n_resample: int = 2
    ) -> jnp.ndarray:
        """Same as fused_apply but on an already texel-major [H·W, B·C]
        array — callers chaining several seam sites (forward_tex's shadow →
        multiply → texture sequence) stay in this layout and pay the
        relayout transposes once."""
        return self._apply_buckets(t, B, C, self._buckets(n_resample))

    def _apply_buckets(self, t: jnp.ndarray, B: int, C: int, buckets) -> jnp.ndarray:
        if not buckets:
            return t
        outs, dsts = [], []
        for dst_b, taps_b, ws_b in buckets:
            Mb, Kb = taps_b.shape
            acc = jnp.zeros((Mb, B * C), jnp.float32)
            for k in range(Kb):
                rows = jnp.take(t, jnp.asarray(taps_b[:, k]), axis=0)
                acc = acc + rows.astype(jnp.float32) * jnp.asarray(ws_b[:, k])[:, None]
            outs.append(acc)
            dsts.append(dst_b)
        vals = jnp.concatenate(outs, 0).astype(t.dtype)  # [M, B·C]
        dst_all = jnp.asarray(np.concatenate(dsts))
        return t.at[dst_all].set(vals)


    def fused_apply_packed(self, img_packed: jnp.ndarray, n_resample: int = 2) -> jnp.ndarray:
        """Seam pipeline on a PACKED display-space RGB8 int32 image
        [B, H, W] (see ops/gridsample.pack_rgb8) — the product video path.

        Impaint rows (pure copies) are exact.  Resample rows blend AFTER the
        display transform instead of before; the display curve is smooth and
        monotone, so blend-then-curve vs curve-then-blend differ by well
        under one 8-bit step for neighboring texel values — invisible in the
        encoded video.  Runs ~4× cheaper than the exact linear-space
        pipeline: one int32 channel instead of three linear channels."""
        if self.is_empty:
            return img_packed
        buckets = self._buckets(n_resample)
        if not buckets:
            return img_packed
        B, H, W = img_packed.shape
        HW = H * W
        t = img_packed.reshape(B, HW).transpose(1, 0)  # [HW, B] int32
        outs, dsts = [], []
        for dst_b, taps_b, ws_b in buckets:
            Mb, Kb = taps_b.shape
            acc = jnp.zeros((Mb, B, 3), jnp.float32)
            for k in range(Kb):
                rows = jnp.take(t, jnp.asarray(taps_b[:, k]), axis=0)  # [Mb, B] i32
                rgb = jnp.stack(
                    [rows & 0xFF, (rows >> 8) & 0xFF, (rows >> 16) & 0xFF], -1
                ).astype(jnp.float32)
                acc = acc + rgb * jnp.asarray(ws_b[:, k])[:, None, None]
            outs.append(acc)
            dsts.append(dst_b)
        vals = jnp.concatenate(outs, 0)  # [M, B, 3] float display
        q = jnp.clip(jnp.round(vals), 0.0, 255.0).astype(jnp.int32)
        repacked = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)  # [M, B]
        dst_all = jnp.asarray(np.concatenate(dsts))
        t = t.at[dst_all].set(repacked)
        return t.transpose(1, 0).reshape(B, H, W)


def to_texel_rows(tex: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → texel-major narrow rows [H·W, B·C]: one row-gather per
    tap serves the whole batch, and row-scatters don't lane-pad.  IMPORTANT:
    relayout from the FLAT [B, HW, C] view — transposing the 4D [B, H, W, C]
    form materialises a [H, W, B, C] intermediate whose tiny minor dims
    lane-pad up to 42× (OOMs at 2048²·batch-16)."""
    B, H, W, C = tex.shape
    return tex.reshape(B, H * W, C).transpose(1, 0, 2).reshape(H * W, B * C)


def from_texel_rows(t: jnp.ndarray, B: int, H: int, W: int, C: int) -> jnp.ndarray:
    """Inverse of to_texel_rows."""
    return t.reshape(H * W, B, C).transpose(1, 0, 2).reshape(B, H, W, C)
