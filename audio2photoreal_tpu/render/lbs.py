"""Linear blend skinning with level-parallel forward kinematics.

Re-design of the reference LBS stack (visualize/ca_body/utils/lbs.py):
- ``ParameterTransform`` (:31-54): pose → 7-per-joint channel params via a
  (sparse) transform matrix + offsets,
- ``solve_skeleton_state`` (:318-354): the reference walks the parent chain
  joint-by-joint in Python; here joints are grouped into topological LEVELS
  (computed host-side once) and each level composes against its parents in
  one vectorized step — depth-of-skeleton iterations instead of
  num-joints iterations, all static for XLA,
- ``skinning``/``unskinning`` (:215-290): weighted 3×4 transforms; the
  per-sample 4×4 inverse loop becomes one batched ``jnp.linalg.inv``,
- ``LBSModule`` (:796-827): pose/unpose around template vertices with global
  scaling.

State layout matches the reference: per joint 8 numbers = translation(3) +
quaternion(4, xyzw) + scale(1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from audio2photoreal_tpu.render import quaternion as quat


@dataclass(frozen=True)
class Skeleton:
    """Static skeleton description (host-side numpy; hashable by identity)."""

    joint_parents: np.ndarray  # [J] int, -1 = root
    joint_offset: np.ndarray  # [J, 3]
    joint_rotation: np.ndarray  # [J, 4] pre-rotation quats (xyzw)
    levels: Tuple[np.ndarray, ...]  # topological groups of joint indices

    @classmethod
    def create(cls, parents, offset, rotation) -> "Skeleton":
        parents = np.asarray(parents, np.int64).reshape(-1)
        depth = np.zeros_like(parents)
        for j, p in enumerate(parents):
            depth[j] = 0 if p < 0 else depth[p] + 1
        levels = tuple(
            np.where(depth == d)[0] for d in range(int(depth.max()) + 1)
        )
        return cls(parents, np.asarray(offset, np.float32), np.asarray(rotation, np.float32), levels)

    @property
    def num_joints(self) -> int:
        return len(self.joint_parents)


def param_transform(pose: jnp.ndarray, transform: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """[B, P] raw pose → [B, 7·J] channel params (lbs.py:47-54)."""
    return pose @ transform.T + offsets


def solve_skeleton_state(skel: Skeleton, params: jnp.ndarray) -> jnp.ndarray:
    """[B, 7·J] → [B, J, 8] global joint states via level-parallel FK."""
    B = params.shape[0]
    J = skel.num_joints
    jp = params.reshape(B, J, 7)
    lt = jp[:, :, 0:3] + jnp.asarray(skel.joint_offset)[None]
    lr = quat.mul(jnp.asarray(skel.joint_rotation)[None], quat.from_xyz(jp[:, :, 3:6]))
    ls = 2.0 ** jp[:, :, 6:7]

    gt = lt
    gr = lr
    gs = ls
    parents = jnp.asarray(skel.joint_parents)
    for level in skel.levels[1:]:
        idx = jnp.asarray(level)
        par = parents[idx]
        p_t, p_r, p_s = gt[:, par], gr[:, par], gs[:, par]
        new_r = quat.mul(p_r, lr[:, idx])
        new_t = quat.rotate(p_r, lt[:, idx] * p_s) + p_t
        new_s = p_s * ls[:, idx]
        gt = gt.at[:, idx].set(new_t)
        gr = gr.at[:, idx].set(new_r)
        gs = gs.at[:, idx].set(new_s)
    return jnp.concatenate([gt, gr, gs], axis=-1)


def states_to_matrix(bind_state: jnp.ndarray, target_states: jnp.ndarray) -> jnp.ndarray:
    """[B?, J, 8] bind + [B, J, 8] target → [B, J, 3, 4] skinning transforms
    (lbs.py:357-397): M = target ∘ bind⁻¹."""
    br = quat.invert(bind_state[..., 3:7])
    bs = 1.0 / bind_state[..., 7:8]
    bt = quat.rotate(br, -bind_state[..., 0:3]) * bs

    tr = quat.mul(target_states[..., 3:7], br)
    ts = target_states[..., 7:8] * bs
    tt = (
        quat.rotate(target_states[..., 3:7], bt * target_states[..., 7:8])
        + target_states[..., 0:3]
    )
    rot = quat.to_matrix(tr) * ts[..., None]  # [B, J, 3, 3] scaled rotation
    return jnp.concatenate([rot, tt[..., None]], axis=-1)  # [B, J, 3, 4]


def skinning(
    mat: jnp.ndarray,  # [B, J, 3, 4]
    verts: jnp.ndarray,  # [B or 1, V, 3]
    skin_indices: jnp.ndarray,  # [V, K] int
    skin_weights: jnp.ndarray,  # [V, K]
) -> jnp.ndarray:
    """Weighted transform of vertices (lbs.py:215-241).

    Blends the per-vertex 3×4 transforms FIRST (K ≤ 8 gathers) then applies
    one transform per vertex — fewer FLOPs than transforming K times."""
    vmat = mat[:, skin_indices]  # [B, V, K, 3, 4]
    blended = (vmat * skin_weights[None, :, :, None, None]).sum(axis=2)  # [B, V, 3, 4]
    v = jnp.broadcast_to(verts, (mat.shape[0],) + verts.shape[-2:])
    return (
        jnp.einsum("bvij,bvj->bvi", blended[..., :3], v) + blended[..., 3]
    )


def unskinning(
    mat: jnp.ndarray,
    verts_posed: jnp.ndarray,
    skin_indices: jnp.ndarray,
    skin_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse skinning via batched 4×4 inverses (lbs.py:260-290 — the
    reference's per-sample Python loop becomes one batched inv)."""
    vmat = mat[:, skin_indices]
    blended = (vmat * skin_weights[None, :, :, None, None]).sum(axis=2)  # [B, V, 3, 4]
    B, V = blended.shape[:2]
    bottom = jnp.zeros((B, V, 1, 4)).at[..., 0, 3].set(1.0)
    m44 = jnp.concatenate([blended, bottom], axis=-2)
    inv = jnp.linalg.inv(m44)
    return (
        jnp.einsum("bvij,bvj->bvi", inv[..., :3, :3], verts_posed) + inv[..., :3, 3]
    )


@dataclass
class LBSModule:
    """pose/unpose around a template (reference LBSModule, lbs.py:796-827)."""

    skel: Skeleton
    transform: jnp.ndarray  # [7J, P]
    transform_offsets: jnp.ndarray  # [7J]
    bind_state: jnp.ndarray  # [1, J, 8]
    skin_indices: jnp.ndarray  # [V, K]
    skin_weights: jnp.ndarray  # [V, K]
    template_verts: jnp.ndarray  # [1, V, 3]
    global_scaling: float = 1.0

    @classmethod
    def create(
        cls,
        skel: Skeleton,
        transform,
        transform_offsets,
        skin_indices,
        skin_weights,
        template_verts,
        global_scaling: float = 1.0,
        bind_offsets=None,
    ) -> "LBSModule":
        """``bind_offsets``: channel offsets for the BIND state.  The
        reference solves the bind pose from all-zero params INCLUDING zero
        scale (lbs.py:112-115), so when the constant scale params have been
        folded into ``transform_offsets`` (convert_static_assets) the
        pre-fold offsets must be supplied here — else the bind absorbs the
        scale and every unpose/pose transform is off."""
        zero_pose = jnp.zeros((1, transform.shape[1]), jnp.float32)
        bo = transform_offsets if bind_offsets is None else bind_offsets
        params0 = param_transform(zero_pose, jnp.asarray(transform), jnp.asarray(bo))
        bind_state = solve_skeleton_state(skel, params0)
        return cls(
            skel=skel,
            transform=jnp.asarray(transform),
            transform_offsets=jnp.asarray(transform_offsets),
            bind_state=bind_state,
            skin_indices=jnp.asarray(skin_indices),
            skin_weights=jnp.asarray(skin_weights),
            template_verts=jnp.asarray(template_verts)[None]
            if np.ndim(template_verts) == 2
            else jnp.asarray(template_verts),
            global_scaling=global_scaling,
        )

    def _states(self, pose: jnp.ndarray) -> jnp.ndarray:
        params = param_transform(pose, self.transform, self.transform_offsets)
        return solve_skeleton_state(self.skel, params)

    def pose(self, verts_unposed: Optional[jnp.ndarray], pose: jnp.ndarray) -> jnp.ndarray:
        """Skin (delta + template) — ``verts_unposed`` is a DELTA from the
        template, matching the reference (ca_body/utils/lbs.py:809-813:
        ``lbs_fn(motion, scale, verts_unposed + template)``)."""
        states = self._states(pose)
        mat = states_to_matrix(self.bind_state, states)
        verts = (
            self.template_verts
            if verts_unposed is None
            else verts_unposed + self.template_verts
        )
        return skinning(mat, verts, self.skin_indices, self.skin_weights) * self.global_scaling

    def unpose(self, verts_posed: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
        """Posed verts → DELTA from template (lbs.py:815-821)."""
        states = self._states(pose)
        mat = states_to_matrix(self.bind_state, states)
        return (
            unskinning(
                mat, verts_posed / self.global_scaling, self.skin_indices, self.skin_weights
            )
            - self.template_verts
        )

    def template_pose(self, pose: jnp.ndarray) -> jnp.ndarray:
        return self.pose(None, pose)
