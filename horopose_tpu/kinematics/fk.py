"""Compiled batched forward kinematics.

The reference walks a networkx kinematic graph with per-link Python loops on
every FK call (urdfpytorch/urdf.py:3061-3149, called from
lib/utils/urdf_robot.py:107-111). Here the URDF is compiled ONCE into a
static plan (topologically-sorted joint arrays); executing FK is then a fixed,
fully-unrolled chain of batched 4x4 matmuls — jittable, differentiable, and
trivially vmappable. All trig/matmul work is vectorized over (batch, joints).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from horopose_tpu.kinematics.urdf import URDFModel

_FIXED, _REVOLUTE, _PRISMATIC = 0, 1, 2


class KinematicPlan:
    """Static FK plan for one robot.

    Attributes
    ----------
    link_names : list of link names; FK returns poses in this order. Entry 0
        is the root link (identity pose).
    dof : number of actuated DoF (= len(actuated_joint_names)).
    """

    def __init__(self, model: URDFModel,
                 actuated_joint_names: Optional[Sequence[str]] = None):
        self.model = model
        joints = model.topological_joints()
        if actuated_joint_names is None:
            actuated_joint_names = [j.name for j in joints if j.is_actuated]
        self.actuated_joint_names = list(actuated_joint_names)
        self.dof = len(self.actuated_joint_names)
        qidx = {name: i for i, name in enumerate(self.actuated_joint_names)}

        self.link_names: List[str] = [model.root_link]
        link_index = {model.root_link: 0}

        origins, axes, types = [], [], []
        parent_idx, sel_rows, offsets = [], [], []
        for j in joints:
            link_index[j.child] = len(self.link_names)
            self.link_names.append(j.child)
            origins.append(j.origin)
            axes.append(j.axis)
            parent_idx.append(link_index[j.parent])
            row = np.zeros(self.dof, dtype=np.float64)
            off = 0.0
            if j.jtype in ("revolute", "continuous", "prismatic"):
                types.append(_PRISMATIC if j.jtype == "prismatic" else _REVOLUTE)
                if j.mimic_joint is not None:
                    src = model.joints[j.mimic_joint]
                    if src.name in qidx:
                        row[qidx[src.name]] = j.mimic_multiplier
                        off = j.mimic_offset
                elif j.name in qidx:
                    row[qidx[j.name]] = 1.0
                # actuated-but-unlisted joints stay at q=0 (row of zeros)
            else:
                types.append(_FIXED)
            sel_rows.append(row)
            offsets.append(off)

        self.n_joints = len(joints)
        self.joint_names = [j.name for j in joints]
        self._origins = jnp.asarray(np.stack(origins), jnp.float32)     # (J,4,4)
        self._axes = jnp.asarray(np.stack(axes), jnp.float32)           # (J,3)
        self._types = np.asarray(types, np.int32)                       # static
        self._parent = np.asarray(parent_idx, np.int32)                 # static
        self._sel = jnp.asarray(np.stack(sel_rows), jnp.float32)        # (J,DoF)
        self._offset = jnp.asarray(np.asarray(offsets), jnp.float32)    # (J,)
        # joint origin translations per child link, used for joint-origin
        # keypoints (baxter): keypoint = parent_link_pose @ origin.translation
        self.joint_origin_xyz = {j.name: np.asarray(j.origin[:3, 3], np.float32)
                                 for j in joints}
        self.joint_parent_link = {j.name: j.parent for j in joints}

    # ------------------------------------------------------------------
    def _motions(self, q: jnp.ndarray) -> jnp.ndarray:
        """Per-joint motion transforms. q (B, J) -> (B, J, 4, 4)."""
        B = q.shape[0]
        a = self._axes  # (J,3)
        ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
        c = jnp.cos(q)  # (B,J)
        s = jnp.sin(q)
        one_c = 1.0 - c
        # Rodrigues for unit axis, broadcast over batch
        r = jnp.stack([
            jnp.stack([c + ax * ax * one_c, ax * ay * one_c - az * s,
                       ay * s + ax * az * one_c], -1),
            jnp.stack([az * s + ax * ay * one_c, c + ay * ay * one_c,
                       -ax * s + ay * az * one_c], -1),
            jnp.stack([-ay * s + ax * az * one_c, ax * s + ay * az * one_c,
                       c + az * az * one_c], -1),
        ], axis=-2)  # (B,J,3,3)
        is_rev = jnp.asarray(self._types == _REVOLUTE, q.dtype)[None, :, None, None]
        is_prs = jnp.asarray(self._types == _PRISMATIC, q.dtype)[None, :, None, None]
        eye3 = jnp.eye(3, dtype=q.dtype)
        rot = r * is_rev + eye3 * (1.0 - is_rev)
        trans = (a[None] * q[..., None]) * is_prs[..., 0]  # (B,J,3)
        top = jnp.concatenate([rot, trans[..., None]], axis=-1)  # (B,J,3,4)
        bottom = jnp.zeros((B, q.shape[1], 1, 4), q.dtype).at[..., 0, 3].set(1.0)
        return jnp.concatenate([top, bottom], axis=-2)

    def link_poses(self, cfg: jnp.ndarray) -> jnp.ndarray:
        """FK. cfg (..., DoF) -> link poses (..., L, 4, 4) in link_names order."""
        batch_shape = cfg.shape[:-1]
        cfg2 = cfg.reshape(-1, self.dof).astype(jnp.float32)
        B = cfg2.shape[0]
        q = cfg2 @ self._sel.T + self._offset[None]  # (B, J)
        motions = self._motions(q)                   # (B, J, 4, 4)
        # local transform parent->child: origin_j @ motion_j
        local = jnp.einsum("jab,Bjbc->Bjac", self._origins, motions)
        poses = [jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))]
        for jidx in range(self.n_joints):
            parent = poses[self._parent[jidx]]
            poses.append(parent @ local[:, jidx])
        out = jnp.stack(poses, axis=1)  # (B, L, 4, 4)
        return out.reshape(*batch_shape, len(self.link_names), 4, 4)

    def link_poses_subset(self, cfg: jnp.ndarray,
                          names: Sequence[str]) -> jnp.ndarray:
        """FK restricted to named links: (..., len(names), 4, 4)."""
        all_poses = self.link_poses(cfg)
        idx = np.asarray([self.link_names.index(n) for n in names], np.int32)
        return all_poses[..., idx, :, :]
