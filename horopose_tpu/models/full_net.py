"""FullNet (RootNetwithRegInt): the flagship holistic pose model.

Parity target: /root/reference/lib/models/full_net.py:18-435. Two backbones:
a rootnet backbone (hrnet32 default) for absolute root depth, and a
regression backbone (resnet50 default) whose feature map feeds (a) a 3D
heatmap head decoded by the soft-argmax integral layer, and (b) a pooled
feature driving iterative residual MLP heads for joint angles and the 6D
root rotation. Root translation is recovered from (root uv, depth, K^-1).

TPU-native design notes:
- NHWC, single fused forward under jit; both backbones are independent
  subgraphs XLA can schedule in parallel (the reference times them
  separately and reports "FPS_parallel" assuming exactly this overlap).
- The FK lift (keypoints from pose/rot/trans) is intentionally OUTSIDE this
  module: the engine composes it with the Robot facade so the network stays
  a pure Flax transform. See core/engine.py.
- Weight-shared iterative heads: the same Dense modules are applied n_iter
  times (reference: full_net.py:318-331, 365-378).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from horopose_tpu.models.common import batch_norm
from horopose_tpu.models.hrnet import get_hrnet
from horopose_tpu.models.resnet import get_resnet
from horopose_tpu.ops.integral import (heatmap_integral_joint,
                                       heatmap_integral_pose)
from horopose_tpu.ops.rotations import rot6d_to_rotmat, rotmat_to_rot6d
from horopose_tpu.ops.transforms import uvz_to_xyz_singlepoint

_RESNETS = ("resnet", "resnet18", "resnet34", "resnet50", "resnet101")
# "hrnet"/"hrnet32" -> w32 (the reference FullNet's only wiring,
# full_net.py:80-81,139-140); "hrnet48" additionally exposes the w48 variant
# the reference defines in get_hrnet (HRnet.py:613-623 + hrnet_w48.yaml) but
# never plumbs through.
_HRNETS = ("hrnet", "hrnet32", "hrnet48")


def _hrnet_width(name: str) -> int:
    return 48 if str(name).endswith("48") else 32


def conv_transpose_d2s(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(kernel 4x4, stride 2, padding SAME, no bias)
    re-expressed as ONE stride-1 2x2 conv with 4x output channels followed
    by a depth-to-space interleave.

    Numerically identical to flax nn.ConvTranspose on the same (4,4,in,out)
    kernel (test_models.py asserts bit-level agreement); on the MXU the
    2x2 GEMM runs with N = 4*C_out lanes and no input dilation, where the
    direct lowering convolves a zero-dilated input — each output phase
    (dy,dx) only ever reads kernel taps ky=2ty+(1-dy), kx=2tx+(1-dx).
    """
    import jax
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (4, 4), "rewrite specialised to the k4s2 deconv"
    # flax SAME k4s2 semantics (probe): out[2j+d] sums x[j-1+t]*W[d+2t] for
    # d=0 and x[j+t]*W[d+2t] for d=1 -> phase kernel = W[dy::2, dx::2],
    # phase windows offset by (dy, dx) into one padded 2x2 conv
    phases = [kernel[dy::2, dx::2]
              for dy in (0, 1) for dx in (0, 1)]       # 4 x (2,2,in,out)
    kp = jnp.concatenate(phases, axis=-1)              # (2,2,in,4*out)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    c = jax.lax.conv_general_dilated(
        xpad, kp.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # (B, H+1, W+1, 4C)
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    parts = [c[:, dy:dy + H, dx:dx + W,
               (2 * dy + dx) * cout:(2 * dy + dx + 1) * cout]
             for dy in (0, 1) for dx in (0, 1)]
    s = jnp.stack(parts, axis=3).reshape(B, H, W, 2, 2, cout)
    return s.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, cout)


class FullNet(nn.Module):
    robot_type: str = "panda"
    num_keypoints: int = 7
    dof: int = 8
    backbone_name: str = "resnet50"
    rootnet_backbone_name: str = "hrnet32"
    image_size: int = 256
    depth_dim: int = 64
    bbox_3d_shape: Tuple[float, float, float] = (1300.0, 1300.0, 1300.0)
    reference_keypoint_id: int = 3
    fix_root: bool = True
    n_iter: int = 4
    p_dropout: float = 0.5
    rotation_dim: int = 6
    direct_reg_rot: bool = False
    rot_iterative_matmul: bool = False
    reg_joint_map: bool = False
    joint_conv_dim: Sequence[int] = (256, 256, 256)
    joint_bounds: Optional[Any] = None       # (dof, 2) array if reg_joint_map
    add_fc: bool = False
    multi_kp: bool = False
    kps_need_depth: Optional[Sequence[int]] = None
    init_pose: Tuple[float, ...] = ()        # (dof,) initial joint angles
    init_rot: Tuple[float, ...] = (1, 0, 0, 0, 1, 0)  # identity rot6d
    use_pallas_integral: Optional[bool] = None  # None -> auto (TPU only)
    remat: bool = False   # per-block jax.checkpoint in both backbones
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_reg, x_root, k_value, K, train: bool = True):
        """x_reg, x_root: (B, S, S, 3) float crops in [0, 1]; k_value (B,);
        K (B, 3, 3) intrinsics of the reg crop.

        Returns a dict: pose (B,dof), rot (B,rotation_dim), trans (B,3),
        root_uv (B,2) pixels, depth (B,1) metres, uvd (B,K,3),
        xyz_int (B,K,3) [, depths (B,len(kps_need_depth)) if multi_kp].
        """
        B = x_reg.shape[0]
        heatmap_size = self.image_size // 4

        # ---- root depth branch (full_net.py:252-287) ----
        if self.rootnet_backbone_name in _RESNETS:
            fm = get_resnet(self.rootnet_backbone_name, self.dtype,
                            name="rootnet_backbone",
                            remat=self.remat)(x_root, train=train)
            img_feat = jnp.mean(fm, axis=(1, 2))
        elif self.rootnet_backbone_name in _HRNETS:
            img_feat = get_hrnet(_hrnet_width(self.rootnet_backbone_name),
                                 num_joints=self.num_keypoints,
                                 depth_dim=self.depth_dim, generate_hm=False,
                                 generate_feat=True, dtype=self.dtype,
                                 name="rootnet_backbone",
                                 remat=self.remat)(x_root, train=train)
        else:
            raise NotImplementedError(self.rootnet_backbone_name)
        inplanes = img_feat.shape[-1]
        if self.add_fc:
            f1 = nn.Dense(1024, name="depth_fc_d1")(img_feat)
            f2 = nn.Dense(512, name="depth_fc_d2")(f1)
            fmid = nn.leaky_relu(batch_norm(train, name="depth_bn")(f2))
            f3 = nn.Dense(1024, name="depth_fc_u2")(fmid)
            f3 = 0.5 * (f3 + f1)
            f4 = nn.Dense(inplanes, name="depth_fc_u1")(f3)
            img_feat = 0.5 * (f4 + img_feat)

        depth_num = len(self.kps_need_depth) if self.multi_kp else 1
        gamma = nn.Dense(depth_num, kernel_init=nn.initializers.normal(0.001),
                         bias_init=nn.initializers.zeros,
                         name="depth_layer")(img_feat)
        outputs = {}
        if self.multi_kp:
            pred_depths = gamma * jnp.reshape(k_value, (-1, 1)) / 1000.0
            root_index = list(self.kps_need_depth).index(
                self.reference_keypoint_id)
            pred_depth = pred_depths[:, root_index:root_index + 1]
            outputs["depths"] = pred_depths
        else:
            pred_depth = gamma * jnp.reshape(k_value, (-1, 1)) / 1000.0
        root_trans_from_rootnet = jnp.concatenate(
            [jnp.zeros((B, 2), pred_depth.dtype), pred_depth], axis=-1)

        # ---- keypoint (integral) branch (full_net.py:291-302) ----
        if self.backbone_name in _RESNETS:
            x_out = get_resnet(self.backbone_name, self.dtype,
                               name="reg_backbone",
                               remat=self.remat)(x_reg, train=train)
            xf = jnp.mean(x_out, axis=(1, 2))             # avgpool -> (B, C)
            y = x_out
            for i in range(3):
                y = nn.ConvTranspose(256, (4, 4), (2, 2), padding="SAME",
                                     use_bias=False, dtype=self.dtype,
                                     name=f"deconv{i}")(y)
                y = batch_norm(train, dtype=self.dtype, name=f"deconv{i}_bn")(y)
                y = nn.relu(y)
            hm = nn.Conv(self.num_keypoints * self.depth_dim, (1, 1),
                         kernel_init=nn.initializers.normal(
                             jnp.sqrt(2.0 / (self.num_keypoints *
                                             self.depth_dim))),
                         dtype=self.dtype, name="final_layer")(y)
        elif self.backbone_name in _HRNETS:
            hm, xf = get_hrnet(_hrnet_width(self.backbone_name),
                               num_joints=self.num_keypoints,
                               depth_dim=self.depth_dim, generate_hm=True,
                               generate_feat=True, dtype=self.dtype,
                               name="reg_backbone",
                               remat=self.remat)(x_reg, train=train)
            x_out = None
        else:
            raise NotImplementedError(self.backbone_name)

        # NHWC heatmap -> (B, K, D, H, W) ordering expected by the decoder
        hm_nchw = jnp.transpose(hm, (0, 3, 1, 2))
        use_pallas = self.use_pallas_integral
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() == "tpu"
        pred_uvd, pred_xyz_int = heatmap_integral_pose(
            hm_nchw, num_joints=self.num_keypoints, depth_dim=self.depth_dim,
            height_dim=heatmap_size, width_dim=heatmap_size,
            image_size=float(self.image_size), bbox_3d_shape=self.bbox_3d_shape,
            K=K, root_trans=root_trans_from_rootnet,
            rootid=self.reference_keypoint_id, fixroot=self.fix_root,
            use_pallas=use_pallas)
        pred_root_uv = (pred_uvd[:, self.reference_keypoint_id, :2] + 0.5) \
            * self.image_size

        # ---- root translation (full_net.py:305) ----
        pred_trans = uvz_to_xyz_singlepoint(pred_root_uv, pred_depth, K)

        # ---- joint angles (full_net.py:313-331) ----
        init_pose = jnp.broadcast_to(
            jnp.asarray(self.init_pose, jnp.float32), (B, self.dof))
        xf = xf.reshape(B, -1)
        if self.reg_joint_map:
            assert x_out is not None, "reg_joint_map needs a resnet backbone"
            y = x_out
            for i, ch in enumerate(self.joint_conv_dim):
                y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"joint_conv{i}")(y)
                y = batch_norm(train, dtype=self.dtype,
                               name=f"joint_conv{i}_bn")(y)
                y = nn.relu(y)
            jm = nn.Conv(self.dof, (1, 1), dtype=self.dtype,
                         name="joint_final_layer")(y)
            pred_pose = heatmap_integral_joint(
                jnp.transpose(jm, (0, 3, 1, 2)), dof=self.dof,
                joint_bounds=jnp.asarray(self.joint_bounds))
        else:
            fc_pose_1 = nn.Dense(1024, name="fc_pose_1")
            fc_pose_2 = nn.Dense(1024, name="fc_pose_2")
            decpose = nn.Dense(self.dof, name="decpose",
                               kernel_init=nn.initializers.xavier_uniform())
            drop1 = nn.Dropout(self.p_dropout, deterministic=not train)
            drop2 = nn.Dropout(self.p_dropout, deterministic=not train)
            pred_pose = init_pose
            for _ in range(self.n_iter):
                xc = jnp.concatenate([xf, pred_pose], axis=1)
                xc = drop1(fc_pose_1(xc))
                xc = drop2(fc_pose_2(xc))
                pred_pose = decpose(xc) + pred_pose

        # ---- rotation (full_net.py:333-378) ----
        init_rot = jnp.broadcast_to(
            jnp.asarray(self.init_rot, jnp.float32), (B, self.rotation_dim))
        if self.direct_reg_rot:
            fcs = [nn.Dense(1024, name=f"fc_rot_{i + 1}") for i in range(6)]
            xc1 = fcs[0](xf)
            xc = xc1
            for fc in fcs[1:]:
                xc = fc(xc)
            xc = xc + xc1
            pred_rot = nn.Dense(self.rotation_dim, name="decrot",
                                kernel_init=nn.initializers.xavier_uniform()
                                )(xc)
        else:
            fc_rot_1 = nn.Dense(1024, name="fc_rot_1")
            fc_rot_2 = nn.Dense(1024, name="fc_rot_2")
            decrot = nn.Dense(self.rotation_dim, name="decrot",
                              kernel_init=nn.initializers.xavier_uniform())
            drop1r = nn.Dropout(self.p_dropout, deterministic=not train)
            drop2r = nn.Dropout(self.p_dropout, deterministic=not train)
            pred_rot = init_rot
            for _ in range(self.n_iter):
                xc = jnp.concatenate([xf, pred_rot], axis=1)
                xc = drop1r(fc_rot_1(xc))
                xc = drop2r(fc_rot_2(xc))
                if self.rot_iterative_matmul:
                    pred_rot = rotmat_to_rot6d(
                        rot6d_to_rotmat(decrot(xc))
                        @ rot6d_to_rotmat(pred_rot))
                else:
                    pred_rot = decrot(xc) + pred_rot

        outputs.update(dict(pose=pred_pose, rot=pred_rot, trans=pred_trans,
                            root_uv=pred_root_uv, depth=pred_depth,
                            uvd=pred_uvd, xyz_int=pred_xyz_int))
        return outputs
