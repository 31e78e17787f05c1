"""Loss-engine numerical parity: compute_full_losses vs an independent
torch oracle implementing the reference's loss semantics
(lib/core/function.py:191-311) — elementwise losses, masked l2norms with
valid-count normalization, the trans outlier downweight, and the weighted
sum."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from horopose_tpu.config import make_default_cfg  # noqa: E402
from horopose_tpu.core.engine import compute_full_losses  # noqa: E402


def make_inputs(rng, B=6, K=7, dof=8):
    preds = dict(
        pose=rng.randn(B, dof).astype(np.float32),
        rot=rng.randn(B, 6).astype(np.float32),
        trans=(rng.randn(B, 3) * 0.1 + [0, 0, 1.5]).astype(np.float32),
        root_uv=rng.uniform(0, 256, (B, 2)).astype(np.float32),
        depth=rng.uniform(1, 2, (B, 1)).astype(np.float32),
        xyz_int=(rng.randn(B, K, 3) * 0.2 + [0, 0, 1.5]).astype(np.float32),
        xyz_fk=(rng.randn(B, K, 3) * 0.2 + [0, 0, 1.5]).astype(np.float32),
    )
    gts = dict(
        gt_pose=rng.randn(B, dof).astype(np.float32),
        gt_root_rot=rng.randn(B, 6).astype(np.float32),
        gt_root_trans=(rng.randn(B, 3) * 0.1 + [0, 0, 1.5]).astype(
            np.float32),
        gt_root_depth=rng.uniform(1, 2, (B, 1)).astype(np.float32),
        gt_root_uv=rng.uniform(0, 256, (B, 2)).astype(np.float32),
        gt_keypoints3d=(rng.randn(B, K, 3) * 0.2 + [0, 0, 1.5]).astype(
            np.float32),
        gt_keypoints2d=rng.uniform(0, 256, (B, K, 2)).astype(np.float32),
        valid_mask_crop=(rng.rand(B, K) > 0.2).astype(np.float32),
    )
    other_K = np.tile(np.asarray([[320.0, 0, 128], [0, 320.0, 128],
                                  [0, 0, 1]], np.float32)[None], (B, 1, 1))
    return preds, gts, other_K


def torch_oracle(cfg, preds, gts, other_K):
    t = {k: torch.from_numpy(v) for k, v in preds.items()}
    g = {k: torch.from_numpy(v) for k, v in gts.items()}
    Km = torch.from_numpy(other_K)
    S = float(cfg.image_size)
    mse = torch.nn.MSELoss()
    l1 = torch.nn.L1Loss()
    sl1 = torch.nn.SmoothL1Loss()
    funcs = {"mse": mse, "l1": l1, "smoothl1": sl1}

    loss_pose = funcs[cfg.pose_loss_func](t["pose"], g["gt_pose"])
    loss_rot = funcs[cfg.rot_loss_func](t["rot"], g["gt_root_rot"])
    loss_depth = funcs[cfg.depth_loss_func](t["depth"], g["gt_root_depth"])

    ref = cfg.reference_keypoint_id
    m = g["valid_mask_crop"][:, ref]
    err_uv = torch.norm((t["root_uv"] - g["gt_root_uv"]) / S, dim=1)
    loss_uv = torch.sum(err_uv * m) / torch.sum(m != 0)

    err_t = torch.norm(t["trans"] - g["gt_root_trans"], dim=1)
    loss_trans = err_t.mean()
    if loss_trans > 0.5:
        coeff = torch.exp(-20.0 * err_t).detach()
        loss_trans = (err_t * coeff).mean()

    def project(xyz):
        p = torch.einsum("bij,bnj->bni", Km, xyz)
        return p[..., :2] / p[..., 2:3]

    vm = g["valid_mask_crop"]
    loss_e3d = torch.norm(t["xyz_fk"] - g["gt_keypoints3d"], dim=2).mean()
    gt2n = g["gt_keypoints2d"] / S
    e2d = torch.norm(project(t["xyz_fk"]) / S - gt2n, dim=2)
    loss_e2d = torch.sum(e2d * vm) / torch.sum(vm != 0)
    e2di = torch.norm(project(t["xyz_int"]) / S - gt2n, dim=2)
    loss_e2di = torch.sum(e2di * vm) / torch.sum(vm != 0)
    loss_e3di = torch.norm(t["xyz_int"] - g["gt_keypoints3d"], dim=2).mean()
    loss_align = torch.norm(t["xyz_fk"] - t["xyz_int"], dim=2).mean()

    total = (cfg.pose_loss_weight * loss_pose +
             cfg.rot_loss_weight * loss_rot +
             cfg.uv_loss_weight * loss_uv +
             cfg.depth_loss_weight * loss_depth +
             cfg.trans_loss_weight * loss_trans +
             cfg.kp2d_loss_weight * loss_e2d +
             cfg.kp3d_loss_weight * loss_e3d +
             cfg.kp2d_int_loss_weight * loss_e2di +
             cfg.kp3d_int_loss_weight * loss_e3di +
             cfg.align_3d_loss_weight * loss_align)
    return dict(loss=float(total), loss_joint=float(loss_pose),
                loss_rot=float(loss_rot), loss_uv=float(loss_uv),
                loss_depth=float(loss_depth), loss_trans=float(loss_trans),
                loss_error2d=float(loss_e2d), loss_error3d=float(loss_e3d),
                loss_error2d_int=float(loss_e2di),
                loss_error3d_int=float(loss_e3di),
                loss_error3d_align=float(loss_align))


@pytest.mark.parametrize("pose_fn,rot_fn,depth_fn", [
    ("mse", "mse", "l1"),
    ("smoothl1", "l1", "mse"),
    ("l1", "smoothl1", "smoothl1"),
])
def test_loss_engine_matches_torch_oracle(rng, pose_fn, rot_fn, depth_fn):
    cfg = make_default_cfg()
    cfg.pose_loss_func = pose_fn
    cfg.rot_loss_func = rot_fn
    cfg.depth_loss_func = depth_fn
    for k in ("pose", "rot", "trans", "uv"):
        cfg[f"{k}_loss_weight"] = 1.0
    for k in ("depth", "kp2d", "kp3d", "kp2d_int", "kp3d_int", "align_3d"):
        cfg[f"{k}_loss_weight"] = 10.0
    preds, gts, other_K = make_inputs(rng)
    jl, jdict = compute_full_losses(
        cfg, {k: jnp.asarray(v) for k, v in preds.items()},
        {k: jnp.asarray(v) for k, v in gts.items()}, jnp.asarray(other_K))
    oracle = torch_oracle(cfg, preds, gts, other_K)
    np.testing.assert_allclose(float(jl), oracle["loss"], rtol=2e-5)
    for k, v in jdict.items():
        np.testing.assert_allclose(float(v), oracle[k], rtol=2e-5,
                                   err_msg=k)


def test_trans_outlier_downweight_branch(rng):
    """Force the >0.5m branch and verify the exp(-20 err) re-weighting."""
    cfg = make_default_cfg()
    cfg.trans_loss_weight = 1.0
    preds, gts, other_K = make_inputs(rng)
    preds = dict(preds)
    preds["trans"] = gts["gt_root_trans"] + np.asarray([2.0, 0, 0],
                                                       np.float32)
    jl, jdict = compute_full_losses(
        cfg, {k: jnp.asarray(v) for k, v in preds.items()},
        {k: jnp.asarray(v) for k, v in gts.items()}, jnp.asarray(other_K))
    expect = float(np.mean(2.0 * np.exp(-20.0 * 2.0)))
    np.testing.assert_allclose(float(jdict["loss_trans"]), expect,
                               rtol=1e-4)
