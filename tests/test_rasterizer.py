"""Rasterizer: analytic silhouettes, IoU checks, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.kinematics import Robot
from horopose_tpu.kinematics.meshes import (box_mesh, build_robot_mesh,
                                            sphere_mesh)
from horopose_tpu.ops.rasterizer import (rasterize_silhouette,
                                         render_robot_silhouette)


def simple_K(f=100.0, cx=32.0, cy=32.0):
    return jnp.asarray([[f, 0, cx], [0, f, cy], [0, 0, 1]], jnp.float32)


def test_square_silhouette_area():
    """A fronto-parallel unit square at z=2, f=100 -> 50x50 px footprint."""
    v, f = box_mesh((1.0, 1.0, 0.01))
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64), sigma=0.05)
    a = np.asarray(alpha)[0]
    # expected: 50 x 50 = 2500 px inside (small sigma -> sharp edges)
    area = (a > 0.5).sum()
    assert abs(area - 2500) < 2500 * 0.05, area
    # center on, corner off
    assert a[32, 32] > 0.9
    assert a[2, 2] < 0.1


def test_sphere_silhouette_circle():
    v, f = sphere_mesh(0.3, n=16)
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64), sigma=0.05)
    a = np.asarray(alpha)[0]
    r_px = 0.3 / 2.0 * 100
    area = (a > 0.5).sum()
    assert abs(area - np.pi * r_px ** 2) < np.pi * r_px ** 2 * 0.12


def test_behind_camera_culled():
    v, f = box_mesh((1.0, 1.0, 0.01))
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, -2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (32, 32), sigma=0.25)
    assert float(jnp.max(alpha)) < 1e-3


def test_gradient_moves_silhouette():
    """d(mask MSE)/d(translation) must push the object toward the target."""
    v, f = box_mesh((0.5, 0.5, 0.01))
    target_v = jnp.asarray(v)[None] + jnp.asarray([0.2, 0.0, 2.0])
    target = rasterize_silhouette(target_v, f, simple_K(), (64, 64),
                                  sigma=1.0)

    def loss(dx):
        verts = jnp.asarray(v)[None] + jnp.asarray([dx, 0.0, 2.0])
        alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64),
                                     sigma=1.0)
        return jnp.mean((alpha - target) ** 2)

    g = jax.grad(loss)(0.0)
    assert np.isfinite(float(g))
    # at dx=0 the object sits left of the target -> gradient negative
    # (moving +x reduces loss)
    assert float(g) < 0


def test_robot_silhouette_renders():
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    assert mesh.num_faces > 100
    B = 2
    cfg = jnp.zeros((B, 8))
    rot = jnp.asarray([[1, 0, 0, 0, 1, 0]] * B, jnp.float32)
    trans = jnp.asarray([[0, 0, 1.5]] * B, jnp.float32)
    K = jnp.asarray([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]])
    alpha = render_robot_silhouette(robot, mesh, cfg, rot, trans, K,
                                    (60, 80), root=0, sigma=1.0)
    a = np.asarray(alpha)
    assert a.shape == (B, 60, 80)
    cover = (a[0] > 0.5).mean()
    assert 0.02 < cover < 0.9, cover


def test_robot_silhouette_root_reframe_consistency():
    """Rendering with a root-frame pose must match rendering with the
    equivalent base-frame pose."""
    from horopose_tpu.ops.rotations import (make_T, rot6d_to_rotmat,
                                            rotmat_to_rot6d)
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    cfg = jnp.full((1, 8), 0.2)
    rot = jnp.asarray([[1, 0, 0, 0, 1, 0]], jnp.float32)
    trans = jnp.asarray([[0, 0, 1.5]], jnp.float32)
    base = render_robot_silhouette(robot, mesh, cfg, rot, trans,
                                   simple_K(120.0, 40, 30), (60, 80),
                                   root=0, sigma=1.0)
    TWL = robot.get_TWL(cfg)
    root = 3
    base2cam = make_T(rot6d_to_rotmat(rot), trans)
    root_pose = base2cam @ TWL[:, root]
    rot_r = rotmat_to_rot6d(root_pose[:, :3, :3])
    trans_r = root_pose[:, :3, 3]
    reframed = render_robot_silhouette(robot, mesh, cfg, rot_r, trans_r,
                                       simple_K(120.0, 40, 30), (60, 80),
                                       root=root, sigma=1.0)
    np.testing.assert_allclose(np.asarray(reframed), np.asarray(base),
                               atol=1e-3)


def test_sliver_face_does_not_streak():
    """A triangle seen edge-on projects to a near-line; all three edge
    functions are ~0 for pixels anywhere near that LINE, and f32 rounding
    used to flip the inside test, painting alpha=1 streaks across the
    image far beyond the segment (found via the tiled renderer, which was
    immune by construction). Regression: a dense sphere's silhouette must
    be zero away from its projected disk."""
    import numpy as np
    from horopose_tpu.kinematics.meshes import sphere_mesh
    from horopose_tpu.ops.rasterizer import rasterize_silhouette

    v, f = sphere_mesh(0.06, n=24)
    vc = jnp.asarray(v.astype(np.float32) + [0, 0, 0.8])[None]
    K = jnp.asarray([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]],
                    jnp.float32)
    a = np.asarray(rasterize_silhouette(vc, np.asarray(f, np.int32), K,
                                        (240, 320)))[0]
    # sphere projects to a disk of radius ~21 px at (160, 120); everything
    # farther than 40 px must be (soft-tail) zero
    yy, xx = np.mgrid[0:240, 0:320]
    far = (yy - 120) ** 2 + (xx - 160) ** 2 > 40 ** 2
    assert a[far].max() < 1e-4, a[far].max()
    # and the disk itself is rendered
    assert a[~far].sum() > 1000


def test_tiled_rasterizer_matches_dense():
    """Tile-culled renderer == dense renderer (values AND gradients) on a
    spread-out fine mesh where the per-tile face budget holds, and the
    overflow diagnostic is 0 there / positive when the budget is absurd."""
    import numpy as np
    from horopose_tpu.kinematics.meshes import sphere_mesh
    from horopose_tpu.ops.rasterizer import (rasterize_silhouette,
                                             rasterize_silhouette_tiled)

    parts, base = [], 0
    verts_l, faces_l = [], []
    for o in np.array([[-0.45, -0.2, 0], [0.1, 0.25, 0.3], [0.55, -0.1, 0.6],
                       [0.25, 0.45, 0.15]]):
        v, f = sphere_mesh(0.3, n=16)
        verts_l.append(v + o)
        faces_l.append(f + base)
        base += len(v)
    verts = np.concatenate(verts_l).astype(np.float32)
    faces = np.concatenate(faces_l).astype(np.int32)
    K = jnp.asarray([[180.0, 0, 160.0], [0, 180.0, 120.0], [0, 0, 1.0]],
                    jnp.float32)
    vb = jnp.asarray(verts + [0, 0, 1.2])[None]

    dense = rasterize_silhouette(vb, faces, K, (240, 320))
    tiled, ovf = rasterize_silhouette_tiled(vb, faces, K, (240, 320),
                                            faces_per_tile=256,
                                            return_overflow=True)
    # the flag counts bbox-overlap, a conservative proxy: a few flagged
    # tiles only dropped negligible-tail faces, so values still match
    assert float(ovf) < 0.02, float(ovf)
    assert float(jnp.abs(dense - tiled).max()) < 1e-5

    gd = jax.grad(lambda v: (rasterize_silhouette(v, faces, K,
                                                  (240, 320)) ** 2).sum())(vb)
    gt = jax.grad(lambda v: (rasterize_silhouette_tiled(
        v, faces, K, (240, 320), faces_per_tile=256) ** 2).sum())(vb)
    assert float(jnp.abs(gd - gt).max()) < 1e-3, \
        float(jnp.abs(gd - gt).max())

    # absurdly small budget on a dense blob must raise the overflow flag
    _, ovf_small = rasterize_silhouette_tiled(vb, faces, K, (240, 320),
                                              faces_per_tile=16,
                                              return_overflow=True)
    assert float(ovf_small) > 0.0


def test_resolve_faces_per_tile():
    """"auto" picks the measured-best tile budget per mesh size; explicit
    ints (including 0 = dense) always win (config default is "auto")."""
    from horopose_tpu.ops.rasterizer import resolve_faces_per_tile as r
    assert r("auto", 548) == 256        # panda primitives
    assert r(None, 548) == 256
    assert r("auto", 13248) == 384      # fine OBJ meshes
    assert r(0, 548) == 0               # explicit dense
    assert r(192, 13248) == 192         # explicit budget
    # auto on tiny meshes (budget >= F) degenerates to dense-plus-gather,
    # measured slower than dense -> auto falls back to the exact dense path
    assert r("auto", 100) == 0
    assert r("auto", 256) == 0
    assert r("auto", 257) == 256
