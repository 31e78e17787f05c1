"""Differentiable soft silhouette rasterizer, TPU-native.

Replaces pytorch3d's SoftSilhouetteShader pipeline
(/root/reference/lib/utils/mesh_renderer.py:94-109: sigma=gamma=1e-8,
faces_per_pixel=100; only the alpha channel is consumed,
urdf_robot.py:257). The reference rasterizes ONE image at a time
(train_sim2real.py:413-416); here the whole batch renders in one fused
program.

Algorithm (soft rasterization, Liu et al. 2019 style):
  For every (pixel, face) pair: signed 2D distance d to the projected
  triangle (negative inside). Face coverage D = sigmoid(-sign(d) d^2 /
  sigma). Silhouette alpha = 1 - prod_f (1 - D_f), computed in log space:
  log(1 - D) = -softplus(-sign(d) d^2 / sigma), so
  alpha = 1 - exp(sum_f log(1 - D_f)) — numerically stable and fully
  differentiable to the vertices.

TPU mapping: pixels are processed in chunks via lax.map (dense
(chunk x faces) distance tiles live in VMEM-sized working sets and hit the
VPU); faces behind the camera are masked. No topology-dependent control
flow — everything is static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_faces_per_tile(value, n_faces) -> int:
    """Resolve the `raster_faces_per_tile` config knob to a tile budget.

    "auto"/None picks the measured-best budget for the mesh: 256 for
    coarse meshes (548-face panda primitives: overflow 0.0 and a 1.88x
    faster sim2real step than dense — scripts/bench_sim2real.py, round 4)
    and 384 for finely-tessellated meshes (7.9k-face OBJ sweep: 15.8x
    over dense at sub-percent overflow — PERF_NOTES round 2). An explicit
    integer wins; 0 forces the dense renderer. Budgets >= the face count
    are never useful (slower than dense: same pairs plus gather overhead).
    """
    if value in (None, "auto"):
        budget = 256 if int(n_faces) <= 2048 else 384
        # a budget >= the face count degenerates to dense-plus-gather
        # (measured slower than dense); use the exact dense path instead
        return 0 if budget >= int(n_faces) else budget
    return int(value)


def _edge_distance_sq(p, a, b):
    """Squared distance from points p (..., 2) to segment ab."""
    ab = b - a
    ap = p - a
    t = jnp.clip(jnp.sum(ap * ab, -1) /
                 jnp.maximum(jnp.sum(ab * ab, -1), 1e-12), 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = p - closest
    return jnp.sum(d * d, -1)


def _signed_dist_sq(pix, v0, v1, v2):
    """Signed squared distance of pixels to triangles.

    pix (P, 1, 2); v0/v1/v2 (1, F, 2). Returns (P, F): negative inside.
    """
    def edge_fn(a, b, p):
        return (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - \
               (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0])

    e0 = edge_fn(v0, v1, pix)
    e1 = edge_fn(v1, v2, pix)
    e2 = edge_fn(v2, v0, pix)
    # inside iff all edge functions share the triangle's orientation sign;
    # zero-area (degenerate) triangles can never contain a pixel
    area = edge_fn(v0, v1, v2)
    s = jnp.sign(area)
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) & \
        (jnp.abs(area) > 1e-9)
    # Sliver robustness: a triangle seen edge-on projects to a near-line;
    # ALL THREE edge functions are then ~0 for every pixel near that LINE
    # (arbitrarily far beyond the segment), and f32 rounding can flip the
    # sign tests to "inside", painting an alpha=1 streak across the image.
    # A genuinely interior pixel is never farther from the boundary than
    # the triangle's inradius <= its longest edge, so bound the interior
    # by the squared max edge length.
    emax2 = jnp.maximum(jnp.maximum(
        jnp.sum((v1 - v0) ** 2, -1),
        jnp.sum((v2 - v1) ** 2, -1)),
        jnp.sum((v0 - v2) ** 2, -1))
    d2 = jnp.minimum(jnp.minimum(
        _edge_distance_sq(pix, v0, v1),
        _edge_distance_sq(pix, v1, v2)),
        _edge_distance_sq(pix, v2, v0))
    inside = inside & (d2 <= emax2)
    return jnp.where(inside, -d2, d2)


def rasterize_silhouette(verts: jnp.ndarray, faces, K: jnp.ndarray,
                         image_hw, sigma: float = 1.0,
                         pixel_chunk: int = 2048) -> jnp.ndarray:
    """Soft silhouette.

    verts (B, V, 3) camera-frame vertices; faces (F, 3) static int array;
    K (B, 3, 3) or (3, 3); image_hw (H, W). sigma in pixel^2 units.
    Returns alpha (B, H, W) in [0, 1].
    """
    H, W = image_hw
    B = verts.shape[0]
    faces = jnp.asarray(faces)
    if K.ndim == 2:
        K = jnp.broadcast_to(K, (B, 3, 3))
    proj = jnp.einsum("bij,bvj->bvi", K, verts)
    z = proj[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv = proj[..., :2] / safe_z[..., None]

    tri_uv = uv[:, faces]                     # (B, F, 3, 2)
    tri_z = z[:, faces]                       # (B, F, 3)
    valid = jnp.all(tri_z > 1e-4, axis=-1)    # (B, F) in front of camera

    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H,W,2)
    pixels = grid.reshape(-1, 2)              # (P, 2)
    P = pixels.shape[0]
    n_chunks = -(-P // pixel_chunk)
    pad = n_chunks * pixel_chunk - P
    pixels = jnp.concatenate(
        [pixels, jnp.zeros((pad, 2), jnp.float32)], axis=0)
    pixel_chunks = pixels.reshape(n_chunks, pixel_chunk, 2)

    inv_sigma = 1.0 / sigma

    def render_one(tri_uv_b, valid_b):
        v0 = tri_uv_b[None, :, 0]
        v1 = tri_uv_b[None, :, 1]
        v2 = tri_uv_b[None, :, 2]

        # checkpoint: without it the scan under the batch vmap stacks the
        # (B, C, F) distance/logit residuals for every chunk — the full
        # (B, P, F) tensor times several — and a 480x640 sim2real step
        # OOMs 16 GB HBM by ~60 GB. Recomputing the distances in the
        # backward keeps the residuals at (B, C) per chunk.
        @jax.checkpoint
        def chunk_fn(pix):
            sd2 = _signed_dist_sq(pix[:, None, :], v0, v1, v2)  # (C, F)
            logits = -sd2 * inv_sigma
            # log(1 - sigmoid(logits)) = -softplus(logits)
            log_one_minus = -jax.nn.softplus(logits)
            log_one_minus = jnp.where(valid_b[None, :], log_one_minus, 0.0)
            return 1.0 - jnp.exp(jnp.sum(log_one_minus, axis=-1))   # (C,)

        alpha = jax.lax.map(chunk_fn, pixel_chunks)     # (n_chunks, C)
        return alpha.reshape(-1)[:P].reshape(H, W)

    return jax.vmap(render_one)(tri_uv, valid)


def rasterize_silhouette_tiled(verts: jnp.ndarray, faces, K: jnp.ndarray,
                               image_hw, sigma: float = 1.0,
                               tile: int = 16,
                               faces_per_tile: int = 192,
                               return_overflow: bool = False):
    """Tile-culled soft silhouette — same math as rasterize_silhouette but
    each `tile`x`tile` pixel block only evaluates the faces whose
    screen-space bbox (plus a halo) intersects it.

    The cutoff is exact to f32: a face whose squared distance to every
    pixel of the tile exceeds halo^2 = 37*sigma contributes
    softplus(-37) < 1e-16 to the log-space union. Faces are ranked by
    bbox-center proximity so, if more than `faces_per_tile` faces overlap
    a tile (dense close-ups), the farthest are dropped first — pick
    `faces_per_tile` generously vs the mesh (tests compare against the
    dense renderer). Work drops from P*F to P*faces_per_tile pairs.

    For finely-tessellated meshes (real OBJ link meshes, 10k+ small faces)
    the win is ~F/faces_per_tile (15.8x measured at 7.9k faces). Round-4
    measurement overturned the round-2 assumption that coarse primitive
    meshes should stay dense: at the production sim2real config (548-face
    panda primitives, b16, 240x320) per-tile face counts never exceed 128
    (overflow 0.0) and faces_per_tile=256 runs the full training step
    1.88x faster than dense (scripts/bench_sim2real.py) — budgets at or
    above the face count are slower than dense (per-tile gather overhead),
    so pick ~half the face count or use resolve_faces_per_tile. With
    return_overflow=True also returns the fraction of tiles whose
    overlapping-face count exceeded faces_per_tile (0.0 == exact);
    pipelines log it so a too-small budget is visible, not silent.
    """
    H, W = image_hw
    B = verts.shape[0]
    faces = jnp.asarray(faces)
    F = faces.shape[0]
    Kf = min(faces_per_tile, F)
    if K.ndim == 2:
        K = jnp.broadcast_to(K, (B, 3, 3))
    proj = jnp.einsum("bij,bvj->bvi", K, verts)
    z = proj[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv = proj[..., :2] / safe_z[..., None]

    tri_uv = uv[:, faces]                      # (B, F, 3, 2)
    tri_z = z[:, faces]
    valid = jnp.all(tri_z > 1e-4, axis=-1)     # (B, F)

    th, tw = -(-H // tile), -(-W // tile)
    halo = jnp.sqrt(37.0 * sigma) + 1.0

    # face screen bboxes + halo
    fmin = tri_uv.min(axis=2) - halo           # (B, F, 2) xy
    fmax = tri_uv.max(axis=2) + halo

    # tile rects (T, 2): origin xy; T = th*tw
    ty = jnp.arange(th, dtype=jnp.float32) * tile
    tx = jnp.arange(tw, dtype=jnp.float32) * tile
    torig = jnp.stack(
        jnp.meshgrid(tx, ty, indexing="xy"), axis=-1).reshape(-1, 2)
    T = torig.shape[0]

    # overlap (B, T, F): 1-D interval tests on x and y
    ox = (fmin[:, None, :, 0] <= torig[None, :, None, 0] + tile) & \
         (fmax[:, None, :, 0] >= torig[None, :, None, 0])
    oy = (fmin[:, None, :, 1] <= torig[None, :, None, 1] + tile) & \
         (fmax[:, None, :, 1] >= torig[None, :, None, 1])
    overlap = ox & oy & valid[:, None, :]

    # rank: overlapping faces by bbox-center distance to the tile center
    fcent = (fmin + fmax) * 0.5                # (B, F, 2)
    tcent = torig + tile * 0.5                 # (T, 2)
    d2c = jnp.sum((fcent[:, None] - tcent[None, :, None]) ** 2, -1)
    score = jnp.where(overlap, -d2c, -jnp.inf)  # (B, T, F)
    _, idx = jax.lax.top_k(score, Kf)           # (B, T, Kf)
    sel_valid = jnp.take_along_axis(overlap, idx, axis=2)  # (B, T, Kf)
    overflow = jnp.mean((jnp.sum(overlap, axis=2) > Kf).astype(jnp.float32))

    tri_sel = jnp.take_along_axis(
        tri_uv[:, None], idx[..., None, None], axis=2)  # (B, T, Kf, 3, 2)

    # per-tile pixel grid (T, tile*tile, 2), pixel centers
    py = jnp.arange(tile, dtype=jnp.float32) + 0.5
    px = jnp.arange(tile, dtype=jnp.float32) + 0.5
    tgrid = jnp.stack(jnp.meshgrid(px, py, indexing="xy"),
                      axis=-1).reshape(-1, 2)           # (tile*tile, 2)
    pix_tiles = torig[:, None, :] + tgrid[None]         # (T, tp, 2)

    inv_sigma = 1.0 / sigma

    def render_one(tri_b, val_b):
        # tri_b (T, Kf, 3, 2); val_b (T, Kf)
        @jax.checkpoint
        def tile_fn(args):
            tri_t, val_t, pix_t = args                  # per tile
            v0 = tri_t[None, :, 0]
            v1 = tri_t[None, :, 1]
            v2 = tri_t[None, :, 2]
            sd2 = _signed_dist_sq(pix_t[:, None, :], v0, v1, v2)
            log_one_minus = -jax.nn.softplus(-sd2 * inv_sigma)
            log_one_minus = jnp.where(val_t[None, :], log_one_minus, 0.0)
            return 1.0 - jnp.exp(jnp.sum(log_one_minus, axis=-1))  # (tp,)

        alpha = jax.lax.map(tile_fn, (tri_b, val_b, pix_tiles))  # (T, tp)
        img = alpha.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
        return img.reshape(th * tile, tw * tile)[:H, :W]

    out = jax.vmap(render_one)(tri_sel, sel_valid)
    if return_overflow:
        return out, overflow
    return out


def render_robot_silhouette(robot, robot_mesh, cfg: jnp.ndarray,
                            rot: jnp.ndarray, trans: jnp.ndarray,
                            K: jnp.ndarray, image_hw,
                            root: int = 0, sigma: float = 1.0,
                            detach_joints: bool = True,
                            faces_per_tile: int = 0,
                            return_overflow: bool = False):
    """Batched robot silhouette for the sim2real mask loss.

    Mirrors get_rendered_mask_single_image_at_specific_root
    (urdf_robot.py:259-275): (rot, trans) place keypoint-link `root` in the
    camera; FK poses the link meshes; joints are detached from the mask
    gradient (TWL_base .detach() at urdf_robot.py:270) so the mask loss
    drives only the root pose — unless detach_joints=False.
    """
    from horopose_tpu.ops.rotations import make_T, rot_to_rotmat, invert_T

    link_poses = robot.plan.link_poses(cfg)           # (B, L, 4, 4)
    if detach_joints:
        link_poses = jax.lax.stop_gradient(link_poses)
    root2cam = make_T(rot_to_rotmat(rot), trans)      # (B, 4, 4)
    if root != 0:
        root_pose = link_poses[:, robot._kp_link_idx[root]]
        base2cam = root2cam @ invert_T(root_pose)
    else:
        base2cam = root2cam
    world = jnp.einsum("bij,bljk->blik", base2cam, link_poses)  # (B,L,4,4)
    vl = jnp.asarray(robot_mesh.vert_link)
    Rv = world[:, vl, :3, :3]                         # (B, V, 3, 3)
    tv = world[..., :3, 3][:, vl]                     # (B, V, 3)
    v_local = jnp.asarray(robot_mesh.verts)
    v_cam = jnp.einsum("bvij,vj->bvi", Rv, v_local) + tv
    if faces_per_tile and faces_per_tile > 0:
        out = rasterize_silhouette_tiled(v_cam, robot_mesh.faces, K,
                                         image_hw, sigma=sigma,
                                         faces_per_tile=faces_per_tile,
                                         return_overflow=True)
        return out if return_overflow else out[0]
    alpha = rasterize_silhouette(v_cam, robot_mesh.faces, K, image_hw,
                                 sigma=sigma)
    return (alpha, jnp.zeros(())) if return_overflow else alpha
