"""Spatial (latency-mode) sharding equivalence: splitting the image H
dimension over a 'spatial' mesh axis must reproduce the single-device
forward bit-for-tolerance — XLA's SPMD partitioner handles the conv halo
exchanges, so correctness here is about our sharding annotations, padding
and trim logic (predictor._device_args, parallel.image_sharding).

The reference has no analog (its only multi-device mode is DataParallel,
lib/core/function.py:100-102); spatial partitioning is the TPU-native
lever for small-batch latency, where there is no batch to split.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horopose_tpu import constants as C
from horopose_tpu.config import make_default_cfg
from horopose_tpu.models import FullNet
from horopose_tpu.parallel import make_mesh, shard_images


def _small_cfg(size=32):
    cfg = make_default_cfg()
    cfg.image_size = float(size)
    cfg.rootnet_image_size = float(size)
    cfg.other_image_size = float(size)
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    return cfg


def _small_model(size=32):
    return FullNet(robot_type="panda", dof=8, num_keypoints=7,
                   image_size=size, depth_dim=8,
                   backbone_name="resnet18",
                   rootnet_backbone_name="resnet18",
                   init_pose=tuple(C.initial_joint_vector(
                       "mean", "panda").tolist()))


def _init_and_inputs(size=32, B=2):
    model = _small_model(size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, size, size, 3))
    k = jnp.full((B,), 1000.0)
    K = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
        jnp.float32), (B, 3, 3))
    variables = model.init({"params": rng, "dropout": rng}, x, x, k, K,
                           train=False)
    return model, variables, x, k, K


def _forward(model, variables, x, k, K):
    out = model.apply(variables, x, x, k, K, train=False)
    return {t: out[t] for t in ("pose", "rot", "trans", "depth", "xyz_int")}


@pytest.mark.parametrize("axis_names,shape", [
    (("spatial",), (8,)),          # pure latency mesh
    (("data", "spatial"), (2, 4)),  # hybrid throughput x latency grid
])
def test_spatial_sharded_forward_matches_single_device(axis_names, shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    size, B = 32, 2
    model, variables, x, k, K = _init_and_inputs(size, B)

    ref = jax.jit(lambda v, x, k, K: _forward(model, v, x, k, K))(
        variables, x, k, K)

    mesh = make_mesh(axis_names=axis_names, shape=shape)
    from horopose_tpu.parallel import data_sharding, replicate
    v8 = replicate(variables, mesh)
    xs = shard_images(np.asarray(x), mesh)
    # H really is split over the spatial axis (not silently replicated)
    n_sp = dict(zip(mesh.axis_names, mesh.devices.shape))["spatial"]
    assert xs.sharding.shard_shape(xs.shape)[1] == size // n_sp
    ds = data_sharding(mesh)
    out = jax.jit(lambda v, x, k, K: _forward(model, v, x, k, K))(
        v8, xs, jax.device_put(k, ds), jax.device_put(K, ds))

    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   atol=5e-5, rtol=1e-4, err_msg=t)


def test_predictor_spatial_mesh_end_to_end():
    """Predictor with a spatial mesh: full frames in, same outputs as the
    meshless predictor (exercises _device_args padding + image sharding)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    from horopose_tpu.predictor import Predictor

    size = 32
    cfg = _small_cfg(size)
    base = Predictor(cfg, None, dtype=None)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, size, size, 3))
    variables = base.model.init({"params": rng, "dropout": rng}, dummy,
                                dummy, jnp.ones((1,)), jnp.eye(3)[None],
                                train=False)
    base.variables = variables

    mesh = make_mesh(axis_names=("data", "spatial"), shape=(2, 4))
    sharded = Predictor(cfg, variables, dtype=None, mesh=mesh)

    r = np.random.RandomState(5)
    B, H, W = 3, 48, 64  # B=3 forces data-axis padding (pad=1)
    frames = r.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))

    out1 = base(frames, K)
    out8 = sharded(frames, K)
    for t in ("joints", "rotation", "translation", "keypoints_3d"):
        assert out8[t].shape == out1[t].shape, t
        np.testing.assert_allclose(out1[t], out8[t], atol=5e-5, rtol=1e-4,
                                   err_msg=t)
