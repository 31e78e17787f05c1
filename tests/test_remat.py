"""cfg.remat (per-block jax.checkpoint in both backbones) must be a pure
memory/compute trade: identical param tree (checkpoint interop), identical
forward, matching gradients and BN running-stat updates. The reference has
no rematerialization (torch stores all activations); this is the TPU-native
knob for fitting larger training batches (SURVEY §3 HBM notes)."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.models import FullNet


def _model(remat, size=32):
    return FullNet(robot_type="panda", dof=8, num_keypoints=7,
                   image_size=size, depth_dim=8,
                   backbone_name="resnet18",
                   rootnet_backbone_name="hrnet32",
                   remat=remat,
                   init_pose=tuple(C.initial_joint_vector(
                       "mean", "panda").tolist()))


def test_remat_is_numerically_invisible():
    size, B = 32, 2
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, size, size, 3))
    k = jnp.full((B,), 1000.0)
    K = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]], jnp.float32), (B, 3, 3))

    m0, m1 = _model(False), _model(True)
    v0 = m0.init({"params": rng, "dropout": rng}, x, x, k, K, train=False)
    v1 = m1.init({"params": rng, "dropout": rng}, x, x, k, K, train=False)

    # identical parameter tree: remat checkpoints load into non-remat
    # models and vice versa
    t0 = jax.tree.structure(v0)
    t1 = jax.tree.structure(v1)
    assert t0 == t1
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval-mode forward: bit-identical program modulo scheduling
    o0 = jax.jit(lambda v: m0.apply(v, x, x, k, K, train=False))(v0)
    o1 = jax.jit(lambda v: m1.apply(v, x, x, k, K, train=False))(v0)
    for t in o0:
        np.testing.assert_allclose(np.asarray(o0[t]), np.asarray(o1[t]),
                                   atol=1e-6, rtol=1e-6, err_msg=t)

    # train-mode grads + BN running-stat updates
    def loss_fn(model):
        def f(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": v0["batch_stats"]},
                x, x, k, K, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])
            l = (out["pose"].sum() + out["rot"].sum() +
                 out["xyz_int"].sum() + out["depth"].sum())
            return l, mut["batch_stats"]
        return jax.jit(jax.value_and_grad(f, has_aux=True))

    (l0, bs0), g0 = loss_fn(m0)(v0["params"])
    (l1, bs1), g1 = loss_fn(m1)(v0["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
