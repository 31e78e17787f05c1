"""NUMERIC torch<->flax parity for the stage-1 DepthNet (RootNet), using
the reference's own module (/root/reference/lib/models/depth_net.py:11-168)
with every optional head enabled (pred_xy deconv+soft-argmax branch,
add_fc bottleneck with BatchNorm1d, offset head), randomized weights AND
BN stats, converted via convert_rootnet_reference_checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_torch import (randomize_state_dict, rel_err, setup_reference_imports,
                       to_numpy_sd)


@pytest.fixture(scope="module")
def ref_depth_net():
    setup_reference_imports()
    import models.backbones.Resnet as ref_resnet
    import models.depth_net as ref_depth
    ref_resnet.ResNet.init_weights = lambda self, name: None
    return ref_depth


def test_depthnet_full_options_numeric_parity(ref_depth_net, rng):
    import torch
    from horopose_tpu.models.depth_net import RootNet
    from horopose_tpu.tools.torch_weights import (
        convert_rootnet_reference_checkpoint, merge_into)

    S = 64
    tmodel = ref_depth_net.RootNet("resnet50", pred_xy=True, use_offset=True,
                                   add_fc=True, input_shape=(S, S))
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()

    B = 2
    x = rng.rand(B, S, S, 3).astype(np.float32)
    k = (rng.rand(B) * 1000 + 800).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k)).numpy()   # (B, 3) x,y,depth

    fmodel = RootNet(backbone_name="resnet50", pred_xy=True, use_offset=True,
                     add_fc=True, input_size=S)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                            jnp.ones((1,)), train=False)
    tb = convert_rootnet_reference_checkpoint(to_numpy_sd(tmodel),
                                              "resnet50")
    variables = merge_into(variables, tb)
    f_out = fmodel.apply(variables, jnp.asarray(x), jnp.asarray(k),
                         train=False)
    assert f_out.shape == t_out.shape == (B, 3)
    err = rel_err(f_out, t_out)
    assert err < 2e-4, f"rootnet out rel err {err}"


def test_depthnet_hrnet_backbone_numeric_parity(ref_depth_net, rng):
    """hrnet32-backboned DepthNet (the shipped stage-1 default)."""
    import os
    import torch
    from horopose_tpu.models.depth_net import RootNet
    from horopose_tpu.tools.torch_weights import (
        convert_rootnet_reference_checkpoint, merge_into)
    import models.backbones.HRnet as ref_hrnet
    ref_hrnet.PoseHighResolutionNet.init_weights = \
        lambda self, pretrained="": None

    S = 64
    cwd = os.getcwd()
    os.chdir("/root/reference")   # get_hrnet reads ./lib/.../hrnet_w32.yaml
    try:
        tmodel = ref_depth_net.RootNet("hrnet32", input_shape=(S, S))
    finally:
        os.chdir(cwd)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()

    B = 2
    x = rng.rand(B, S, S, 3).astype(np.float32)
    k = (rng.rand(B) * 1000 + 800).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k)).numpy()

    fmodel = RootNet(backbone_name="hrnet32", input_size=S)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                            jnp.ones((1,)), train=False)
    variables = merge_into(variables, convert_rootnet_reference_checkpoint(
        to_numpy_sd(tmodel), "hrnet32"))
    f_out = fmodel.apply(variables, jnp.asarray(x), jnp.asarray(k),
                         train=False)
    err = rel_err(f_out, t_out)
    assert err < 2e-4, f"rootnet(hrnet32) rel err {err}"
