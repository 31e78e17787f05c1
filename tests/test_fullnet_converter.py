"""FullNet model-zoo converter coverage: synthesize the reference
RootNetwithRegInt state dict (full_net.py naming: reg_backbone resnet50 +
rootnet_backbone hrnet32 + deconv stack + heads) and require full coverage
of our FullNet parameter tree."""

import numpy as np

import jax
import jax.numpy as jnp

from horopose_tpu import constants as C
from horopose_tpu.models import FullNet
from horopose_tpu.tools.torch_weights import (
    convert_fullnet_reference_checkpoint, merge_into)

from test_hrnet_converter import _leaf_paths, synth_pose_hrnet_sd


def synth_torch_resnet50_sd(rng, prefix=""):
    sd = {}

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = rng.randn(o, i, k, k).astype(
            np.float32)

    def bn(name, c):
        for suffix, gen in (("weight", rng.rand), ("bias", rng.randn),
                            ("running_mean", rng.randn)):
            sd[f"{prefix}{name}.{suffix}"] = gen(c).astype(np.float32)
        sd[f"{prefix}{name}.running_var"] = (rng.rand(c) + 0.5).astype(
            np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for stage, (n, width) in enumerate(zip((3, 4, 6, 3),
                                           (64, 128, 256, 512))):
        for i in range(n):
            b = f"layer{stage + 1}.{i}"
            conv(f"{b}.conv1", width, in_ch if i == 0 else width * 4, 1)
            bn(f"{b}.bn1", width)
            conv(f"{b}.conv2", width, width, 3)
            bn(f"{b}.bn2", width)
            conv(f"{b}.conv3", width * 4, width, 1)
            bn(f"{b}.bn3", width * 4)
            if i == 0:
                conv(f"{b}.downsample.0", width * 4,
                     in_ch if stage == 0 else width * 2, 1)
                bn(f"{b}.downsample.1", width * 4)
        in_ch = width * 4
    return sd


def synth_fullnet_sd(rng, dof=8, nkpt=7, depth_dim=64):
    sd = {}
    sd.update(synth_torch_resnet50_sd(rng, prefix="reg_backbone."))
    hr = synth_pose_hrnet_sd(rng, num_joints=nkpt, depth_dim=depth_dim)
    # rootnet hrnet has no heatmap head (generate_hm=False)
    for k, v in hr.items():
        if k.startswith("final_layer"):
            continue
        sd[f"rootnet_backbone.{k}"] = v

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    # deconv stack (Sequential indices 0/1, 3/4, 6/7)
    chans = [2048, 256, 256, 256]
    for di, (ci, bi) in enumerate(((0, 1), (3, 4), (6, 7))):
        sd[f"deconv_layers.{ci}.weight"] = rng.randn(
            chans[di], chans[di + 1], 4, 4).astype(np.float32)
        for suffix, gen in (("weight", rng.rand), ("bias", rng.randn),
                            ("running_mean", rng.randn)):
            sd[f"deconv_layers.{bi}.{suffix}"] = gen(256).astype(np.float32)
        sd[f"deconv_layers.{bi}.running_var"] = (rng.rand(256) + 0.5).astype(
            np.float32)
    sd["final_layer.weight"] = rng.randn(nkpt * depth_dim, 256, 1, 1).astype(
        np.float32)
    sd["final_layer.bias"] = rng.randn(nkpt * depth_dim).astype(np.float32)

    feat = 2048
    lin("fc_pose_1", 1024, feat + dof)
    lin("fc_pose_2", 1024, 1024)
    lin("decpose", dof, 1024)
    lin("fc_rot_1", 1024, feat + 6)
    lin("fc_rot_2", 1024, 1024)
    lin("decrot", 6, 1024)
    sd["depth_layer.weight"] = rng.randn(1, 2048, 1, 1).astype(np.float32)
    sd["depth_layer.bias"] = rng.randn(1).astype(np.float32)
    return sd


def test_fullnet_checkpoint_converter_coverage(rng):
    model = FullNet(
        robot_type="panda", dof=8, num_keypoints=7, image_size=64,
        depth_dim=64, backbone_name="resnet50",
        rootnet_backbone_name="hrnet32",
        init_pose=tuple(C.initial_joint_vector("mean", "panda").tolist()))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    sd = synth_fullnet_sd(rng)
    tb = convert_fullnet_reference_checkpoint(sd, "resnet50", "hrnet32")
    new_vars = merge_into(variables, tb)
    want = set(_leaf_paths(variables["params"]))
    got = set(_leaf_paths(tb.params))
    missing = want - got
    assert not missing, sorted(missing)[:10]
    # converted model must run
    out = model.apply(new_vars, jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                      jnp.eye(3)[None], train=False)
    assert out["pose"].shape == (1, 8)
