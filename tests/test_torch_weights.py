"""Weight converter mechanics: synthesize a torch-style state dict with the
expected names/shapes, convert, and verify it merges into a real init tree
with every leaf replaced."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from horopose_tpu.models.resnet import get_resnet
from horopose_tpu.tools.torch_weights import convert_resnet, merge_into


def synth_torch_resnet50_sd(rng):
    """Names/shapes follow torchvision resnet50 conventions."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for stage, (n, width) in enumerate(zip((3, 4, 6, 3),
                                           (64, 128, 256, 512))):
        for i in range(n):
            base = f"layer{stage + 1}.{i}"
            conv(f"{base}.conv1", width, in_ch if i == 0 else width * 4, 1)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            conv(f"{base}.conv3", width * 4, width, 1)
            bn(f"{base}.bn3", width)  # (torchvision uses width*4; see below)
            sd[f"{base}.bn3.weight"] = rng.rand(width * 4).astype(np.float32)
            sd[f"{base}.bn3.bias"] = rng.randn(width * 4).astype(np.float32)
            sd[f"{base}.bn3.running_mean"] = rng.randn(width * 4).astype(
                np.float32)
            sd[f"{base}.bn3.running_var"] = (rng.rand(width * 4) + 0.5
                                             ).astype(np.float32)
            if i == 0:
                conv(f"{base}.downsample.0", width * 4,
                     in_ch if stage == 0 else width * 2, 1)
                bn(f"{base}.downsample.1", width * 4)
        in_ch = width * 4
    return sd


def test_resnet50_converter_round_trip(rng):
    model = get_resnet("resnet50")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    sd = synth_torch_resnet50_sd(rng)
    tb = convert_resnet(sd, (3, 4, 6, 3), bottleneck=True)
    new_vars = merge_into(variables, tb)
    # the converted conv1 kernel must equal the transposed torch tensor
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["bn1"]["mean"]),
        sd["bn1.running_mean"])
    # every converted leaf should differ from random init (sanity that the
    # merge actually replaced them)
    assert not np.allclose(
        np.asarray(variables["params"]["layer3_2"]["Conv_1"]["kernel"]),
        np.asarray(new_vars["params"]["layer3_2"]["Conv_1"]["kernel"]))
    # and the model must still run
    out = model.apply(new_vars, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 2, 2, 2048)


def test_merge_shape_mismatch_raises(rng):
    model = get_resnet("resnet50")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    sd = synth_torch_resnet50_sd(rng)
    sd["conv1.weight"] = rng.randn(64, 3, 5, 5).astype(np.float32)  # wrong k
    tb = convert_resnet(sd, (3, 4, 6, 3), bottleneck=True)
    with pytest.raises(AssertionError):
        merge_into(variables, tb)
