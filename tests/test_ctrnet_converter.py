"""CtRNet segmentation-teacher converter coverage: synthesize the CtRNet
KeyPointSegNet state dict (keypoint_seg_resnet.py naming: backbone.0.* =
dilated resnet50 via IntermediateLayerGetter, read_out.kps_score_lowres
deconv, classifer.0 = torchvision ASPP) and require full coverage of our
KeypointSegNet tree."""

import numpy as np

import jax
import jax.numpy as jnp

from horopose_tpu.models.deeplab import KeypointSegNet
from horopose_tpu.tools.torch_weights import convert_ctrnet_seg, merge_into

from test_hrnet_converter import _leaf_paths
from test_fullnet_converter import synth_torch_resnet50_sd


def synth_ctrnet_sd(rng, n_kp=7):
    sd = synth_torch_resnet50_sd(rng, prefix="backbone.0.")

    def conv(name, o, i, k, bias=False):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def bn(name, c):
        for suffix, gen in (("weight", rng.rand), ("bias", rng.randn),
                            ("running_mean", rng.randn)):
            sd[f"{name}.{suffix}"] = gen(c).astype(np.float32)
        sd[f"{name}.running_var"] = (rng.rand(c) + 0.5).astype(np.float32)

    # keypoint head: ConvTranspose2d(2048 -> n_kp, 4, 2, 1) with bias
    sd["read_out.kps_score_lowres.weight"] = rng.randn(
        2048, n_kp, 4, 4).astype(np.float32)
    sd["read_out.kps_score_lowres.bias"] = rng.randn(n_kp).astype(np.float32)

    # torchvision DeepLabHead under the misspelled 'classifer' Sequential.
    # Real checkpoints nest ONE extra level (`Sequential(DeepLabHead)`,
    # keypoint_seg_resnet.py:127): classifer.0.0 = ASPP, .0.1 conv3x3,
    # .0.2 bn, .0.4 final 1x1 — confirmed numerically against the
    # reference's own wiring in test_numeric_parity_ctrnet.py.
    conv("classifer.0.0.convs.0.0", 256, 2048, 1)
    bn("classifer.0.0.convs.0.1", 256)
    for r in (1, 2, 3):
        conv(f"classifer.0.0.convs.{r}.0", 256, 2048, 3)
        bn(f"classifer.0.0.convs.{r}.1", 256)
    conv("classifer.0.0.convs.4.1", 256, 2048, 1)
    bn("classifer.0.0.convs.4.2", 256)
    conv("classifer.0.0.project.0", 256, 256 * 5, 1)
    bn("classifer.0.0.project.1", 256)
    conv("classifer.0.1", 256, 256, 3)
    bn("classifer.0.2", 256)
    conv("classifer.0.4", 1, 256, 1, bias=True)
    return sd


def test_ctrnet_converter_coverage(rng):
    model = KeypointSegNet(num_keypoints=7)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 48, 64, 3)), train=False)
    sd = synth_ctrnet_sd(rng)
    tb = convert_ctrnet_seg(sd)
    new_vars = merge_into(variables, tb)
    want = set(_leaf_paths(variables["params"]))
    got = set(_leaf_paths(tb.params))
    missing = want - got
    assert not missing, sorted(missing)[:10]
    kp, seg = model.apply(new_vars, jnp.zeros((1, 48, 64, 3)), train=False)
    assert kp.shape == (1, 7, 2)
    assert seg.shape == (1, 48, 64, 1)
