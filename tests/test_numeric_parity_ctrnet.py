"""NUMERIC torch<->flax parity for the CtRNet segmentation teacher, running
the reference's own KeyPointSegNet wiring
(/root/reference/lib/models/ctrnet/keypoint_seg_resnet.py:103-149)
against a state-dict-faithful torchvision replica
(tests/torchvision_replica.py — torchvision itself is absent from this
container), with fully randomized weights AND BatchNorm stats converted via
tools/torch_weights.convert_ctrnet_seg. Catches exactly the bug class
VERDICT r2 #1 warns about: this test exposed both the extra Sequential
nesting of 'classifer.*' keys and a dilation-placement mismatch in our
DilatedResNet50 (torchvision puts the OLD dilation on block 0 of a dilated
stage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_torch import (EasyDict, randomize_state_dict, rel_err,
                       setup_reference_imports, to_numpy_sd)


@pytest.fixture(scope="module")
def ref_kpseg():
    setup_reference_imports()
    import sys
    import types
    import torchvision_replica as tvr
    # wire the replica into the torchvision stub so the reference
    # constructor (`models.segmentation.deeplabv3_resnet50(pretrained=True)`)
    # runs unmodified
    seg = types.ModuleType("torchvision.models.segmentation")
    seg.deeplabv3_resnet50 = tvr.deeplabv3_resnet50
    sys.modules["torchvision.models.segmentation"] = seg
    sys.modules["torchvision.models"].segmentation = seg
    import models.ctrnet.keypoint_seg_resnet as ref_mod
    return ref_mod


def test_ctrnet_teacher_numeric_forward_parity(ref_kpseg, rng):
    import torch
    from horopose_tpu.models.deeplab import KeypointSegNet
    from horopose_tpu.tools.torch_weights import (convert_ctrnet_seg,
                                                  merge_into)

    H, W, K = 120, 160, 7
    args = EasyDict(dict(n_kp=K, width=W, height=H))
    tmodel = ref_kpseg.KeyPointSegNet(args, use_gpu=False)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()
    # SpatialSoftArgmax uses .view() on a tensor that is non-contiguous on
    # this CPU path (keypoint_seg_resnet.py:83); .contiguous() is a pure
    # memory-layout copy, zero semantic change
    ssa = tmodel.spatialsoftargmax
    orig_forward = ssa.forward
    ssa.forward = lambda x: orig_forward(x.contiguous())

    x = rng.rand(2, H, W, 3).astype(np.float32)
    with torch.no_grad():
        t_kp, t_seg = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_kp = t_kp.numpy()
    t_seg = t_seg.numpy().transpose(0, 2, 3, 1)     # NCHW -> NHWC

    sd = to_numpy_sd(tmodel)
    # real checkpoints carry the nested head layout (classifer.0.0 = ASPP)
    assert "classifer.0.0.convs.0.0.weight" in sd

    fmodel = KeypointSegNet(num_keypoints=K)
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 3)), train=False)
    variables = merge_into(variables, convert_ctrnet_seg(sd))
    f_kp, f_seg = jax.jit(
        lambda v, x: fmodel.apply(v, x, train=False))(variables,
                                                      jnp.asarray(x))

    assert rel_err(f_seg, t_seg) < 2e-4, f"seg rel err {rel_err(f_seg, t_seg)}"
    assert rel_err(f_kp, t_kp) < 2e-4, f"kp rel err {rel_err(f_kp, t_kp)}"
