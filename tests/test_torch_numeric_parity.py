"""Numerical converter validation: a torch mini-ResNet (torchvision-style
naming) and our Flax ResNet must produce the SAME outputs after weight
conversion. This pins down every layout convention (conv kernel transpose,
BN stats, downsample ordering) that the shape-only mechanics test cannot."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from horopose_tpu.models.resnet import ResNet  # noqa: E402
from horopose_tpu.tools.torch_weights import convert_resnet, merge_into  # noqa: E402


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(y + r)


class TorchMiniResNet(tnn.Module):
    """Stem + 2 stages of (1, 1) bottlenecks, torchvision naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBottleneck(
            64, 64, 1, tnn.Sequential(tnn.Conv2d(64, 256, 1, bias=False),
                                      tnn.BatchNorm2d(256))))
        self.layer2 = tnn.Sequential(TorchBottleneck(
            256, 128, 2, tnn.Sequential(tnn.Conv2d(256, 512, 1, 2,
                                                   bias=False),
                                        tnn.BatchNorm2d(512))))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer2(self.layer1(x))


def test_converted_weights_match_torch_forward(rng):
    tmodel = TorchMiniResNet().eval()
    # randomize BN stats so the test cannot pass with defaults
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        torch_out = tmodel(torch.from_numpy(x)).numpy()    # NCHW

    fmodel = ResNet(block="bottleneck", stage_sizes=(1, 1))
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), train=False)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tb = convert_resnet(sd, (1, 1), bottleneck=True)
    new_vars = merge_into(variables, tb)
    flax_out = fmodel.apply(new_vars, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1))), train=False)       # NHWC
    flax_out = np.transpose(np.asarray(flax_out), (0, 3, 1, 2))
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-4, rtol=1e-3)


def test_deconv_conversion_matches_torch(rng):
    """torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose with the
    converter's flipped-transposed kernel (the reference's deconv stacks and
    CtRNet's keypoint head use exactly this configuration)."""
    import flax.linen as fnn
    from horopose_tpu.tools.torch_weights import _deconv

    x = rng.rand(2, 8, 6, 6).astype(np.float32)
    tconv = tnn.ConvTranspose2d(8, 4, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        out_t = tconv(torch.from_numpy(x)).numpy()
    k = _deconv(tconv.weight.detach().numpy())
    m = fnn.ConvTranspose(4, (4, 4), (2, 2), padding="SAME", use_bias=False)
    out_f = m.apply({"params": {"kernel": jnp.asarray(k)}},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out_f = np.transpose(np.asarray(out_f), (0, 3, 1, 2))
    np.testing.assert_allclose(out_f, out_t, atol=1e-5)
