"""State-dict-faithful torch re-implementation of torchvision's
deeplabv3_resnet50 module graph, for the CtRNet-teacher numeric parity test.

torchvision is not installed in this container (and
`deeplabv3_resnet50(pretrained=True)` would need a download), so the
reference KeyPointSegNet (keypoint_seg_resnet.py:103-149) cannot construct
its backbone here. This replica reproduces the torchvision architecture —
resnet50 with replace_stride_with_dilation=[False, True, True] behind an
IntermediateLayerGetter, DeepLabHead = ASPP(rates 12/24/36) + 3x3 conv +
BN + ReLU + 1x1 classifier — with identical parameter names, so the
reference's own wiring code runs unmodified against it and produces the
same state-dict keys a real CtRNet .pth carries.

Test-support code only; not part of the framework.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class DilatedResNet50Trunk(nn.Module):
    """torchvision resnet50(replace_stride_with_dilation=[False,True,True])
    behind an IntermediateLayerGetter(return_layers={'layer4': 'out'}) —
    same parameter names (conv1/bn1/layer1..4), forward returns the dict."""

    def __init__(self):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2, dilate=True)
        self.layer4 = self._make_layer(512, 3, stride=2, dilate=True)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        # torchvision semantics: block 0 keeps the PREVIOUS dilation
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             dilation=previous_dilation)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes, dilation=self.dilation)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return {"out": x}


class ASPPConv(nn.Sequential):
    def __init__(self, in_ch, out_ch, dilation):
        super().__init__(
            nn.Conv2d(in_ch, out_ch, 3, padding=dilation, dilation=dilation,
                      bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU())


class ASPPPooling(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(in_ch, out_ch, 1, bias=False),
                         nn.BatchNorm2d(out_ch), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class ASPP(nn.Module):
    def __init__(self, in_ch, rates, out_ch=256):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                              nn.BatchNorm2d(out_ch), nn.ReLU())]
        mods += [ASPPConv(in_ch, out_ch, r) for r in rates]
        mods.append(ASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(len(mods) * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = [conv(x) for conv in self.convs]
        return self.project(torch.cat(res, dim=1))


class DeepLabHead(nn.Sequential):
    def __init__(self, in_ch, num_classes):
        super().__init__(
            ASPP(in_ch, [12, 24, 36]),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1))


class DeepLabV3(nn.Module):
    """children() order matters: the reference slices children()[0]
    (backbone) and children()[1] (classifier)."""

    def __init__(self, backbone, classifier):
        super().__init__()
        self.backbone = backbone
        self.classifier = classifier


def deeplabv3_resnet50(pretrained=False, **kwargs):
    """Signature-compatible stand-in for
    torchvision.models.segmentation.deeplabv3_resnet50 (random init —
    `pretrained` is accepted and ignored; parity tests randomize anyway)."""
    return DeepLabV3(DilatedResNet50Trunk(), DeepLabHead(2048, 21))
