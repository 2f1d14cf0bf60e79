"""Minimal torchvision stand-in for importing the reference DKMv3 module
in this torchvision-free environment.

Provides `torchvision.models.resnet50` with the standard torchvision
Bottleneck ResNet50 architecture (state-dict-compatible layer naming:
conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}/fc), plus
empty `transforms` attributes that DKMv3.py imports but never calls on the
match path.  Install with `install_tv_stub()` BEFORE importing the
reference dkm package.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)


def resnet50(pretrained=False, weights=None, replace_stride_with_dilation=None, **kw):
    assert not pretrained and weights is None, "stub has no pretrained weights"
    return ResNet()


class AlexNet(nn.Module):
    """torchvision.models.alexnet-compatible `.features` (indices 0-12),
    for importing the vendored LPIPS trunk at random weights."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2),
        )


def alexnet(pretrained=False, weights=None, **kw):
    assert not pretrained and weights is None, "stub has no pretrained weights"
    return AlexNet()


def install_tv_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.resnet50 = resnet50
    models.alexnet = alexnet
    models.resnet18 = lambda **kw: (_ for _ in ()).throw(NotImplementedError)
    models.resnet101 = models.resnet18
    models.wide_resnet50_2 = models.resnet18
    transforms = types.ModuleType("torchvision.transforms")
    transforms.Compose = lambda fns: fns
    transforms.ToTensor = lambda *a, **k: None
    transforms.Normalize = lambda *a, **k: None
    transforms.Resize = lambda *a, **k: None
    functional = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    functional.InterpolationMode = InterpolationMode
    transforms.functional = functional
    tv.models = models
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
