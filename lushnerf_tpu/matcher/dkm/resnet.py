"""ResNet50 feature-pyramid encoder (torchvision layout, eval mode).

Mirrors the exercised path of the reference encoder (DKMv3.py:416-455 /
Encoder :896-915): returns features at strides {1, 2, 4, 8, 16, 32}.
Parameter names follow torchvision (`encoder.net.conv1.weight`, ...),
matching the LuSh checkpoint after its key cleanup (run_lushnerf.py:352-356).
"""

from __future__ import annotations

import jax.numpy as jnp

from lushnerf_tpu.matcher.dkm.nn import batchnorm, conv2d, maxpool2d, relu

BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}  # ResNet50 bottleneck counts


def _bottleneck(params, prefix, x, stride):
    identity = x
    out = relu(batchnorm(params, f"{prefix}.bn1", conv2d(params, f"{prefix}.conv1", x)))
    out = relu(
        batchnorm(
            params, f"{prefix}.bn2",
            conv2d(params, f"{prefix}.conv2", out, stride=stride, padding=1),
        )
    )
    out = batchnorm(params, f"{prefix}.bn3", conv2d(params, f"{prefix}.conv3", out))
    if f"{prefix}.downsample.0.weight" in params:
        identity = batchnorm(
            params, f"{prefix}.downsample.1",
            conv2d(params, f"{prefix}.downsample.0", x, stride=stride),
        )
    return relu(out + identity)


def resnet50_pyramid(params, x, prefix="encoder.net"):
    """x: [N, 3, H, W] -> dict {1, 2, 4, 8, 16, 32} of feature maps."""
    feats = {1: x}
    x = conv2d(params, f"{prefix}.conv1", x, stride=2, padding=3)
    x = relu(batchnorm(params, f"{prefix}.bn1", x))
    feats[2] = x
    x = maxpool2d(x, 3, 2, 1)
    for layer, n_blocks in BLOCKS.items():
        stride = 1 if layer == 1 else 2
        for b in range(n_blocks):
            x = _bottleneck(params, f"{prefix}.layer{layer}.{b}", x, stride if b == 0 else 1)
        feats[2 ** (layer + 1)] = x
    return feats
