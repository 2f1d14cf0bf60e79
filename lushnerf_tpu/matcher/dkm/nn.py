"""Inference NN primitives for the DKM port (NCHW, torch-compatible).

All functions take a flat params dict keyed by torch state-dict names
(e.g. ``encoder.net.conv1.weight``) so converted checkpoints apply
verbatim.  BatchNorm runs in eval mode (running stats) — the matcher is
frozen (DKMv3 freezes BN even in training, DKMv3.py:449-455).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Conv input precision for the frozen inference matcher.  float32 is the
# default: the decoder is gather/VPU-bound (grid_sample + windowed local
# correlation), so bf16 convs measured NEUTRAL on the production shape
# (PROFILE_r04).  'bfloat16' remains the available, parity-tested
# alternative via set_conv_dtype — measured match deltas are sub-pixel
# (tests/test_dkm.py::test_dkm_bf16_matches_f32) and the certainty feeds
# a 1e-2-weight loss through a 0.8 threshold.
_CONV_DTYPE = jnp.float32


def set_conv_dtype(dtype) -> None:
    global _CONV_DTYPE
    _CONV_DTYPE = jnp.dtype(dtype)


def conv2d(params, name, x, stride=1, padding=0, groups=1):
    """x: [N, C, H, W]; weight '<name>.weight' [O, I/g, kh, kw]."""
    w = params[f"{name}.weight"]
    s = (stride, stride) if isinstance(stride, int) else stride
    p = [(padding, padding), (padding, padding)] if isinstance(padding, int) else padding
    cd = _CONV_DTYPE
    y = jax.lax.conv_general_dilated(
        x.astype(cd), w.astype(cd), s, p,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    b = params.get(f"{name}.bias")
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def batchnorm(params, name, x, eps=1e-5):
    mean = params[f"{name}.running_mean"]
    var = params[f"{name}.running_var"]
    gamma = params[f"{name}.weight"]
    beta = params[f"{name}.bias"]
    inv = gamma / jnp.sqrt(var + eps)
    return x * inv[None, :, None, None] + (beta - mean * inv)[None, :, None, None]


def relu(x):
    return jnp.maximum(x, 0.0)


def maxpool2d(x, kernel=3, stride=2, padding=1):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, kernel, kernel), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )


def adaptive_avg_pool1(x):
    return jnp.mean(x, axis=(2, 3), keepdims=True)


def _resize_axis_weights(in_size, out_size, dtype=jnp.float32):
    """Bilinear sampling matrix [out, in] with half-pixel centres and edge
    clamping (torch F.interpolate align_corners=False, NO antialiasing —
    jax.image.resize low-passes on downscale, torch does not)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    i0c = jnp.clip(i0, 0, in_size - 1).astype(jnp.int32)
    i1c = jnp.clip(i0 + 1, 0, in_size - 1).astype(jnp.int32)
    m = jnp.zeros((out_size, in_size), dtype)
    m = m.at[jnp.arange(out_size), i0c].add(1.0 - frac)
    m = m.at[jnp.arange(out_size), i1c].add(frac)
    return m


def interpolate_bilinear(x, size):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent.

    x: [N, C, H, W] -> [N, C, size[0], size[1]].  Expressed as two small
    matmuls (MXU-friendly; resize matrices are tiny and constant-folded).
    """
    n, c, h, w = x.shape
    mh = _resize_axis_weights(h, size[0], x.dtype)
    mw = _resize_axis_weights(w, size[1], x.dtype)
    return jnp.einsum("oh,nchw,pw->ncop", mh, x, mw)


def grid_sample_bilinear(img, grid):
    """F.grid_sample(align_corners=False, padding_mode='zeros') equivalent.

    img: [N, C, H, W]; grid: [N, Ho, Wo, 2] with (x, y) in [-1, 1].
    align_corners=False: pixel i spans [-1 + 2i/W, -1 + 2(i+1)/W], centre
    at (-1 + (2i+1)/W) -> ix = ((gx + 1) * W - 1) / 2.
    """
    n, c, h, w = img.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # img [N,C,H,W]; index per-batch grid
        out = jax.vmap(lambda im, yy, xx: im[:, yy, xx])(img, yi_c, xi_c)
        # out [N, C, Ho, Wo]
        return out * valid[:, None].astype(img.dtype)

    out = (
        gather(y0, x0) * (wy0 * wx0)[:, None]
        + gather(y0, x1) * (wy0 * wx1)[:, None]
        + gather(y1, x0) * (wy1 * wx0)[:, None]
        + gather(y1, x1) * (wy1 * wx1)[:, None]
    )
    return out


def meshgrid_coords(h, w, dtype=jnp.float32):
    """The DKM convention: centres at linspace(-1+1/h, 1-1/h, h), stacked
    as (x, y) channels-last [h, w, 2] (DKMv3.py:848-858)."""
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h, dtype=dtype)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def local_correlation(feature0, feature1, local_radius, flow=None):
    """(2r+1)^2 windowed correlation (gim/dkm/utils/local_correlation.py).

    feature0, feature1: [N, C, H, W]; flow: [N, 2, H, W] or None.
    Returns [N, (2r+1)^2, H, W].
    """
    b, c, h, w = feature0.shape
    r = local_radius
    if flow is None:
        coords = jnp.broadcast_to(meshgrid_coords(h, w)[None], (b, h, w, 2))
    else:
        coords = jnp.transpose(flow, (0, 2, 3, 1))
    wy = jnp.linspace(-2 * r / h, 2 * r / h, 2 * r + 1)
    wx = jnp.linspace(-2 * r / w, 2 * r / w, 2 * r + 1)
    gy, gx = jnp.meshgrid(wy, wx, indexing="ij")
    window = jnp.stack([gx, gy], axis=-1).reshape(1, (2 * r + 1) ** 2, 2)
    # coords [b, h, w, 1, 2] + window [1, 1, 1, K, 2] -> [b, h, w*K, 2]
    K = (2 * r + 1) ** 2
    sample = (coords[:, :, :, None] + window[:, None, None]).reshape(b, h, w * K, 2)
    window_feature = grid_sample_bilinear(feature1, sample)  # [b, c, h, w*K]
    window_feature = window_feature.reshape(b, c, h, w, K)
    corr = jnp.einsum("bchw,bchwk->bkhw", feature0, window_feature) / (c**0.5)
    return corr
