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


def grid_sample_patch(img, grid):
    """grid_sample_bilinear via ONE (C, 2, 2) dynamic_slice per output
    pixel instead of four pointwise gathers — 4x fewer gather indices,
    and the corner combine happens densely on the sliced patches.
    Identical zeros-padding semantics via a clamped index into a
    2-pixel zero pad.  Same signature/result as grid_sample_bilinear."""
    n, c, h, w = img.shape
    _, ho, wo, _ = grid.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0)[:, None]  # [N, 1, Ho, Wo]
    fy = (gy - y0)[:, None]
    PAD = 2
    x0c = jnp.clip(x0, -2, w + 1).astype(jnp.int32)
    y0c = jnp.clip(y0, -2, h + 1).astype(jnp.int32)
    imgp = jnp.pad(img, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)))
    sy = (y0c + PAD).reshape(n, ho * wo)
    sx = (x0c + PAD).reshape(n, ho * wo)
    P = ho * wo
    # chunk the pixel axis so only ~128 MB of patches is live (full-res
    # production shapes would otherwise materialize multi-GB patch sets)
    target = 128 * 1024 * 1024
    CH = max(64, min(8192, int(target // (c * 4 * 4))))
    P_pad = -(-P // CH) * CH
    w00 = ((1 - fy) * (1 - fx)).reshape(n, P)
    w01 = ((1 - fy) * fx).reshape(n, P)
    w10 = (fy * (1 - fx)).reshape(n, P)
    w11 = (fy * fx).reshape(n, P)

    def per_image(args):
        im_i, sy_i, sx_i, ws = args
        padp = lambda a: jnp.pad(a, [(0, P_pad - P)] + [(0, 0)] * (a.ndim - 1))
        syp, sxp = padp(sy_i), padp(sx_i)
        wsp = jnp.pad(ws, ((0, 0), (0, P_pad - P)))

        def chunk_fn(ch):
            ys, xs, wc = ch

            def slice_one(y, x):
                return jax.lax.dynamic_slice(im_i, (0, y, x), (c, 2, 2))

            p = jax.vmap(slice_one)(ys, xs)  # [CH, C, 2, 2]
            return (
                p[..., 0, 0] * wc[0][:, None]
                + p[..., 0, 1] * wc[1][:, None]
                + p[..., 1, 0] * wc[2][:, None]
                + p[..., 1, 1] * wc[3][:, None]
            )  # [CH, C]

        out = jax.lax.map(chunk_fn, (
            syp.reshape(-1, CH), sxp.reshape(-1, CH),
            wsp.reshape(4, -1, CH).transpose(1, 0, 2),
        ))
        return out.reshape(P_pad, c)[:P]

    out = jax.lax.map(per_image, (imgp, sy, sx,
                                  jnp.stack([w00, w01, w10, w11], axis=1)))
    return jnp.transpose(out, (0, 2, 1)).reshape(n, c, ho, wo)


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


def local_correlation(feature0, feature1, local_radius, flow=None,
                      impl: str = "gather"):
    """(2r+1)^2 windowed correlation (gim/dkm/utils/local_correlation.py).

    feature0, feature1: [N, C, H, W]; flow: [N, 2, H, W] or None.
    Returns [N, (2r+1)^2, H, W].

    impl='gather' (default) is the direct formulation: one grid_sample
    over an [h, w*K] grid = h*w*K*4 pointwise gathers.
    impl='patch' exploits that the window offsets are EXACT integer
    pixel steps (linspace spacing 2/h normalized = 1 px under
    align_corners=False), so every window sample shares ONE fractional
    part per pixel: fetch a single (C, 2r+2, 2r+2) patch per pixel
    (dynamic_slice — K*4x fewer indices), correlate the patch with
    feature0, and form all K window values as four shifted slices of the
    patch correlation weighted by the shared bilinear weights.
    Bit-equal to 'gather' up to f32 summation order (parity-tested).

    MEASURED on v5e at production shapes (scripts/profile_dkm_stages):
    XLA's gather lowering is already competitive (local_corr@16 67 ms,
    @8 59 ms) while the vmap(dynamic_slice)-under-lax.map vehicle used
    here serializes badly (up to 3.6x slower at stride 8) — so 'gather'
    stays the default and 'patch' is kept as the algebraic blueprint for
    a future pallas DMA-gather kernel, which is the vehicle that could
    actually exploit the index-count reduction.
    """
    b, c, h, w = feature0.shape
    r = local_radius
    if flow is None:
        coords = jnp.broadcast_to(meshgrid_coords(h, w)[None], (b, h, w, 2))
    else:
        coords = jnp.transpose(flow, (0, 2, 3, 1))
    if impl == "patch":
        return _local_correlation_patch(feature0, feature1, r, coords)
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


def _local_correlation_patch(feature0, feature1, r, coords):
    """Patch-slice local correlation (see local_correlation docstring).

    The window grid positions in pixel units are ix(k) = ix0 + k for
    integer k in [-r, r] (the normalized window spacing is exactly one
    pixel), so floor/frac are SHARED across the window: with
    x0 = floor(ix0), every sample is a bilinear mix of integer taps
    x0 + k and x0 + k + 1.  One (C, 2r+2, 2r+2) patch at (y0-r, x0-r)
    covers all taps of all K window positions.
    """
    b, c, h, w = feature0.shape
    S = 2 * r + 2
    # centre sample position in pixel units (grid_sample_bilinear's
    # align_corners=False mapping).  The window linspace reproduces the
    # exact same f32 values as the gather path's `coords + window` only
    # approximately; the difference can flip a floor() when ix0 + k sits
    # on an integer, where the bilinear weight of the flipped tap is ~0.
    gx = (coords[..., 0] + 1.0) * w / 2.0 - 0.5  # [b, h, w]
    gy = (coords[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    # clamp far-out positions: anything beyond this range is fully
    # outside the image for every window tap and must contribute zeros,
    # which the (2r+3)-wide zero pad provides exactly
    PAD = 2 * r + 3
    x0c = jnp.clip(x0, -(r + 2), w + r + 1).astype(jnp.int32)
    y0c = jnp.clip(y0, -(r + 2), h + r + 1).astype(jnp.int32)
    f1p = jnp.pad(feature1, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)))

    # one dynamic_slice per pixel: start (y0-r+PAD, x0-r+PAD), size (C,S,S)
    sy = (y0c - r + PAD).reshape(b, h * w)
    sx = (x0c - r + PAD).reshape(b, h * w)
    f0 = jnp.transpose(feature0.reshape(b, c, h * w), (0, 2, 1))  # [b, h*w, C]

    # the patch tensor for ALL pixels would be P*C*S*S floats (23 GB at
    # the production stride-16 shape) — chunk the pixel axis with lax.map
    # and reduce each chunk's patches against feature0 immediately, so
    # only ~128 MB of patches is ever live
    target = 128 * 1024 * 1024
    CH = max(64, min(4096, int(target // (c * S * S * 4))))
    P = h * w
    P_pad = -(-P // CH) * CH

    def per_image(args):
        f1p_i, sy_i, sx_i, f0_i = args
        syp = jnp.pad(sy_i, (0, P_pad - P))
        sxp = jnp.pad(sx_i, (0, P_pad - P))
        f0p = jnp.pad(f0_i, ((0, P_pad - P), (0, 0)))

        def chunk_fn(ch):
            ys, xs, f0c = ch

            def slice_one(y, x):
                return jax.lax.dynamic_slice(f1p_i, (0, y, x), (c, S, S))

            patches = jax.vmap(slice_one)(ys, xs)  # [CH, C, S, S]
            return jnp.einsum("pc,pcij->pij", f0c, patches)

        cp = jax.lax.map(chunk_fn, (
            syp.reshape(-1, CH), sxp.reshape(-1, CH),
            f0p.reshape(-1, CH, f0p.shape[-1]),
        ))
        return cp.reshape(P_pad, S, S)[:P]

    cp = jax.lax.map(per_image, (f1p, sy, sx, f0))  # [b, h*w, S, S]

    w00 = ((1 - fy) * (1 - fx)).reshape(b, h * w, 1, 1)
    w01 = ((1 - fy) * fx).reshape(b, h * w, 1, 1)
    w10 = (fy * (1 - fx)).reshape(b, h * w, 1, 1)
    w11 = (fy * fx).reshape(b, h * w, 1, 1)
    D = 2 * r + 1
    corr = (
        w00 * cp[:, :, :D, :D]
        + w01 * cp[:, :, :D, 1:]
        + w10 * cp[:, :, 1:, :D]
        + w11 * cp[:, :, 1:, 1:]
    )  # [b, h*w, D, D]; window k = (dy + r) * D + (dx + r)
    corr = corr.reshape(b, h, w, D * D)
    return jnp.transpose(corr, (0, 3, 1, 2)) / (c**0.5)
