"""Image quality metrics: MSE / PSNR / SSIM in pure JAX (+ LPIPS hook).

The reference evaluates via skimage on CPU after mapping images to [-1, 1]
(utils/metrics.py:15-94): mse = mean squared error, psnr with data_range 2,
ssim with skimage defaults (7x7 uniform window, K1=0.01, K2=0.03,
multichannel).  We reproduce those formulas in JAX so eval renders never
leave the device.  LPIPS is provided via an optional weight-converted JAX
AlexNet (see lushnerf_tpu.utils.lpips); callers degrade gracefully when the
weights are unavailable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_pm1(x):
    """[0,1] -> [-1,1], clipped (reference utils/metrics.py:59-61)."""
    return jnp.clip(x * 2.0 - 1.0, -1.0, 1.0)


def mse(im1, im2):
    return jnp.mean((to_pm1(im1) - to_pm1(im2)) ** 2)


def psnr(im1, im2, data_range: float = 2.0):
    m = mse(im1, im2)
    return 10.0 * jnp.log10(data_range**2 / m)


def _uniform_filter(img, win: int):
    """Mean filter with a win x win window, 'valid' region, per channel.

    img: [H, W, C] -> [H-win+1, W-win+1, C].
    """
    k = jnp.ones((win, win, 1, 1), img.dtype) / (win * win)
    x = img.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    y = jax.lax.conv_general_dilated(
        x, jnp.ones((1, 1, win, win), img.dtype) / (win * win), (1, 1), "VALID"
    )
    return y[:, 0].transpose(1, 2, 0)


def ssim(im1, im2, data_range: float = 2.0, win: int = 7, K1: float = 0.01, K2: float = 0.03):
    """Structural similarity, skimage-compatible (uniform window, the
    skimage default for non-Gaussian mode), multichannel mean.

    im1, im2: [H, W, C] in [0, 1] (mapped to [-1, 1] internally like the
    reference's compute_img_metric).
    """
    x = to_pm1(im1).astype(jnp.float32)
    y = to_pm1(im2).astype(jnp.float32)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)  # sample covariance (skimage default)

    ux = _uniform_filter(x, win)
    uy = _uniform_filter(y, win)
    uxx = _uniform_filter(x * x, win)
    uyy = _uniform_filter(y * y, win)
    uxy = _uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return jnp.mean(S)


def compute_img_metric(im1, im2, metric: str):
    """Reference-compatible entry point over [0,1] images (batched or not)."""
    im1 = jnp.asarray(im1)
    im2 = jnp.asarray(im2)
    if im1.ndim == 3:
        im1, im2 = im1[None], im2[None]
    if metric == "mse":
        vals = [mse(a, b) for a, b in zip(im1, im2)]
    elif metric == "psnr":
        vals = [psnr(a, b) for a, b in zip(im1, im2)]
    elif metric == "ssim":
        vals = [ssim(a, b) for a, b in zip(im1, im2)]
    elif metric == "lpips":
        from lushnerf_tpu.utils import lpips as _lpips

        vals = [_lpips.lpips(a, b) for a, b in zip(im1, im2)]
    else:
        raise ValueError(f"metric {metric!r} not recognized")
    return float(sum(jax.device_get(v) for v in vals) / len(vals))
