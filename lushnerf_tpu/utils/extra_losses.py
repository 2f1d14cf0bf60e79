"""Auxiliary loss/analysis utilities from the reference helper module.

JAX equivalents of utils/run_lushnerf_helpers.py extras: MS-SSIM+L1 loss
(:26-107), white balance (:110-132), correlation coefficient (:14-22), and
kernel density estimation (:691-713).  These are unused by the shipped
training recipe (the reference keeps them dormant too) but are part of the
framework surface for experimentation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def compute_correlation_coefficient(x, y, eps: float = 1e-6):
    """Per-column Pearson correlation (helpers:14-22). x, y: [N, D]."""
    xm = x - jnp.mean(x, axis=0, keepdims=True)
    ym = y - jnp.mean(y, axis=0, keepdims=True)
    num = jnp.sum(xm * ym, axis=0)
    den = jnp.sqrt(jnp.sum(xm**2, axis=0) * jnp.sum(ym**2, axis=0))
    return num / (den + eps)


def kde(x: jnp.ndarray, std: float = 0.1) -> jnp.ndarray:
    """Gaussian kernel density over a point set x [N, D] (helpers:691-713;
    no batching needed — one pairwise distance matrix on device)."""
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    return jnp.sum(jnp.exp(-d2 / (2 * std**2)), axis=-1) / x.shape[0]


def white_balance_init(map_type: str, num_images: int):
    """WhiteBalance parameter init (helpers:110-120)."""
    if map_type == "none":
        return {}
    if map_type == "white_balance":
        return {"wb": jnp.ones((num_images, 3))}
    if map_type == "white_balance_consistent":
        return {"wb": jnp.ones((3,))}
    raise ValueError(f"map_type {map_type!r} not recognized")


def white_balance_apply(params: Dict, map_type: str, x, img_idx=None):
    if map_type == "none":
        return x
    if map_type == "white_balance":
        return x * params["wb"][img_idx]
    if map_type == "white_balance_consistent":
        return x * params["wb"]
    raise ValueError(f"map_type {map_type!r} not recognized")


def _gauss_kernel1d(size: int, sigma: float):
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def ms_ssim_l1_loss(
    x,
    y,
    sigmas=(0.5, 1.0, 2.0, 4.0, 8.0),
    data_range: float = 1.0,
    K=(0.01, 0.03),
    alpha: float = 0.025,
    compensation: float = 200.0,
):
    """MS-SSIM + Gaussian-weighted L1 mix (MS_SSIM_L1_LOSS, helpers:26-107).

    x, y: [B, 3, H, W] in [0, data_range].
    """
    C1 = (K[0] * data_range) ** 2
    C2 = (K[1] * data_range) ** 2
    pad = int(2 * sigmas[-1])
    size = int(4 * sigmas[-1] + 1)

    kernels = []
    for s in sigmas:
        g1 = _gauss_kernel1d(size, s)
        kernels.append(jnp.outer(g1, g1))
    # [3*len(sigmas), 1, k, k] in the reference's filter order (sigma-major)
    g_masks = jnp.stack([k for k in kernels for _ in range(3)])[:, None]

    def filt(img, w):
        # torch conv2d(groups=3): out channels 5g..5g+4 read input chan g
        return jax.lax.conv_general_dilated(
            img, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=3,
        )

    mux = filt(x, g_masks)
    muy = filt(y, g_masks)
    mux2, muy2, muxy = mux * mux, muy * muy, mux * muy
    sigmax2 = filt(x * x, g_masks) - mux2
    sigmay2 = filt(y * y, g_masks) - muy2
    sigmaxy = filt(x * y, g_masks) - muxy

    l = (2 * muxy + C1) / (mux2 + muy2 + C1)
    cs = (2 * sigmaxy + C2) / (sigmax2 + sigmay2 + C2)

    lM = l[:, -1] * l[:, -2] * l[:, -3]
    PIcs = jnp.prod(cs, axis=1)
    loss_ms_ssim = 1 - lM * PIcs  # [B, H, W]

    loss_l1 = jnp.abs(x - y)  # [B, 3, H, W]
    g_last = g_masks[-3:]
    gaussian_l1 = jnp.mean(
        jax.lax.conv_general_dilated(
            loss_l1, g_last, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=3,
        ),
        axis=1,
    )
    loss_mix = alpha * loss_ms_ssim + (1 - alpha) * gaussian_l1 / data_range
    return jnp.mean(compensation * loss_mix)
