"""Alpha compositing of raw MLP outputs along rays.

Matches the reference's (nonstandard) raw2outputs exactly
(models/lushnerf.py:296-352):
  * dists are the N-1 interval lengths (NO 1e10 far pad), scaled by |rays_d|
  * rgb = rgb_activate(raw[..., :3]) over ALL N samples
  * density = sigma_activate(raw[..., :-1, 3] + noise) over the first N-1
    samples only
  * alpha over N-1 intervals, then a terminator alpha == 1 is appended, so
    the final sample absorbs all remaining transmittance
  * weights = alpha * cumprod([1, 1-alpha+1e-10])[:-1]
  * optional near-plane density zeroing at inference
    (render_rmnearplane, models/lushnerf.py:331-335): density *= (z[1:] >
    rmnearplane/128)

Pure function of arrays — runs identically under jit on TPU and in the
Pallas fused renderer's epilogue.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray  # [..., 3]
    density: jnp.ndarray  # [..., N-1]
    acc: jnp.ndarray  # [...]
    weights: jnp.ndarray  # [..., N]
    depth: jnp.ndarray  # [...]


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    rgb_activate: Callable = jnp.asarray,  # set by caller (sigmoid by default cfg)
    sigma_activate: Callable = jnp.asarray,  # (relu by default cfg)
    density_noise: Optional[jnp.ndarray] = None,
    rm_nearplane: float = 0.0,
    white_bkgd: bool = False,
) -> CompositeOut:
    """Composite raw [..., N, 4] predictions into per-ray outputs.

    density_noise: optional [..., N-1] noise added to the raw sigma channel
    before activation (the reference's raw_noise_std * randn, training only).
    rm_nearplane: if > 0, zero density where z <= rm_nearplane/128
    (inference only in the reference — caller gates it).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]  # [..., N-1]
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = rgb_activate(raw[..., :3])  # [..., N, 3]

    sigma_raw = raw[..., :-1, 3]
    if density_noise is not None:
        sigma_raw = sigma_raw + density_noise
    density = sigma_activate(sigma_raw)  # [..., N-1]

    if rm_nearplane > 0:
        mask = (z_vals[..., 1:] > rm_nearplane / 128.0).astype(density.dtype)
        density = density * mask

    alpha = 1.0 - jnp.exp(-density * dists)  # [..., N-1]
    alpha = jnp.concatenate([alpha, jnp.ones_like(alpha[..., :1])], axis=-1)  # [..., N]

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans  # [..., N]

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return CompositeOut(rgb_map, density, acc_map, weights, depth_map)
