"""Camera ray generation and NDC projection.

Conventions match the reference exactly:
  * get_rays (utils/run_lushnerf_helpers.py:517-539): pinhole rays with a
    half-pixel offset (HALF_PIX = 0.5), y flipped, looking down -z; ray
    directions rotated to world by c2w[:3,:3]; origin = c2w[:3,-1].
  * ndc_rays (utils/run_lushnerf_helpers.py:542-562): the original NeRF NDC
    projection for forward-facing scenes (near plane shift + projection).

These are pure functions over jnp arrays — usable inside jit and on host
(via numpy inputs) alike.
"""

from __future__ import annotations

import jax.numpy as jnp

HALF_PIX = 0.5


def get_rays(H: int, W: int, K, c2w):
    """Generate rays for every pixel of an HxW image.

    K: [3,3] intrinsics ([[fx,0,cx],[0,fy,cy],[0,0,1]]); c2w: [3,4] pose.
    Returns (rays_o, rays_d), each [H, W, 3].
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)  # [H,W] x
    j = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)  # [H,W] y
    dirs = jnp.stack(
        [
            (i + (HALF_PIX - K[0, 2])) / K[0, 0],
            -(j + (HALF_PIX - K[1, 2])) / K[1, 1],
            -jnp.ones_like(i),
        ],
        axis=-1,
    )
    # Rotate camera-frame dirs to world: sum_k dirs[...,k] * c2w[:3,k].
    rays_d = jnp.einsum("hwk,ck->hwc", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """Host-side numpy twin of get_rays (reference get_rays_np,
    utils/run_lushnerf_helpers.py:531-539) for the data pipeline — the
    train-time ray precompute must never dispatch to (or read back from)
    the accelerator."""
    import numpy as np

    K = np.asarray(K)
    c2w = np.asarray(c2w)
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [
            (i + (HALF_PIX - K[0, 2])) / K[0, 0],
            -(j + (HALF_PIX - K[1, 2])) / K[1, 1],
            -np.ones_like(i),
        ],
        axis=-1,
    )
    rays_d = np.einsum("hwk,ck->hwc", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Project rays to normalized device coordinates (forward-facing scenes)."""
    # Shift ray origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
