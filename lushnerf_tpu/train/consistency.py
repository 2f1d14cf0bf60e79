"""Multi-view consistency (CTE) pass: aligned-pixel rendering + loss.

Reference (models/lushnerf.py:949-988 + run_lushnerf.py:629-650): each
iteration past `noisenerf_start_iter`, pick a random anchor view and 32
random match columns; in EVERY training view, render the pixels matched to
those columns through the *sharp* branch (no blur kernel, no noise head,
fine rgb, pre-tonemap), then penalize each confident view's color against
the confidence-masked mean (threshold 0.8; L1; weight 1e-2).

TPU design: the random anchor/columns are drawn host-side from the
host-resident MatchTables (the reference keeps a ~10 GB table on GPU just
to sample 32 columns); the jitted pass receives only [V, n_pix, ...]
arrays and renders V*n_pix rays in one traced computation (vs the
reference's per-view Python loop).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.lushnerf import LushConfig
from lushnerf_tpu.models.renderer import prepare_rays, render_rays_scene
from lushnerf_tpu.ops.rays import HALF_PIX


def rays_at_pixels(K, c2w, pix_xy, H: int, W: int):
    """Rays for integer pixel coords (x, y) [N, 2] of one view.

    Equivalent to indexing the full get_rays grid at [y, x]
    (models/lushnerf.py:974-983), with the same clamping.
    """
    K = jnp.asarray(K)
    x = jnp.clip(pix_xy[:, 0], 0, W - 1).astype(jnp.float32)
    y = jnp.clip(pix_xy[:, 1], 0, H - 1).astype(jnp.float32)
    # the reference clamps the float coords then uses them as grid indices;
    # grid index i corresponds to pixel centre i (+HALF_PIX offset in dirs)
    x = jnp.floor(x)
    y = jnp.floor(y)
    dirs = jnp.stack(
        [
            (x + (HALF_PIX - K[0, 2])) / K[0, 0],
            -(y + (HALF_PIX - K[1, 2])) / K[1, 1],
            -jnp.ones_like(x),
        ],
        axis=-1,
    )
    rays_d = jnp.einsum("nk,ck->nc", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def render_aligned_pixels(
    params,
    cfg: LushConfig,
    H: int,
    W: int,
    K,
    poses: jnp.ndarray,  # [V, 3, 4] train poses
    align_pix: jnp.ndarray,  # [V, n_pix, 2] matched pixel coords per view
) -> jnp.ndarray:
    """Render the matched pixels of every view via the sharp branch.

    Returns rgb_align [V, n_pix, 3] (fine rgb, pre-tonemap — the reference
    feeds render_train_scene's raw rgb into the loss)."""
    V, n_pix = align_pix.shape[0], align_pix.shape[1]

    def per_view(c2w, pix):
        return rays_at_pixels(K, c2w, pix, H, W)

    rays_o, rays_d = jax.vmap(per_view)(poses, align_pix)  # [V, n_pix, 3]
    rays_o = jax.lax.stop_gradient(rays_o.reshape(V * n_pix, 3))
    rays_d = jax.lax.stop_gradient(rays_d.reshape(V * n_pix, 3))

    prepared = prepare_rays(cfg.render, H, W, K[0][0], rays_o, rays_d, cfg.near, cfg.far)
    out = render_rays_scene(
        params["coarse"],
        params.get("fine"),
        cfg.mlp_cfg,
        cfg.render,
        prepared,
        # eval-style sampling (render_kwargs_test: perturb=0, no noise),
        # but self.training remains True in the reference so the
        # near-plane mask stays OFF -> inference=False here.
        inference=False,
    )
    return out["rgb"].reshape(V, n_pix, 3)
