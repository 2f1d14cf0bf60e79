"""Rigid Blurring Kernel (DP-NeRF RBK): learned per-image SE(3) sub-ray
bundles that reproduce camera motion blur.

Matches models/lushnerf.py:27-175:
  * per-image embedding [num_img, embed_ch] (View_Embedding, :27-35;
    torch.nn.Embedding default init = N(0,1))
  * trunk MLP (D=4, W=64, skip rule as in the reference — with skips=(4,)
    and D=4 the skip never fires)
  * three heads from the shared trunk feature:
      r: rotation screws   [N, 3*M], scaled by rv_window
      v: translations      [N, 3*M], scaled by rv_window
      w: composite weights [N, M+1], sigmoid then sum-normalized (+1e-10)
  * r/v output layers initialized ~ U(-1e-5, 1e-5) (xavier_uniform with
    gain 1e-5/sqrt((fan_in+fan_out)/6), :62-68) so warps start near
    identity; biases keep the torch default init (reference behavior).
  * rbk_warp (:75-98): warp ray origin and the point origin+dir by each
    SE(3) motion; warped dir = warped_end - warped_origin; slot 0 keeps the
    original ray (use_origin=True).

TPU-first: the motion axis is vectorized (no Python loop over motions at
trace time beyond a static M), and warped sub-rays are returned as
[N, M+1, 3, 2] for the caller to fold into the ray axis before sharding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.mlp import linear, linear_init
from lushnerf_tpu.ops.se3 import se3_warp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RBKConfig:
    num_images: int = 1
    embed_ch: int = 64  # rbk_view_embed_ch
    depth: int = 4  # rbk_enc_brc_depth
    width: int = 64  # rbk_enc_brc_width
    skips: Tuple[int, ...] = (4,)  # rbk_enc_brc_skips
    num_motion: int = 4  # rbk_num_motion
    r_depth: int = 1
    r_width: int = 32
    r_output_ch: int = 3
    v_depth: int = 1
    v_width: int = 32
    v_output_ch: int = 3
    w_depth: int = 1
    w_width: int = 32
    rv_window: float = 0.1  # rbk_se_rv_window
    use_origin: bool = True
    # Framework addition (rbk_zero_head_bias): zero-init the r/v output
    # biases so warps start at EXACTLY identity.  The reference keeps the
    # torch-default bias (models/lushnerf.py:62-68) on heads whose weights
    # it deliberately shrinks to 1e-5 — the leftover bias is a translation/
    # rotation shared by every image, which kicks the gauge-drift mode the
    # zero-mean-blur anchor then has to undo (measured ~3 px of image
    # shift by iter 500 on the synthetic staged run).  False = reference.
    zero_head_bias: bool = False
    # Framework addition (rbk_guard_dz): replace DEGENERATE warped
    # sub-rays (direction z-component >= -eps, i.e. tilted onto/past the
    # image plane) with the original ray.  Root-caused failure (round-4
    # forensics, mild/rbk_cte_gt iter 3088): a motion whose composite
    # weight collapses (ccw ~ 1e-28) receives no photometric gradient and
    # drifts under Adam until its warped dz crosses 0; ndc_rays divides
    # by dz (same in the reference, run_lushnerf_helpers.py:542-562, no
    # guard), producing ~1e7-scale coordinates whose positional encoding
    # overflows -> one NaN poisons every parameter within a step.  The
    # replacement only fires where the reference computes geometric
    # garbage anyway.  False = reference behavior.
    guard_dz: bool = False
    guard_dz_eps: float = 1e-3
    # Framework addition (rbk_center_bundle): re-center every sub-ray
    # bundle so its ccw-weighted mean ray EXACTLY equals the original ray.
    # The RBK parameterization has a flat gauge direction — shift every
    # sub-ray (and therefore the reconstructed sharp scene) off the pixel
    # grid and the blur composite reproduces the same training images —
    # which the soft anchor penalty (rbk_anchor_reg) only damps: measured
    # residual drift of 1-2 px that differs run-to-run and dtype-to-dtype
    # (BF16_NOTE round 3).  Projecting the mean out removes the mode
    # structurally: the blur centroid coincides with the original camera
    # ray at every depth, for any parameter value, so eval renders are
    # pinned to the GT pixel grid by construction.  False = reference.
    center_bundle: bool = False

    @property
    def num_rays_out(self) -> int:
        return self.num_motion + (1 if self.use_origin else 0)

    def trunk_in_dim(self, i: int) -> int:
        if i == 0:
            return self.embed_ch
        return self.width + self.embed_ch if (i - 1) in self.skips else self.width


def _tiny_head_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """xavier_uniform with gain chosen so the bound is exactly 1e-5
    (models/lushnerf.py:62-68); bias keeps the torch Linear default."""
    kw, kb = jax.random.split(key)
    gain = 1.0e-5 / math.sqrt((fan_in + fan_out) / 6.0)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))  # == 1e-5
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bb, bb)
    return w, b


def init_rbk(key, cfg: RBKConfig, dtype=jnp.float32) -> Params:
    n_keys = 2 + cfg.depth + cfg.r_depth + 1 + cfg.v_depth + 1 + cfg.w_depth + 1
    keys = list(jax.random.split(key, n_keys))
    nk = iter(keys)
    params: Params = {
        # torch.nn.Embedding default init: N(0, 1).
        "embed": jax.random.normal(next(nk), (cfg.num_images, cfg.embed_ch), dtype),
        "trunk": [
            linear_init(next(nk), cfg.trunk_in_dim(i), cfg.width, dtype)
            for i in range(cfg.depth)
        ],
    }
    r_dims = [cfg.width] + [cfg.r_width] * cfg.r_depth
    params["r_branch"] = [
        linear_init(next(nk), r_dims[i], r_dims[i + 1], dtype) for i in range(cfg.r_depth)
    ]
    def head_init(key, fan_in, fan_out):
        w, b = _tiny_head_init(key, fan_in, fan_out, dtype)
        return (w, jnp.zeros_like(b)) if cfg.zero_head_bias else (w, b)

    params["r_out"] = head_init(next(nk), cfg.r_width, cfg.r_output_ch * cfg.num_motion)
    v_dims = [cfg.width] + [cfg.v_width] * cfg.v_depth
    params["v_branch"] = [
        linear_init(next(nk), v_dims[i], v_dims[i + 1], dtype) for i in range(cfg.v_depth)
    ]
    params["v_out"] = head_init(next(nk), cfg.v_width, cfg.v_output_ch * cfg.num_motion)
    w_dims = [cfg.width] + [cfg.w_width] * cfg.w_depth
    params["w_branch"] = [
        linear_init(next(nk), w_dims[i], w_dims[i + 1], dtype) for i in range(cfg.w_depth)
    ]
    params["w_out"] = linear_init(next(nk), cfg.w_width, cfg.num_motion + 1, dtype)
    return params


def apply_rbk(params: Params, cfg: RBKConfig, rays: jnp.ndarray, image_idx: jnp.ndarray):
    """Predict sub-ray bundles for a batch of rays.

    rays: [N, 3, 2] (origin, direction stacked on the last axis, reference
    layout run_lushnerf.py:607); image_idx: [N] int.
    Returns (sub_rays [N, M+1, 3, 2], ccw [N, M+1]).
    """
    if not cfg.use_origin:
        # The reference crashes on this combination too (rbk_weighted_sum
        # reads `num_motion` only assigned under use_origin,
        # models/lushnerf.py:101-102), and all shipped configs set
        # rbk_use_origin (configs/*:41).  Fail with a clear message instead
        # of a shape error downstream.
        raise ValueError(
            "rbk_use_origin=False is unsupported: the weight head predicts "
            "num_motion+1 composite weights (one per warped sub-ray plus the "
            "original ray); set rbk_use_origin=True as every reference "
            "scene config does."
        )
    e = params["embed"][image_idx]  # [N, embed_ch]
    h = e
    for i in range(cfg.depth):
        h = jax.nn.relu(linear(params["trunk"][i], h))
        if i in cfg.skips:
            h = jnp.concatenate([e, h], axis=-1)

    h_r, h_v, h_w = h, h, h
    for lyr in params["r_branch"]:
        h_r = jax.nn.relu(linear(lyr, h_r))
    for lyr in params["v_branch"]:
        h_v = jax.nn.relu(linear(lyr, h_v))
    for lyr in params["w_branch"]:
        h_w = jax.nn.relu(linear(lyr, h_w))

    M = cfg.num_motion
    r = linear(params["r_out"], h_r) * cfg.rv_window  # [N, 3*M]
    v = linear(params["v_out"], h_v) * cfg.rv_window  # [N, 3*M]
    w = jax.nn.sigmoid(linear(params["w_out"], h_w))  # [N, M+1]
    ccw = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-10)

    # Reference reshape [N, 3, M] (models/lushnerf.py:76-77) -> motion-major
    # [N, M, 3] for vectorized warping.
    r = r.reshape(-1, 3, M).transpose(0, 2, 1)
    v = v.reshape(-1, 3, M).transpose(0, 2, 1)

    rays_o = rays[..., 0]  # [N, 3]
    rays_d = rays[..., 1]
    ends = rays_o + rays_d

    o_b = jnp.broadcast_to(rays_o[:, None, :], r.shape)
    e_b = jnp.broadcast_to(ends[:, None, :], r.shape)
    warped_o = se3_warp(o_b, r, v)  # [N, M, 3]
    warped_end = se3_warp(e_b, r, v)
    warped_d = warped_end - warped_o

    warped = jnp.stack([warped_o, warped_d], axis=-1)  # [N, M, 3, 2]
    if cfg.use_origin:
        orig = jnp.stack([rays_o, rays_d], axis=-1)[:, None]  # [N, 1, 3, 2]
        sub_rays = jnp.concatenate([orig, warped], axis=1)  # [N, M+1, 3, 2]
    else:
        sub_rays = warped
    if cfg.center_bundle:
        # Pin the bundle's weighted-mean ray to the original ray (see
        # RBKConfig.center_bundle).  Differentiable in both the warps and
        # the composite weights; with ccw summing to 1 the subtraction is
        # exact: sum_i ccw_i (sub_i - (mean - orig)) == orig.
        mean_sub = jnp.einsum("nm,nmdc->ndc", ccw, sub_rays)
        orig_ray = jnp.stack([rays_o, rays_d], axis=-1)  # [N, 3, 2]
        sub_rays = sub_rays - (mean_sub - orig_ray)[:, None]
    if cfg.guard_dz:
        # degenerate-warp guard (see RBKConfig.guard_dz): forward-facing
        # rays have dz < 0; a warped dz >= -eps means the sub-ray is
        # parallel to / behind the image plane and the NDC projection
        # would blow up -> fall back to the original ray for that slot
        ok = sub_rays[..., 2, 1] < -cfg.guard_dz_eps  # [N, M+1]
        orig_b = jnp.stack([rays_o, rays_d], axis=-1)[:, None]  # [N, 1, 3, 2]
        sub_rays = jnp.where(ok[..., None, None], sub_rays, orig_b)
    return sub_rays, ccw


def rbk_weighted_sum(x: jnp.ndarray, ccw: jnp.ndarray) -> jnp.ndarray:
    """Composite per-sub-ray quantities with the learned weights.

    x: [N, M+1, ...]; ccw: [N, M+1].  (models/lushnerf.py:100-116 operates
    on flattened [(M+1)N] tensors; we keep the bundle axis explicit.)
    """
    ccw = ccw.reshape(ccw.shape + (1,) * (x.ndim - 2))
    return jnp.sum(x * ccw, axis=1)
