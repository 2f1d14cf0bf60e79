"""Volumetric rendering engine.

Reference behavior (models/lushnerf.py):
  * render_rays / render_rays_nonoise (:354-583): linear z placement in
    [near, far] (or inverse depth), optional stratified perturb, coarse MLP,
    raw2outputs compositing, inverse-CDF importance sampling of
    weights[..., 1:-1] over z midpoints, sorted merge, fine MLP, composite.
  * render_rays_noise (:585-617): SND noise head — evaluates the noise MLP
    at the single unperturbed sample `noise_sample_idx` (=16) of each ray
    with stop-gradient inputs, returning raw per-ray RGB noise.
  * ray preparation (render_infer :679-763): viewdirs = normalized pre-NDC
    direction; NDC projection for forward-facing scenes; near/far columns.

TPU-first design: no Python chunk loops — the whole ray batch is one traced
computation; the MLP point evaluation is chunked with `lax.map` +
`jax.checkpoint` (remat) so activations never exceed VMEM/HBM budgets, and
can be swapped for the fused Pallas kernel backend.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from lushnerf_tpu.models.mlp import MLPConfig, apply_nerf_mlp
from lushnerf_tpu.ops.compositing import raw2outputs
from lushnerf_tpu.ops.encoding import PositionalEncoding
from lushnerf_tpu.ops.rays import ndc_rays
from lushnerf_tpu.ops.sampling import (
    det_u,
    linear_z_vals,
    merge_z_vals,
    sample_pdf,
    stratify_z_vals,
)

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "exp": jnp.exp,
    "none": lambda x: x,
    "sigmoid1": lambda x: 1.002 / (jnp.exp(-x) + 1.0) - 0.001,
    "softplus": lambda x: jax.nn.softplus(x - 1.0),
}


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable; safe to close over in jit)."""

    n_samples: int = 64
    n_importance: int = 64
    use_viewdirs: bool = True
    ndc: bool = True
    lindisp: bool = False
    perturb: bool = True  # train-time stratified jitter
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    rm_nearplane: float = 0.0  # applied at inference only (caller gates)
    rgb_activate: str = "sigmoid"
    sigma_activate: str = "relu"
    multires: int = 10
    multires_views: int = 4
    noise_sample_idx: int = 16
    point_chunk: int = 0  # 0 = single call; else remat-chunked MLP eval
    mlp_backend: str = "xla"  # 'xla' | 'pallas'
    # matmul input precision inside the fused kernel ('float32' |
    # 'bfloat16'); accumulation is always f32.  bf16 runs the MXU at full
    # rate; f32 needs multiple passes.
    mlp_compute_dtype: str = "float32"
    # (fwd, bwd) pallas point-tile override; (0, 0) = the kernel's
    # measured DEFAULT_TILE.  Exposed for tuning and for interpret-mode
    # runs where a single big tile keeps the traced grid short.
    mlp_tile: tuple = (0, 0)
    # pallas backward strategy: 'remat' recomputes activations (4 passes,
    # zero activation HBM traffic) | 'stash' streams compute-dtype
    # activations from the forward and skips the recompute (3 passes).
    # See ops/fused/nerf_mlp.fused_mlp_packed.
    mlp_bwd: str = "remat"

    @property
    def pe_x(self) -> PositionalEncoding:
        return PositionalEncoding(num_freqs=self.multires, input_dims=3)

    @property
    def pe_d(self) -> PositionalEncoding:
        return PositionalEncoding(num_freqs=self.multires_views, input_dims=3)

    @property
    def input_ch(self) -> int:
        return self.pe_x.out_dim

    @property
    def input_ch_views(self) -> int:
        return self.pe_d.out_dim if self.use_viewdirs else 0


def prepare_rays(cfg: RenderConfig, H: int, W: int, focal, rays_o, rays_d, near, far):
    """Viewdirs + optional NDC projection + per-ray near/far.

    rays_o, rays_d: [R, 3].  Returns dict of [R, ...] arrays.
    """
    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if cfg.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    near_c = jnp.full_like(rays_d[..., :1], near)
    far_c = jnp.full_like(rays_d[..., :1], far)
    return dict(rays_o=rays_o, rays_d=rays_d, viewdirs=viewdirs, near=near_c, far=far_c)


# ---------------------------------------------------------------------------
# MLP point evaluation (backend-switchable)
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def eval_points(
    params,
    mlp_cfg: MLPConfig,
    cfg: RenderConfig,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
):
    """Evaluate the scene MLP at pts [R, S, 3] with per-ray viewdirs [R, 3].

    Fuses PE + MLP.  With cfg.point_chunk > 0 the flattened point axis is
    processed in remat'ed chunks via lax.map (replaces the reference's
    `netchunk` Python loop, models/lushnerf.py:234,247-257, with a single
    traced scan).  Returns raw [R, S, out_ch].
    """
    if cfg.mlp_backend == "pallas":
        from lushnerf_tpu.ops.fused import nerf_mlp as fused

        if fused.supports(mlp_cfg, cfg):
            tile = cfg.mlp_tile if cfg.mlp_tile != (0, 0) else fused.DEFAULT_TILE
            return fused.eval_points_fused(params, mlp_cfg, cfg, pts, viewdirs,
                                           tile=tile)
        # architectures outside the kernel family (e.g. the small noise
        # MLP) fall back to the XLA path below

    R, S = pts.shape[0], pts.shape[1]
    x = pts.reshape(R * S, 3)
    d = None
    if viewdirs is not None:
        d = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)

    def apply_flat(x_f, d_f):
        x_pe = cfg.pe_x(x_f)
        d_pe = cfg.pe_d(d_f) if d_f is not None else None
        return apply_nerf_mlp(params, mlp_cfg, x_pe, d_pe)

    P = R * S
    chunk = cfg.point_chunk
    if chunk and P > chunk:
        P_pad = _round_up(P, chunk)
        x = jnp.pad(x, ((0, P_pad - P), (0, 0)))
        if d is not None:
            d = jnp.pad(d, ((0, P_pad - P), (0, 0)))
        xs = x.reshape(P_pad // chunk, chunk, 3)
        if d is not None:
            ds = d.reshape(P_pad // chunk, chunk, 3)
            raw = lax.map(jax.checkpoint(lambda ab: apply_flat(ab[0], ab[1])), (xs, ds))
        else:
            raw = lax.map(jax.checkpoint(lambda a: apply_flat(a, None)), xs)
        raw = raw.reshape(P_pad, -1)[:P]
    else:
        raw = apply_flat(x, d)
    return raw.reshape(R, S, -1)


# ---------------------------------------------------------------------------
# Scene rendering (coarse [+ fine])
# ---------------------------------------------------------------------------


def render_rays_scene(
    coarse_params,
    fine_params,
    mlp_cfg: MLPConfig,
    cfg: RenderConfig,
    prepared: Dict[str, jnp.ndarray],
    *,
    t_rand: Optional[jnp.ndarray] = None,
    u_importance: Optional[jnp.ndarray] = None,
    density_noise_coarse: Optional[jnp.ndarray] = None,
    density_noise_fine: Optional[jnp.ndarray] = None,
    inference: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical scene render of a prepared ray batch (no noise head).

    Randomness is passed explicitly: t_rand [R, S] stratified uniforms
    (None = unperturbed), u_importance [R, S_imp] (None = deterministic
    linspace, reference det mode), density noise arrays (None = off).
    """
    rays_o, rays_d = prepared["rays_o"], prepared["rays_d"]
    viewdirs = prepared["viewdirs"]
    near, far = prepared["near"][..., 0], prepared["far"][..., 0]
    R = rays_o.shape[0]

    rgb_act = ACTIVATIONS[cfg.rgb_activate]
    sigma_act = ACTIVATIONS[cfg.sigma_activate]
    rm = cfg.rm_nearplane if inference else 0.0

    z_vals = linear_z_vals(near, far, cfg.n_samples, cfg.lindisp, rays_o.dtype)
    if t_rand is not None:
        z_vals = stratify_z_vals(z_vals, t_rand)

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = eval_points(coarse_params, mlp_cfg, cfg, pts, viewdirs)
    comp = raw2outputs(
        raw, z_vals, rays_d, rgb_act, sigma_act, density_noise_coarse, rm, cfg.white_bkgd
    )

    out = {
        "rgb": comp.rgb,
        "depth": comp.depth,
        "acc": comp.acc,
        "density": comp.density,
        "weights": comp.weights,
        "z_vals": z_vals,
    }
    if cfg.n_importance <= 0:
        return out

    out.update(
        rgb0=comp.rgb, depth0=comp.depth, acc0=comp.acc, density0=comp.density
    )

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if u_importance is None:
        u_importance = det_u((R,), cfg.n_importance, z_vals.dtype)
    z_samples = lax.stop_gradient(
        sample_pdf(z_mid, lax.stop_gradient(comp.weights[..., 1:-1]), u_importance)
    )
    z_all = merge_z_vals(z_vals, z_samples)

    pts_f = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    params_f = fine_params if fine_params is not None else coarse_params
    raw_f = eval_points(params_f, mlp_cfg, cfg, pts_f, viewdirs)
    comp_f = raw2outputs(
        raw_f, z_all, rays_d, rgb_act, sigma_act, density_noise_fine, rm, cfg.white_bkgd
    )

    out.update(
        rgb=comp_f.rgb,
        depth=comp_f.depth,
        acc=comp_f.acc,
        density=comp_f.density,
        weights=comp_f.weights,
        z_vals=z_all,
        z_std=jnp.std(z_samples, axis=-1),
    )
    return out


def render_rays_noise(
    noise_params,
    noise_cfg: MLPConfig,
    cfg: RenderConfig,
    prepared: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """SND noise head: raw per-ray RGB noise (models/lushnerf.py:585-617).

    Evaluated at the single unperturbed sample `noise_sample_idx` with
    stop-gradient point/dir inputs (the reference detaches both).
    Returns raw noise [R, 3] (caller applies 0.1*sigmoid).
    """
    rays_o, rays_d = prepared["rays_o"], prepared["rays_d"]
    viewdirs = prepared["viewdirs"]
    near, far = prepared["near"][..., 0], prepared["far"][..., 0]

    z_vals = linear_z_vals(near, far, cfg.n_samples, cfg.lindisp, rays_o.dtype)
    z = z_vals[..., cfg.noise_sample_idx]
    pt = rays_o + rays_d * z[..., None]  # [R, 3]
    pt = lax.stop_gradient(pt)
    d = lax.stop_gradient(viewdirs) if viewdirs is not None else None

    x_pe = cfg.pe_x(pt)
    d_pe = cfg.pe_d(d) if d is not None else None
    return apply_nerf_mlp(noise_params, noise_cfg, x_pe, d_pe)
