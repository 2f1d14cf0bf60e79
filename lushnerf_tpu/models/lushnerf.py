"""The composed LuSh-NeRF model: hierarchical NeRF + SND noise head +
RBK deformable blur kernel + tone mapping.

Mirrors the mode dispatch of the reference NeRFAll.forward
(models/lushnerf.py:619-677) as separate pure functions (one jitted graph
per training stage — the reference's data-dependent Python branches become
distinct compiled step variants):

  * forward_naive  — warmup (i < kernel_start_iter) and the no-blur path:
    hierarchical render of the original rays; the noise head is evaluated
    but NOT added to the returned color (:657-662 — it receives no gradient
    during warmup).
  * forward_kernel — main DSK stage: RBK sub-ray bundles rendered through
    the field, composited with learned weights, SND noise added before tone
    mapping (:636-654); optional frequency-mask gradient gating (:641-643).
  * render_image   — eval path (:868-896): full-image render returning
    tonemapped rgb, tonemapped 0.1*sigmoid(noise) image, and depth.

All randomness enters via an explicit JAX PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from lushnerf_tpu.models.mlp import MLPConfig, init_nerf_mlp
from lushnerf_tpu.models.rbk import RBKConfig, apply_rbk, init_rbk, rbk_weighted_sum
from lushnerf_tpu.models.renderer import (
    RenderConfig,
    prepare_rays,
    render_rays_noise,
    render_rays_scene,
)
from lushnerf_tpu.models.tonemap import apply_tonemap, init_tonemap
from lushnerf_tpu.ops.rays import get_rays

Params = Dict[str, Any]

NOISE_SCALE = 0.1  # run_lushnerf reference: rgb_noise = 0.1 * sigmoid(raw)


@dataclasses.dataclass(frozen=True)
class LushConfig:
    """Static model + rendering configuration for the full LuSh-NeRF stack."""

    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    rbk: RBKConfig = dataclasses.field(default_factory=RBKConfig)
    blur_model_type: str = "dpnerf"  # 'dpnerf' | 'none'
    tone_mapping_type: str = "gamma"
    num_images: int = 1
    near: float = 0.0
    far: float = 1.0
    # Weight of the zero-mean-blur anchor penalty on the RBK bundle
    # (framework addition, not in the reference): the blur composite's
    # weighted-mean sub-ray is pulled onto the original ray, removing the
    # gauge mode where the whole scene drifts off the pixel grid while the
    # per-image kernels absorb the shift (the reference's RBK has this flat
    # direction — shipped configs enable the anchor; 0.0 reproduces the
    # reference exactly).
    rbk_anchor_reg: float = 0.0
    # depth (in ray-lengths) at which the far anchor point is evaluated;
    # should span the visible scene (forward-facing LLFF content sits at
    # a few ray-lengths from the camera)
    rbk_anchor_depth: float = 8.0
    # SND noise head in the blur-stage forward (True = reference).  False
    # (ablation aid) skips the noise MLP and composites rgb_noise = 0.
    use_snd: bool = True
    # L1 shrinkage on the ccw-weighted blur spread (framework addition,
    # 0.0 = reference): blur below ~a pixel is UNIDENTIFIABLE — the
    # kernel can absorb genuine high-frequency content as 'blur', which
    # is what costs RBK ~0.3 dB vs the control on mild scenes
    # (LONGRUN_r04 finding 1).  An L1 (not L2) penalty on the weighted
    # sub-ray dispersion applies a constant shrinkage force that
    # collapses sub-threshold kernels to identity while only slightly
    # biasing large (well-identified) blur — a magnitude-adaptive gate
    # with no schedule (VERDICT r4 #10).
    rbk_spread_l1: float = 0.0
    # gamma-tonemap input floor (0.0 = reference; see models/tonemap.py —
    # guards the x^(1/2.2) gradient pole at saturated-dark pixels)
    tonemap_eps: float = 0.0
    # SND output-bias init (framework addition; 0.0 = reference torch
    # default).  The reference's noise head starts at sigmoid(~0) = 0.5,
    # i.e. a CONSTANT +0.05 radiance added to every pixel from the first
    # blur-stage step — the scene field must learn a compensating -0.05
    # and dark-pixel tonemap gradients shrink meanwhile (measured as a
    # persistent ~0.5 dB eval drag of SND variants in LONGRUN_r04).
    # A negative bias b starts the noise at 0.1*sigmoid(b) ~ the actual
    # sensor-noise floor instead (e.g. -3.0 -> 0.0047).
    snd_bias_init: float = 0.0
    # L1 penalty weight on the SND noise output (framework addition,
    # 0.0 = reference).  The scene+noise decomposition has a GAUGE mode:
    # any DC radiance c can move from the scene field into the noise head
    # with ZERO training-loss change (tonemap(scene + noise) is all the
    # loss sees), but eval renders the sharp branch only — measured on
    # the r5 ISP scene, the head absorbed ~0.06 radiance and eval
    # collapsed 36 -> 19.5 dB.  An L1 on the (nonnegative) noise output
    # fixes the gauge: noise grows only where it reduces photometric
    # loss by more than snd_l1 per unit, i.e. where there is actual
    # per-view noise to explain.
    snd_l1: float = 0.0

    @property
    def mlp_cfg(self) -> MLPConfig:
        return MLPConfig(
            depth=self.netdepth,
            width=self.netwidth,
            input_ch=self.render.input_ch,
            input_ch_views=self.render.input_ch_views,
            use_viewdirs=self.render.use_viewdirs,
        )

    @property
    def mlp_cfg_fine(self) -> MLPConfig:
        return MLPConfig(
            depth=self.netdepth_fine,
            width=self.netwidth_fine,
            input_ch=self.render.input_ch,
            input_ch_views=self.render.input_ch_views,
            use_viewdirs=self.render.use_viewdirs,
        )

    @property
    def noise_cfg(self) -> MLPConfig:
        # NeRF_Noise is built at half depth/width (models/lushnerf.py:203-207).
        return MLPConfig(
            depth=self.netdepth // 2,
            width=self.netwidth // 2,
            input_ch=self.render.input_ch,
            input_ch_views=self.render.input_ch_views,
            use_viewdirs=self.render.use_viewdirs,
            rgb_only=True,
        )


def init_lush_params(key, cfg: LushConfig, dtype=jnp.float32) -> Params:
    kc, kf, kn, kr, kt = jax.random.split(key, 5)
    params: Params = {
        "coarse": init_nerf_mlp(kc, cfg.mlp_cfg, dtype),
        "noise": init_nerf_mlp(kn, cfg.noise_cfg, dtype),
        "tonemap": init_tonemap(kt, cfg.tone_mapping_type, dtype),
    }
    if cfg.snd_bias_init != 0.0:
        w, b = params["noise"]["rgb"]
        params["noise"]["rgb"] = (w, jnp.full_like(b, cfg.snd_bias_init))
    if cfg.render.n_importance > 0:
        params["fine"] = init_nerf_mlp(kf, cfg.mlp_cfg_fine, dtype)
    if cfg.blur_model_type == "dpnerf":
        params["rbk"] = init_rbk(kr, dataclasses.replace(cfg.rbk, num_images=cfg.num_images), dtype)
    return params


# ---------------------------------------------------------------------------
# Randomness plumbing
# ---------------------------------------------------------------------------


def _train_randomness(key, cfg: LushConfig, n_rays: int):
    """Sampled randomness for one scene render of n_rays rays."""
    rc = cfg.render
    k1, k2, k3, k4 = jax.random.split(key, 4)
    S, SI = rc.n_samples, rc.n_importance
    t_rand = jax.random.uniform(k1, (n_rays, S)) if rc.perturb else None
    u_imp = jax.random.uniform(k2, (n_rays, SI)) if (rc.perturb and SI > 0) else None
    dn_c = dn_f = None
    if rc.raw_noise_std > 0:
        dn_c = jax.random.normal(k3, (n_rays, S - 1)) * rc.raw_noise_std
        if SI > 0:
            dn_f = jax.random.normal(k4, (n_rays, S + SI - 1)) * rc.raw_noise_std
    return dict(
        t_rand=t_rand,
        u_importance=u_imp,
        density_noise_coarse=dn_c,
        density_noise_fine=dn_f,
    )


# ---------------------------------------------------------------------------
# Training forwards
# ---------------------------------------------------------------------------


def forward_naive(
    params: Params,
    cfg: LushConfig,
    H: int,
    W: int,
    focal,
    rays: jnp.ndarray,
    key,
    rand_override: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Warmup / no-blur forward on original rays (reference :657-662).

    rays: [N, 3, 2].  Returns tonemapped rgb/rgb0 and the (unused-in-loss)
    noise prediction, mirroring the reference's return tuple.
    rand_override: explicit randomness dict (keys as _train_randomness)
    replacing the key-derived draws — used by parity tests to feed the
    reference's pytest=True seeded-numpy values.
    """
    tm = cfg.tone_mapping_type
    prepared = prepare_rays(
        cfg.render, H, W, focal, rays[..., 0], rays[..., 1], cfg.near, cfg.far
    )
    rnd = rand_override if rand_override is not None else _train_randomness(
        key, cfg, rays.shape[0]
    )
    out = render_rays_scene(
        params["coarse"], params.get("fine"), cfg.mlp_cfg, cfg.render, prepared, **rnd
    )
    raw_noise = render_rays_noise(params["noise"], cfg.noise_cfg, cfg.render, prepared)
    rgb_noise = NOISE_SCALE * jax.nn.sigmoid(raw_noise)
    tmap = lambda v: apply_tonemap(params["tonemap"], tm, v, cfg.tonemap_eps)
    return {
        "rgb_blur": tmap(out["rgb"]),
        "rgb0_blur": tmap(out.get("rgb0", out["rgb"])),
        "rgb_noise": rgb_noise,
        "depth": out["depth"],
        "acc": out["acc"],
    }


def forward_kernel(
    params: Params,
    cfg: LushConfig,
    H: int,
    W: int,
    focal,
    rays: jnp.ndarray,
    image_idx: jnp.ndarray,
    key,
    fq_mask: Optional[jnp.ndarray] = None,
    rand_override: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Main DSK training forward (reference :636-654).

    rays: [N, 3, 2]; image_idx: [N] int; fq_mask: [N] bool or None.  When
    fq_mask is given (i < allkernel_start_iter), gradients to the blur
    kernel flow only through rays whose mask is True (torch.where detach
    gating, :641-643).
    """
    tm = cfg.tone_mapping_type
    N = rays.shape[0]
    M1 = cfg.rbk.num_rays_out

    sub_rays, ccw = apply_rbk(params["rbk"], cfg.rbk, rays, image_idx)  # [N, M1, 3, 2]
    if fq_mask is not None:
        gate = fq_mask.astype(bool).reshape(N, 1, 1, 1)
        sub_rays = jnp.where(gate, sub_rays, lax.stop_gradient(sub_rays))

    flat = sub_rays.reshape(N * M1, 3, 2)  # fold bundle into the ray axis
    prepared = prepare_rays(
        cfg.render, H, W, focal, flat[..., 0], flat[..., 1], cfg.near, cfg.far
    )
    if rand_override is not None:
        rnd = rand_override
    else:
        k_scene, _ = jax.random.split(key)
        rnd = _train_randomness(k_scene, cfg, N * M1)
    out = render_rays_scene(
        params["coarse"], params.get("fine"), cfg.mlp_cfg, cfg.render, prepared, **rnd
    )

    # SND noise on the ORIGINAL rays (render_train_noise, :647).
    if cfg.use_snd:
        prep_orig = prepare_rays(
            cfg.render, H, W, focal, rays[..., 0], rays[..., 1], cfg.near, cfg.far
        )
        raw_noise = render_rays_noise(
            params["noise"], cfg.noise_cfg, cfg.render, prep_orig
        )
        rgb_noise = NOISE_SCALE * jax.nn.sigmoid(raw_noise)  # [N, 3]
    else:
        rgb_noise = jnp.zeros((N, 3), rays.dtype)

    rgb_pure = rbk_weighted_sum(out["rgb"].reshape(N, M1, 3), ccw)
    rgb0_pure = rbk_weighted_sum(out["rgb0"].reshape(N, M1, 3), ccw)
    depth = rbk_weighted_sum(out["depth"].reshape(N, M1), ccw)
    acc = rbk_weighted_sum(out["acc"].reshape(N, M1), ccw)

    # Zero-mean-blur anchor (see LushConfig.rbk_anchor_reg): squared drift
    # of the bundle's weighted-mean ray vs the original ray, evaluated at
    # the ray origin AND at `rbk_anchor_depth` ray-lengths out.  Pinning
    # only origin+unit-endpoint is NOT enough: a mean direction tilt of
    # eps displaces the image by ~focal*eps*z/z at scene depth z>>1 while
    # costing only eps in the penalty — measured on the synthetic staged
    # run as a persistent ~4 px scene shift with a drift_dir of 0.0135.
    # Anchoring at depth Z makes the blur centroid coincide with the
    # original ray across the whole visible depth range.  Uses the
    # fq-gated sub_rays so kernel-stage gradient gating is respected.
    mean_sub = rbk_weighted_sum(sub_rays, ccw)  # [N, 3, 2]
    drift_o = mean_sub[..., 0] - rays[..., 0]
    drift_d = mean_sub[..., 1] - rays[..., 1]
    Z = cfg.rbk_anchor_depth
    rbk_drift = jnp.mean(
        jnp.sum(drift_o**2, axis=-1)
        + jnp.sum((drift_o + Z * drift_d) ** 2, axis=-1)
    )

    # ccw-weighted L1 dispersion of the bundle around its mean, evaluated
    # at the anchor depth (see LushConfig.rbk_spread_l1): the expected
    # endpoint scatter that IS the blur extent, in ray units.  Weighted by
    # ccw so zero-weight stray motions (which do not blur the image) are
    # not penalized.
    dev = sub_rays - mean_sub[:, None]  # [N, M1, 3, 2]
    dev_pt = dev[..., 0] + Z * dev[..., 1]  # [N, M1, 3]
    rbk_spread = jnp.mean(
        jnp.sum(ccw * jnp.sqrt(jnp.sum(dev_pt**2, axis=-1) + 1e-12), axis=-1)
    )

    tmap = lambda v: apply_tonemap(params["tonemap"], tm, v, cfg.tonemap_eps)
    return {
        "rbk_drift": rbk_drift,
        "rbk_spread": rbk_spread,
        "rgb_blur": tmap(rgb_pure + rgb_noise),
        "rgb0_blur": tmap(rgb0_pure + rgb_noise),
        "rgb_noise": rgb_noise,
        "rgb_pure": tmap(rgb_pure),
        "rgb0_pure": tmap(rgb0_pure),
        "depth": depth,
        "acc": acc,
        "ccw": ccw,
    }


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def render_rays_chunked_eval(
    params: Params,
    cfg: LushConfig,
    H: int,
    W: int,
    focal,
    rays: jnp.ndarray,
    ray_chunk: int = 4096,
):
    """Eval-mode render of arbitrary rays [R, 3, 2] in lax.map chunks.

    perturb=0, raw_noise_std=0, inference=True (near-plane removal active —
    render_kwargs_test, run_lushnerf.py:406-410).  Returns raw (pre-tonemap)
    rgb, raw noise, depth.
    """
    R = rays.shape[0]
    R_pad = -(-R // ray_chunk) * ray_chunk
    rays_p = jnp.pad(rays, ((0, R_pad - R), (0, 0), (0, 0)))
    chunks = rays_p.reshape(R_pad // ray_chunk, ray_chunk, 3, 2)

    def render_chunk(chunk):
        prepared = prepare_rays(
            cfg.render, H, W, focal, chunk[..., 0], chunk[..., 1], cfg.near, cfg.far
        )
        out = render_rays_scene(
            params["coarse"],
            params.get("fine"),
            cfg.mlp_cfg,
            cfg.render,
            prepared,
            inference=True,
        )
        raw_noise = render_rays_noise(params["noise"], cfg.noise_cfg, cfg.render, prepared)
        return out["rgb"], raw_noise, out["depth"]

    rgb, raw_noise, depth = lax.map(render_chunk, chunks)
    return (
        rgb.reshape(R_pad, 3)[:R],
        raw_noise.reshape(R_pad, 3)[:R],
        depth.reshape(R_pad)[:R],
    )


def render_warped_view(
    params: Params,
    cfg: LushConfig,
    H: int,
    W: int,
    K,
    c2w,
    image_idx: int,
    ray_chunk: int = 4096,
):
    """Render each RBK sub-ray bundle of one training view separately.

    A WORKING equivalent of the reference's dead render_warped_path
    (models/lushnerf.py:898-947 — signature-mismatched with RBK.forward,
    SURVEY.md quirks ledger): returns (rgbs [M+1, H, W, 3] tonemapped,
    depths [M+1, H, W], centre_sub_rays [M+1, 3, 2]) so the learned blur
    decomposition can be inspected.
    """
    M1 = cfg.rbk.num_rays_out
    rays_o, rays_d = get_rays(H, W, K, c2w)
    rays = jnp.stack([rays_o, rays_d], axis=-1).reshape(-1, 3, 2)
    idx = jnp.full((rays.shape[0],), image_idx, jnp.int32)
    sub_rays, _ = apply_rbk(params["rbk"], cfg.rbk, rays, idx)  # [HW, M1, 3, 2]
    centre = sub_rays.reshape(H, W, M1, 3, 2)[H // 2, W // 2]
    flat = jnp.transpose(sub_rays, (1, 0, 2, 3)).reshape(M1 * H * W, 3, 2)
    rgb, _, depth = render_rays_chunked_eval(params, cfg, H, W, K[0][0], flat, ray_chunk)
    tm = cfg.tone_mapping_type
    rgb = apply_tonemap(params["tonemap"], tm, rgb, cfg.tonemap_eps).reshape(M1, H, W, 3)
    return rgb, depth.reshape(M1, H, W), centre


def render_image(
    params: Params,
    cfg: LushConfig,
    H: int,
    W: int,
    K,
    c2w,
    ray_chunk: int = 4096,
):
    """Render one full image from a camera pose (reference render_path).

    Returns (rgb [H,W,3] tonemapped, noise_img [H,W,3] tonemapped
    0.1*sigmoid, depth [H,W]) matching NeRFAll eval outputs (:671-677).
    """
    rays_o, rays_d = get_rays(H, W, K, c2w)
    rays = jnp.stack([rays_o, rays_d], axis=-1).reshape(-1, 3, 2)
    rgb, raw_noise, depth = render_rays_chunked_eval(params, cfg, H, W, K[0][0], rays, ray_chunk)
    tm = cfg.tone_mapping_type
    rgb = apply_tonemap(params["tonemap"], tm, rgb, cfg.tonemap_eps).reshape(H, W, 3)
    noise_img = apply_tonemap(
        params["tonemap"], tm, NOISE_SCALE * jax.nn.sigmoid(raw_noise), cfg.tonemap_eps
    ).reshape(H, W, 3)
    return rgb, noise_img, depth.reshape(H, W)
