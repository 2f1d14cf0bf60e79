"""Golden-parity tests for MLPs, RBK blur kernel, tonemap, and the full
hierarchical renderer vs the weight-copied PyTorch reference (CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.mlp import MLPConfig, apply_nerf_mlp, init_nerf_mlp
from lushnerf_tpu.models.rbk import RBKConfig, apply_rbk, init_rbk, rbk_weighted_sum
from lushnerf_tpu.models.renderer import RenderConfig, prepare_rays, render_rays_noise, render_rays_scene
from lushnerf_tpu.models.tonemap import apply_tonemap, init_tonemap
from lushnerf_tpu.ops.encoding import PositionalEncoding

from tests.torch_ref import (
    float32_numpy_rand,
    copy_linear,
    copy_nerf_mlp,
    copy_rbk,
    make_ref_args,
    ref_helpers,
    ref_models,
    seeded_rand,
    t2n,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_nerf_mlp_matches_reference():
    helpers = ref_helpers()
    torch.manual_seed(0)
    D, W = 8, 32
    ref_mlp = helpers.NeRF(D=D, W=W, input_ch=63, input_ch_views=27, skips=[4], use_viewdirs=True)
    cfg = MLPConfig(depth=D, width=W, input_ch=63, input_ch_views=27, skips=(4,), use_viewdirs=True)
    params = copy_nerf_mlp(ref_mlp)

    rng = np.random.default_rng(0)
    x = _rand(rng, 50, 63)
    d = _rand(rng, 50, 27)
    ref_out = ref_mlp(torch.from_numpy(np.concatenate([x, d], -1))).detach().numpy()
    ours = np.asarray(apply_nerf_mlp(params, cfg, jnp.asarray(x), jnp.asarray(d)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_noise_mlp_matches_reference():
    helpers = ref_helpers()
    torch.manual_seed(1)
    # NeRF_Noise is built at half depth/width with skips=[4] which never
    # fires at D=4 (reference quirk; models/lushnerf.py:203-207).
    ref_mlp = helpers.NeRF_Noise(D=4, W=16, input_ch=63, input_ch_views=27, skips=[4], use_viewdirs=True)
    cfg = MLPConfig(depth=4, width=16, input_ch=63, input_ch_views=27, skips=(4,), use_viewdirs=True, rgb_only=True)
    params = copy_nerf_mlp(ref_mlp)

    rng = np.random.default_rng(1)
    x = _rand(rng, 20, 63)
    d = _rand(rng, 20, 27)
    ref_out = ref_mlp(torch.from_numpy(np.concatenate([x, d], -1))).detach().numpy()
    ours = np.asarray(apply_nerf_mlp(params, cfg, jnp.asarray(x), jnp.asarray(d)))
    assert ours.shape == (20, 3)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_mlp_init_shapes():
    cfg = MLPConfig(depth=8, width=256, input_ch=63, input_ch_views=27)
    params = init_nerf_mlp(jax.random.PRNGKey(0), cfg)
    assert params["pts"][0][0].shape == (63, 256)
    assert params["pts"][5][0].shape == (256 + 63, 256)  # skip widening
    assert params["views"][0].shape == (27 + 256, 128)
    assert params["rgb"][0].shape == (128, 3)


def test_rbk_matches_reference():
    ref_lush = ref_models()
    torch.manual_seed(2)
    num_img, M = 3, 4
    ref_rbk_wrap = ref_lush.RBK(
        num_img=num_img, view_embed_ch=64,
        D_rbk=4, W_rbk=64, D_rbk_r=1, W_rbk_r=32, D_rbk_v=1, W_rbk_v=32,
        D_rbk_w=1, W_rbk_w=32, output_ch_rbk_r=3, output_ch_rbk_v=3,
        skips_rbk=[4], rbk_use_origin=True, rbk_se_rv_window=0.1,
        num_motion_rbk=M, use_dpnerf=True,
    )
    cfg = RBKConfig(num_images=num_img, embed_ch=64, depth=4, width=64, skips=(4,),
                    num_motion=M, rv_window=0.1, use_origin=True)
    params = copy_rbk(ref_rbk_wrap.RBK, ref_rbk_wrap.view_embed_layer)

    rng = np.random.default_rng(2)
    N = 11
    rays = _rand(rng, N, 3, 2)
    idx = rng.integers(0, num_img, N)

    rays_info = {"images_idx": torch.from_numpy(idx.reshape(-1, 1))}
    ref_rays, ref_w = ref_rbk_wrap.RBK(torch.from_numpy(rays), rays_info)
    ref_rays = t2n(ref_rays).reshape(N, M + 1, 3, 2)
    ref_w = t2n(ref_w)

    sub_rays, ccw = apply_rbk(params, cfg, jnp.asarray(rays), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(ccw), ref_w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sub_rays), ref_rays, rtol=1e-3, atol=1e-5)

    # weighted recomposition parity (models/lushnerf.py:100-116)
    rgb = _rand(rng, N * (M + 1), 3)
    ref_sum = torch.sum(
        torch.from_numpy(rgb).reshape(-1, M + 1, 3) * torch.from_numpy(ref_w)[..., None], dim=1
    ).numpy()
    ours_sum = np.asarray(rbk_weighted_sum(jnp.asarray(rgb.reshape(N, M + 1, 3)), ccw))
    np.testing.assert_allclose(ours_sum, ref_sum, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("map_type", ["none", "gamma", "learn"])
def test_tonemap_matches_reference(map_type):
    helpers = ref_helpers()
    torch.manual_seed(3)
    ref_tm = helpers.ToneMapping(map_type)
    params = init_tonemap(jax.random.PRNGKey(3), map_type)
    if map_type == "learn":
        layers = [m for m in ref_tm.linear if isinstance(m, torch.nn.Linear)]
        params = {"layers": [copy_linear(l) for l in layers]}

    rng = np.random.default_rng(3)
    x = rng.random((13, 3)).astype(np.float32)
    ref_out = ref_tm(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(apply_tonemap(params, map_type, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def _build_ref_nerfall(n_importance=16, netwidth=32, rmnearplane=0):
    ref_lush = ref_models()
    torch.manual_seed(4)
    args = make_ref_args(N_importance=n_importance, netwidth=netwidth,
                         netwidth_fine=netwidth, render_rmnearplane=rmnearplane)
    nerfall = ref_lush.NeRFAll(args, None)
    return nerfall, args


def _copy_nerfall_params(nerfall):
    params = {
        "coarse": copy_nerf_mlp(nerfall.mlp_coarse),
        "noise": copy_nerf_mlp(nerfall.mlp_noise_coarse),
        "tonemap": {},
    }
    if nerfall.mlp_fine is not None:
        params["fine"] = copy_nerf_mlp(nerfall.mlp_fine)
    return params


def _make_ray_batch(rng, n):
    rays_o = _rand(rng, n, 3) * 0.1
    rays_d = _rand(rng, n, 3)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = np.zeros((n, 1), np.float32)
    far = np.ones((n, 1), np.float32)
    return np.concatenate([rays_o, rays_d, near, far, viewdirs], -1).astype(np.float32)


@pytest.mark.parametrize("perturb", [0.0, 1.0])
def test_render_rays_scene_matches_reference(perturb):
    """Full hierarchical render parity vs NeRFAll.render_rays_nonoise with
    seeded stratified/importance randomness (pytest=True semantics)."""
    nerfall, args = _build_ref_nerfall()
    params = _copy_nerfall_params(nerfall)
    nerfall.train()

    rng = np.random.default_rng(7)
    R, S, SI = 6, 32, 16
    ray_batch = _make_ray_batch(rng, R)

    with float32_numpy_rand():
        ref = nerfall.render_rays_nonoise(
            torch.from_numpy(ray_batch), N_samples=S, retraw=False, perturb=perturb,
            N_importance=SI, white_bkgd=False, raw_noise_std=0.0, pytest=True,
        )

    cfg = RenderConfig(
        n_samples=S, n_importance=SI, perturb=perturb > 0, raw_noise_std=0.0,
        ndc=False, rm_nearplane=0.0,
    )
    mlp_cfg = MLPConfig(depth=8, width=32, input_ch=63, input_ch_views=27)
    prepared = dict(
        rays_o=jnp.asarray(ray_batch[:, 0:3]),
        rays_d=jnp.asarray(ray_batch[:, 3:6]),
        viewdirs=jnp.asarray(ray_batch[:, 8:11]),
        near=jnp.asarray(ray_batch[:, 6:7]),
        far=jnp.asarray(ray_batch[:, 7:8]),
    )
    t_rand = jnp.asarray(seeded_rand(R, S).astype(np.float32)) if perturb > 0 else None
    u_imp = jnp.asarray(seeded_rand(R, SI).astype(np.float32)) if perturb > 0 else None
    out = render_rays_scene(
        params["coarse"], params.get("fine"), mlp_cfg, cfg, prepared,
        t_rand=t_rand, u_importance=u_imp,
    )

    np.testing.assert_allclose(np.asarray(out["rgb0"]), t2n(ref["rgb0"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]), t2n(ref["rgb_map"]), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), t2n(ref["depth_map"]), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), t2n(ref["acc_map"]), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["density"]), t2n(ref["density_map"]), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["z_std"]), t2n(ref["z_std"]), rtol=1e-3, atol=2e-5)


def test_render_rmnearplane_matches_reference():
    """Inference-mode near-plane density removal (models/lushnerf.py:331-335)."""
    nerfall, args = _build_ref_nerfall(rmnearplane=80)
    params = _copy_nerfall_params(nerfall)
    nerfall.eval()

    rng = np.random.default_rng(8)
    R, S, SI = 5, 32, 16
    ray_batch = _make_ray_batch(rng, R)
    with torch.no_grad():
        ref = nerfall.render_rays_nonoise(
            torch.from_numpy(ray_batch), N_samples=S, retraw=False, perturb=0.0,
            N_importance=SI, white_bkgd=False, raw_noise_std=0.0, pytest=True,
        )
    cfg = RenderConfig(n_samples=S, n_importance=SI, perturb=False, ndc=False, rm_nearplane=80)
    mlp_cfg = MLPConfig(depth=8, width=32, input_ch=63, input_ch_views=27)
    prepared = dict(
        rays_o=jnp.asarray(ray_batch[:, 0:3]),
        rays_d=jnp.asarray(ray_batch[:, 3:6]),
        viewdirs=jnp.asarray(ray_batch[:, 8:11]),
        near=jnp.asarray(ray_batch[:, 6:7]),
        far=jnp.asarray(ray_batch[:, 7:8]),
    )
    out = render_rays_scene(
        params["coarse"], params.get("fine"), mlp_cfg, cfg, prepared, inference=True
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), t2n(ref["rgb_map"]), rtol=1e-4, atol=2e-5)


def test_render_rays_noise_matches_reference():
    """SND noise head parity vs NeRFAll.render_rays_noise (:585-617)."""
    nerfall, args = _build_ref_nerfall()
    params = _copy_nerfall_params(nerfall)
    nerfall.train()

    rng = np.random.default_rng(9)
    R, S = 7, 32
    ray_batch = _make_ray_batch(rng, R)
    ref_noise = nerfall.render_rays_noise(
        torch.from_numpy(ray_batch), N_samples=S, perturb=1.0, N_importance=16,
    )["rgb_map"]

    cfg = RenderConfig(n_samples=S, n_importance=16, ndc=False, noise_sample_idx=16)
    noise_cfg = MLPConfig(depth=4, width=16, input_ch=63, input_ch_views=27, rgb_only=True)
    prepared = dict(
        rays_o=jnp.asarray(ray_batch[:, 0:3]),
        rays_d=jnp.asarray(ray_batch[:, 3:6]),
        viewdirs=jnp.asarray(ray_batch[:, 8:11]),
        near=jnp.asarray(ray_batch[:, 6:7]),
        far=jnp.asarray(ray_batch[:, 7:8]),
    )
    ours = render_rays_noise(params["noise"], noise_cfg, cfg, prepared)
    np.testing.assert_allclose(np.asarray(ours), t2n(ref_noise), rtol=1e-4, atol=1e-5)


def test_point_chunking_is_invariant():
    """Remat-chunked MLP eval must be bit-identical to the single call."""
    cfg0 = RenderConfig(n_samples=16, n_importance=8, ndc=False, perturb=False, point_chunk=0)
    cfg1 = RenderConfig(n_samples=16, n_importance=8, ndc=False, perturb=False, point_chunk=40)
    mlp_cfg = MLPConfig(depth=4, width=16, input_ch=63, input_ch_views=27)
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp_cfg)
    rng = np.random.default_rng(10)
    ray_batch = _make_ray_batch(rng, 9)
    prepared = dict(
        rays_o=jnp.asarray(ray_batch[:, 0:3]),
        rays_d=jnp.asarray(ray_batch[:, 3:6]),
        viewdirs=jnp.asarray(ray_batch[:, 8:11]),
        near=jnp.asarray(ray_batch[:, 6:7]),
        far=jnp.asarray(ray_batch[:, 7:8]),
    )
    out0 = render_rays_scene(params, None, mlp_cfg, cfg0, prepared)
    out1 = render_rays_scene(params, None, mlp_cfg, cfg1, prepared)
    np.testing.assert_allclose(np.asarray(out0["rgb"]), np.asarray(out1["rgb"]), rtol=1e-6, atol=1e-6)
