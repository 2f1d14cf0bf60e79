"""DKMv3 JAX port: block-level and end-to-end parity vs the torch
reference (random weights; the real checkpoint converts the same way)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import REF_PATH
from tests.torch_tv_stub import install_tv_stub

install_tv_stub()

import sys

if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

import importlib  # noqa: E402

ref_mod = importlib.import_module("gim.dkm.models.model_zoo.DKMv3")
from gim.dkm.utils.local_correlation import local_correlation as ref_local_corr  # noqa: E402

from lushnerf_tpu.matcher.dkm import nn as jnn  # noqa: E402
from lushnerf_tpu.matcher.dkm import blocks as jblocks  # noqa: E402
from lushnerf_tpu.matcher.dkm.convert import from_torch_state_dict  # noqa: E402
from lushnerf_tpu.matcher.dkm.matcher import dkm_match  # noqa: E402
from lushnerf_tpu.matcher.dkm.resnet import resnet50_pyramid  # noqa: E402

RTOL, ATOL = 2e-4, 2e-4


def _np(x):
    return x.detach().cpu().numpy()


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 8, 11)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 7, 2)).astype(np.float32)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), align_corners=False
    ).numpy()
    ours = np.asarray(jnn.grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_interpolate_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 6, 9)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(13, 5), mode="bilinear", align_corners=False
    ).numpy()
    ours = np.asarray(jnn.interpolate_bilinear(jnp.asarray(x), (13, 5)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_local_correlation_matches_reference():
    rng = np.random.default_rng(2)
    f0 = rng.standard_normal((1, 8, 10, 12)).astype(np.float32)
    f1 = rng.standard_normal((1, 8, 10, 12)).astype(np.float32)
    flow = rng.uniform(-1, 1, (1, 2, 10, 12)).astype(np.float32)
    ref = ref_local_corr(
        torch.from_numpy(f0), torch.from_numpy(f1), 2, flow=torch.from_numpy(flow)
    ).numpy()
    ours = np.asarray(
        jnn.local_correlation(jnp.asarray(f0), jnp.asarray(f1), 2, jnp.asarray(flow))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_cos_kernel_matches_reference():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    y = rng.standard_normal((2, 15, 16)).astype(np.float32)
    ref = ref_mod.CosKernel(T=0.2)(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = np.asarray(jblocks.cos_kernel(jnp.asarray(x), jnp.asarray(y), T=0.2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_resnet50_pyramid_matches_stub_reference():
    torch.manual_seed(0)
    enc = ref_mod.ResNet50(pretrained=False, freeze_bn=False)
    enc.eval()
    params = from_torch_state_dict(_sd(enc, "encoder"))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_feats = enc(torch.from_numpy(x))
    ours = resnet50_pyramid(params, jnp.asarray(x))
    for s in (1, 2, 4, 8, 16, 32):
        np.testing.assert_allclose(
            np.asarray(ours[s]), _np(ref_feats[s]), rtol=1e-3, atol=1e-3,
            err_msg=f"stride {s}",
        )


def test_gp_matches_reference():
    torch.manual_seed(1)
    gp = ref_mod.GP(ref_mod.CosKernel, T=0.2, gp_dim=32, basis="fourier", no_cov=True)
    gp.eval()
    params = from_torch_state_dict(_sd(gp, "gp"))
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 32, 4, 6)).astype(np.float32)
    y = rng.standard_normal((2, 32, 4, 6)).astype(np.float32)
    with torch.no_grad():
        ref = gp(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = np.asarray(jblocks.gp_forward(params, "gp", jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_conv_refiner_matches_reference():
    torch.manual_seed(2)
    # scale-"4"-style refiner: dw, local corr radius 2, disp emb 8
    cr = ref_mod.ConvRefiner(
        2 * 16 + 8 + 25, 2 * 16 + 8 + 25, 3, kernel_size=5, dw=True,
        hidden_blocks=2, displacement_emb="linear", displacement_emb_dim=8,
        local_corr_radius=2, corr_in_other=True,
    )
    cr.eval()
    params = from_torch_state_dict(_sd(cr, "cr"))
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 16, 6, 8)).astype(np.float32)
    y = rng.standard_normal((1, 16, 6, 8)).astype(np.float32)
    flow = rng.uniform(-0.9, 0.9, (1, 2, 6, 8)).astype(np.float32)
    with torch.no_grad():
        ref_cert, ref_disp = cr(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(flow))
    cert, disp = jblocks.conv_refiner_forward(
        params, "cr", jnp.asarray(x), jnp.asarray(y), jnp.asarray(flow), "4",
        hidden_blocks=2,
    )
    np.testing.assert_allclose(np.asarray(cert), _np(ref_cert), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(disp), _np(ref_disp), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_match_many_cached_parity_with_per_pair_match():
    """The cached/batched rematch fast path (per-view pyramid cache +
    single-direction batched decoder, matcher.match_many) must reproduce
    the per-pair symmetric match() outputs LuSh consumes (VERDICT r3
    next #4: 'keep golden parity')."""
    from lushnerf_tpu.matcher.dkm.matcher import DKMMatcher

    torch.manual_seed(4)
    hs, ws = 64, 96
    ref = ref_mod.DKMv3(weights=None, h=hs, w=ws)
    params = from_torch_state_dict(ref.state_dict())
    m = DKMMatcher(params=params, hs=hs, ws=ws, max_columns=1024, pair_batch=3)

    rng = np.random.default_rng(8)
    images = rng.random((3, 48, 64, 3), dtype=np.float64).astype(np.float32)
    pairs = [(0, 1), (1, 0), (2, 0), (0, 0)]  # exercises batch padding too

    kpts, cert = m.match_many(images, pairs)
    assert kpts.shape == (4, 1024, 4) and cert.shape == (4, 1024)

    for pi, (k, v) in enumerate(pairs):
        k0, k1, c = m.match(images[k], images[v])
        np.testing.assert_allclose(kpts[pi, :, :2], k0, rtol=1e-4, atol=5e-4)
        np.testing.assert_allclose(kpts[pi, :, 2:], k1, rtol=1e-4, atol=5e-4)
        np.testing.assert_allclose(cert[pi], c, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_dkm_bf16_matches_f32():
    """The shipped bf16-conv inference mode must agree with f32 to
    sub-pixel keypoints and small certainty deltas (the matcher is
    frozen; its certainty feeds a 1e-2-weight loss through a 0.8
    threshold)."""
    from lushnerf_tpu.matcher.dkm.matcher import DKMMatcher

    torch.manual_seed(6)
    hs, ws = 64, 96
    ref = ref_mod.DKMv3(weights=None, h=hs, w=ws)
    params = from_torch_state_dict(ref.state_dict())
    rng = np.random.default_rng(9)
    img0 = rng.random((48, 64, 3), dtype=np.float64).astype(np.float32)
    img1 = rng.random((48, 64, 3), dtype=np.float64).astype(np.float32)

    outs = {}
    for cd in ("float32", "bfloat16"):
        m = DKMMatcher(params=params, hs=hs, ws=ws, max_columns=2048, conv_dtype=cd)
        outs[cd] = m.match(img0, img1)
    k0f, k1f, cf = outs["float32"]
    k0b, k1b, cb = outs["bfloat16"]
    np.testing.assert_allclose(k0b, k0f, atol=1e-4)  # query grid is exact
    # matched coordinates: sub-pixel agreement where either run is confident
    conf = np.maximum(cf, cb) > 0.3
    assert conf.sum() > 50
    d = np.abs(k1b[conf] - k1f[conf]).max()
    assert d < 1.0, f"bf16 match coords deviate {d} px"
    assert np.abs(cb - cf).max() < 0.15
    assert np.abs(cb - cf).mean() < 0.02


@pytest.mark.slow
def test_dkm_match_end_to_end_matches_reference():
    """Full symmetric two-pass match() parity at a small resolution with
    random weights (the checkpoint converts through the same path)."""
    torch.manual_seed(3)
    hs, ws = 64, 96
    matcher = ref_mod.DKMv3(weights=None, h=hs, w=ws)
    matcher.upsample_res = (hs, ws)
    matcher.eval()
    params = from_torch_state_dict(matcher.state_dict())

    rng = np.random.default_rng(7)
    im0 = rng.random((1, 3, hs, ws), dtype=np.float64).astype(np.float32)
    im1 = rng.random((1, 3, hs, ws), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        ref_warp, ref_cert = matcher.match(torch.from_numpy(im0), torch.from_numpy(im1))

    warp, cert = dkm_match(
        params, jnp.asarray(im0[0]), jnp.asarray(im1[0]), hs=hs, ws=ws
    )
    np.testing.assert_allclose(np.asarray(warp), _np(ref_warp), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cert), _np(ref_cert), rtol=2e-3, atol=2e-3)


def test_local_correlation_patch_matches_gather():
    """The patch-slice local correlation (one dynamic_slice per pixel)
    must match the direct grid_sample formulation, including pixels whose
    flow points outside the image (zeros padding semantics)."""
    import jax.numpy as jnp

    from lushnerf_tpu.matcher.dkm.nn import local_correlation, meshgrid_coords

    rng = np.random.default_rng(0)
    b, c, h, w = 2, 16, 12, 20
    f0 = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    coords = np.asarray(meshgrid_coords(h, w))
    # smooth in-bounds flow + a band of far-out-of-bounds flow
    flow = np.broadcast_to(coords[None], (b, h, w, 2)).copy()
    flow += 0.12 * rng.standard_normal((b, h, w, 2)).astype(np.float32)
    flow[:, :2] = 3.5  # fully outside
    flow[:, 2, :5] = -1.02  # straddling the border
    flow = jnp.asarray(np.transpose(flow, (0, 3, 1, 2)))

    for r in (1, 2, 3):
        ref = local_correlation(f0, f1, r, flow=flow, impl="gather")
        got = local_correlation(f0, f1, r, flow=flow, impl="patch")
        assert got.shape == ref.shape == (b, (2 * r + 1) ** 2, h, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_grid_sample_patch_matches_gather():
    import jax.numpy as jnp

    from lushnerf_tpu.matcher.dkm.nn import grid_sample_bilinear, grid_sample_patch

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 7, 9, 13)).astype(np.float32))
    grid = jnp.asarray(
        (rng.uniform(-1.4, 1.4, (2, 5, 11, 2))).astype(np.float32)
    )
    ref = grid_sample_bilinear(img, grid)
    got = grid_sample_patch(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
