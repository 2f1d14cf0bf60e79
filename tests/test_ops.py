"""Golden-parity tests for the core ops vs the PyTorch reference (CPU)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lushnerf_tpu.ops.encoding import PositionalEncoding
from lushnerf_tpu.ops.rays import get_rays, ndc_rays
from lushnerf_tpu.ops.sampling import (
    det_u,
    linear_z_vals,
    sample_pdf,
    stratify_z_vals,
)
from lushnerf_tpu.ops.se3 import se3_warp

from tests.torch_ref import ref_helpers, ref_rigid, seeded_rand

RTOL = 1e-5
ATOL = 1e-5


@pytest.mark.parametrize("multires", [4, 10])
def test_positional_encoding_matches_reference(multires):
    helpers = ref_helpers()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 3)).astype(np.float32)

    ref_embed, ref_dim = helpers.get_embedder(multires, 0)
    ref_out = ref_embed(torch.from_numpy(x)).numpy()

    enc = PositionalEncoding(num_freqs=multires, input_dims=3)
    assert enc.out_dim == ref_dim
    ours = np.asarray(enc(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=RTOL, atol=ATOL)


def test_get_rays_matches_reference():
    helpers = ref_helpers()
    H, W = 12, 17
    focal = 20.0
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(1)
    c2w = np.eye(3, 4, dtype=np.float32) + 0.1 * rng.standard_normal((3, 4)).astype(np.float32)

    ro_ref, rd_ref = helpers.get_rays(H, W, torch.from_numpy(K), torch.from_numpy(c2w))
    ro, rd = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_ref.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(), rtol=RTOL, atol=ATOL)

    # numpy variant agrees too (helpers:531-539)
    ro_np, rd_np = helpers.get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-4, atol=1e-4)


def test_ndc_rays_matches_reference():
    helpers = ref_helpers()
    rng = np.random.default_rng(2)
    n = 50
    rays_o = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0

    ro_ref, rd_ref = helpers.ndc_rays(
        12, 17, 20.0, 1.0, torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    )
    ro, rd = ndc_rays(12, 17, 20.0, 1.0, jnp.asarray(rays_o), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(ro), ro_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_se3_warp_matches_reference():
    rigid = ref_rigid()
    rng = np.random.default_rng(3)
    n = 64
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    rot = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)
    trans = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)

    field = rigid.SE3Field()
    ref_out = field.warp(
        torch.from_numpy(pts), torch.from_numpy(rot), torch.from_numpy(trans)
    ).numpy()
    ours = np.asarray(se3_warp(jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(trans)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_se3_warp_tiny_rotation_near_identity():
    # near-zero screw => warp ~ identity + trans (the 1e-5 init regime)
    rng = np.random.default_rng(4)
    pts = rng.standard_normal((16, 3)).astype(np.float32)
    rot = np.full((16, 3), 1e-6, np.float32)
    trans = np.zeros((16, 3), np.float32)
    out = np.asarray(se3_warp(jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(trans)))
    np.testing.assert_allclose(out, pts, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("det", [True, False])
def test_sample_pdf_matches_reference(det):
    helpers = ref_helpers()
    rng = np.random.default_rng(5)
    R, M, N = 9, 15, 8
    bins = np.sort(rng.random((R, M)).astype(np.float32), axis=-1)
    weights = rng.random((R, M - 1)).astype(np.float32)

    ref_out = helpers.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), N, det=det, pytest=True
    ).numpy()

    if det:
        u = det_u((R,), N)
    else:
        u = jnp.asarray(seeded_rand(R, N).astype(np.float32))
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), u))
    if det:
        # At u exactly on a CDF knot (e.g. u=1.0 with cdf[-1] rounding to
        # 0.9999998 vs 1.0000001 depending on accumulation order),
        # searchsorted legitimately lands one bin apart between torch and
        # XLA.  Tolerate those boundary cases; everything else must match.
        close = np.isclose(ours, ref_out, rtol=1e-4, atol=1e-5)
        bad = ~close
        assert bad.mean() <= 0.02, f"{bad.sum()} mismatches"
        max_bin = np.max(bins[..., 1:] - bins[..., :-1])
        assert np.all(np.abs(ours - ref_out)[bad] <= max_bin)
    else:
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_stratify_and_linear_z():
    # linear z: matches the closed form; stratified z stays within bounds.
    z = linear_z_vals(jnp.asarray([0.0, 2.0]), jnp.asarray([1.0, 4.0]), 5)
    np.testing.assert_allclose(
        np.asarray(z),
        np.stack([np.linspace(0, 1, 5), np.linspace(2, 4, 5)]),
        rtol=1e-6,
        atol=1e-6,
    )
    t = jnp.asarray(np.random.default_rng(6).random((2, 5)).astype(np.float32))
    zs = np.asarray(stratify_z_vals(z, t))
    assert (zs[:, 1:] >= np.asarray(z)[:, :-1]).all()
    assert (zs[:, :-1] <= np.asarray(z)[:, 1:]).all()


def test_lindisp_z_matches_reference_formula():
    near, far = 2.0, 6.0
    z = np.asarray(linear_z_vals(near, far, 7, lindisp=True))
    t = np.linspace(0, 1, 7)
    expect = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    np.testing.assert_allclose(z, expect, rtol=1e-6)


def test_get_rays_np_matches_jax():
    """Host-pipeline numpy rays must equal the jitted get_rays exactly."""
    import numpy as np
    from lushnerf_tpu.ops.rays import get_rays, get_rays_np

    K = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)
    c2w = np.concatenate([np.linalg.qr(rng.standard_normal((3, 3)))[0],
                          rng.standard_normal((3, 1))], 1).astype(np.float32)
    ro_j, rd_j = get_rays(24, 32, K, c2w)
    ro_n, rd_n = get_rays_np(24, 32, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_n, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rd_j), rd_n, rtol=1e-6, atol=1e-7)
