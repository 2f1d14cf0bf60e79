"""Data layer: preprocessing, frequency masks, ray dataset vs reference."""

import numpy as np
import torch

from lushnerf_tpu.data.freq_mask import frequency_mask, get_masks_for_images
from lushnerf_tpu.data.preprocess import enhance_image_bgr
from lushnerf_tpu.data.rays import build_ray_dataset
from lushnerf_tpu.utils.metrics import compute_img_metric

from tests.torch_ref import ref_helpers


def _test_image(H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    img = (
        96
        + 64 * np.sin(xx / 5.0)
        + 48 * np.cos(yy / 7.0)
        + rng.normal(0, 8, (H, W))
    )
    return np.clip(np.stack([img, img * 0.8, img * 0.6], -1), 0, 255).astype(np.uint8)


def test_frequency_mask_matches_reference():
    helpers = ref_helpers()
    img = _test_image()
    ref_mask = helpers.frequency_mask(img, radius=10)
    ours = frequency_mask(img, radius=10)
    np.testing.assert_array_equal(ours, ref_mask)


def test_get_masks_batch():
    imgs = np.stack([_test_image(seed=s) for s in range(3)])
    masks = get_masks_for_images(imgs, radius=10)
    assert masks.shape == (3, 64, 64)
    assert set(np.unique(masks)) <= {0, 1}


def test_enhance_image_is_deterministic_and_brightens():
    img = (_test_image() * 0.3).astype(np.uint8)  # dark image
    out1 = enhance_image_bgr(img, gamma=0.5, clahe_value=10)
    out2 = enhance_image_bgr(img, gamma=0.5, clahe_value=10)
    np.testing.assert_array_equal(out1, out2)
    assert out1.mean() > img.mean()  # CLAHE + inverse gamma brighten
    # clahe disabled path
    out3 = enhance_image_bgr(img, gamma=1.0, clahe_value=0)
    assert out3.shape == img.shape


def test_ray_dataset_matches_reference_ray_build():
    """Ray dataset rays equal the reference's get_rays_np-based build
    (run_lushnerf.py:561-575)."""
    helpers = ref_helpers()
    H = W = 8
    K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(3)
    poses = np.stack(
        [np.eye(4)[:3] + 0.01 * rng.standard_normal((3, 4)) for _ in range(3)]
    ).astype(np.float32)
    images = rng.random((3, H, W, 3)).astype(np.float32)
    fq = np.ones((3, H, W), np.uint8)

    ds = build_ray_dataset(images, poses, K, fq, np.arange(3))

    ref_rays = np.stack([np.stack(helpers.get_rays_np(H, W, K, p), 0) for p in poses], 0)
    ref_rays = np.transpose(ref_rays, [0, 2, 3, 1, 4]).reshape(-1, 2, 3)
    # ours is [T, 3, 2] (o,d on last axis); reference is [T, 2, 3]
    np.testing.assert_allclose(ds.rays.transpose(0, 2, 1), ref_rays, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ds.rgbs, images.reshape(-1, 3))
    assert ds.images_idx.shape == (3 * H * W, 1)


def test_ray_dataset_epoch_reshuffle():
    rng = np.random.default_rng(0)
    H = W = 4
    K = np.array([[5.0, 0, 2.0], [0, 5.0, 2.0], [0, 0, 1]], np.float32)
    poses = np.stack([np.eye(4)[:3]]).astype(np.float32)
    images = rng.random((1, H, W, 3)).astype(np.float32)
    ds = build_ray_dataset(images, poses, K, np.ones((1, H, W), np.uint8), np.arange(1))
    seen = []
    for _ in range(5):
        b = ds.next_batch(8, rng)
        seen.append(b["rgbs"])
    # 16 rays, batches of 8: epoch wraps after 2 batches and reshuffles
    assert all(b.shape == (8, 3) for b in seen)


def test_ssim_identical_images_is_one():
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    assert abs(compute_img_metric(img, img, "ssim") - 1.0) < 1e-5
    assert compute_img_metric(img, img, "mse") < 1e-12


def test_ssim_against_reference_formula():
    """Cross-check our SSIM against an independent numpy implementation of
    skimage's uniform-window SSIM on [-1,1] images."""
    rng = np.random.default_rng(1)
    a = rng.random((24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)

    def np_ssim(x, y, data_range=2.0, win=7, K1=0.01, K2=0.03):
        x = (x * 2 - 1).astype(np.float64)
        y = (y * 2 - 1).astype(np.float64)
        C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
        NP = win * win
        cov_norm = NP / (NP - 1)

        def filt(img):
            out = np.zeros((img.shape[0] - win + 1, img.shape[1] - win + 1, img.shape[2]))
            for i in range(out.shape[0]):
                for j in range(out.shape[1]):
                    out[i, j] = img[i : i + win, j : j + win].mean(axis=(0, 1))
            return out

        ux, uy = filt(x), filt(y)
        vx = cov_norm * (filt(x * x) - ux * ux)
        vy = cov_norm * (filt(y * y) - uy * uy)
        vxy = cov_norm * (filt(x * y) - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
        return S.mean()

    ours = compute_img_metric(a, b, "ssim")
    expect = np_ssim(a, b)
    assert abs(ours - expect) < 1e-4
