"""Golden parity of the vectorized pose-math block (data/llff.py) vs the
reference data_utils/load_llff.py:205-334 on random pose sets."""

import importlib.util
import sys

import numpy as np
import pytest

from lushnerf_tpu.data.llff import (
    poses_avg,
    recenter_poses,
    render_path_epi,
    render_path_spiral,
    spherify_poses,
)


@pytest.fixture(scope="module")
def ref_llff():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_load_llff", "/root/reference/data_utils/load_llff.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_poses(rng, n, hwf=(32.0, 48.0, 40.0)):
    """Plausible [N, 3, 5] forward-facing-ish camera poses."""
    poses = []
    for _ in range(n):
        fwd = rng.standard_normal(3)
        fwd[2] = abs(fwd[2]) + 1.0  # roughly common viewing direction
        fwd /= np.linalg.norm(fwd)
        up_hint = np.array([0.0, 1.0, 0.0]) + 0.2 * rng.standard_normal(3)
        right = np.cross(up_hint, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        t = rng.standard_normal(3) * 0.5 + np.array([0, 0, 4.0])
        m = np.stack([right, up, fwd, t, np.asarray(hwf)], 1)
        poses.append(m)
    return np.stack(poses).astype(np.float32)


def test_poses_avg(ref_llff):
    poses = _random_poses(np.random.default_rng(0), 9)
    np.testing.assert_allclose(
        poses_avg(poses), ref_llff.poses_avg(poses), rtol=1e-5, atol=1e-6
    )


def test_recenter_poses(ref_llff):
    poses = _random_poses(np.random.default_rng(1), 7)
    ours = recenter_poses(poses.copy())
    ref = ref_llff.recenter_poses(poses.copy())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_render_path_spiral(ref_llff):
    poses = _random_poses(np.random.default_rng(2), 8)
    c2w = ref_llff.poses_avg(poses)
    up = ref_llff.normalize(poses[:, :3, 1].sum(0))
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    ours = render_path_spiral(c2w, up, rads, focal=2.5, zrate=0.5, rots=2, N=24)
    ref = np.array(
        ref_llff.render_path_spiral(c2w, up, rads, focal=2.5, zdelta=0, zrate=0.5, rots=2, N=24)
    )
    assert ours.shape == (24, 3, 5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_render_path_epi(ref_llff):
    poses = _random_poses(np.random.default_rng(3), 8)
    c2w = ref_llff.poses_avg(poses)
    up = ref_llff.normalize(poses[:, :3, 1].sum(0))
    rads = 0.7
    ours = render_path_epi(c2w, up, rads, N=16)
    ref = np.array(ref_llff.render_path_epi(c2w, up, rads, N=16))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_spherify_poses(ref_llff):
    # inward-facing ring of cameras (the spherify use case)
    rng = np.random.default_rng(4)
    n = 10
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        origin = np.array([3 * np.cos(th), 3 * np.sin(th), 1.0]) + 0.1 * rng.standard_normal(3)
        fwd = -origin / np.linalg.norm(origin)
        up_hint = np.array([0.0, 0.0, 1.0])
        right = np.cross(up_hint, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        poses.append(np.stack([right, up, fwd, origin, [32.0, 48.0, 40.0]], 1))
    poses = np.stack(poses).astype(np.float32)
    bds = np.abs(rng.standard_normal((n, 2))).astype(np.float32) + 1.0

    ours_p, ours_new, ours_bds = spherify_poses(poses.copy(), bds.copy())
    ref_p, ref_new, ref_bds = ref_llff.spherify_poses(poses.copy(), bds.copy())
    np.testing.assert_allclose(ours_p, ref_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_new, ref_new, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_bds, ref_bds, rtol=1e-5, atol=1e-6)
