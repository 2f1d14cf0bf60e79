"""CTE consistency machinery: loss parity vs reference, aligned-pixel ray
math, match tables, and the trainer integration."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from lushnerf_tpu.matcher.api import MatchTables, build_match_tables
from lushnerf_tpu.ops.rays import get_rays
from lushnerf_tpu.train.consistency import rays_at_pixels
from lushnerf_tpu.train.losses import consistency_loss, masked_consistency_mean

from tests.torch_ref import ref_helpers


def test_masked_mean_matches_reference():
    helpers = ref_helpers()
    rng = np.random.default_rng(0)
    V, P = 6, 32
    rgb = rng.random((V, P, 3)).astype(np.float32)
    conf = rng.random((V, P)).astype(np.float32)

    ref_mean = helpers.compute_mean_with_confidence(
        torch.from_numpy(rgb), torch.from_numpy(conf), 0.8
    ).numpy()
    ours, _ = masked_consistency_mean(jnp.asarray(rgb), jnp.asarray(conf), 0.8)
    np.testing.assert_allclose(np.asarray(ours), ref_mean, rtol=1e-5, atol=1e-6)


def test_consistency_loss_matches_reference_formula():
    """Reference loss (run_lushnerf.py:646-650): sum |rgb - mean|*mask /
    count(mask)."""
    helpers = ref_helpers()
    rng = np.random.default_rng(1)
    V, P = 5, 16
    rgb = rng.random((V, P, 3)).astype(np.float32)
    conf = rng.random((V, P)).astype(np.float32)

    rgb_t, conf_t = torch.from_numpy(rgb), torch.from_numpy(conf)
    mask = conf_t >= 0.8
    mean = helpers.compute_mean_with_confidence(rgb_t, conf_t, 0.8)
    ref_loss = (
        torch.sum(torch.abs(rgb_t - mean.unsqueeze(0)) * mask.unsqueeze(2))
        / len(mask[mask == 1])
    ).item()

    ours = float(consistency_loss(jnp.asarray(rgb), jnp.asarray(conf), 0.8))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_consistency_loss_zero_when_no_confident():
    rgb = jnp.ones((4, 8, 3))
    conf = jnp.zeros((4, 8))
    assert float(consistency_loss(rgb, conf, 0.8)) == 0.0


def test_rays_at_pixels_matches_grid_indexing():
    """rays_at_pixels(K, c2w, (x, y)) == full get_rays grid indexed [y, x]
    with the reference's clamping (models/lushnerf.py:981)."""
    H, W = 12, 17
    K = np.array([[20.0, 0, 8.5], [0, 20.0, 6.0], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(2)
    c2w = (np.eye(4)[:3] + 0.1 * rng.standard_normal((3, 4))).astype(np.float32)

    ro_grid, rd_grid = get_rays(H, W, K, c2w)
    pix = np.stack(
        [rng.uniform(-3, W + 3, 20), rng.uniform(-3, H + 3, 20)], -1
    ).astype(np.float32)
    ro, rd = rays_at_pixels(jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(pix), H, W)

    xi = np.clip(pix[:, 0], 0, W - 1).astype(int)
    yi = np.clip(pix[:, 1], 0, H - 1).astype(int)
    np.testing.assert_allclose(np.asarray(ro), np.asarray(ro_grid)[yi, xi], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_grid)[yi, xi], rtol=1e-5, atol=1e-6)


def test_match_tables_roundtrip_and_sampling(tmp_path):
    t = MatchTables.zeros(3, 64)
    t.kpts += 1.5
    t.certainty += 0.9
    p = tmp_path / "tables.npz"
    t.save(p)
    t2 = MatchTables.load(p)
    np.testing.assert_array_equal(t.kpts, t2.kpts)

    rng = np.random.default_rng(0)
    anchor, pix, cert = t2.sample_anchor(rng, 8)
    assert pix.shape == (3, 8, 2)
    assert cert.shape == (3, 8)
    assert (cert == 0.9).all()


def test_build_match_tables_with_stub_matcher():
    class StubMatcher:
        def match(self, img0, img1):
            P = 10
            k0 = np.tile(np.arange(P)[:, None], (1, 2)).astype(np.float32)
            return k0, k0 + 1, np.full(P, 0.5, np.float32)

    imgs = np.zeros((3, 4, 4, 3), np.float32)
    t = build_match_tables(StubMatcher(), imgs)
    assert t.kpts.shape == (3, 3, 10, 4)
    assert (t.certainty == 0.5).all()


def test_trainer_consist_stage(tmp_path):
    """Crossing noisenerf_start_iter compiles the +consist step and the
    CTE term is active (nonzero certainty tables injected)."""
    from tests.test_train_e2e import synthetic_scene, tiny_config
    from lushnerf_tpu.train.trainer import Trainer

    cfg = tiny_config(
        tmp_path, noisenerf_start_iter=3, kernel_start_iter=1, allkernel_start_iter=2,
        consist_num_pixels=8,
    )
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()
    # inject confident tables pointing at valid pixels
    V = len(trainer.i_train)
    t = MatchTables.zeros(V, 32)
    rng = np.random.default_rng(0)
    t.kpts[..., 0:4] = rng.uniform(0, 15, t.kpts[..., 0:4].shape)
    t.certainty[:] = 1.0
    trainer.match_tables = t
    out = trainer.train(num_iters=6)
    assert np.isfinite(out["loss"])
    assert any("consist" in k for k in trainer._step_fns)
