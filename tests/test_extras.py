"""Auxiliary components: MAM, extra losses, warped-view renderer,
standalone metric script, datadownsample, multichip dryrun."""

import subprocess
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.mam import apply_mam, init_mam
from lushnerf_tpu.utils.extra_losses import (
    compute_correlation_coefficient,
    kde,
    ms_ssim_l1_loss,
    white_balance_apply,
    white_balance_init,
)

from tests.torch_ref import ref_helpers, t2n


def test_correlation_coefficient_matches_reference():
    helpers = ref_helpers()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, 5)).astype(np.float32)
    y = rng.standard_normal((40, 5)).astype(np.float32)
    ref = helpers.compute_correlation_coefficient(
        torch.from_numpy(x), torch.from_numpy(y)
    ).numpy()
    ours = np.asarray(compute_correlation_coefficient(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_kde_matches_reference():
    helpers = ref_helpers()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    ref = helpers.kde(torch.from_numpy(x), device=torch.device("cpu")).numpy()
    ours = np.asarray(kde(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_ms_ssim_l1_matches_reference():
    helpers = ref_helpers()

    class CPU_MSSSIM(helpers.MS_SSIM_L1_LOSS):
        def __init__(self):
            torch.nn.Module.__init__(self)
            import numpy as _np

            base = helpers.MS_SSIM_L1_LOSS.__new__(helpers.MS_SSIM_L1_LOSS)
            torch.nn.Module.__init__(base)
            # replicate __init__ without the .cuda() call (helpers:48)
            gaussian_sigmas = [0.5, 1.0, 2.0, 4.0, 8.0]
            self.DR = 1.0
            self.C1 = (0.01 * 1.0) ** 2
            self.C2 = (0.03 * 1.0) ** 2
            self.pad = int(2 * gaussian_sigmas[-1])
            self.alpha = 0.025
            self.compensation = 200.0
            filter_size = int(4 * gaussian_sigmas[-1] + 1)
            g_masks = torch.zeros((3 * len(gaussian_sigmas), 1, filter_size, filter_size))
            for idx, sigma in enumerate(gaussian_sigmas):
                g = base._fspecial_gauss_2d(filter_size, sigma)
                g_masks[3 * idx + 0, 0] = g
                g_masks[3 * idx + 1, 0] = g
                g_masks[3 * idx + 2, 0] = g
            self.g_masks = g_masks

    rng = np.random.default_rng(2)
    x = rng.random((2, 3, 40, 40)).astype(np.float32)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    ref = CPU_MSSSIM()(torch.from_numpy(x), torch.from_numpy(y)).item()
    ours = float(ms_ssim_l1_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_white_balance_matches_reference():
    helpers = ref_helpers()
    rng = np.random.default_rng(3)
    x = rng.random((10, 3)).astype(np.float32)
    ref_wb = helpers.WhiteBalance("white_balance_consistent", 4)
    with torch.no_grad():
        ref_wb.white_balance_parameter.mul_(1.7)
    ref = ref_wb(torch.from_numpy(x)).detach().numpy()
    params = {"wb": jnp.full((3,), 1.7)}
    ours = np.asarray(white_balance_apply(params, "white_balance_consistent", jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    assert white_balance_init("white_balance", 4)["wb"].shape == (4, 3)


def test_mam_shapes_and_finite():
    p = init_mam(jax.random.PRNGKey(0), in_channels=32, num_motion=4)
    n_ray, M1, L = 6, 5, 16
    x_global = jnp.asarray(np.random.default_rng(4).standard_normal((n_ray, 8, 32)), jnp.float32)
    x_local = jnp.asarray(
        np.random.default_rng(5).standard_normal((n_ray * M1, L, 64)), jnp.float32
    )
    out = apply_mam(p, x_global, x_local)
    assert out.shape == (n_ray, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_render_warped_view_shapes(tmp_path):
    from tests.test_train_e2e import synthetic_scene, tiny_config
    from lushnerf_tpu.models.lushnerf import render_warped_view
    from lushnerf_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()
    M1 = trainer.lush_cfg.rbk.num_rays_out
    rgbs, depths, centre = render_warped_view(
        trainer.params, trainer.lush_cfg, trainer.H, trainer.W,
        jnp.asarray(trainer.K), jnp.asarray(trainer.poses[0]), 0, ray_chunk=256,
    )
    assert rgbs.shape == (M1, trainer.H, trainer.W, 3)
    assert depths.shape == (M1, trainer.H, trainer.W)
    assert centre.shape == (M1, 3, 2)


def test_datadownsample_dataset(tmp_path):
    from tests.test_train_e2e import synthetic_scene, tiny_config
    from lushnerf_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path, datadownsample=2.0)
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()
    # 16x16 images downsampled 2x -> 8x8 per view
    n_train = len(trainer.i_train)
    assert len(trainer.dataset) == n_train * 8 * 8
    trainer.train(num_iters=2)


def test_calculate_metric_script(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(6)
    for d in ("r", "g"):
        (tmp_path / d).mkdir()
    for i in range(3):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        imageio.imwrite(tmp_path / "r" / f"{i:03d}.png", img)
        imageio.imwrite(tmp_path / "g" / f"{i:03d}.png", img)
    out = subprocess.run(
        [sys.executable, "scripts/calculate_metric.py", str(tmp_path / "r"),
         str(tmp_path / "g"), "--all"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo:/root/.axon_site", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "PSNR" in out.stdout


def test_dryrun_multichip_entrypoint():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
