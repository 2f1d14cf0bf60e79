"""END-TO-END composed-pipeline golden parity vs the PyTorch reference.

Covers the BASELINE.md north star ("allclose renders + pixel gradients"):
the full training forward — RBK sub-ray warp + fq gating + hierarchical
render + SND noise + ccw composite + tone mapping — plus the reference
loss assembly (run_lushnerf.py:625-661), compared against NeRFAll.forward
(models/lushnerf.py:630-655) with weight-copied params and seeded
randomness, asserting allclose on every output AND on the gradients of
every parameter.  Per-component tests (test_models.py) can't catch
composition bugs (tonemap-vs-noise order, gate direction, coarse/fine
loss wiring); this one does.

Also: torch `.tar` checkpoint import/export roundtrips (the analog of
smart_load_state_dict, utils/run_lushnerf_helpers.py:612-628).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.lushnerf import (
    LushConfig,
    forward_kernel,
    forward_naive,
)
from lushnerf_tpu.models.renderer import RenderConfig
from lushnerf_tpu.models.rbk import RBKConfig
from lushnerf_tpu.train.losses import photometric_loss
from lushnerf_tpu.train.torch_import import (
    load_torch_checkpoint,
    params_to_torch_state,
    save_torch_checkpoint,
    torch_state_to_params,
)

from tests.torch_ref import (
    build_ref_lush,
    copy_nerfall,
    float32_numpy_rand,
    ref_helpers,
    seeded_rand,
    t2n,
)

H, W, FOCAL = 8, 8, 10.0
NUM_IMG, M = 3, 4
S, SI = 32, 16
WIDTH = 32


def _lush_cfg(perturb=True, width=WIDTH, mlp_backend="xla"):
    return LushConfig(
        render=RenderConfig(
            n_samples=S, n_importance=SI, perturb=perturb, ndc=True,
            raw_noise_std=0.0, rm_nearplane=0.0, mlp_backend=mlp_backend,
        ),
        netdepth=8, netwidth=width, netdepth_fine=8, netwidth_fine=width,
        rbk=RBKConfig(num_images=NUM_IMG, num_motion=M),
        blur_model_type="dpnerf", tone_mapping_type="gamma",
        num_images=NUM_IMG, near=0.0, far=1.0,
    )


def _batch(rng, n):
    rays_o = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing (NDC-safe)
    rays = np.stack([rays_o, rays_d], axis=-1)  # [n, 3, 2]
    idx = rng.integers(0, NUM_IMG, n).astype(np.int64)
    target = rng.random((n, 3), dtype=np.float32)
    return rays, idx, target


def _k_matrix():
    return np.array(
        [[FOCAL, 0, 0.5 * W], [0, FOCAL, 0.5 * H], [0, 0, 1]], np.float32
    )


def _ref_loss(helpers, rgb_blur, rgb0_blur, target_t):
    return (
        0.5 * helpers.img2mse(rgb_blur, target_t)
        + 0.5 * helpers.img2l1(rgb_blur, target_t)
        + 0.5 * helpers.img2mse(rgb0_blur, target_t)
        + 0.5 * helpers.img2l1(rgb0_blur, target_t)
    )


def _assert_tree_allclose(ours, ref, rtol, atol, path=""):
    if isinstance(ref, dict):
        assert set(ours) == set(ref), f"{path}: key mismatch"
        for k in ref:
            _assert_tree_allclose(ours[k], ref[k], rtol, atol, f"{path}.{k}")
    elif isinstance(ref, (list, tuple)):
        assert len(ours) == len(ref), f"{path}: length mismatch"
        for i, (o, r) in enumerate(zip(ours, ref)):
            _assert_tree_allclose(o, r, rtol, atol, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=rtol, atol=atol,
            err_msg=f"mismatch at {path}",
        )


@pytest.mark.parametrize("gated", [False, True], ids=["allkernel", "fq-gated"])
def test_forward_kernel_composed_parity(gated):
    """forward_kernel + photometric_loss vs NeRFAll.forward (DSK training
    mode) — outputs and ALL parameter gradients allclose."""
    helpers = ref_helpers()
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI)
    nerfall.train()
    params = copy_nerfall(nerfall)
    cfg = _lush_cfg(perturb=True)

    rng = np.random.default_rng(21)
    N = 6
    rays, idx, target = _batch(rng, N)
    # mixed mask so gated gradients differ from ungated
    fq = np.array([1, 0, 1, 1, 0, 1], bool) if gated else None

    rays_t = torch.from_numpy(rays)
    rays_info = {"images_idx": torch.from_numpy(idx.reshape(-1, 1))}
    target_t = torch.from_numpy(target)
    with float32_numpy_rand():
        out_ref = nerfall(
            H, W, _k_matrix(), chunk=1 << 20, rays=rays_t, rays_info=rays_info,
            retraw=True, force_naive=False,
            allkernel=gated,  # reference: allkernel=True means i < allkernel_start (gate ON)
            kernel_pixel=torch.from_numpy(fq) if gated else None,
            perturb=1.0, N_importance=SI, N_samples=S, use_viewdirs=True,
            white_bkgd=False, raw_noise_std=0.0, inference=False,
            near=0.0, far=1.0, pytest=True,
        )
    rgb_blur_r, rgb0_blur_r, _, noise_r, _, rgb_pure_r, rgb0_pure_r = out_ref
    loss_ref = _ref_loss(helpers, rgb_blur_r, rgb0_blur_r, target_t)
    nerfall.zero_grad()
    loss_ref.backward()
    grads_ref = copy_nerfall(nerfall, grad=True)

    # the reference draws seed-0 numpy uniforms once per sampling site
    rand = dict(
        t_rand=jnp.asarray(seeded_rand(N * (M + 1), S).astype(np.float32)),
        u_importance=jnp.asarray(seeded_rand(N * (M + 1), SI).astype(np.float32)),
        density_noise_coarse=None,
        density_noise_fine=None,
    )

    def loss_fn(p):
        out = forward_kernel(
            p, cfg, H, W, FOCAL, jnp.asarray(rays),
            jnp.asarray(idx.astype(np.int32)), None,
            fq_mask=jnp.asarray(fq) if gated else None, rand_override=rand,
        )
        loss, _ = photometric_loss(out["rgb_blur"], out["rgb0_blur"], jnp.asarray(target))
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(out["rgb_blur"]), t2n(rgb_blur_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb0_blur"]), t2n(rgb0_blur_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_noise"]), t2n(noise_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_pure"]), t2n(rgb_pure_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb0_pure"]), t2n(rgb0_pure_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)

    # gradient parity over the ENTIRE param pytree (incl. zero-grads —
    # e.g. the fq-gated RBK must receive gradients only from masked rays)
    _assert_tree_allclose(grads, grads_ref, rtol=2e-3, atol=1e-5, path="grads")


@pytest.mark.slow
def test_forward_kernel_composed_parity_pallas_w256():
    """The SHIPPED flagship path — mlp_backend=pallas at production width
    256 — against the torch reference at the same width (interpret mode on
    CPU; the identical kernel compiles via Mosaic on TPU).  Ties the fused
    kernel directly to the composed parity evidence instead of only to the
    XLA path (VERDICT r2 weak #3): outputs AND all parameter gradients."""
    from jax.experimental.pallas import tpu as pltpu

    helpers = ref_helpers()
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, 256, SI)
    nerfall.train()
    params = copy_nerfall(nerfall)
    cfg = _lush_cfg(perturb=True, width=256, mlp_backend="pallas")

    rng = np.random.default_rng(31)
    N = 4
    rays, idx, target = _batch(rng, N)

    rays_t = torch.from_numpy(rays)
    rays_info = {"images_idx": torch.from_numpy(idx.reshape(-1, 1))}
    target_t = torch.from_numpy(target)
    with float32_numpy_rand():
        out_ref = nerfall(
            H, W, _k_matrix(), chunk=1 << 20, rays=rays_t, rays_info=rays_info,
            retraw=True, force_naive=False, allkernel=False, kernel_pixel=None,
            perturb=1.0, N_importance=SI, N_samples=S, use_viewdirs=True,
            white_bkgd=False, raw_noise_std=0.0, inference=False,
            near=0.0, far=1.0, pytest=True,
        )
    rgb_blur_r, rgb0_blur_r = out_ref[0], out_ref[1]
    loss_ref = _ref_loss(helpers, rgb_blur_r, rgb0_blur_r, target_t)
    nerfall.zero_grad()
    loss_ref.backward()
    grads_ref = copy_nerfall(nerfall, grad=True)

    rand = dict(
        t_rand=jnp.asarray(seeded_rand(N * (M + 1), S).astype(np.float32)),
        u_importance=jnp.asarray(seeded_rand(N * (M + 1), SI).astype(np.float32)),
        density_noise_coarse=None,
        density_noise_fine=None,
    )

    def loss_fn(p):
        out = forward_kernel(
            p, cfg, H, W, FOCAL, jnp.asarray(rays),
            jnp.asarray(idx.astype(np.int32)), None, rand_override=rand,
        )
        loss, _ = photometric_loss(out["rgb_blur"], out["rgb0_blur"], jnp.asarray(target))
        return loss, out

    with pltpu.force_tpu_interpret_mode():
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(out["rgb_blur"]), t2n(rgb_blur_r), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["rgb0_blur"]), t2n(rgb0_blur_r), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    _assert_tree_allclose(grads, grads_ref, rtol=2e-3, atol=2e-5, path="grads")


def test_forward_naive_composed_parity():
    """forward_naive + loss vs NeRFAll.forward force_naive branch
    (:657-662): noise MLP evaluated but ungraded, RBK untouched."""
    helpers = ref_helpers()
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI)
    nerfall.train()
    params = copy_nerfall(nerfall)
    cfg = _lush_cfg(perturb=True)

    rng = np.random.default_rng(22)
    N = 7
    rays, idx, target = _batch(rng, N)
    rays_info = {"images_idx": torch.from_numpy(idx.reshape(-1, 1))}
    target_t = torch.from_numpy(target)
    with float32_numpy_rand():
        out_ref = nerfall(
            H, W, _k_matrix(), chunk=1 << 20, rays=torch.from_numpy(rays),
            rays_info=rays_info, retraw=True, force_naive=True, allkernel=True,
            kernel_pixel=None, perturb=1.0, N_importance=SI, N_samples=S,
            use_viewdirs=True, white_bkgd=False, raw_noise_std=0.0,
            inference=False, near=0.0, far=1.0, pytest=True,
        )
    rgb_r, rgb0_r, _, noise_r, _, _, _ = out_ref
    loss_ref = _ref_loss(helpers, rgb_r, rgb0_r, target_t)
    nerfall.zero_grad()
    loss_ref.backward()
    grads_ref = copy_nerfall(nerfall, grad=True)

    rand = dict(
        t_rand=jnp.asarray(seeded_rand(N, S).astype(np.float32)),
        u_importance=jnp.asarray(seeded_rand(N, SI).astype(np.float32)),
        density_noise_coarse=None,
        density_noise_fine=None,
    )

    def loss_fn(p):
        out = forward_naive(p, cfg, H, W, FOCAL, jnp.asarray(rays), None, rand_override=rand)
        loss, _ = photometric_loss(out["rgb_blur"], out["rgb0_blur"], jnp.asarray(target))
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(out["rgb_blur"]), t2n(rgb_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb0_blur"]), t2n(rgb0_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_noise"]), t2n(noise_r), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    _assert_tree_allclose(grads, grads_ref, rtol=2e-3, atol=1e-5, path="grads")


# ---------------------------------------------------------------------------
# torch checkpoint interop
# ---------------------------------------------------------------------------


def test_torch_checkpoint_import(tmp_path):
    """A reference-format `.tar` (DataParallel 'module.' keys, as the
    reference trainer writes, run_lushnerf.py:687-694) imports to exactly
    the weight-copied pytree."""
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI, seed=11)
    sd = {"module." + k: v for k, v in nerfall.state_dict().items()}
    path = tmp_path / "042000.tar"
    torch.save({"global_step": 42000, "network_state_dict": sd}, path)

    step, params = load_torch_checkpoint(path)
    assert step == 42000
    expected = copy_nerfall(nerfall)
    _assert_tree_allclose(params, expected, rtol=0, atol=0, path="params")


def test_torch_checkpoint_legacy_two_dict(tmp_path):
    """Legacy Deblur-NeRF layout (network_fn/network_fine) accepted like
    smart_load_state_dict (helpers:612-620)."""
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI, seed=12)
    path = tmp_path / "legacy.tar"
    torch.save(
        {
            "global_step": 7,
            "network_fn_state_dict": nerfall.mlp_coarse.state_dict(),
            "network_fine_state_dict": nerfall.mlp_fine.state_dict(),
        },
        path,
    )
    step, params = load_torch_checkpoint(path)
    assert step == 7
    from tests.torch_ref import copy_nerf_mlp

    _assert_tree_allclose(params["coarse"], copy_nerf_mlp(nerfall.mlp_coarse), 0, 0)
    _assert_tree_allclose(params["fine"], copy_nerf_mlp(nerfall.mlp_fine), 0, 0)


def test_torch_checkpoint_export_roundtrip(tmp_path):
    """params -> reference state dict loads strict=True into a fresh
    NeRFAll (key-complete incl. shared-tensor aliases), and importing the
    written `.tar` returns the identical pytree."""
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI, seed=13)
    params = copy_nerfall(nerfall)

    sd = params_to_torch_state(params, module_prefix=False)
    fresh, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI, seed=14)
    fresh.load_state_dict(sd, strict=True)  # raises on any key mismatch
    for (ka, va), (kb, vb) in zip(
        sorted(nerfall.state_dict().items()), sorted(fresh.state_dict().items())
    ):
        assert ka == kb
        np.testing.assert_array_equal(t2n(va), t2n(vb), err_msg=ka)

    path = tmp_path / "100000.tar"
    save_torch_checkpoint(path, 100000, params)
    step, params2 = load_torch_checkpoint(path)
    assert step == 100000
    _assert_tree_allclose(params2, params, rtol=0, atol=0)


def test_torch_import_render_parity():
    """Import-then-render equals weight-copied render: the cheapest real
    proof that a reference-trained checkpoint renders identically here."""
    nerfall, _, _ = build_ref_lush(NUM_IMG, M, WIDTH, SI, seed=15)
    params = torch_state_to_params(nerfall.state_dict())
    cfg = _lush_cfg(perturb=False)

    rng = np.random.default_rng(25)
    rays, idx, _ = _batch(rng, 5)
    nerfall.train()
    with torch.no_grad(), float32_numpy_rand():
        out_ref = nerfall(
            H, W, _k_matrix(), chunk=1 << 20, rays=torch.from_numpy(rays),
            rays_info={"images_idx": torch.from_numpy(idx.reshape(-1, 1))},
            retraw=True, force_naive=False, allkernel=False, kernel_pixel=None,
            perturb=0.0, N_importance=SI, N_samples=S, use_viewdirs=True,
            white_bkgd=False, raw_noise_std=0.0, inference=False,
            near=0.0, far=1.0, pytest=True,
        )
    out = forward_kernel(
        params, cfg, H, W, FOCAL, jnp.asarray(rays),
        jnp.asarray(idx.astype(np.int32)), None,
        rand_override=dict(t_rand=None, u_importance=None,
                           density_noise_coarse=None, density_noise_fine=None),
    )
    np.testing.assert_allclose(np.asarray(out["rgb_blur"]), t2n(out_ref[0]), rtol=1e-4, atol=2e-5)
