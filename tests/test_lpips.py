"""LPIPS numeric golden parity vs the vendored reference package
(/root/reference/lpips/lpips.py:140-240) at RANDOM weights — the full
scale/trunk/normalize/lin/spatial-average graph needs no pretrained trunk
to be pinned (round-1 gap: utils/lpips.py was structurally ported but
never numerically validated)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lushnerf_tpu.utils import lpips as jlpips

from tests.torch_tv_stub import install_tv_stub


@pytest.fixture(scope="module")
def ref_lpips_cls():
    install_tv_stub()  # vendored trunk builds via torchvision.models.alexnet
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import lpips as ref_pkg  # /root/reference/lpips

    return ref_pkg.LPIPS


def _build_ref(ref_lpips_cls, seed=0):
    torch.manual_seed(seed)
    return ref_lpips_cls(
        pnet_rand=True, pretrained=False, net="alex", lpips=True,
        use_dropout=True, verbose=False, eval_mode=True,
    )


def _params_from_ref(ref):
    convs = [
        (jnp.asarray(m.weight.detach().numpy()), jnp.asarray(m.bias.detach().numpy()))
        for m in ref.net.modules()
        if isinstance(m, torch.nn.Conv2d)
    ]
    lins = [
        jnp.asarray(l.model[1].weight.detach().numpy()[:, :, 0, 0]) for l in ref.lins
    ]
    return {"convs": convs, "lins": lins}


def test_lpips_matches_reference_random_weights(ref_lpips_cls):
    ref = _build_ref(ref_lpips_cls)
    params = _params_from_ref(ref)

    rng = np.random.default_rng(0)
    im0 = rng.random((48, 64, 3), dtype=np.float32)
    im1 = np.clip(im0 + 0.1 * rng.standard_normal(im0.shape).astype(np.float32), 0, 1)

    t0 = torch.from_numpy(im0).permute(2, 0, 1)[None]
    t1 = torch.from_numpy(im1).permute(2, 0, 1)[None]
    with torch.no_grad():
        ref_val = float(ref(t0, t1, normalize=True).reshape(()))

    ours = float(
        jlpips.lpips_pair(
            params, jnp.asarray(im0 * 2 - 1), jnp.asarray(im1 * 2 - 1)
        )
    )
    np.testing.assert_allclose(ours, ref_val, rtol=1e-4, atol=1e-6)


def test_lpips_identical_images_zero(ref_lpips_cls):
    ref = _build_ref(ref_lpips_cls, seed=1)
    params = _params_from_ref(ref)
    im = np.random.default_rng(1).random((32, 32, 3), dtype=np.float32)
    val = float(jlpips.lpips_pair(params, jnp.asarray(im * 2 - 1), jnp.asarray(im * 2 - 1)))
    assert abs(val) < 1e-7


def test_lpips_weight_converter_roundtrip(ref_lpips_cls, tmp_path, monkeypatch):
    """load_weights reads the on-disk torch formats (torchvision alexnet
    state dict + LPIPS v0.1 linear .pth) into the exact same pytree, and
    lpips() end-to-end equals the reference through those files."""
    ref = _build_ref(ref_lpips_cls, seed=2)
    direct = _params_from_ref(ref)

    # write the files in the layouts load_weights expects
    conv_ids = [0, 3, 6, 8, 10]
    convs = [m for m in ref.net.modules() if isinstance(m, torch.nn.Conv2d)]
    alex_sd = {}
    for i, m in zip(conv_ids, convs):
        alex_sd[f"features.{i}.weight"] = m.weight.detach().clone()
        alex_sd[f"features.{i}.bias"] = m.bias.detach().clone()
    torch.save(alex_sd, tmp_path / "alexnet.pth")
    lin_sd = {
        f"lin{i}.model.1.weight": l.model[1].weight.detach().clone()
        for i, l in enumerate(ref.lins)
    }
    torch.save(lin_sd, tmp_path / "alex_lin.pth")

    loaded = jlpips.load_weights(
        str(tmp_path / "alexnet.pth"), str(tmp_path / "alex_lin.pth")
    )
    for (wa, ba), (wb, bb) in zip(direct["convs"], loaded["convs"]):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
        np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))
    for la, lb in zip(direct["lins"], loaded["lins"]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # the public entry point through env-var config
    monkeypatch.setenv("LPIPS_ALEX_PATH", str(tmp_path / "alexnet.pth"))
    monkeypatch.setenv("LPIPS_LINEAR_PATH", str(tmp_path / "alex_lin.pth"))
    jlpips._cache.clear()
    try:
        assert jlpips.available()
        rng = np.random.default_rng(2)
        im0 = rng.random((32, 40, 3), dtype=np.float32)
        im1 = rng.random((32, 40, 3), dtype=np.float32)
        with torch.no_grad():
            ref_val = float(
                ref(
                    torch.from_numpy(im0).permute(2, 0, 1)[None],
                    torch.from_numpy(im1).permute(2, 0, 1)[None],
                    normalize=True,
                ).reshape(())
            )
        np.testing.assert_allclose(float(jlpips.lpips(im0, im1)), ref_val,
                                   rtol=1e-4, atol=1e-6)
    finally:
        jlpips._cache.clear()
