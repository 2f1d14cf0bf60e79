"""Fused Pallas NeRF-MLP kernel: forward + gradient parity vs the XLA path
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lushnerf_tpu.models.mlp import MLPConfig, apply_nerf_mlp, init_nerf_mlp
from lushnerf_tpu.models.renderer import RenderConfig
from lushnerf_tpu.ops.fused import nerf_mlp as fused


@pytest.fixture(scope="module")
def setup():
    mlp_cfg = MLPConfig(depth=8, width=256, input_ch=63, input_ch_views=27)
    render_cfg = RenderConfig()
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp_cfg)
    rng = np.random.default_rng(0)
    R, S = 4, 16
    pts = rng.standard_normal((R, S, 3)).astype(np.float32)
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return mlp_cfg, render_cfg, params, jnp.asarray(pts), jnp.asarray(dirs)


def _xla_raw(params, mlp_cfg, render_cfg, pts, dirs):
    R, S = pts.shape[:2]
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw = apply_nerf_mlp(params, mlp_cfg, render_cfg.pe_x(x), render_cfg.pe_d(d))
    return raw.reshape(R, S, 4)


def test_forward_parity(setup):
    mlp_cfg, render_cfg, params, pts, dirs = setup
    expect = _xla_raw(params, mlp_cfg, render_cfg, pts, dirs)
    with pltpu.force_tpu_interpret_mode():
        got = fused.eval_points_fused(params, mlp_cfg, render_cfg, pts, dirs, tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_forward_parity_nondivisible_points(setup):
    mlp_cfg, render_cfg, params, pts, dirs = setup
    pts7 = pts[:, :7]  # R*S = 28, not a multiple of tile 16 -> padding path
    expect = _xla_raw(params, mlp_cfg, render_cfg, pts7, dirs)
    with pltpu.force_tpu_interpret_mode():
        got = fused.eval_points_fused(params, mlp_cfg, render_cfg, pts7, dirs, tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_gradient_parity(setup):
    """Param, point, and dir gradients of a scalar loss must match XLA."""
    mlp_cfg, render_cfg, params, pts, dirs = setup

    def loss_xla(params, pts, dirs):
        raw = _xla_raw(params, mlp_cfg, render_cfg, pts, dirs)
        return jnp.sum(jnp.sin(raw) * jnp.arange(4))

    def loss_fused(params, pts, dirs):
        raw = fused.eval_points_fused(params, mlp_cfg, render_cfg, pts, dirs, tile=16)
        return jnp.sum(jnp.sin(raw) * jnp.arange(4))

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, pts, dirs)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, pts, dirs)

    leaves_x, tree_x = jax.tree.flatten(gx)
    leaves_f, tree_f = jax.tree.flatten(gf)
    assert tree_x == tree_f
    for lx, lf in zip(leaves_x, leaves_f):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_stash_backward_matches_remat(setup, dtype):
    """bwd_mode='stash' (no-recompute, activations streamed from the
    forward) must produce the same gradients as the remat backward —
    bit-identical in principle (the backward casts activations to the
    compute dtype before every matmul either way)."""
    mlp_cfg, _, params, pts, dirs = setup
    render_cfg = RenderConfig(mlp_compute_dtype=dtype)

    def loss(params, pts, dirs, mode):
        cfg = RenderConfig(mlp_compute_dtype=dtype, mlp_bwd=mode)
        raw = fused.eval_points_fused(params, mlp_cfg, cfg, pts, dirs, tile=16)
        return jnp.sum(jnp.sin(raw) * jnp.arange(4))

    with pltpu.force_tpu_interpret_mode():
        g_remat = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs, "remat")
        g_stash = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs, "stash")
    for lx, lf in zip(jax.tree.leaves(g_remat), jax.tree.leaves(g_stash)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=1e-6, atol=1e-7)


def test_sharded_kernel_parity_and_grads(setup):
    """shard_map-wrapped kernel (8-device CPU mesh, pure interpret mode)
    must match the unsharded kernel exactly — forward AND the psum-ed
    weight/point gradients (the multi-device path GSPMD cannot express
    for a Mosaic custom call; parallel/mesh.py kernel-mesh registry)."""
    from lushnerf_tpu.parallel.mesh import make_mesh, set_kernel_mesh

    mlp_cfg, render_cfg, params, pts, dirs = setup

    def loss(params, pts, dirs):
        raw = fused.eval_points_fused(params, mlp_cfg, render_cfg, pts, dirs, tile=8)
        return jnp.sum(jnp.sin(raw) * jnp.arange(4))

    fused.set_interpret(True)
    try:
        ref_out = fused.eval_points_fused(params, mlp_cfg, render_cfg, pts, dirs, tile=8)
        ref_g = jax.grad(loss, argnums=(0, 1))(params, pts, dirs)

        mesh = make_mesh([8])
        set_kernel_mesh(mesh)
        try:
            got = jax.jit(
                lambda p, x, d: fused.eval_points_fused(p, mlp_cfg, render_cfg, x, d, tile=8)
            )(params, pts, dirs)
            got_g = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, pts, dirs)
        finally:
            set_kernel_mesh(None)
    finally:
        fused.set_interpret(False)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out), rtol=1e-5, atol=1e-6)
    for lx, lf in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=1e-4, atol=1e-5)


def test_supports_gates_architecture():
    render_cfg = RenderConfig()
    good = MLPConfig(depth=8, width=256, input_ch=63, input_ch_views=27)
    assert fused.supports(good, render_cfg)
    assert not fused.supports(MLPConfig(depth=4, width=256), render_cfg)
    assert not fused.supports(MLPConfig(depth=8, width=100), render_cfg)
    noise = MLPConfig(depth=4, width=128, rgb_only=True)
    assert not fused.supports(noise, render_cfg)
