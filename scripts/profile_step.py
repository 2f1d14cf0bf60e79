#!/usr/bin/env python
"""Decompose flagship train-step time on the real chip.

Times (via the same two-length differencing as bench.py, which cancels the
tunnel's fixed readback latency):
  * fused MLP forward only, 983k points
  * fused MLP forward+backward, 983k points
  * sample_pdf + merge_z_vals at step shapes
  * full train step (bench.py workload)

Run:  python scripts/profile_step.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
import optax


def timed(fn, *args, n_short=4, n_long=16):
    """Median-free two-length differencing: returns seconds/iter."""
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0

    run(2)  # compile + warm
    t_s = run(n_short)
    t_l = run(n_long)
    return max(t_l - t_s, 1e-9) / (n_long - n_short)


def main():
    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params
    from lushnerf_tpu.models.mlp import init_nerf_mlp, MLPConfig
    from lushnerf_tpu.ops.fused import nerf_mlp as fused
    from lushnerf_tpu.ops.sampling import merge_z_vals, sample_pdf
    from lushnerf_tpu.train.losses import photometric_loss
    from lushnerf_tpu.utils.compile_cache import enable_persistent_cache
    import __graft_entry__ as ge

    enable_persistent_cache()
    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    cfg = ge._flagship_cfg(num_images=29)
    lush_cfg = cfg.lush_config()
    rcfg = lush_cfg.render
    n_rays = 1024
    n_sub = lush_cfg.rbk.num_motion + 1
    R = n_rays * n_sub  # 5120 folded rays
    S_c, S_f = rcfg.n_samples, rcfg.n_samples + rcfg.n_importance
    P = R * (S_c + S_f)  # 983,040 scene points
    print(f"rays={n_rays} folded={R} pts/step={P}")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # --- fused MLP alone ------------------------------------------------
    mlp_cfg = MLPConfig(
        depth=8, width=256, skips=(4,), use_viewdirs=True,
        input_ch=rcfg.input_ch, input_ch_views=rcfg.input_ch_views,
    )
    mparams = init_nerf_mlp(key, mlp_cfg)
    tile_max = max(fused._tile_pair(fused.DEFAULT_TILE))
    P_pad = -(-P // tile_max) * tile_max
    xd = jnp.asarray(rng.standard_normal((P_pad, fused.XD_CH)), jnp.float32)

    cd = rcfg.mlp_compute_dtype

    @jax.jit
    def mlp_fwd(mparams, xd):
        w = fused.pad_params(mparams, 256)
        return fused.fused_mlp_packed(w, xd, fused.DEFAULT_TILE, cd)

    @jax.jit
    def mlp_fwdbwd(mparams, xd):
        def loss(mp):
            w = fused.pad_params(mp, 256)
            out = fused.fused_mlp_packed(w, xd, fused.DEFAULT_TILE, cd)
            return jnp.sum(out * out)
        return jax.grad(loss)(mparams)

    t_fwd = timed(mlp_fwd, mparams, xd)
    t_fb = timed(mlp_fwdbwd, mparams, xd)

    # MLP MACs/pt at padded kernel shapes
    macs = 128 * 256 * 2 + 256 * 256 * 8 + 256 * 128 * 2 + 128 * 128 * 2
    fl_fwd = 2 * macs * P_pad
    print(f"mlp fwd      : {t_fwd*1e3:8.2f} ms   {fl_fwd/t_fwd/1e12:6.1f} TFLOP/s")
    print(f"mlp fwd+bwd  : {t_fb*1e3:8.2f} ms   {3*fl_fwd/t_fb/1e12:6.1f} TFLOP/s (counting 3x fwd)")

    # --- sampling ops at step shapes -------------------------------------
    z_mid = jnp.sort(jnp.asarray(rng.random((R, S_c - 1), dtype=np.float32)), axis=-1)
    wts = jnp.asarray(rng.random((R, S_c - 2), dtype=np.float32))
    u = jnp.asarray(rng.random((R, rcfg.n_importance), dtype=np.float32))
    zc = jnp.sort(jnp.asarray(rng.random((R, S_c), dtype=np.float32)), axis=-1)
    zi = jnp.asarray(rng.random((R, rcfg.n_importance), dtype=np.float32))

    samp = jax.jit(lambda z, w, u: sample_pdf(z, w, u))
    merg = jax.jit(lambda a, b: merge_z_vals(a, b))
    t_samp = timed(samp, z_mid, wts, u)
    t_merge = timed(merg, zc, zi)
    print(f"sample_pdf   : {t_samp*1e3:8.2f} ms")
    print(f"merge_z_vals : {t_merge*1e3:8.2f} ms")

    # --- full step (bench workload) --------------------------------------
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_lush_params(jax.random.PRNGKey(0), lush_cfg)
    params = jax.device_put(params, dev)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    H, W, focal = 400, 400, 320.0

    rays_o = (0.1 * rng.standard_normal((n_rays, 3))).astype(np.float32)
    rays_d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    batch = {
        "rays": jnp.asarray(np.stack([rays_o, rays_d], axis=-1)),
        "rgbs": jnp.asarray(rng.random((n_rays, 3), dtype=np.float32)),
        "images_idx": jnp.asarray(rng.integers(0, 29, n_rays, dtype=np.int32)),
        "fq_mask": jnp.asarray(rng.integers(0, 2, n_rays).astype(bool)),
    }

    def loss_fn(params, key):
        out = forward_kernel(
            params, lush_cfg, H, W, focal, batch["rays"], batch["images_idx"],
            key, fq_mask=batch["fq_mask"],
        )
        loss, _ = photometric_loss(out["rgb_blur"], out["rgb0_blur"], batch["rgbs"])
        return loss

    @jax.jit
    def fwd_only(params, key):
        return loss_fn(params, key)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, opt_state, loss

    # Thread params/opt-state through the loop and split a fresh key per
    # call — the axon tunnel MEMOIZES executions with identical inputs
    # (measured: a constant-input step 'runs' in <1 ms), so repeated
    # same-argument calls time the cache, not the chip.  This is the same
    # chained pattern bench.py uses.
    def timed_step(fn, iters, key):
        p, o = params, opt_state
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            p, o, loss = fn(p, o, k)
        _ = float(loss)
        return time.perf_counter() - t0

    @jax.jit
    def fwd_step(p, o, k):  # fwd-only, but still input-varied and chained
        return p, o, loss_fn(p, k)

    key0 = jax.random.PRNGKey(1)
    timed_step(step, 2, key0)
    t_step = max(timed_step(step, 16, key0) - timed_step(step, 4, key0), 1e-9) / 12
    timed_step(fwd_step, 2, key0)
    t_sfwd = max(timed_step(fwd_step, 16, key0) - timed_step(fwd_step, 4, key0), 1e-9) / 12
    print(f"step fwd-only: {t_sfwd*1e3:8.2f} ms")
    print(f"full step    : {t_step*1e3:8.2f} ms   {n_rays/t_step:9.0f} rays/s")
    print(f"  mlp share (est): fwd+bwd {t_fb*1e3:.1f} ms of {t_step*1e3:.1f} ms "
          f"= {100*t_fb/t_step:.0f}%")


if __name__ == "__main__":
    main()
