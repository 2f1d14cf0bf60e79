#!/usr/bin/env python
"""Benchmark: rays/s/chip forward+backward on the flagship workload.

Workload = the reference's default training step (configs/poster_lushnerf):
N_rand=1024 rays x 5 sub-rays (RBK) x (64 coarse + 128 fine) samples
through 8x256 MLPs + SND noise head + compositing + losses + Adam update
== the full jitted train step, fwd+bwd.  ~983k MLP point evals / step.

Prints ONE JSON line:
  {"metric": "rays_per_s_per_chip_fwdbwd", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE_RAYS_PER_S}

BASELINE_RAYS_PER_S: the reference publishes no throughput numbers
(BASELINE.md).  DP-NeRF-class PyTorch codebases (which LuSh-NeRF extends)
train 100k-200k iters in ~1-2 GPU-days at N_rand=1024, i.e. ~1 it/s ~=
1024 rays/s on a modern GPU; the LuSh README itself warns it is slower
than that ("may be a bit slow", README.md:47).  We use 1024 rays/s as the
documented estimate.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 1024.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params
    from lushnerf_tpu.train.losses import photometric_loss
    from lushnerf_tpu.utils.compile_cache import enable_persistent_cache

    import __graft_entry__ as ge

    enable_persistent_cache()
    cfg = ge._flagship_cfg(num_images=29)
    lush_cfg = cfg.lush_config()
    n_rays = 1024
    H, W, focal = 400, 400, 320.0

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_lush_params(jax.random.PRNGKey(0), lush_cfg)
    params = jax.device_put(params, jax.devices()[0])
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    def loss_fn(params, batch, key):
        out = forward_kernel(
            params, lush_cfg, H, W, focal, batch["rays"], batch["images_idx"], key,
            fq_mask=batch["fq_mask"],
        )
        loss, mse = photometric_loss(out["rgb_blur"], out["rgb0_blur"], batch["rgbs"])
        return loss, mse

    @jax.jit
    def step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.default_rng(0)
    rays_o = (0.1 * rng.standard_normal((n_rays, 3))).astype(np.float32)
    rays_d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    batch = {
        "rays": jnp.asarray(np.stack([rays_o, rays_d], axis=-1)),
        "rgbs": jnp.asarray(rng.random((n_rays, 3), dtype=np.float32)),
        "images_idx": jnp.asarray(rng.integers(0, 29, n_rays, dtype=np.int32)),
        "fq_mask": jnp.asarray(rng.integers(0, 2, n_rays).astype(bool)),
    }
    key = jax.random.PRNGKey(1)

    # Timing note: on this platform block_until_ready does not reliably
    # wait for remote completion; only a host readback synchronizes.  We
    # therefore time two chained runs of different lengths, each ended by
    # float(loss), and difference them to cancel the fixed readback
    # latency (~25ms on the tunnel).
    def timed(iters, params, opt_state, key):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, batch, k)
        _ = float(loss)
        return time.perf_counter() - t0

    timed(2, params, opt_state, key)  # warmup / compile
    n_short, n_long = 5, 25
    t_short = timed(n_short, params, opt_state, key)
    t_long = timed(n_long, params, opt_state, key)
    dt = max(t_long - t_short, 1e-9)
    iters = n_long - n_short

    rays_per_s = n_rays * iters / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_s_per_chip_fwdbwd",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
