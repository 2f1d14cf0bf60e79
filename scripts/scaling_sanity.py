#!/usr/bin/env python
"""Scaling evidence for the data-parallel design (VERDICT r3 missing #3).

Two parts:

1. **Virtual-device sanity** — jit the production-sharding train step
   (params replicated, rays sharded, grad all-reduce) on a 1-device and an
   8-device CPU mesh with the SAME global batch and compare steady-state
   step times.  Virtual CPU devices share one host's cores, so this cannot
   show real speedup; what it CAN show is that the 8-way partitioned
   program introduces no pathological communication or recompute (time
   ratio ~1, not >>1).

2. **Analytic comm/compute budget** — the measured v5e step is compute
   bound at 42.7 ms (BENCH_r03/PROFILE_r03).  Data parallelism adds ONE
   gradient all-reduce of the parameter pytree per step.  This script
   counts the real parameter bytes and computes the all-reduce time on
   ICI (ring: 2*(n-1)/n * bytes / bw) for v5e (45 GB/s/link/direction)
   and v4 (3D torus links), giving the predicted scaling efficiency at
   n=8/16/32 chips — the ≥90 % BASELINE.md target with margin.

Writes SCALING_r05.json at the repo root.

Run (CPU):  JAX_PLATFORMS=cpu python scripts/scaling_sanity.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build(n_devices: int, n_rand: int = 256):
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params
    from lushnerf_tpu.train.losses import photometric_loss

    cfg = Config(
        num_images=8, N_samples=32, N_importance=32, use_viewdirs=True,
        raw_noise_std=1.0, blur_model_type="dpnerf", use_dpnerf=True,
        rbk_use_origin=True, rbk_num_motion=4, rbk_view_embed_ch=64,
        tone_mapping_type="gamma", point_chunk=0, mlp_backend="xla",
    )
    lush_cfg = cfg.lush_config()
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices).reshape((n_devices,)), ("data",))
    rep, shard = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    params = init_lush_params(jax.random.PRNGKey(0), lush_cfg)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    H, W, focal = 64, 64, 48.0

    def loss_fn(params, batch, key):
        out = forward_kernel(
            params, lush_cfg, H, W, focal, batch["rays"], batch["images_idx"], key
        )
        loss, mse = photometric_loss(out["rgb_blur"], out["rgb0_blur"], batch["rgbs"])
        return loss, mse

    def train_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(
        train_step, in_shardings=(rep, rep, shard, rep),
        out_shardings=(rep, rep, rep), donate_argnums=(0, 1),
    )
    rng = np.random.default_rng(0)
    rays_o = (0.1 * rng.standard_normal((n_rand, 3))).astype(np.float32)
    rays_d = rng.standard_normal((n_rand, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    batch = jax.device_put({
        "rays": jnp.asarray(np.stack([rays_o, rays_d], -1)),
        "rgbs": jnp.asarray(rng.random((n_rand, 3), dtype=np.float32)),
        "images_idx": jnp.asarray(rng.integers(0, 8, n_rand, dtype=np.int32)),
    }, shard)
    return step, params, opt_state, batch, lush_cfg


def time_steps(n_devices: int, iters: int = 8):
    step, params, opt_state, batch, lush_cfg = build(n_devices)
    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, batch, key)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters, params


def main():
    t1, params = time_steps(1)
    t8, _ = time_steps(8)

    # real parameter byte count of the FLAGSHIP config (w256, 64+64)
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.models.lushnerf import init_lush_params

    flag = Config(
        num_images=29, N_samples=64, N_importance=64, use_viewdirs=True,
        blur_model_type="dpnerf", use_dpnerf=True, rbk_use_origin=True,
        rbk_num_motion=4, rbk_view_embed_ch=64,
    )
    fparams = init_lush_params(jax.random.PRNGKey(0), flag.lush_config())
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(fparams))
    grad_bytes = n_params * 4  # f32 grads

    step_ms = 36.5  # measured v5e fwd+bwd step (PROFILE_r05, stash bwd)
    budgets = {}
    for name, bw_gbs in (("v5e_ici_45GBps", 45.0), ("v4_ici_100GBps", 100.0)):
        per_n = {}
        for n in (4, 8, 16, 32):
            # bidirectional ring all-reduce: 2*(n-1)/n * bytes over the
            # slowest link; overlap with backward ignored (worst case)
            t_ar_ms = 2 * (n - 1) / n * grad_bytes / (bw_gbs * 1e9) * 1e3
            eff = step_ms / (step_ms + t_ar_ms)
            per_n[n] = {"allreduce_ms": round(t_ar_ms, 4), "predicted_eff": round(eff, 4)}
        budgets[name] = per_n

    out = {
        "virtual_device_sanity": {
            "global_batch_rays": 256,
            "step_s_1dev": round(t1, 4),
            "step_s_8dev": round(t8, 4),
            "ratio_8_over_1": round(t8 / t1, 3),
            "note": "8 virtual CPU devices share one host's cores: ratio ~1 "
                    "means the partitioned program adds no pathological "
                    "comm/recompute; real speedup needs real chips",
        },
        "analytic_budget": {
            "flagship_param_count": n_params,
            "grad_bytes_f32": grad_bytes,
            "measured_step_ms_v5e": step_ms,
            "per_interconnect": budgets,
            "note": "one grad all-reduce per step; rays are sharded so "
                    "activations never cross chips; eval all-gather is "
                    "off the training path.  Worst case (no overlap with "
                    "backward) still predicts >99% scaling efficiency "
                    "through 32 chips — the BASELINE.md >=90% target has "
                    ">10x margin.",
        },
    }
    (REPO / "SCALING_r05.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
