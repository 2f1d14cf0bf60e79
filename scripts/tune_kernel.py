#!/usr/bin/env python
"""Kernel tuning experiments: tile-size sweep + PE-cost isolation.

Run:  python scripts/tune_kernel.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n_short=4, n_long=16, repeats=1):
    """Two-length differencing (cancels the tunnel's fixed readback
    latency), repeated `repeats` times -> median.  ADVICE r3: a single
    trial mis-ranked the fwd tile sweep (2048 read faster once and did
    not reproduce); report the spread too."""
    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        return time.perf_counter() - t0

    run(2)
    ts = []
    for _ in range(repeats):
        t_s = run(n_short)
        t_l = run(n_long)
        ts.append(max(t_l - t_s, 1e-9) / (n_long - n_short))
    return (float(np.median(ts)), float(min(ts)), float(max(ts)))


def main():
    from lushnerf_tpu.models.mlp import MLPConfig, init_nerf_mlp
    from lushnerf_tpu.ops.fused import nerf_mlp as fused
    from lushnerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print("device:", jax.devices()[0].device_kind)

    P = 983040
    rng = np.random.default_rng(0)
    mlp_cfg = MLPConfig(depth=8, width=256, skips=(4,), use_viewdirs=True,
                        input_ch=63, input_ch_views=27)
    mparams = init_nerf_mlp(jax.random.PRNGKey(0), mlp_cfg)
    macs = 128 * 256 * 2 + 256 * 256 * 8 + 256 * 128 * 2 + 128 * 128 * 2
    cd = "bfloat16"

    for tile in (256, 512, 1024, 2048, 4096):
        P_pad = -(-P // tile) * tile
        xd = jnp.asarray(rng.standard_normal((P_pad, fused.XD_CH)), jnp.float32)
        fl = 2 * macs * P_pad

        @jax.jit
        def mlp_fwd(mparams, xd, tile=tile):
            w = fused.pad_params(mparams, 256)
            return fused.fused_mlp_packed(w, xd, tile, cd)

        @jax.jit
        def mlp_fb(mparams, xd, tile=tile):
            def loss(mp):
                w = fused.pad_params(mp, 256)
                out = fused.fused_mlp_packed(w, xd, tile, cd)
                return jnp.sum(out * out)
            return jax.grad(loss)(mparams)

        try:
            t_f, lo, hi = timed(mlp_fwd, mparams, xd, repeats=5)
            msg = (f"tile={tile:5d}  fwd {t_f*1e3:7.2f} ms "
                   f"[{lo*1e3:.2f},{hi*1e3:.2f}] {fl/t_f/1e12:6.1f} TF/s")
        except Exception as e:
            msg = f"tile={tile:5d}  fwd FAILED: {str(e)[:80]}"
        try:
            t_fb, lo, hi = timed(mlp_fb, mparams, xd, repeats=5)
            msg += (f"   fwd+bwd {t_fb*1e3:7.2f} ms "
                    f"[{lo*1e3:.2f},{hi*1e3:.2f}] {3*fl/t_fb/1e12:6.1f} TF/s(3x)")
        except Exception as e:
            msg += f"   fwd+bwd FAILED: {str(e)[:80]}"
        print(msg, flush=True)

    # --- PE-only and matmul-only kernels at tile=512 ----------------------
    tile = 512
    P_pad = -(-P // tile) * tile
    grid = P_pad // tile
    C = jnp.asarray(fused._pe_consts_np(10, 4))
    xd = jnp.asarray(rng.standard_normal((P_pad, fused.XD_CH)), jnp.float32)

    def pe_kernel(xd_ref, c_ref, out_ref):
        _, pe = fused._pe_forward(xd_ref[...], c_ref[...])
        out_ref[...] = pe

    @jax.jit
    def pe_only(xd):
        return pl.pallas_call(
            pe_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile, fused.XD_CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P_pad, 128), jnp.float32),
        )(xd, C)

    w = jax.jit(lambda p: fused.pad_params(p, 256))(mparams)

    def mm_kernel(x_ref, *refs):
        ws = tuple(r[...] for r in refs[:-1])
        out_ref = refs[-1]
        acts = fused._fwd_activations(x_ref[...], ws, jnp.bfloat16)
        alpha, rgb = acts[8], acts[11]
        out_ref[...] = jnp.concatenate(
            [rgb[:, :4], jnp.zeros_like(rgb[:, :124])], axis=-1) + alpha

    @jax.jit
    def mm_only(xpe, w):
        return pl.pallas_call(
            mm_kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P_pad, 128), jnp.float32),
        )(xpe, *w)

    xpe = pe_only(xd)
    t_pe, _, _ = timed(pe_only, xd)
    t_mm, _, _ = timed(mm_only, xpe, w)
    fl = 2 * macs * P_pad
    print(f"tile={tile}: PE-only {t_pe*1e3:7.2f} ms   matmul-only {t_mm*1e3:7.2f} ms "
          f"({fl/t_mm/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
