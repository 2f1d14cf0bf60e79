#!/usr/bin/env python
"""Decompose DKM decoder time per stage at the production match shape.

PROFILE_r04 attributed the cached-rematch floor (1.19 s/pair) to
"full-res grid_sample/local-correlation gathers" without per-stage
numbers; this script times, at (640, 1120) with random converted weights:

  * the full single-direction decoder (the cached-rematch unit of work)
  * per-scale ConvRefiner pieces: the grid_sample warp (x_hat), the
    windowed local_correlation (scales 16/8/4), and the conv stack
  * the GP + DFN coarse stages

so the pallas-kernel effort (VERDICT r4 #5) lands on the measured
bottleneck.  Two-length differencing cancels the tunnel readback latency.

Run:  python scripts/profile_dkm_stages.py [--hs 640] [--ws 1120]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def timed(fn, *args, ns=2, nl=6):
    import jax
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return time.perf_counter() - t0

    run(1)  # compile
    run(1)  # warm
    return max(run(nl) - run(ns), 1e-9) / (nl - ns)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hs", type=int, default=640)
    ap.add_argument("--ws", type=int, default=1120)
    args = ap.parse_args()
    hs, ws = args.hs, args.ws

    import numpy as np

    from torch_tv_stub import install_tv_stub

    install_tv_stub()
    import jax
    import jax.numpy as jnp

    from lushnerf_tpu.matcher.dkm import convert as cv
    from lushnerf_tpu.matcher.dkm.blocks import conv_refiner_forward
    from lushnerf_tpu.matcher.dkm.matcher import decoder_forward
    from lushnerf_tpu.matcher.dkm.nn import (
        grid_sample_bilinear,
        local_correlation,
        meshgrid_coords,
    )
    from lushnerf_tpu.matcher.dkm.resnet import resnet50_pyramid

    # random weights through the real converter path
    from torch_ref import REF_PATH

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import importlib

    import torch

    ref_mod = importlib.import_module("gim.dkm.models.model_zoo.DKMv3")
    torch.manual_seed(0)
    model = ref_mod.DKMv3(weights=None, h=hs, w=ws)
    params = cv.from_torch_state_dict(model.state_dict())
    params = jax.device_put(jax.tree.map(jnp.asarray, params))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, hs, ws), dtype=np.float32))

    pyr = jax.jit(lambda p, x: resnet50_pyramid(p, x))(params, img)
    pyr_q = {s: f[:1] for s, f in pyr.items()}
    pyr_s = {s: f[1:] for s, f in pyr.items()}

    print(f"device: {jax.devices()[0].device_kind}  shape ({hs}, {ws})")

    dec = jax.jit(lambda p, a, b: decoder_forward(p, a, b))
    t = timed(dec, params, pyr_q, pyr_s)
    print(f"decoder pass 1 (32..1)      : {1e3 * t:8.1f} ms")

    # per-scale refiner pieces.  feature dims per scale from the pyramid.
    for scale, proj in [("16", True), ("8", False), ("4", False),
                        ("2", False), ("1", False)]:
        ins = int(scale)
        f1s, f2s = pyr_q[ins], pyr_s[ins]
        if proj:
            from lushnerf_tpu.matcher.dkm.nn import conv2d

            f1s = jax.jit(lambda p, x: conv2d(p, f"decoder.proj.{scale}", x))(params, f1s)
            f2s = jax.jit(lambda p, x: conv2d(p, f"decoder.proj.{scale}", x))(params, f2s)
        b, c, h, w = f1s.shape
        coords = meshgrid_coords(h, w)
        flow = jnp.broadcast_to(
            jnp.transpose(coords, (2, 0, 1))[None], (1, 2, h, w)
        ) + 0.01 * jnp.asarray(rng.standard_normal((1, 2, h, w)), jnp.float32)

        from lushnerf_tpu.matcher.dkm.nn import grid_sample_patch

        t_ref = timed(
            jax.jit(lambda p, a, b_, f: conv_refiner_forward(p, f"decoder.conv_refiner.{scale}", a, b_, f, scale)),
            params, f1s, f2s, flow,
        )
        t_warp = timed(
            jax.jit(lambda y, f: grid_sample_bilinear(y, jnp.transpose(f, (0, 2, 3, 1)))),
            f2s, flow,
        )
        t_warp_p = timed(
            jax.jit(lambda y, f: grid_sample_patch(y, jnp.transpose(f, (0, 2, 3, 1)))),
            f2s, flow,
        )
        line = (f"refiner@{scale:>2} [C={c:4d} {h}x{w}]: total {1e3 * t_ref:8.1f} ms"
                f"  warp {1e3 * t_warp:7.1f} ms  warp_patch {1e3 * t_warp_p:7.1f} ms")
        from lushnerf_tpu.matcher.dkm.blocks import REFINER_CFG

        r = REFINER_CFG[scale]
        if r is not None:
            t_corr = timed(
                jax.jit(lambda a, b_, f: local_correlation(a, b_, r, flow=f, impl="gather")),
                f1s, f2s, flow,
            )
            t_corr_p = timed(
                jax.jit(lambda a, b_, f: local_correlation(a, b_, r, flow=f, impl="patch")),
                f1s, f2s, flow,
            )
            line += (f"  local_corr(r={r}) {1e3 * t_corr:7.1f} ms"
                     f"  patch {1e3 * t_corr_p:7.1f} ms")
        print(line)


if __name__ == "__main__":
    main()
