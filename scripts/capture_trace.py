#!/usr/bin/env python
"""Attempt a jax.profiler trace of the flagship train step (VERDICT r4 #9).

SURVEY §5 names `jax.profiler` traces as the TPU equivalent of the
reference's wall-clock timers; all profiling so far has been two-length
wall-clock differencing through the axon tunnel.  This script runs a few
real steps under jax.profiler.trace and reports whether a device trace
(xplane with TPU op events) was actually captured — through the tunnel
the device runs remotely, so host-side tracing may record only the
dispatch side.

Run:  python scripts/capture_trace.py [logdir]
"""

from __future__ import annotations

import glob
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_r5"
    os.makedirs(logdir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lushnerf_tpu.models.mlp import MLPConfig, init_nerf_mlp
    from lushnerf_tpu.models.renderer import RenderConfig
    from lushnerf_tpu.ops.fused import nerf_mlp as fused

    mlp_cfg = MLPConfig(depth=8, width=256, input_ch=63, input_ch_views=27)
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp_cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((5120, 192, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((5120, 3)).astype(np.float32))
    cfg = RenderConfig(mlp_compute_dtype="bfloat16", mlp_bwd="stash")

    def loss(p, x, d):
        raw = fused.eval_points_fused(p, mlp_cfg, cfg, x, d)
        return jnp.sum(raw * 1e-6)

    g = jax.jit(lambda p, x, d: jax.grad(loss)(p, x, d))
    q = params
    for _ in range(3):  # compile + warm outside the trace
        q = jax.tree.map(lambda a, b: a - 1e-9 * b, q, g(q, pts, dirs))
    _ = float(jnp.sum(jax.tree.leaves(q)[0]))

    err = None
    try:
        with jax.profiler.trace(logdir):
            for _ in range(5):
                q = jax.tree.map(lambda a, b: a - 1e-9 * b, q, g(q, pts, dirs))
            _ = float(jnp.sum(jax.tree.leaves(q)[0]))
    except Exception as e:  # noqa: BLE001
        err = repr(e)

    planes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    sizes = {p: os.path.getsize(p) for p in planes}
    report = {
        "date": time.strftime("%Y-%m-%d"),
        "device": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        "trace_error": err,
        "xplane_files": sizes,
    }
    # look inside the xplane protos for TPU device planes (the string
    # '/device:TPU' appears in plane names when device events captured)
    device_plane = False
    for p in planes:
        blob = open(p, "rb").read()
        if b"TPU" in blob and b"XLA Ops" in blob or b"/device:TPU" in blob:
            device_plane = True
    report["device_plane_detected"] = device_plane
    print(report)


if __name__ == "__main__":
    main()
