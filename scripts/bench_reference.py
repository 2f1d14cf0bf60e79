#!/usr/bin/env python
"""Measure the PyTorch reference's training step on THIS host (CPU torch).

VERDICT r01 flagged that bench.py's `vs_baseline` divided by a documented
*estimate* (1,024 rays/s, DP-NeRF-class GPU throughput).  This script
replaces the guess with a measurement: it drives the actual reference
code at /root/reference — `NeRFAll.forward` in DSK training mode
(run_lushnerf.py:625-628) at the flagship workload shape (N_rand=1024,
5 sub-rays, 64+64 samples, 8x256 MLPs), the reference loss assembly
(:652-661), `loss.backward()`, and the Adam step — and times full
iterations on host CPU (no GPU exists in this environment; the reference
is CUDA-only upstream, so CPU is the only same-host measurement
available).

Writes BASELINE_MEASURED.json at the repo root; bench.py reports
`vs_baseline` against the documented GPU-class estimate AND
`vs_torch_cpu_measured` against this number when present.

Run:  python scripts/bench_reference.py  [--iters 3] [--n-rand 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--n-rand", type=int, default=1024)
    ap.add_argument("--netwidth", type=int, default=256)
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--n-importance", type=int, default=64)
    args = ap.parse_args()

    import torch

    from torch_ref import build_ref_lush, ref_helpers

    helpers = ref_helpers()
    torch.manual_seed(0)

    H, W, focal = 400, 400, 320.0
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)
    num_img = 29

    nerfall, _, _ = build_ref_lush(
        num_img=num_img, num_motion=4, netwidth=args.netwidth,
        n_importance=args.n_importance,
    )
    nerfall.train()
    # reference optimizer construction (run_lushnerf.py:359-371): two param
    # groups (noise split out), same lr
    noise_params, scene_params = [], []
    for name, p in nerfall.named_parameters():
        (noise_params if "noise" in name else scene_params).append(p)
    optimizer = torch.optim.Adam(
        [{"params": scene_params}, {"params": noise_params, "lr": 5e-4}], lr=5e-4
    )

    rng = np.random.default_rng(0)
    n = args.n_rand
    rays_o = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = torch.from_numpy(np.stack([rays_o, rays_d], axis=-1))
    rays_info = {
        "images_idx": torch.from_numpy(
            rng.integers(0, num_img, n).astype(np.int64).reshape(-1, 1)
        )
    }
    target = torch.from_numpy(rng.random((n, 3), dtype=np.float32))

    def step():
        out = nerfall(
            H, W, K, chunk=1 << 20, rays=rays, rays_info=rays_info,
            retraw=True, force_naive=False, allkernel=False, kernel_pixel=None,
            perturb=1.0, N_importance=args.n_importance, N_samples=args.n_samples,
            use_viewdirs=True, white_bkgd=False, raw_noise_std=0.0,
            inference=False, near=0.0, far=1.0,
        )
        rgb_blur, rgb0_blur = out[0], out[1]
        loss = (
            0.5 * helpers.img2mse(rgb_blur, target)
            + 0.5 * helpers.img2l1(rgb_blur, target)
            + 0.5 * helpers.img2mse(rgb0_blur, target)
            + 0.5 * helpers.img2l1(rgb0_blur, target)
        )
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0

    rays_per_s = n * args.iters / dt
    result = {
        "torch_cpu_rays_per_s": round(rays_per_s, 2),
        "sec_per_iter": round(dt / args.iters, 3),
        "n_rand": n,
        "n_samples": args.n_samples,
        "n_importance": args.n_importance,
        "netwidth": args.netwidth,
        "torch_threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
        "cpu": platform.processor() or platform.machine(),
        "note": (
            "reference NeRFAll DSK training step (fwd+bwd+Adam) measured on "
            "host CPU; the reference targets CUDA, so this is a lower bound "
            "on its GPU speed — bench.py also reports vs the documented "
            "1,024 rays/s GPU-class estimate"
        ),
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
