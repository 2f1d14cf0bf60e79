#!/usr/bin/env python
"""Quantify the training-quality delta of the shipped bf16 compute mode.

The flagship config (and bench.py) run the fused MLP with
mlp_compute_dtype=bfloat16 (f32 accumulation), while all torch-parity
evidence is f32 — VERDICT r2 weak #4 asked for a bound on the quality
delta.  This script trains the SAME synthetic low-light scene twice
(identical seed/gates/data) with compute dtype f32 vs bf16 and reports
the loss / train-PSNR / eval-PSNR trajectories side by side.

Writes BF16_NOTE.md at the repo root.

Run:  python scripts/bf16_vs_f32_experiment.py <scene_dir> [--iters 1500]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_one(scene, basedir, dtype, iters):
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.train.trainer import Trainer

    cfg = Config.from_args([
        "--config", str(REPO / "configs" / "poster"),
        "--datadir", str(scene),
        "--basedir", str(basedir),
        "--expname", f"exp_{dtype}",
        "--tbdir", "",
        "--factor", "1",
        "--llffhold", "8",
        "--N_iters", str(iters),
        "--kernel_start_iter", "300",
        "--allkernel_start_iter", "1000",
        "--noisenerf_start_iter", "1000",
        "--rematch_interval", "1200",
        "--matcher", "stub",
        "--fq_threshold", "30",
        "--rbk_center_bundle",
        "--rbk_zero_head_bias",
        "--mlp_backend", "pallas",
        "--mlp_compute_dtype", dtype,
        "--render_factor", "2",
        "--i_print", "100",
        "--i_weights", "1000000",
        "--i_testset", str(iters // 3),
        "--no_reload",
    ])
    trainer = Trainer(cfg)
    trainer.setup()
    trainer.train()
    scal = [json.loads(l) for l in open(trainer.log_file)]
    evals = []
    if trainer.metrics_file.exists():
        import re

        for line in open(trainer.metrics_file):
            m = re.search(r"iter(\d+):.*PSNR:([\d.]+)", line)
            if m:
                evals.append({"iter": int(m.group(1)), "psnr": float(m.group(2))})
    return scal, evals


def aligned_eval(scene, exp_dir, iters, llffhold=8):
    """Shift-aligned eval PSNR vs clean GT: best integer (dy,dx) roll in
    [-8,8]^2 per view, averaged over test views.  Separates residual RBK
    gauge drift (a global image shift) from actual render quality."""
    import cv2
    import imageio.v2 as imageio

    from lushnerf_tpu.data.preprocess import enhance_image_bgr

    def pre(im):
        bgr = (im[..., ::-1] * 255).astype(np.uint8)
        return enhance_image_bgr(bgr, 1.0, 10.0)[..., ::-1].astype(np.float32) / 255.0

    def psnr(a, b):
        return -10 * np.log10(np.mean((a - b) ** 2))

    # derive the view count from the scene itself (ADVICE r3 low #2:
    # range(0, 20, ...) assumed exactly 20 views)
    n_views = len(sorted((Path(scene) / "gt").glob("*.png")))
    out = {}
    for it in sorted(int(p.name.split("_")[1]) for p in Path(exp_dir).glob("testset_*")):
        vals, shifts = [], []
        for vi in range(0, n_views, llffhold):
            r = imageio.imread(Path(exp_dir) / f"testset_{it:06d}" / f"{vi:03d}.png")
            r = r.astype(np.float32) / 255.0
            g = pre(imageio.imread(Path(scene) / "gt" / f"{vi:03d}.png").astype(np.float32) / 255.0)
            g = cv2.resize(g, (r.shape[1], r.shape[0]), interpolation=cv2.INTER_AREA)
            best = (None, -1.0)
            for dy in range(-8, 9):
                for dx in range(-8, 9):
                    rr = np.roll(np.roll(r, dy, 0), dx, 1)
                    m = psnr(rr[8:-8, 8:-8], g[8:-8, 8:-8])
                    if m > best[1]:
                        best = ((dy, dx), m)
            vals.append(best[1])
            shifts.append(best[0])
        # report every per-view shift and the worst |shift| (ADVICE r3:
        # reporting only view 0's shift hid per-view disagreement)
        max_shift = max(abs(s[0]) + abs(s[1]) for s in shifts)
        out[it] = (float(np.mean(vals)), shifts, max_shift)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--basedir", default="/tmp/bf16_exp")
    args = ap.parse_args()

    results = {}
    for dtype in ("float32", "bfloat16"):
        print(f"=== training with mlp_compute_dtype={dtype} ===")
        results[dtype] = run_one(args.scene, args.basedir, dtype, args.iters)

    lines = [
        "# bf16 vs f32 training numerics (round 3)",
        "",
        "Same synthetic low-light scene (`scripts/make_synthetic_scene.py`),",
        "identical seed, data order, and stage gates "
        f"(kernel@300, allkernel+consist@1000, stub rematch@1200), {args.iters}",
        "iters with the shipped pallas backend; only `mlp_compute_dtype`",
        "differs (f32 accumulation in both — the kernel always accumulates",
        "f32, `ops/fused/nerf_mlp.py:295-311`).",
        "",
        "| iter | loss f32 | loss bf16 | train PSNR f32 | train PSNR bf16 |",
        "|---|---|---|---|---|",
    ]
    s32 = {s["step"]: s for s in results["float32"][0]}
    s16 = {s["step"]: s for s in results["bfloat16"][0]}
    for step in sorted(set(s32) & set(s16)):
        a, b = s32[step], s16[step]
        lines.append(
            f"| {step} | {a['loss']:.5f} | {b['loss']:.5f} "
            f"| {a['psnr']:.3f} | {b['psnr']:.3f} |"
        )
    lines += ["", "| iter | eval PSNR f32 | eval PSNR bf16 |", "|---|---|---|"]
    e32 = {e["iter"]: e["psnr"] for e in results["float32"][1]}
    e16 = {e["iter"]: e["psnr"] for e in results["bfloat16"][1]}
    for it in sorted(set(e32) & set(e16)):
        lines.append(f"| {it} | {e32[it]:.3f} | {e16[it]:.3f} |")

    # shift-aligned eval: removes residual gauge-drift image shift (a
    # property of the RBK optimization trajectory, not of the MLP compute
    # dtype) so the dtype comparison reflects render quality alone
    a32 = aligned_eval(args.scene, Path(args.basedir) / "exp_float32", args.iters)
    a16 = aligned_eval(args.scene, Path(args.basedir) / "exp_bfloat16", args.iters)
    lines += [
        "",
        "| iter | shift-aligned eval PSNR f32 (shifts; max |s|) | bf16 (shifts; max |s|) |",
        "|---|---|---|",
    ]
    for it in sorted(set(a32) & set(a16)):
        lines.append(
            f"| {it} | {a32[it][0]:.3f} ({a32[it][1]}; {a32[it][2]}) "
            f"| {a16[it][0]:.3f} ({a16[it][1]}; {a16[it][2]}) |"
        )

    fa = results["float32"][0][-1]
    fb = results["bfloat16"][0][-1]
    lines += [
        "",
        f"Final ({args.iters} iters): loss f32 {fa['loss']:.5f} vs bf16 "
        f"{fb['loss']:.5f}; train PSNR f32 {fa['psnr']:.3f} vs bf16 "
        f"{fb['psnr']:.3f} (delta {fb['psnr']-fa['psnr']:+.3f} dB).",
    ]
    e_last = sorted(set(e32) & set(e16))[-1] if (set(e32) & set(e16)) else None
    if e_last is not None:
        lines += [
            "",
            f"**Headline (raw eval PSNR vs GT, the benchmark metric): "
            f"f32 {e32[e_last]:.2f} vs bf16 {e16[e_last]:.2f} dB at iter "
            f"{e_last} (delta {e16[e_last]-e32[e_last]:+.2f} dB).**",
        ]
    lines += [
        "",
        "Reading: raw eval PSNR is the metric that matters (ADVICE r3: the",
        "round-3 note led with shift-aligned PSNR, which hid a 4.5 dB raw",
        "gap caused by residual RBK gauge drift).  Round 4 removes that",
        "drift structurally — `rbk_center_bundle` pins the blur centroid to",
        "the original ray for ANY parameter value, so neither dtype can",
        "wander off the pixel grid; the shift table above is kept as a",
        "diagnostic and should show (0, 0)-ish shifts for both dtypes.",
    ]
    (REPO / "BF16_NOTE.md").write_text("\n".join(lines) + "\n")
    print("wrote BF16_NOTE.md")


if __name__ == "__main__":
    main()
