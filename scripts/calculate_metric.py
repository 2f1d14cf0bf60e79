#!/usr/bin/env python
"""Offline PSNR/SSIM/LPIPS over two PNG folders.

Equivalent of the reference's utils/Calculate_Metric.py: compares rendered
images against ground truth, holding out every Nth image (default 8, the
LLFF test split).

Usage:
    python scripts/calculate_metric.py RENDER_DIR GT_DIR [--hold 8] [--all]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_dir(path):
    import imageio.v2 as imageio

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    return [imageio.imread(os.path.join(path, f))[..., :3] / 255.0 for f in files], files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("render_dir")
    ap.add_argument("gt_dir")
    ap.add_argument("--hold", type=int, default=8, help="use every Nth image (test split)")
    ap.add_argument("--all", action="store_true", help="use all images")
    args = ap.parse_args()

    from lushnerf_tpu.utils.metrics import compute_img_metric
    from lushnerf_tpu.utils import lpips as lpips_lib

    renders, rnames = load_dir(args.render_dir)
    gts, gnames = load_dir(args.gt_dir)
    n = min(len(renders), len(gts))
    idx = range(n) if args.all else range(0, n, args.hold)

    r = np.stack([renders[i] for i in idx]).astype(np.float32)
    g = np.stack([gts[i] for i in idx]).astype(np.float32)

    psnr = compute_img_metric(r, g, "psnr")
    ssim = compute_img_metric(r, g, "ssim")
    lp = compute_img_metric(r, g, "lpips") if lpips_lib.available() else float("nan")
    print(f"images: {len(r)}  PSNR: {psnr:.4f}  SSIM: {ssim:.4f}  LPIPS: {lp:.4f}")


if __name__ == "__main__":
    main()
