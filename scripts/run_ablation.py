#!/usr/bin/env python
"""Ablation matrix: prove the LuSh stack earns its complexity (VERDICT r3
next #1).

Round-3 context: on the mild-blur synthetic scene the full stack (26.9 dB
peak, declining after 4k) LOST to a blur-model-free NeRF control
(27.45 dB), and CTE had only ever trained with the identity-grid stub.
This harness runs the decisive matrix:

  scenes:   mild  (motion blur 4-9 px — the r3 scene)
            heavy (motion blur 14-22 px — deblurring must matter)
  variants: control   — plain NeRF, no RBK/SND/CTE (the bar to beat)
            rbk       — + RBK blur kernel only
            rbk_snd   — + RBK + SND noise head
            full_gt   — + RBK + SND + CTE with geometry-true matches
                        (GroundTruthMatcher: non-identity correspondences
                        + occlusion-aware certainty)
            full_stub — + RBK + SND + CTE with the identity-grid stub
                        (isolates whether stub-CTE caused the r3 decline)

All variants share seed, data order, schedule (kernel@300,
allkernel+consist@2000, rematch@2500), 8k iters, eval every 1k, and the
shipped flagship compute path (pallas backend, bf16 compute) with the
round-4 structural gauge fix (rbk_center_bundle + rbk_zero_head_bias).

Run:  python scripts/run_ablation.py <workdir> [--iters 8000]
Then: python scripts/collect_ablation.py <workdir>   -> LONGRUN_r04.md
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCENES = {
    "mild": dict(blur_min=4, blur_max=9),
    "heavy": dict(blur_min=14, blur_max=22),
    # heavy blur + 4x sensor noise: the 0-clip biases dark-pixel noise,
    # which multi-view averaging cannot remove — SND's target regime
    "harsh": dict(blur_min=14, blur_max=22, noise_scale=4.0),
    # ISP-realistic low-light chain (VERDICT r4 #3): 0.10 exposure,
    # Bayer-correlated Poisson shot + clipped read noise, 8-bit
    # quantization, then the reference's x^0.25 scaleup applied
    # in-generator — the amplification real LOL-Blur inputs get from
    # preprocessing (load_llff.py:109-144)
    # noise_scale=3: post-amplification noise rms ~0.08-0.15 per view
    # (brightness-decile table in LONGRUN_r05), spatially correlated, so
    # 19-view averaging leaves a ~0.03 floor plus a -0.01..-0.04
    # concavity bias — material at the ~25 dB scale of these runs
    "isp": dict(blur_min=14, blur_max=22, noise_scale=3.0, mode="isp",
                isp_gamma=0.25),
}

# per-scene config overrides appended after COMMON: the isp scene is
# already scaled up in-generator, so in-trainer preprocessing must be
# identity or the gamma amplification would apply twice
SCENE_ARGS = {
    "isp": ["--scaleup_gamma", "1.0", "--scaleup_clahe", "0"],
}

COMMON = [
    "--factor", "1",
    "--llffhold", "8",
    "--fq_threshold", "30",
    "--mlp_backend", "pallas",
    "--mlp_compute_dtype", "bfloat16",
    "--rbk_center_bundle",
    "--rbk_zero_head_bias",
    "--rbk_guard_dz",
    # guard the gamma-tonemap gradient pole (measured: the SND head drives
    # dark-pixel radiance to f32-sigmoid saturation on the heavy-blur
    # scene and the x^(1/2.2) grad at exactly 0 NaN'ed the run)
    "--tonemap_eps", "1e-4",
    "--render_factor", "2",
    "--i_print", "100",
    "--i_weights", "1000000",
    "--no_reload",
    "--tbdir", "",
    # r5: no-recompute backward (bit-identical gradients at bf16,
    # ~14% faster steps — ops/fused/nerf_mlp.fused_mlp_packed)
    "--mlp_bwd", "stash",
]

VARIANTS = {
    # blur-model-free NeRF: the reference's own baseline to beat
    # (/root/reference/run_lushnerf.py:625-661 premise)
    "control": ["--blur_model_type", "none", "--matcher", "none",
                "--noisenerf_start_iter", "1000000000"],
    "rbk": ["--use_snd", "False", "--matcher", "none",
            "--noisenerf_start_iter", "1000000000"],
    "rbk_snd": ["--matcher", "none", "--noisenerf_start_iter", "1000000000"],
    # full variants: noisenerf_start_iter is set to the allkernel gate by
    # run_one (the reference couples them, run_lushnerf configs: both 60k)
    "full_gt": ["--matcher", "gt"],
    "full_stub": ["--matcher", "stub"],
    # dark-init SND (snd_bias_init=-3): the noise head starts at the
    # sensor-noise floor (0.0047) instead of the reference's constant
    # +0.05 — tests whether SND's measured drag is its init transient
    "rbk_snd_dark": ["--matcher", "none", "--noisenerf_start_iter", "1000000000",
                     "--snd_bias_init", "-3.0"],
    "full_gt_dark": ["--matcher", "gt", "--snd_bias_init", "-3.0"],
    # RBK + geometry-true CTE with the SND head off: the configuration
    # the component ablation predicts to be optimal on synthetic scenes
    "rbk_cte_gt": ["--matcher", "gt", "--use_snd", "False"],
    # r5 mild-scene gate (VERDICT r4 #10): L1 blur-spread shrinkage
    # collapses sub-pixel (unidentifiable) kernels toward identity
    "rbk_gate": ["--use_snd", "False", "--matcher", "none",
                 "--noisenerf_start_iter", "1000000000",
                 "--rbk_spread_l1", "5e-3"],
    "rbk_cte_gt_gate": ["--matcher", "gt", "--use_snd", "False",
                        "--rbk_spread_l1", "5e-3"],
    # r5 SND gauge fix: L1 on the noise output pins the DC decomposition
    # (on the isp scene the unpenalized head absorbed ~0.06 radiance of
    # scene brightness and eval collapsed 36 -> 19.5 dB)
    "rbk_snd_l1": ["--matcher", "none", "--noisenerf_start_iter", "1000000000",
                   "--snd_l1", "1e-2"],
    "full_gt_l1": ["--matcher", "gt", "--snd_l1", "1e-2"],
    # gauge fix + dark init: the head starts at the noise floor AND the
    # gauge direction is priced
    "full_gt_l1_dark": ["--matcher", "gt", "--snd_l1", "1e-2",
                        "--snd_bias_init", "-3.0"],
}

MATRIX = [
    ("heavy", "control"),
    ("heavy", "rbk"),
    ("heavy", "rbk_snd"),
    ("heavy", "full_gt"),
    ("mild", "control"),
    ("mild", "full_gt"),
    ("mild", "full_stub"),
    ("harsh", "control"),
    ("harsh", "rbk"),
    ("harsh", "rbk_snd"),
    ("harsh", "full_gt"),
    ("heavy", "rbk_snd_dark"),
    ("heavy", "full_gt_dark"),
    ("harsh", "rbk_snd_dark"),
    ("heavy", "rbk_cte_gt"),
    ("harsh", "rbk_cte_gt"),
    ("mild", "rbk"),
    ("mild", "rbk_cte_gt"),
    # r5 ISP-noise matrix: does SND finally pay for itself where the
    # noise is ISP-shaped? (VERDICT r4 #3)
    ("isp", "control"),
    ("isp", "rbk"),
    ("isp", "rbk_snd"),
    ("isp", "rbk_cte_gt"),
    ("isp", "full_gt"),
    ("isp", "rbk_snd_dark"),
    # r5 mild-scene gate column (VERDICT r4 #10) + heavy no-harm check
    ("mild", "rbk_gate"),
    ("heavy", "rbk_cte_gt_gate"),
    # r5 SND gauge-fix columns
    ("isp", "rbk_snd_l1"),
    ("isp", "full_gt_l1"),
    ("isp", "rbk_cte_gt_gate"),
    ("isp", "full_gt_l1_dark"),
    ("harsh", "full_gt_l1"),
]


def ensure_scene(workdir: Path, name: str):
    scene = workdir / f"scene_{name}"
    if not (scene / "poses_bounds.npy").exists():
        from scripts.make_synthetic_scene import make_scene

        make_scene(scene, n=20, H=256, W=256, seed=0, supersample=2,
                   **SCENES[name])
    return scene


def run_one(scene: Path, exp_dir: Path, variant: str, iters: int,
            gates=None, i_testset=1000):
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.train.trainer import Trainer

    # default gates: the round-3 scaled schedule (kernel@300,
    # allkernel+consist@2000, rematch@2500); pass gates=(k, a, r) to
    # override (e.g. reference-proportional for longer runs)
    k, a, r = gates or (300, 2000, 2500)
    argv = [
        "--config", str(REPO / "configs" / "poster"),
        "--datadir", str(scene),
        "--basedir", str(exp_dir.parent),
        "--expname", exp_dir.name,
        "--N_iters", str(iters),
        "--i_testset", str(i_testset),
        "--kernel_start_iter", str(k),
        "--allkernel_start_iter", str(a),
        "--rematch_interval", str(r),
    ] + COMMON + SCENE_ARGS.get(scene.name.replace("scene_", ""), []) \
      + VARIANTS[variant]
    if "--matcher" in argv and argv[argv.index("--matcher") + 1] in ("gt", "stub") \
            and "--noisenerf_start_iter" not in argv:
        argv += ["--noisenerf_start_iter", str(a)]
    cfg = Config.from_args(argv)
    trainer = Trainer(cfg)
    trainer.setup()
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0
    (exp_dir / "DONE.json").write_text(json.dumps({
        "variant": variant, "iters": iters, "wall_s": wall,
    }))
    print(f"[ablation] {exp_dir} done in {wall:.0f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--only", default="", help="comma list scene:variant filters")
    ap.add_argument("--gates", default="",
                    help="kernel,allkernel,rematch gate override, e.g. "
                         "'240,12000,4000' (reference-proportional at 20k)")
    ap.add_argument("--i-testset", type=int, default=1000)
    ap.add_argument("--tag", default="", help="suffix for exp dirs (schedule variants)")
    args = ap.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    gates = tuple(int(x) for x in args.gates.split(",")) if args.gates else None

    only = [tuple(s.split(":")) for s in args.only.split(",") if s]
    for scene_name, variant in MATRIX:
        if only and (scene_name, variant) not in only:
            continue
        scene = ensure_scene(workdir, scene_name)
        exp_dir = workdir / scene_name / (variant + args.tag)
        if (exp_dir / "DONE.json").exists():
            print(f"[ablation] skip {exp_dir} (done)")
            continue
        print(f"=== {scene_name} / {variant}{args.tag} ===", flush=True)
        run_one(scene, exp_dir, variant, args.iters, gates=gates,
                i_testset=args.i_testset)


if __name__ == "__main__":
    main()
