#!/usr/bin/env python
"""Collect the ablation matrix into a tables file.

Run:  python scripts/collect_ablation.py <workdir> [outfile]
(default outfile LONGRUN_TABLES.md — the per-round LONGRUN_r0N.md
narratives cite these tables)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

SCENE_DESC = {
    "mild": "motion blur 4-9 px, 1x noise (the round-3 scene)",
    "heavy": "motion blur 14-22 px, 1x noise",
    "harsh": "motion blur 14-22 px, 4x noise (0-clip biases dark pixels)",
    "isp": ("ISP-realistic chain (r5): 0.10 exposure, Bayer-correlated "
            "Poisson shot + clipped read noise at 3x, 8-bit quantization, "
            "x^0.25 scaleup applied in-generator"),
}
VARIANT_DESC = {
    "control": "plain NeRF (no RBK/SND/CTE) — the bar to beat",
    "rbk": "+ RBK blur kernel",
    "rbk_snd": "+ RBK + SND noise head",
    "full_gt": "full stack: RBK + SND + CTE (geometry-true matches)",
    "full_stub": "full stack with identity-grid stub CTE (r3's setup)",
    "rbk_snd_dark": "+ RBK + SND with dark init (snd_bias_init=-3)",
    "full_gt_dark": "full stack, SND dark-init",
    "rbk_cte_gt": "+ RBK + geometry-true CTE, SND off",
    "rbk_gate": "+ RBK with L1 blur-spread gate (rbk_spread_l1=5e-3, r5)",
    "rbk_cte_gt_gate": "rbk_cte_gt + L1 blur-spread gate (r5)",
    "rbk_snd_l1": "+ RBK + SND with L1 gauge fix (snd_l1=1e-2, r5)",
    "full_gt_l1": "full stack with SND L1 gauge fix (r5)",
}


def read_evals(exp_dir: Path):
    evals = {}
    f = exp_dir / "test_metrics.txt"
    if not f.exists():
        return evals
    for line in open(f):
        m = re.search(r"iter(\d+): MSE:(\S+) PSNR:(\S+) SSIM:(\S+)", line)
        if m:
            evals[int(m.group(1))] = (float(m.group(3)), float(m.group(4)))
    return evals


SCHEDULE_TAGS = ("_20k", "_40k")


def _emit_scene_tables(lines, runs, scene, tag):
    variants = [v for (s, v) in runs if s == scene and
                (v.endswith(tag) if tag
                 else not any(v.endswith(t) for t in SCHEDULE_TAGS))]
    base = lambda v: v[: -len(tag)] if tag else v
    order = [v for b in VARIANT_DESC for v in variants if base(v) == b]
    if not order:
        return
    iters = sorted({it for v in order for it in runs[(scene, v)]})
    lines.append("| iter | " + " | ".join(f"{base(v)} PSNR" for v in order) + " |")
    lines.append("|" + "---|" * (len(order) + 1))
    for it in iters:
        row = [str(it)]
        for v in order:
            e = runs[(scene, v)].get(it)
            row.append(f"{e[0]:.2f}" if e else "—")
        lines.append("| " + " | ".join(row) + " |")
    lines.append("")
    lines.append("| variant | peak PSNR | final PSNR | final SSIM |")
    lines.append("|---|---|---|---|")
    for v in order:
        e = runs[(scene, v)]
        if not e:
            continue
        peak = max(p for p, _ in e.values())
        last_it = max(e)
        lines.append(
            f"| {base(v)} ({VARIANT_DESC.get(base(v), '')}) | {peak:.2f} | "
            f"{e[last_it][0]:.2f} | {e[last_it][1]:.3f} |"
        )
    lines.append("")


def main():
    workdir = Path(sys.argv[1])
    runs = {}
    for scene_dir in sorted(workdir.iterdir()):
        if not scene_dir.is_dir() or scene_dir.name.startswith("scene_"):
            continue
        for exp in sorted(scene_dir.iterdir()):
            if (exp / "DONE.json").exists():
                runs[(scene_dir.name, exp.name)] = read_evals(exp)

    scenes = sorted({s for s, _ in runs})
    lines = [
        "# LONGRUN_TABLES — full ablation matrix (auto-generated; narratives in LONGRUN_r04/r05)",
        "",
        "VERDICT r3's top item: the round-3 long run showed the full stack",
        "LOSING to a blur-model-free NeRF control on the mild-blur scene, with",
        "eval declining after 4k iters, and CTE had only ever trained with the",
        "identity-grid stub.  This matrix isolates every component on three",
        "scene difficulties (shared seed/flagship pallas+bf16 path; round-4",
        "fixes active: `rbk_center_bundle` pins the blur centroid to the pixel",
        "grid, `tonemap_eps=1e-4` guards the x^(1/2.2) gradient pole, CTE uses",
        "GroundTruthMatcher's geometry-exact correspondences).  Two schedules:",
        "8k iters with early gates (kernel@300, allkernel+consist@2000,",
        "rematch@2500) and 20k iters at the reference's own proportions",
        "(kernel@1.2%, allkernel+consist@60%, rematch every 20%).",
        "",
    ]

    for scene in scenes:
        lines += [f"## Scene `{scene}` — {SCENE_DESC.get(scene, '')}", ""]
        _emit_scene_tables(lines, runs, scene, tag="")
        if any(v.endswith("_40k") for (s, v) in runs if s == scene):
            lines += [f"### `{scene}` at 40k iters, reference-proportional "
                      "gates (kernel@480, allkernel+consist@24000, "
                      "rematch@8000) — r5", ""]
            _emit_scene_tables(lines, runs, scene, tag="_40k")
        if any(v.endswith("_20k") for (s, v) in runs if s == scene):
            lines += [f"### `{scene}` at 20k iters, reference-proportional gates", ""]
            _emit_scene_tables(lines, runs, scene, tag="_20k")

    outname = sys.argv[2] if len(sys.argv) > 2 else "LONGRUN_TABLES.md"
    (REPO / outname).write_text("\n".join(lines) + "\n")
    print(f"wrote {outname}")


if __name__ == "__main__":
    main()
