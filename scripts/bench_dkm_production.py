#!/usr/bin/env python
"""Execute the DKMv3 port at the PRODUCTION match shape on the TPU.

The reference rematch pass runs symmetric two-pass matching at
(hs, ws) = (640, 1120) (gim/dkm/models/model_zoo/DKMv3.py:1128,1264-1271)
over all V*(V-1)+V ordered pairs of rendered training views
(run_lushnerf.py:745-774; 841 pairs at V=29).  VERDICT r2 flagged that the
port had only ever executed at 64x96 — this script runs the real shape
with random weights (the checkpoint converts through the same tested
path), measures per-pair wall-clock + HBM, and projects full-rematch cost.

Round 4 additionally measures the cached rematch fast path
(matcher.match_many: per-view encoder pyramids encoded once + batched
single-direction decoder — VERDICT r3 next #4 asked for steady_pair_s
<= ~0.35 with parity intact; parity is golden-tested in
tests/test_dkm.py::test_match_many_cached_parity_with_per_pair_match).

Writes DKM_PROD_r05.json at the repo root.

Run:  python scripts/bench_dkm_production.py [--hs 640] [--ws 1120]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hs", type=int, default=640)
    ap.add_argument("--ws", type=int, default=1120)
    ap.add_argument("--views", type=int, default=29)
    args = ap.parse_args()

    import numpy as np

    # random-weight torch reference -> converter (CPU only, no TPU traffic)
    from torch_tv_stub import install_tv_stub

    install_tv_stub()
    from torch_ref import REF_PATH

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import importlib

    import torch

    ref_mod = importlib.import_module("gim.dkm.models.model_zoo.DKMv3")
    torch.manual_seed(0)
    model = ref_mod.DKMv3(weights=None, h=args.hs, w=args.ws)
    sd = model.state_dict()
    del model

    from lushnerf_tpu.matcher.dkm.convert import from_torch_state_dict
    from lushnerf_tpu.matcher.dkm.matcher import DKMMatcher
    from lushnerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    dev = jax.devices()[0]
    print("device:", dev.device_kind)
    params = from_torch_state_dict(sd)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"params: {len(params)} tensors, {n_params/1e6:.1f} M")

    matcher = DKMMatcher(params=params, hs=args.hs, ws=args.ws)

    rng = np.random.default_rng(0)
    imgs = rng.random((3, args.hs, args.ws, 3)).astype(np.float32)

    t0 = time.perf_counter()
    k0, k1, cert = matcher.match(imgs[0], imgs[1])
    t_first = time.perf_counter() - t0
    print(f"first pair (incl. compile): {t_first:.1f} s; "
          f"{len(cert)} columns, cert mean {cert.mean():.4f}")
    assert np.isfinite(k0).all() and np.isfinite(cert).all()

    times = []
    for i in range(4):
        t0 = time.perf_counter()
        matcher.match(imgs[(i + 1) % 3], imgs[(i + 2) % 3])
        times.append(time.perf_counter() - t0)
    t_pair = float(np.median(times))
    print(f"steady-state per pair: {t_pair:.2f} s  (runs: "
          + ", ".join(f"{t:.2f}" for t in times) + ")")

    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)  # 0 = not reported (axon tunnel)
    print(f"peak HBM: {peak/2**30:.2f} GiB" if peak else
          "peak HBM: not reported by this platform (fits in 16 GiB — the run completed)")

    V = args.views
    pairs = V * V
    total = pairs * t_pair
    print(f"projected rematch ({V} views, {pairs} ordered pairs): "
          f"{total/60:.1f} min per host "
          f"(striped over P hosts: {total/60:.1f}/P min)")

    # ---- cached fast path (match_many): encoder cache + batched
    # single-direction decoder.  Timed over enough pairs to amortize the
    # per-chunk pyramid assembly; first call includes its own compiles.
    n_bench_pairs = 12
    bench_pairs = [(i % 3, (i + 1) % 3) for i in range(n_bench_pairs)]
    t0 = time.perf_counter()
    kpts, cert = matcher.match_many(imgs, bench_pairs)
    t_many_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    kpts, cert = matcher.match_many(imgs, bench_pairs)
    t_many = time.perf_counter() - t0
    t_pair_cached = t_many / n_bench_pairs
    assert np.isfinite(kpts).all()
    total_cached = pairs * t_pair_cached
    print(f"cached path: {t_pair_cached:.3f} s/pair steady "
          f"(first batch incl. compile {t_many_first:.1f} s); projected "
          f"rematch {total_cached/60:.1f} min per host")

    out = {
        "shape": [args.hs, args.ws],
        "first_pair_s": round(t_first, 2),
        "steady_pair_s": round(t_pair, 3),
        "cached_pair_s": round(t_pair_cached, 3),
        "speedup_cached": round(t_pair / t_pair_cached, 2),
        "pair_batch": matcher.pair_batch,
        "peak_hbm_gib": round(peak / 2**30, 3),
        "views": V,
        "ordered_pairs": pairs,
        "projected_rematch_min_per_host": round(total / 60, 1),
        "projected_rematch_min_per_host_cached": round(total_cached / 60, 1),
        "device": dev.device_kind,
    }
    (REPO / "DKM_PROD_r05.json").write_text(json.dumps(out, indent=1))
    print("wrote DKM_PROD_r05.json")


if __name__ == "__main__":
    main()
