"""Reference-checkpoint interop: torch `.tar` <-> JAX params.

The reference trainer saves `{global_step, network_state_dict,
optimizer_state_dict}` (run_lushnerf.py:687-694) where
`network_state_dict` is the NeRFAll-under-DataParallel state dict
(keys prefixed `module.`).  Its loader, `smart_load_state_dict`
(utils/run_lushnerf_helpers.py:612-628), also accepts the older
Deblur-NeRF layout with separate `network_fn_state_dict` /
`network_fine_state_dict` entries.

This module converts both layouts into our params pytree (and back), so
a reference-trained scene can be rendered/fine-tuned here and vice
versa.  torch is imported lazily and only needed for reading/writing the
pickle container; all tensor math is numpy.

Key map (reference module attr -> our pytree):
  mlp_coarse / mlp_fine / mlp_noise_coarse   -> coarse / fine / noise
    .pts_linears.{i}                         -> ["pts"][i]
    .feature_linear/.alpha_linear            -> ["feature"]/["alpha"]
    .views_linears.0/.rgb_linear             -> ["views"]/["rgb"]
    .output_linear (no-viewdirs variant)     -> ["output"]
  dbk_view_embedding.view_embed_layer.weight -> rbk["embed"]
  mlp_rbk.view_embed_linears.{i}             -> rbk["trunk"][i]
  mlp_rbk.{r,v,w}_branch.{i} / {r,v,w}_linear-> rbk["{r,v,w}_branch"][i] / "_out"
  tonemapping.linear.{0,2,4,6} ('learn')     -> tonemap["layers"][0..3]
(The duplicate `blur_kernel_net.*` entries — NeRFAll holds the RBK
wrapper as a second submodule sharing the same tensors — are ignored on
import and regenerated on export.)

Linear weights are transposed torch [out, in] -> ours [in, out].
Optimizer state is NOT converted (torch Adam moments have no exact optax
counterpart once LR schedules differ); resuming from a torch checkpoint
restarts the optimizer, which the reference itself treats as acceptable
for `--ft_path` fine-tuning.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Params = Dict[str, Any]


def _np(v) -> np.ndarray:
    """torch tensor (cpu) or array-like -> float32 numpy."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    # correct removeprefix — the reference's lstrip("module.") strips a
    # character SET and would mangle keys starting with those letters
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torch state dict -> params pytree
# ---------------------------------------------------------------------------


def _linear_in(sd, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    return _np(sd[prefix + ".weight"]).T.copy(), _np(sd[prefix + ".bias"])


def _seq_in(sd, prefix: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    out = []
    i = 0
    while f"{prefix}.{i}.weight" in sd:
        out.append(_linear_in(sd, f"{prefix}.{i}"))
        i += 1
    return out


def _mlp_in(sd, prefix: str) -> Params:
    params: Params = {"pts": _seq_in(sd, f"{prefix}.pts_linears")}
    if f"{prefix}.feature_linear.weight" in sd:
        params["feature"] = _linear_in(sd, f"{prefix}.feature_linear")
        params["alpha"] = _linear_in(sd, f"{prefix}.alpha_linear")
        params["views"] = _linear_in(sd, f"{prefix}.views_linears.0")
        params["rgb"] = _linear_in(sd, f"{prefix}.rgb_linear")
    else:
        params["output"] = _linear_in(sd, f"{prefix}.output_linear")
    return params


def torch_state_to_params(state_dict: Dict[str, Any]) -> Params:
    """Reference NeRFAll state dict (module.-stripped or not) -> params.

    Presence of fine / rbk / learned-tonemap entries is inferred from the
    keys, so the result matches whatever the checkpointed model had.
    """
    sd = _strip_module(state_dict)
    params: Params = {
        "coarse": _mlp_in(sd, "mlp_coarse"),
        "tonemap": {},
    }
    # legacy Deblur-NeRF checkpoints predate the SND head; the reference
    # loads them strict=False and leaves mlp_noise_coarse at init — here
    # the caller merges the partial pytree over fresh params the same way
    if "mlp_noise_coarse.pts_linears.0.weight" in sd:
        params["noise"] = _mlp_in(sd, "mlp_noise_coarse")
    if "mlp_fine.pts_linears.0.weight" in sd:
        params["fine"] = _mlp_in(sd, "mlp_fine")
    if "dbk_view_embedding.view_embed_layer.weight" in sd:
        rbk: Params = {
            "embed": _np(sd["dbk_view_embedding.view_embed_layer.weight"]),
            "trunk": _seq_in(sd, "mlp_rbk.view_embed_linears"),
        }
        for h in ("r", "v", "w"):
            rbk[f"{h}_branch"] = _seq_in(sd, f"mlp_rbk.{h}_branch")
            rbk[f"{h}_out"] = _linear_in(sd, f"mlp_rbk.{h}_linear")
        params["rbk"] = rbk
    if "tonemapping.linear.0.weight" in sd:  # 'learn' tone mapping
        # Sequential(Linear, ReLU, ...): Linear entries at 0, 2, 4, 6
        params["tonemap"] = {
            "layers": [
                _linear_in(sd, f"tonemapping.linear.{i}")
                for i in (0, 2, 4, 6)
                if f"tonemapping.linear.{i}.weight" in sd
            ]
        }
    return params


def merge_params(template: Params, partial: Params) -> Params:
    """Overlay an (possibly partial) imported pytree onto fresh params —
    the JAX analog of load_state_dict(strict=False): subtrees absent from
    the checkpoint keep their initialization."""
    merged = dict(template)
    for k, v in partial.items():
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k] = merge_params(merged[k], v)
        else:
            merged[k] = v
    return merged


def load_torch_checkpoint(path: str | Path) -> Tuple[int, Params]:
    """Read a reference `.tar` checkpoint -> (global_step, params).

    Accepts both the NeRFAll layout (`network_state_dict`) and the legacy
    Deblur-NeRF two-dict layout handled by smart_load_state_dict.
    """
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    step = int(ckpt.get("global_step", 0))
    if "network_state_dict" in ckpt:
        sd = ckpt["network_state_dict"]
    elif "network_fn_state_dict" in ckpt:
        sd = {
            "mlp_coarse." + k: v
            for k, v in _strip_module(ckpt["network_fn_state_dict"]).items()
        }
        if ckpt.get("network_fine_state_dict"):
            sd.update(
                {
                    "mlp_fine." + k: v
                    for k, v in _strip_module(ckpt["network_fine_state_dict"]).items()
                }
            )
    else:
        sd = ckpt  # bare state dict
    return step, torch_state_to_params(sd)


# ---------------------------------------------------------------------------
# params pytree -> torch state dict
# ---------------------------------------------------------------------------


def _linear_out(sd, prefix: str, wb) -> None:
    import torch

    w, b = wb
    sd[prefix + ".weight"] = torch.from_numpy(np.asarray(w, np.float32).T.copy())
    sd[prefix + ".bias"] = torch.from_numpy(np.asarray(b, np.float32).copy())


def _mlp_out(sd, prefix: str, p: Params) -> None:
    for i, wb in enumerate(p["pts"]):
        _linear_out(sd, f"{prefix}.pts_linears.{i}", wb)
    if "feature" in p:
        _linear_out(sd, f"{prefix}.feature_linear", p["feature"])
        _linear_out(sd, f"{prefix}.alpha_linear", p["alpha"])
        _linear_out(sd, f"{prefix}.views_linears.0", p["views"])
        _linear_out(sd, f"{prefix}.rgb_linear", p["rgb"])
    else:
        _linear_out(sd, f"{prefix}.output_linear", p["output"])


def params_to_torch_state(params: Params, module_prefix: bool = True) -> Dict[str, Any]:
    """params pytree -> reference-keyed NeRFAll state dict.

    module_prefix=True reproduces the DataParallel `module.` prefix the
    reference's own checkpoints carry (its loader strips k[7:],
    run_lushnerf_helpers.py:622 — a prefix-less dict would be mangled by
    it, so we emit the prefixed form by default).  Duplicate
    `blur_kernel_net.*` aliases are emitted too so
    `load_state_dict(strict=True)` succeeds on a NeRFAll built with an
    RBK.
    """
    import torch

    params = {k: np.asarray(v) if not isinstance(v, (dict, list)) else v
              for k, v in params.items()}
    sd: Dict[str, Any] = {}
    _mlp_out(sd, "mlp_coarse", params["coarse"])
    _mlp_out(sd, "mlp_noise_coarse", params["noise"])
    if "fine" in params:
        _mlp_out(sd, "mlp_fine", params["fine"])
    if "rbk" in params:
        rbk = params["rbk"]
        emb = torch.from_numpy(np.asarray(rbk["embed"], np.float32).copy())
        # the embedding tensor is shared by four module paths in NeRFAll
        # (dbk_view_embedding, blur_kernel_net.view_embed_layer, and the
        # view_embedding_layer attr inside each RBK alias); emit all so
        # load_state_dict(strict=True) succeeds
        for key in (
            "dbk_view_embedding.view_embed_layer.weight",
            "blur_kernel_net.view_embed_layer.view_embed_layer.weight",
            "mlp_rbk.view_embedding_layer.view_embed_layer.weight",
            "blur_kernel_net.RBK.view_embedding_layer.view_embed_layer.weight",
        ):
            sd[key] = emb
        for base in ("mlp_rbk", "blur_kernel_net.RBK"):
            for i, wb in enumerate(rbk["trunk"]):
                _linear_out(sd, f"{base}.view_embed_linears.{i}", wb)
            for h in ("r", "v", "w"):
                for i, wb in enumerate(rbk[f"{h}_branch"]):
                    _linear_out(sd, f"{base}.{h}_branch.{i}", wb)
                _linear_out(sd, f"{base}.{h}_linear", rbk[f"{h}_out"])
    if params.get("tonemap") and "layers" in params["tonemap"]:
        for i, wb in zip((0, 2, 4, 6), params["tonemap"]["layers"]):
            _linear_out(sd, f"tonemapping.linear.{i}", wb)
    if module_prefix:
        sd = {"module." + k: v for k, v in sd.items()}
    return sd


def save_torch_checkpoint(path: str | Path, step: int, params: Params) -> None:
    """Write a reference-format `.tar` (resumable by the reference trainer
    modulo optimizer state, which it loads strict=False)."""
    import torch

    torch.save(
        {
            "global_step": step,
            "network_state_dict": params_to_torch_state(params, module_prefix=True),
        },
        str(path),
    )
