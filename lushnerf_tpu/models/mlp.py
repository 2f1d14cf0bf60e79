"""NeRF-style MLPs as parameter pytrees with pure apply functions.

Covers both the scene MLPs (coarse/fine, D=8 W=256, skip concat after layer
4, viewdir branch W/2 -> rgb, alpha head; utils/run_lushnerf_helpers.py:
365-452) and the SND noise MLP (D=4 W=128, rgb-only output;
:456-512).  Note the reference quirk: with D=4 and skips=[4] the skip never
fires (the loop index never reaches 4) — we reproduce that by simply
honoring the same construction rule.

Initialization matches torch.nn.Linear defaults: W, b ~ U(-k, k) with
k = 1/sqrt(fan_in) — so training dynamics are comparable to the reference.

Weights are stored as [fan_in, fan_out] so application is `x @ W + b`
(row-major activations; MXU-friendly [batch, in] @ [in, out]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return w, b


def linear(params: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    w, b = params
    return x @ w + b


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static architecture of a NeRF-style MLP.

    rgb_only=True gives the SND noise-MLP head (returns 3 channels, no
    alpha concat — helpers:505-512); otherwise returns [rgb, alpha] (4ch).
    """

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    output_ch: int = 4  # only used when use_viewdirs=False
    rgb_only: bool = False

    def layer_in_dim(self, i: int) -> int:
        """Input dim of pts layer i (0-based), honoring the reference's
        construction rule: layer i+1 widens when i in skips."""
        if i == 0:
            return self.input_ch
        # pts_linears[i] for i>=1 is built as Linear(W+input_ch, W) iff
        # (i-1) in skips (helpers:379-381).
        return self.width + self.input_ch if (i - 1) in self.skips else self.width


def init_nerf_mlp(key, cfg: MLPConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.depth + 4)
    params: Params = {
        "pts": [
            linear_init(keys[i], cfg.layer_in_dim(i), cfg.width, dtype)
            for i in range(cfg.depth)
        ]
    }
    if cfg.use_viewdirs:
        params["feature"] = linear_init(keys[cfg.depth], cfg.width, cfg.width, dtype)
        params["alpha"] = linear_init(keys[cfg.depth + 1], cfg.width, 1, dtype)
        params["views"] = linear_init(
            keys[cfg.depth + 2], cfg.input_ch_views + cfg.width, cfg.width // 2, dtype
        )
        params["rgb"] = linear_init(keys[cfg.depth + 3], cfg.width // 2, 3, dtype)
    else:
        params["output"] = linear_init(keys[cfg.depth], cfg.width, cfg.output_ch, dtype)
    return params


def apply_nerf_mlp(params: Params, cfg: MLPConfig, x_pe: jnp.ndarray, d_pe: jnp.ndarray | None):
    """Evaluate the MLP on positionally-encoded points (+ view dirs).

    x_pe: [..., input_ch]; d_pe: [..., input_ch_views] or None.
    Returns [..., 4] ([rgb_raw, alpha_raw]) or [..., 3] if cfg.rgb_only.
    """
    h = x_pe
    for i in range(cfg.depth):
        h = jax.nn.relu(linear(params["pts"][i], h))
        if i in cfg.skips:
            h = jnp.concatenate([x_pe, h], axis=-1)

    if not cfg.use_viewdirs:
        return linear(params["output"], h)

    alpha = linear(params["alpha"], h)
    feature = linear(params["feature"], h)
    h = jnp.concatenate([feature, d_pe], axis=-1)
    h = jax.nn.relu(linear(params["views"], h))
    rgb = linear(params["rgb"], h)
    if cfg.rgb_only:
        return rgb
    return jnp.concatenate([rgb, alpha], axis=-1)
