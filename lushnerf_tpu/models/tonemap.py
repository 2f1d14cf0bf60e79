"""Tone mapping of rendered linear radiance to LDR color.

Matches ToneMapping (utils/run_lushnerf_helpers.py:134-183):
  * 'none'          identity
  * 'gamma'         x^(1/2.2)   (all shipped scene configs use this)
  * 'learn'         sigmoid(0.1 * MLP(x) + x) with a 1-16-16-16-1 MLP
  * 'split_linear'  per-channel 1-64-64-1 MLPs
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.mlp import linear, linear_init

Params = Dict[str, Any]

VALID_TYPES = ("none", "gamma", "learn", "split_linear")


def init_tonemap(key, map_type: str, dtype=jnp.float32) -> Params:
    if map_type not in VALID_TYPES:
        raise ValueError(f"tone mapping type {map_type!r} not recognized")
    if map_type == "learn":
        dims = [1, 16, 16, 16, 1]
        keys = jax.random.split(key, len(dims) - 1)
        return {"layers": [linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)]}
    if map_type == "split_linear":
        dims = [1, 64, 64, 1]
        out: Params = {}
        for ch, k in zip("rgb", jax.random.split(key, 3)):
            ks = jax.random.split(k, len(dims) - 1)
            out[ch] = [linear_init(kk, dims[i], dims[i + 1], dtype) for i, kk in enumerate(ks)]
        return out
    return {}


def _mlp(layers, x):
    for lyr in layers[:-1]:
        x = jax.nn.relu(linear(lyr, x))
    return linear(layers[-1], x)


def apply_tonemap(params: Params, map_type: str, x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """eps (framework addition, 0.0 = reference): floor the gamma input at
    eps.  d/dx x^(1/2.2) = (1/2.2) x^(-6/11) is a POLE at x=0, and f32
    sigmoid saturates to exactly 0.0 for logits < ~-103, so a training
    path that drives dark-pixel radiance to saturation (measured: the SND
    head explaining dark pixels away on the heavy-blur synthetic scene)
    meets an infinite gradient and NaNs the whole model in one step — the
    torch reference has the same pole (x ** (1./2.2),
    run_lushnerf_helpers.py:173) and the same failure mode.  The floor is
    gradient-preserving: (x + eps)^(1/2.2) instead of max(x, eps)^(1/2.2),
    so a pixel saturated below eps still receives a (bounded, ~eps^-6/11)
    photometric gradient and can recover (ADVICE r4 #1); values shift by
    at most eps^(1/2.2) ≈ 0.015 at eps=1e-4, vanishing for bright pixels.
    eps=1e-4 bounds the gamma gradient at ~30."""
    if map_type == "none":
        return x
    if map_type == "gamma":
        if eps > 0.0:
            x = jnp.maximum(x, 0.0) + eps
        return x ** (1.0 / 2.2)
    if map_type == "learn":
        shape = x.shape
        x_in = x.reshape(-1, 1)
        res = _mlp(params["layers"], x_in) * 0.1
        return jax.nn.sigmoid(res + x_in).reshape(shape)
    if map_type == "split_linear":
        chans = jnp.split(x, 3, axis=-1)
        outs = [_mlp(params[c], e) for c, e in zip("rgb", chans)]
        return jnp.concatenate(outs, axis=-1)
    raise ValueError(f"tone mapping type {map_type!r} not recognized")
