"""Motion Aggregation Module (MAM).

JAX equivalent of the reference models/mam.py (Correlation_Module :13-54,
Motion_Aggregation_Module :57-85).  Note: the reference imports but never
instantiates MAM (models/lushnerf.py:6; SURVEY.md quirks ledger) — it is
provided here for capability parity and experimentation.

Attention between a per-ray global feature [B, N, C] and per-motion sample
features [B*(M+1), L, 64]: line-attention pooling over the motion ("curve")
grid, two cross-attention reads, 1x1-conv mixing with a BatchNorm (train
mode batch stats in the reference; we use the same batch-statistic
normalization since the module only ever runs in training).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from lushnerf_tpu.models.mlp import linear_init

Params = Dict[str, Any]


def _conv1d_init(key, in_ch, out_ch, dtype=jnp.float32):
    # torch Conv1d(k=1, bias=False) default init: kaiming_uniform(a=sqrt(5))
    bound = 1.0 / jnp.sqrt(in_ch)
    return jax.random.uniform(key, (in_ch, out_ch), dtype, -bound, bound)


def init_mam(key, in_channels: int, num_motion: int, dtype=jnp.float32) -> Params:
    mid = in_channels // 2
    keys = jax.random.split(key, 8)
    return {
        "conva": _conv1d_init(keys[0], in_channels, mid, dtype),
        "convb": _conv1d_init(keys[1], in_channels, mid, dtype),
        "convc": _conv1d_init(keys[2], in_channels, mid, dtype),
        "convn": _conv1d_init(keys[3], mid, mid, dtype),
        "convl": _conv1d_init(keys[4], mid, mid, dtype),
        "convd": _conv1d_init(keys[5], 2 * mid, in_channels, dtype),
        "convd_bn": (jnp.ones((in_channels,), dtype), jnp.zeros((in_channels,), dtype)),
        "line_att": _conv1d_init(keys[6], in_channels, 1, dtype),
        "linear": linear_init(keys[7], 64, 32, dtype),
        "num_motion": num_motion,
    }


def _batchnorm_train(x, gamma, beta, axis, eps=1e-5):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    shape = [1] * x.ndim
    shape[1] = -1
    return (x - mean) / jnp.sqrt(var + eps) * gamma.reshape(shape) + beta.reshape(shape)


def correlation_module(p: Params, x: jnp.ndarray, curves: jnp.ndarray) -> jnp.ndarray:
    """x: [B, C, N]; curves: [B, C, c_n, c_l] -> [B, C, N]."""
    # line attention over the curve grid (1x1 conv2d == channel matmul)
    att = jnp.einsum("bcnl,co->bonl", curves, p["line_att"])  # [B, 1, c_n, c_l]
    inter = jnp.sum(curves * jax.nn.softmax(att, axis=-1), axis=-1)  # [B, C, c_n]
    intra = jnp.sum(curves * jax.nn.softmax(att, axis=-2), axis=-2)  # [B, C, c_l]

    inter = jnp.einsum("bcn,cm->bmn", inter, p["conva"])  # [B, mid, c_n]
    intra = jnp.einsum("bcl,cm->bml", intra, p["convb"])  # [B, mid, c_l]

    x_logits = jnp.einsum("bcn,cm->bnm", x, p["convc"])  # [B, N, mid]
    x_inter = jax.nn.softmax(jnp.einsum("bnm,bmk->bnk", x_logits, inter), axis=-1)
    x_intra = jax.nn.softmax(jnp.einsum("bnm,bml->bnl", x_logits, intra), axis=-1)

    inter_v = jnp.einsum("bmk,mo->bko", inter, p["convn"])  # [B, c_n, mid]
    intra_v = jnp.einsum("bml,mo->blo", intra, p["convl"])  # [B, c_l, mid]

    x_i = jnp.einsum("bnk,bko->bno", x_inter, inter_v)
    x_a = jnp.einsum("bnl,blo->bno", x_intra, intra_v)

    feats = jnp.concatenate([x_i, x_a], axis=-1)  # [B, N, 2*mid]
    mixed = jnp.einsum("bnc,co->bon", feats, p["convd"])  # [B, C, N]
    gamma, beta = p["convd_bn"]
    mixed = _batchnorm_train(mixed, gamma, beta, axis=(0, 2))
    return jax.nn.leaky_relu(x + mixed, negative_slope=0.2)


def apply_mam(p: Params, x_global: jnp.ndarray, x_local: jnp.ndarray) -> jnp.ndarray:
    """x_global: [N_ray, N_motion_groups, C]; x_local: [(N_ray*(M+1)), L, 64].

    Returns aggregated features [N_ray, N, C] (reference forward :68-84).
    """
    M1 = p["num_motion"] + 1
    n_ray = x_local.shape[0] // M1
    xl = x_local.reshape(n_ray, M1, x_local.shape[1], x_local.shape[2])
    w, b = p["linear"]
    xl = xl @ w + b  # [N_ray, M+1, L, 32]
    xl = jnp.transpose(xl, (0, 3, 1, 2))  # [B, C, N(motion), L(sample)]
    xg = jnp.transpose(x_global, (0, 2, 1))  # [B, C, N]
    out = correlation_module(p, xg, xl)
    return jnp.transpose(out, (0, 2, 1))
