"""DKMv3 building blocks: GP flow regression, DFN decoder pieces, and the
ConvRefiner stack (DKMv3.py:536-895), inference-only, torch-name-keyed."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lushnerf_tpu.matcher.dkm.nn import (
    adaptive_avg_pool1,
    batchnorm,
    conv2d,
    grid_sample_bilinear,
    interpolate_bilinear,
    local_correlation,
    meshgrid_coords,
    relu,
)


# ---------------------------------------------------------------------------
# GP (DKMv3.py:780-895; configured no_cov=True, fourier basis, T=0.2)
# ---------------------------------------------------------------------------


def cos_kernel(x, y, T=0.2, eps=1e-6):
    """K = exp((cos_sim - 1) / T) (CosKernel, DKMv3.py:651-669)."""
    c = jnp.einsum("bnd,bmd->bnm", x, y) / (
        jnp.linalg.norm(x, axis=-1)[..., None] * jnp.linalg.norm(y, axis=-1)[:, None]
        + eps
    )
    return jnp.exp((c - 1.0) / T)


def gp_forward(params, prefix, x, y, T=0.2, sigma_noise=0.1):
    """GP posterior mean embedding of match coordinates (no_cov=True).

    x, y: [B, C, H, W] projected features.  Returns [B, gp_dim, H, W].
    """
    b, c, h1, w1 = x.shape
    _, _, h2, w2 = y.shape
    coords = meshgrid_coords(h2, w2, x.dtype)  # [h2, w2, 2] (x, y)
    coords = jnp.broadcast_to(coords[None], (b, h2, w2, 2))
    coords = jnp.transpose(coords, (0, 3, 1, 2))  # [b, 2, h2, w2]
    # fourier positional basis: cos(8*pi*conv(coords))  (DKMv3.py:839-847)
    f = jnp.cos(8.0 * math.pi * conv2d(params, f"{prefix}.pos_conv", coords))

    rs = lambda t: jnp.transpose(t, (0, 2, 3, 1)).reshape(b, -1, t.shape[1])
    xf, yf, ff = rs(x), rs(y), rs(f)
    K_yy = cos_kernel(yf, yf, T)
    K_xy = cos_kernel(xf, yf, T)
    eye = jnp.eye(h2 * w2, dtype=x.dtype)[None]
    # reference: K_xy @ inv(K_yy + sigma I) @ f  — a solve is the
    # numerically-stable equivalent (torch.linalg.inv, DKMv3.py:874-885)
    mu = jnp.einsum("bnm,bmd->bnd", K_xy, jnp.linalg.solve(K_yy + sigma_noise * eye, ff))
    return jnp.transpose(mu.reshape(b, h1, w1, -1), (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# RRB / CAB / DFN (DKMv3.py:672-779)
# ---------------------------------------------------------------------------


def rrb_forward(params, prefix, x):
    x = conv2d(params, f"{prefix}.conv1", x)
    res = conv2d(params, f"{prefix}.conv2", x, padding=1)
    res = relu(batchnorm(params, f"{prefix}.bn", res))
    res = conv2d(params, f"{prefix}.conv3", res, padding=1)
    return relu(x + res)


def cab_forward(params, prefix, x1, x2):
    x = jnp.concatenate([x1, x2], axis=1)
    x = adaptive_avg_pool1(x)
    x = relu(conv2d(params, f"{prefix}.conv1", x))
    x = jax.nn.sigmoid(conv2d(params, f"{prefix}.conv2", x))
    return x * x2 + x1


def dfn_forward(params, prefix, embeddings, feats, context, key: str):
    """One coarse-scale DFN step (DFN.forward, DKMv3.py:769-779).
    Returns (pred_coord [B,2,h,w], pred_certainty [B,1,h,w], context)."""
    feats = conv2d(params, f"{prefix}.feat_input_modules.{key}", feats)
    emb = jnp.concatenate([feats, embeddings], axis=1)
    emb = rrb_forward(params, f"{prefix}.rrb_d.{key}", emb)
    context = cab_forward(params, f"{prefix}.cab.{key}", context, emb)
    context = rrb_forward(params, f"{prefix}.rrb_u.{key}", context)
    preds = conv2d(params, f"{prefix}.terminal_module.{key}", context)
    return preds[:, -2:], preds[:, :-2], context


# ---------------------------------------------------------------------------
# ConvRefiner (DKMv3.py:536-648; dw=True, 8 hidden blocks, k=5)
# ---------------------------------------------------------------------------

REFINER_CFG = {
    # scale: (local_corr_radius or None); all use displacement_emb
    "16": 7,
    "8": 3,
    "4": 2,
    "2": None,
    "1": None,
}


def _dw_block(params, prefix, x, in_dim):
    """create_block: depthwise conv k5 + BN + relu + 1x1 conv (:575-598)."""
    x = conv2d(params, f"{prefix}.0", x, padding=2, groups=in_dim)
    x = relu(batchnorm(params, f"{prefix}.1", x))
    return conv2d(params, f"{prefix}.3", x)


def conv_refiner_forward(params, prefix, x, y, flow, scale: str, hidden_blocks=8):
    """Refine a flow field (ConvRefiner.forward, DKMv3.py:601-648).

    x, y: [B, C, hs, ws] feature maps; flow: [B, 2, hs, ws] in [-1,1].
    Returns (certainty [B,1,hs,ws], displacement [B,2,hs,ws]).
    """
    b, c, hs, ws = x.shape
    x_hat = grid_sample_bilinear(y, jnp.transpose(flow, (0, 2, 3, 1)))
    coords = meshgrid_coords(hs, ws, x.dtype)
    query_coords = jnp.broadcast_to(
        jnp.transpose(coords, (2, 0, 1))[None], (b, 2, hs, ws)
    )
    in_displacement = flow - query_coords
    emb = conv2d(params, f"{prefix}.disp_emb", in_displacement)
    radius = REFINER_CFG[scale]
    if radius is not None:
        # corr_in_other=True: correlate around the predicted coordinate in
        # the other image (DKMv3.py:630-633)
        corr = local_correlation(x, y, radius, flow=flow)
        d = jnp.concatenate([x, x_hat, emb, corr], axis=1)
    else:
        d = jnp.concatenate([x, x_hat, emb], axis=1)
    in_dim = d.shape[1]
    d = _dw_block(params, f"{prefix}.block1", d, in_dim)
    hidden_dim = d.shape[1]
    for i in range(hidden_blocks):
        d = _dw_block(params, f"{prefix}.hidden_blocks.{i}", d, hidden_dim)
    d = conv2d(params, f"{prefix}.out_conv", d)
    return d[:, :-2], d[:, -2:]
