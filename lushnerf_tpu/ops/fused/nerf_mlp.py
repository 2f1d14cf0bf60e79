"""Fused NeRF-MLP Pallas TPU kernel (forward + custom-VJP backward).

Why: the scene MLP evaluation is the workload's hot loop (~983k point
evals/step through an 8x256 MLP, SURVEY.md §6).  Under plain XLA each
layer's [P, 256] activation round-trips HBM (~16 GB/step of traffic);
this kernel keeps a tile of points resident in VMEM through ALL layers —
weights stay resident too (~3 MB) — so HBM traffic is just the inputs and
outputs and the kernel is MXU-compute-bound.

Architecture fused (reference NeRF MLP, utils/run_lushnerf_helpers.py:
365-452, with depth=8, width=256, skip after layer 4, viewdirs on):

  a0 = relu(x @ W0 + b0)
  a_l = relu(a_{l-1} @ W_l + b_l)        l = 1..4
  a5 = relu(x @ W5a + a4 @ W5b + b5)     # skip concat == split matmul
  a_l = relu(a_{l-1} @ W_l + b_l)        l = 6..7
  alpha = a7 @ Wa + ba
  feat  = a7 @ Wf + bf
  hv  = relu(feat @ Wvf + d @ Wvd + bv)
  rgb = hv @ Wr + br
  out = [rgb, alpha]

Inputs are the positionally-encoded points x [P, 63] and dirs d [P, 27],
zero-padded on the channel axis to 128 lanes (weights padded to match, so
results are exact).  The backward pass recomputes activations per tile
(no [P, 256] residuals ever hit HBM) and accumulates weight grads across
the sequential TPU grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
LANES = 128
# Tile sized so the backward pass's recomputed activations (~12 arrays of
# [tile, 256] f32) + resident weights (~3 MB) fit comfortably in VMEM.
DEFAULT_TILE = 512

# number of padded parameter arrays in the flat tuple
# order: W0, W1, W2, W3, W4, W5a, W5b, W6, W7, Wa, Wf, Wvf, Wvd, Wr,
#        b0, b1, b2, b3, b4, b5, b6, b7, ba, bf, bv, br
_N_W = 14
_N_B = 12


def _pad_to(x, rows=None, cols=None):
    pr = 0 if rows is None else rows - x.shape[0]
    pc = 0 if cols is None else cols - x.shape[1]
    return jnp.pad(x, ((0, pr), (0, pc)))


def pad_params(params, width: int = 256) -> Tuple[jnp.ndarray, ...]:
    """Reference param pytree -> flat tuple of lane-padded f32 arrays.

    Zero-padding extra input rows keeps results exact (padded input lanes
    are zero).  Runs in-graph (params change every step).
    """
    W = width
    Wh = W // 2
    pts = params["pts"]
    w0, b0 = pts[0]
    in_ch = w0.shape[0]  # 63
    w5, b5 = pts[5]  # skip layer: [in_ch + W, W], rows 0:in_ch are x part
    wv, bv = params["views"]  # [d_ch + W, Wh]
    d_ch = wv.shape[0] - W  # 27
    wa, ba = params["alpha"]
    wf, bf = params["feature"]
    wr, br = params["rgb"]

    out = [
        _pad_to(w0, LANES, W),  # W0   [128, W]
        pts[1][0], pts[2][0], pts[3][0], pts[4][0],  # W1..W4 [W, W]
        # reference concat order is [x_pe, h] (helpers:401), so the first
        # in_ch rows of the skip-layer weight act on x, the rest on h.
        _pad_to(w5[:in_ch], LANES, W),  # W5a [128, W]
        w5[in_ch:],  # W5b [W, W]
        pts[6][0], pts[7][0],  # W6, W7 [W, W]
        _pad_to(wa, W, LANES),  # Wa [W, 128] (col 0)
        wf,  # Wf [W, W]
        # views layer input is [feat, d_pe] (helpers:409): feat rows first.
        _pad_to(wv[:W], W, LANES),  # Wvf [W, 128] (cols 0:Wh)
        _pad_to(wv[W:], LANES, LANES),  # Wvd [128, 128] (rows 0:27, cols 0:Wh)
        _pad_to(wr, LANES, LANES),  # Wr [128, 128] (rows 0:Wh, cols 0:3)
        b0[None], pts[1][1][None], pts[2][1][None], pts[3][1][None], pts[4][1][None],
        b5[None], pts[6][1][None], pts[7][1][None],
        _pad_to(ba[None], 1, LANES),
        bf[None],
        _pad_to(bv[None], 1, LANES),
        _pad_to(br[None], 1, LANES),
    ]
    return tuple(x.astype(F32) for x in out)


def unpad_param_grads(grads: Tuple[jnp.ndarray, ...], params, width: int = 256):
    """Flat padded-grad tuple -> grad pytree matching `params`."""
    W = width
    Wh = W // 2
    in_ch = params["pts"][0][0].shape[0]
    d_ch = params["views"][0].shape[0] - W
    (gW0, gW1, gW2, gW3, gW4, gW5a, gW5b, gW6, gW7, gWa, gWf, gWvf, gWvd, gWr,
     gb0, gb1, gb2, gb3, gb4, gb5, gb6, gb7, gba, gbf, gbv, gbr) = grads
    g5 = jnp.concatenate([gW5a[:in_ch], gW5b], axis=0)
    gv = jnp.concatenate([gWvf[:, :Wh], gWvd[:d_ch, :Wh]], axis=0)
    return {
        "pts": [
            (gW0[:in_ch], gb0[0]),
            (gW1, gb1[0]),
            (gW2, gb2[0]),
            (gW3, gb3[0]),
            (gW4, gb4[0]),
            (g5, gb5[0]),
            (gW6, gb6[0]),
            (gW7, gb7[0]),
        ],
        "alpha": (gWa[:, :1], gba[0, :1]),
        "feature": (gWf, gbf[0]),
        "views": (gv, gbv[0, :Wh]),
        "rgb": (gWr[:Wh, :3], gbr[0, :3]),
    }


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _make_dot(compute_dtype):
    """MXU matmul at the requested input precision, f32 accumulation.
    bf16 inputs run the MXU at full rate (f32 needs multiple passes)."""
    cd = jnp.dtype(compute_dtype)
    if cd == jnp.float32:
        return lambda a, b: jnp.dot(a, b, preferred_element_type=F32)
    return lambda a, b: jnp.dot(
        a.astype(cd), b.astype(cd), preferred_element_type=F32
    )


def _fwd_activations(x, d, w, compute_dtype=jnp.float32):
    """Shared forward recurrence on one tile; returns all activations."""
    (W0, W1, W2, W3, W4, W5a, W5b, W6, W7, Wa, Wf, Wvf, Wvd, Wr,
     b0, b1, b2, b3, b4, b5, b6, b7, ba, bf, bv, br) = w
    dot = _make_dot(compute_dtype)
    relu = lambda t: jnp.maximum(t, 0.0)
    a0 = relu(dot(x, W0) + b0)
    a1 = relu(dot(a0, W1) + b1)
    a2 = relu(dot(a1, W2) + b2)
    a3 = relu(dot(a2, W3) + b3)
    a4 = relu(dot(a3, W4) + b4)
    a5 = relu(dot(x, W5a) + dot(a4, W5b) + b5)
    a6 = relu(dot(a5, W6) + b6)
    a7 = relu(dot(a6, W7) + b7)
    alpha = dot(a7, Wa) + ba
    feat = dot(a7, Wf) + bf
    hv = relu(dot(feat, Wvf) + dot(d, Wvd) + bv)
    rgb = dot(hv, Wr) + br
    return a0, a1, a2, a3, a4, a5, a6, a7, alpha, feat, hv, rgb


def _fwd_kernel(x_ref, d_ref, *refs, compute_dtype=jnp.float32):
    w = tuple(r[...] for r in refs[:-1])
    out_ref = refs[-1]
    acts = _fwd_activations(x_ref[...], d_ref[...], w, compute_dtype)
    alpha, rgb = acts[8], acts[11]
    # out lanes: 0:3 rgb, 3 alpha (alpha lives in lane 0 of its buffer)
    out = jnp.concatenate(
        [rgb[:, :3], alpha[:, :1], jnp.zeros_like(rgb[:, : LANES - 4])], axis=-1
    )
    out_ref[...] = out


def _fwd_call(w: Tuple[jnp.ndarray, ...], x: jnp.ndarray, d: jnp.ndarray, tile: int,
              compute_dtype=jnp.float32):
    P = x.shape[0]
    grid = P // tile
    specs_xd = [
        pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        grid=(grid,),
        in_specs=specs_xd + w_specs,
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, LANES), F32),
    )(x, d, *w)
    return out


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, d_ref, g_ref, *refs, compute_dtype=jnp.float32):
    w_refs = refs[: _N_W + _N_B]
    out_refs = refs[_N_W + _N_B :]
    w = tuple(r[...] for r in w_refs)
    (W0, W1, W2, W3, W4, W5a, W5b, W6, W7, Wa, Wf, Wvf, Wvd, Wr, *_bs) = w

    x = x_ref[...]
    d = d_ref[...]
    g = g_ref[...]
    a0, a1, a2, a3, a4, a5, a6, a7, alpha, feat, hv, rgb = _fwd_activations(
        x, d, w, compute_dtype
    )

    cd = jnp.dtype(compute_dtype)
    cast = (lambda t: t) if cd == jnp.float32 else (lambda t: t.astype(cd))
    dotT = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((0,), (0,)), ((), ())), preferred_element_type=F32
    )  # a^T @ b with a [T, m], b [T, n] -> [m, n]
    dBT = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((1,), (1,)), ((), ())), preferred_element_type=F32
    )  # a @ b^T

    g_rgb = jnp.concatenate([g[:, :3], jnp.zeros_like(g[:, : LANES - 3])], axis=-1)
    g_alpha = jnp.concatenate([g[:, 3:4], jnp.zeros_like(g[:, : LANES - 1])], axis=-1)

    relu_m = lambda a: (a > 0.0).astype(F32)

    d_hv = dBT(g_rgb, Wr) * relu_m(hv)
    d_feat = dBT(d_hv, Wvf)
    d_d = dBT(d_hv, Wvd)
    d_a7 = dBT(d_feat, Wf) + dBT(g_alpha, Wa)
    d_z7 = d_a7 * relu_m(a7)
    d_a6 = dBT(d_z7, W7)
    d_z6 = d_a6 * relu_m(a6)
    d_a5 = dBT(d_z6, W6)
    d_z5 = d_a5 * relu_m(a5)
    d_a4 = dBT(d_z5, W5b)
    d_z4 = d_a4 * relu_m(a4)
    d_a3 = dBT(d_z4, W4)
    d_z3 = d_a3 * relu_m(a3)
    d_a2 = dBT(d_z3, W3)
    d_z2 = d_a2 * relu_m(a2)
    d_a1 = dBT(d_z2, W2)
    d_z1 = d_a1 * relu_m(a1)
    d_a0 = dBT(d_z1, W1)
    d_z0 = d_a0 * relu_m(a0)
    d_x = dBT(d_z0, W0) + dBT(d_z5, W5a)

    sum0 = lambda t: jnp.sum(t, axis=0, keepdims=True)
    grads = (
        dotT(x, d_z0),  # dW0
        dotT(a0, d_z1),
        dotT(a1, d_z2),
        dotT(a2, d_z3),
        dotT(a3, d_z4),
        dotT(x, d_z5),  # dW5a
        dotT(a4, d_z5),  # dW5b
        dotT(a5, d_z6),
        dotT(a6, d_z7),
        dotT(a7, g_alpha),  # dWa
        dotT(a7, d_feat),  # dWf
        dotT(feat, d_hv),  # dWvf
        dotT(d, d_hv),  # dWvd
        dotT(hv, g_rgb),  # dWr
        sum0(d_z0), sum0(d_z1), sum0(d_z2), sum0(d_z3), sum0(d_z4),
        sum0(d_z5), sum0(d_z6), sum0(d_z7),
        sum0(g_alpha), sum0(d_feat), sum0(d_hv), sum0(g_rgb),
    )

    dx_ref, dd_ref = out_refs[0], out_refs[1]
    dx_ref[...] = d_x
    dd_ref[...] = d_d

    first = pl.program_id(0) == 0
    for gr, ref in zip(grads, out_refs[2:]):
        @pl.when(first)
        def _(ref=ref, gr=gr):
            ref[...] = gr

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, gr=gr):
            ref[...] += gr


def _bwd_call(w, x, d, g, tile: int, compute_dtype=jnp.float32):
    P = x.shape[0]
    grid = P // tile
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w]
    acc_specs = [
        pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM)
        for a in w
    ]
    out_shapes = (
        [jax.ShapeDtypeStruct((P, LANES), F32), jax.ShapeDtypeStruct((P, LANES), F32)]
        + [jax.ShapeDtypeStruct(a.shape, F32) for a in w]
    )
    out_specs = [tile_spec, tile_spec] + acc_specs
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=(grid,),
        in_specs=[tile_spec, tile_spec, tile_spec] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
    )(x, d, g, *w)
    dx, dd = outs[0], outs[1]
    return dx, dd, tuple(outs[2:])


# ---------------------------------------------------------------------------
# custom-VJP wrapper and public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mlp_padded(w, x, d, tile: int = DEFAULT_TILE, compute_dtype: str = "float32"):
    """w: padded param tuple; x, d: [P, 128] padded PE inputs (P % tile == 0).
    Returns raw [P, 4] = [rgb_raw, alpha_raw]."""
    out = _fwd_call(w, x, d, tile, jnp.dtype(compute_dtype))
    return out[:, :4]


def _fused_fwd(w, x, d, tile, compute_dtype):
    out = _fwd_call(w, x, d, tile, jnp.dtype(compute_dtype))
    return out[:, :4], (w, x, d)


def _fused_bwd(tile, compute_dtype, res, g4):
    w, x, d = res
    g = jnp.pad(g4, ((0, 0), (0, LANES - 4)))
    dx, dd, dw = _bwd_call(w, x, d, g, tile, jnp.dtype(compute_dtype))
    return dw, dx, dd


fused_mlp_padded.defvjp(_fused_fwd, _fused_bwd)


def supports(mlp_cfg, render_cfg) -> bool:
    """Kernel currently covers the reference architecture family:
    depth 8, width multiple of 128, skip at layer 4, viewdirs on."""
    return (
        mlp_cfg.depth == 8
        and mlp_cfg.width % 128 == 0
        and mlp_cfg.width >= 128
        and tuple(mlp_cfg.skips) == (4,)
        and mlp_cfg.use_viewdirs
        and not mlp_cfg.rgb_only
        and mlp_cfg.input_ch <= LANES
        and mlp_cfg.input_ch_views <= LANES
    )


def eval_points_fused(params, mlp_cfg, render_cfg, pts, viewdirs, tile: int = DEFAULT_TILE):
    """Drop-in for renderer.eval_points with the fused kernel.

    pts: [R, S, 3]; viewdirs: [R, 3].  Returns raw [R, S, 4].
    """
    if not supports(mlp_cfg, render_cfg):
        raise NotImplementedError(
            "fused kernel supports the reference MLP family only "
            f"(depth={mlp_cfg.depth}, width={mlp_cfg.width}, skips={mlp_cfg.skips})"
        )
    R, S = pts.shape[0], pts.shape[1]
    P = R * S
    x = pts.reshape(P, 3)
    d = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(P, 3)

    x_pe = render_cfg.pe_x(x)
    d_pe = render_cfg.pe_d(d)
    P_pad = -(-P // tile) * tile
    x_pe = jnp.pad(x_pe, ((0, P_pad - P), (0, LANES - x_pe.shape[-1]))).astype(F32)
    d_pe = jnp.pad(d_pe, ((0, P_pad - P), (0, LANES - d_pe.shape[-1]))).astype(F32)

    w = pad_params(params, mlp_cfg.width)
    raw = fused_mlp_padded(w, x_pe, d_pe, tile, render_cfg.mlp_compute_dtype)
    return raw[:P].reshape(R, S, 4)
