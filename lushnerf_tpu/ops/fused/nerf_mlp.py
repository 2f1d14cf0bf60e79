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

The positional encoding is computed INSIDE the kernel: the input is one
packed [P, 8] array (lanes 0:3 = xyz, 3:6 = viewdir), and BOTH PE lanes
blocks — [x, sin(2^0 x), cos(2^0 x), ..., cos(2^(L-1) x)] for xyz
(reference channel order, utils/run_lushnerf_helpers.py:311-361) at
lanes [0, 63) and the viewdir PE at lanes [63, 90) — are produced in ONE
128-lane register by a 0/1 channel-selection matmul, a per-lane
frequency scale, and a SINGLE sin() whose per-lane phase row turns cos
lanes into sin(x + pi/2).  Staging PE'd inputs through HBM instead
([P, 128] f32 x 2 per pass) measurably cost more than the MLP matmuls
themselves, and so did evaluating sin and cos separately per PE (the
4-transcendental variant spent more VPU time than ALL the MXU matmuls).

The backward pass recomputes activations per tile (no [P, 256] residuals
ever hit HBM), emits d(xyz)/d(dir) back through the PE, and accumulates
weight grads across the sequential TPU grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
LANES = 128
# Tiles swept on a v5e with 5 repeated two-length trials per point
# (scripts/tune_kernel.py, round 4 — ADVICE r3: the round-3 single-trial
# sweep mis-ranked fwd tile 2048; its "7.8 ms" did not reproduce).
# Median [min,max] over repeats: fwd 1024 = 10.0 ms [9.6, 10.2] vs
# 2048 = 9.9 ms [9.4, 11.5] — indistinguishable; fwd+bwd is BEST at
# 1024 (36.2 ms) and regresses at 2048 (39.6 ms; the backward's ~12
# recomputed [tile, 256] activation arrays pressure VMEM).  Default is
# therefore (1024, 1024).  DEFAULT_TILE carries a (fwd, bwd) pair; plain
# ints are accepted everywhere and mean "both".
DEFAULT_TILE = (1024, 1024)


def _tile_pair(tile) -> Tuple[int, int]:
    if isinstance(tile, tuple):
        tf, tb = tile
        # max(tf, tb) is used as the padding granularity; that is only a
        # valid lcm when one tile divides the other — otherwise the grid
        # division in _fwd_call/_bwd_call would silently truncate and drop
        # trailing real points (ADVICE r3 low #1).
        assert max(tf, tb) % min(tf, tb) == 0, (
            f"fwd/bwd tiles must nest (one divide the other), got {tile}"
        )
        return tf, tb
    return (tile, tile)
# Mosaic's default scoped-VMEM budget (16 MB) would cap the tile at 512 for
# the backward pass; v5e/v4 have 128 MB VMEM per core, so raise the
# per-kernel limit and let tiles grow (bigger tiles amortize per-tile
# PE/VPU work and weight-grad accumulation against the MXU matmuls).
VMEM_LIMIT = 100 * 1024 * 1024

# Run pallas_call in (pure, shardable) interpret mode — used by the
# multi-device CPU dryrun, where force_tpu_interpret_mode's io_callback
# cannot live inside a GSPMD-partitioned program.  Set via
# set_interpret(); never enabled on real TPUs.
_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(on)

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
        # Wvd rows live at the d-PE lane offset (in_ch) of the packed PE
        # register; all other rows zero so the x-PE lanes contribute nothing
        jnp.pad(wv[W:], ((in_ch, LANES - in_ch - d_ch), (0, LANES - wv.shape[1]))),
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
    gv = jnp.concatenate([gWvf[:, :Wh], gWvd[in_ch : in_ch + d_ch, :Wh]], axis=0)
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
# in-kernel positional encoding
# ---------------------------------------------------------------------------

# Packed PE-constant array layout (rows): S 0:8 (selection), then freq/
# id-mask/trig-mask/phase rows 8:12; padded to 16 sublanes.
#
# Both PEs live in ONE 128-lane register: lanes [0, 63) hold the xyz PE,
# lanes [63, 90) the viewdir PE (63 + 27 <= 128).  cos is computed as
# sin(x + pi/2) via the per-lane phase row, so each tile pays exactly ONE
# transcendental op in the forward pass (and one extra for its derivative
# in the backward).  Measured motivation: with separate x/d arrays and
# separate sin/cos calls, the PE cost (9.0 ms) exceeded ALL the MLP
# matmuls (7.7 ms at 89% of v5e peak) — the kernel was VPU-transcendental
# bound, not MXU bound.  The MLP weights see the packed layout through
# zero rows: W0/W5a rows [63, 128) and Wvd rows outside [63, 90) are zero,
# so the combined lanes contribute nothing to the wrong branch.
PE_ROWS = 16
XD_CH = 8  # packed input lanes: 0:3 xyz, 3:6 viewdir, 6:8 zero pad
OUT_CH = 8  # packed output lanes: 0:3 rgb, 3 alpha, 4:8 zero pad
HALF_PI = float(np.pi / 2)


def _pe_lane_tables(num_freqs: int, src_lo: int, lane_lo: int, sel, freq, idm,
                    trig, phase, dims: int = 3):
    """Fill selection/meta rows for one PE block at lane offset `lane_lo`.

    Lane order matches the reference embedder exactly
    (ops/encoding.py / utils/run_lushnerf_helpers.py:311-361):
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)].
    """
    out_dim = dims + 2 * num_freqs * dims
    assert lane_lo + out_dim <= LANES
    for l in range(out_dim):
        if l < dims:
            c, f, kind = l, 1.0, "id"
        else:
            j, r = divmod(l - dims, 2 * dims)
            c, f = r % dims, float(2.0**j)
            kind = "sin" if r < dims else "cos"
        lane = lane_lo + l
        sel[src_lo + c, lane] = 1.0
        freq[0, lane] = f
        if kind == "id":
            idm[0, lane] = 1.0
        else:
            trig[0, lane] = 1.0
            phase[0, lane] = 0.0 if kind == "sin" else HALF_PI
    return out_dim


def pe_out_dims(num_freqs_x: int, num_freqs_d: int) -> Tuple[int, int]:
    return 3 + 6 * num_freqs_x, 3 + 6 * num_freqs_d


@functools.lru_cache(maxsize=None)
def _pe_consts_np(num_freqs_x: int, num_freqs_d: int) -> np.ndarray:
    sel = np.zeros((XD_CH, LANES), np.float32)
    freq = np.zeros((1, LANES), np.float32)
    idm = np.zeros((1, LANES), np.float32)
    trig = np.zeros((1, LANES), np.float32)
    phase = np.zeros((1, LANES), np.float32)
    dx = _pe_lane_tables(num_freqs_x, 0, 0, sel, freq, idm, trig, phase)
    _pe_lane_tables(num_freqs_d, 3, dx, sel, freq, idm, trig, phase)
    C = np.concatenate([sel, freq, idm, trig, phase], axis=0)
    return np.pad(C, ((0, PE_ROWS - C.shape[0]), (0, 0)))


def _sel_dot(a, b):
    """Channel-selection matmul against a 0/1 matrix.

    HIGHEST precision so f32 inputs pass through exactly (default TPU
    precision would truncate the coordinates to bf16 before the PE).
    """
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST,
    )


def _sel_dot_t(a, b):
    """a @ b^T at HIGHEST precision (PE backward)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST,
    )


# Fast sine for the PE lanes: Cody-Waite two-word range reduction to
# [-pi, pi] + odd minimax polynomial (degree 15; Remez-fitted, max abs
# error 5.9e-7 in f32 over |x| <= 800, the PE's 2^9-scaled coordinate
# range — jnp.sin itself differs from the f64 truth by ~1e-7 here).
# Motivation: the builtin sin lowers to a long VPU sequence; this
# 13-op version measurably cuts the kernel's remaining transcendental
# time (the PE is the forward kernel's second-largest cost after the
# matmuls).
_SIN_COEFFS = (
    9.999999996e-01, -1.666666648e-01, 8.333331668e-03, -1.984119734e-04,
    2.755549474e-06, -2.502439152e-08, 1.580780855e-10, -6.385889405e-13,
)
_INV_2PI = float(1.0 / (2.0 * np.pi))
_PI2_HI = 6.28125  # few-bit high word: k * _PI2_HI is exact for |k| < 2^16
_PI2_LO = float(2.0 * np.pi - _PI2_HI)


def _fast_sin(x):
    k = jnp.round(x * _INV_2PI)
    r = x - k * _PI2_HI - k * _PI2_LO
    t = r * r
    p = jnp.float32(_SIN_COEFFS[-1])
    for c in _SIN_COEFFS[-2::-1]:
        p = p * t + jnp.float32(c)
    return r * p


def _pe_xs(xd, C):
    """xd [T, 8] packed -> xs [T, 128]: frequency-scaled selected
    coordinates (the trig argument).  Cheap — one tiny selection matmul
    and a per-lane scale, no transcendentals."""
    S = C[0:XD_CH]
    freq = C[XD_CH : XD_CH + 1]
    return _sel_dot(xd, S) * freq


def _pe_forward(xd, C):
    """xd [T, 8] packed -> (xs, pe), each [T, 128].

    xs is the frequency-scaled selected-coordinate array (reused by the
    backward pass); pe packs [x_pe | d_pe | 0] in one 128-lane register.
    ONE sin evaluation covers every sin AND cos lane (phase row = pi/2 on
    cos lanes).
    """
    idm, trig, phase = (C[XD_CH + i : XD_CH + i + 1] for i in range(1, 4))
    xs = _pe_xs(xd, C)
    pe = idm * xs + trig * _fast_sin(xs + phase)
    return xs, pe


def _pe_backward(xs, C, g):
    """Grad w.r.t. the packed PE output [T, 128] -> grad w.r.t. xd [T, 8].

    d/dx sin(x + phase) = sin(x + phase + pi/2) — one transcendental.
    """
    S = C[0:XD_CH]
    freq, idm, trig, phase = (C[XD_CH + i : XD_CH + i + 1] for i in range(4))
    d_xs = (idm + trig * _fast_sin(xs + phase + HALF_PI)) * g * freq
    return _sel_dot_t(d_xs, S)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _make_dot(compute_dtype):
    """MXU matmul at the requested input precision, f32 accumulation.

    'bfloat16': cast inputs to bf16 — one MXU pass (full rate).
    'float32': request Precision.HIGHEST so the result really is f32-grade
    (bf16x6 passes).  JAX's *default* precision on TPU silently truncates
    f32 matmul inputs to a single bf16 pass, which would make 'float32'
    a lie (measured: bit-identical outputs to the bf16 mode).
    """
    cd = jnp.dtype(compute_dtype)
    if cd == jnp.float32:
        return lambda a, b: jnp.dot(
            a, b, preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST
        )
    return lambda a, b: jnp.dot(
        a.astype(cd), b.astype(cd), preferred_element_type=F32
    )


def _fwd_activations(pe, w, compute_dtype=jnp.float32):
    """Shared forward recurrence on one tile; returns all activations.

    pe: packed [T, 128] = [x_pe | d_pe | 0] — the x-only weights (W0, W5a)
    carry zero rows on the d lanes and vice versa (Wvd), so one register
    serves both MLP inputs exactly.
    """
    (W0, W1, W2, W3, W4, W5a, W5b, W6, W7, Wa, Wf, Wvf, Wvd, Wr,
     b0, b1, b2, b3, b4, b5, b6, b7, ba, bf, bv, br) = w
    dot = _make_dot(compute_dtype)
    relu = lambda t: jnp.maximum(t, 0.0)
    a0 = relu(dot(pe, W0) + b0)
    a1 = relu(dot(a0, W1) + b1)
    a2 = relu(dot(a1, W2) + b2)
    a3 = relu(dot(a2, W3) + b3)
    a4 = relu(dot(a3, W4) + b4)
    a5 = relu(dot(pe, W5a) + dot(a4, W5b) + b5)
    a6 = relu(dot(a5, W6) + b6)
    a7 = relu(dot(a6, W7) + b7)
    alpha = dot(a7, Wa) + ba
    feat = dot(a7, Wf) + bf
    hv = relu(dot(feat, Wvf) + dot(pe, Wvd) + bv)
    rgb = dot(hv, Wr) + br
    return a0, a1, a2, a3, a4, a5, a6, a7, alpha, feat, hv, rgb


# Split each forward tile into this many independent half-chains: the
# PE of chain b has no dependency on the matmuls of chain a, so the VLIW
# scheduler can overlap chain-b VPU transcendentals with chain-a MXU
# matmuls (the PE is ~28% of the serial forward critical path —
# tune_kernel r4: PE-only 2.8 ms vs matmul-only 7.9 ms per step).
# 1 = no split (the r3 behavior).
PE_PIPELINE_SPLIT = 2


# activation arrays stashed by the no-recompute backward (see
# `bwd_mode='stash'`): indices into _fwd_activations' return tuple for
# a0..a7, feat, hv — everything _bwd_kernel's gradient math touches
# (alpha/rgb are not re-read in the backward).
_ACT_IDX = (0, 1, 2, 3, 4, 5, 6, 7, 9, 10)
N_ACTS = len(_ACT_IDX)


def _fwd_kernel(xd_ref, c_ref, *refs, compute_dtype=jnp.float32, emit_pe=False,
                emit_acts=False):
    n_out = 1 + (1 if emit_pe else 0) + (N_ACTS if emit_acts else 0)
    w = tuple(r[...] for r in refs[:-n_out])
    out_ref = refs[-n_out]
    xd = xd_ref[...]
    T = xd.shape[0]
    split = PE_PIPELINE_SPLIT if (PE_PIPELINE_SPLIT > 1 and T % PE_PIPELINE_SPLIT == 0) else 1
    if split > 1:
        h = T // split
        pes = [_pe_forward(xd[i * h : (i + 1) * h], c_ref[...])[1] for i in range(split)]
        acts_h = [_fwd_activations(p, w, compute_dtype) for p in pes]
        pe = jnp.concatenate(pes, axis=0)
        acts = tuple(
            jnp.concatenate([a[k] for a in acts_h], axis=0) for k in range(12)
        )
        alpha, rgb = acts[8], acts[11]
    else:
        _, pe = _pe_forward(xd, c_ref[...])
        acts = _fwd_activations(pe, w, compute_dtype)
        alpha, rgb = acts[8], acts[11]
    # out lanes: 0:3 rgb, 3 alpha (alpha lives in lane 0 of its buffer),
    # 4:8 zero pad.  The store is OUT_CH=8 lanes wide, not 128: only 4
    # lanes are live, and the narrow layout cuts the kernel's output HBM
    # traffic (and the consumer's reads) 16x — measured part of the
    # ~5.9 ms/step XLA-glue tax at the custom-call boundary (PROFILE_r03).
    out = jnp.concatenate(
        [rgb[:, :3], alpha[:, :1], jnp.zeros_like(rgb[:, : OUT_CH - 4])], axis=-1
    )
    out_ref[...] = out
    extra = list(refs[len(refs) - n_out + 1 :])
    if emit_pe:
        # persist the packed PE register for the backward pass (in the
        # compute dtype — the matmuls cast to it anyway, so reusing the
        # stored value is bit-identical to recomputing)
        extra[0][...] = pe.astype(extra[0].dtype)
        extra = extra[1:]
    if emit_acts:
        # stream the post-activation arrays the backward needs, in the
        # compute dtype: the backward's matmuls cast activations to that
        # dtype anyway, so reading the stash is bit-identical to the
        # remat path's recompute (relu masks are sign-preserving under
        # the bf16 round except exact-zero underflow, measure-zero).
        for ref, k in zip(extra, _ACT_IDX):
            ref[...] = acts[k].astype(ref.dtype)


def _act_widths(w) -> Tuple[int, ...]:
    """Lane widths of the stashed activation arrays (a0..a7, feat, hv)."""
    W = w[1].shape[0]  # W1 is [W, W]
    return (W,) * 9 + (LANES,)


def _fwd_call(w: Tuple[jnp.ndarray, ...], xd: jnp.ndarray, tile: int,
              compute_dtype=jnp.float32, num_freqs_x: int = 10,
              num_freqs_d: int = 4, emit_pe: bool = False,
              emit_acts: bool = False):
    P = xd.shape[0]
    grid = P // tile
    C = jnp.asarray(_pe_consts_np(num_freqs_x, num_freqs_d))
    cd = jnp.dtype(compute_dtype)
    specs_in = [
        pl.BlockSpec((tile, XD_CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w]
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, OUT_CH), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [out_spec]
    out_shapes = [jax.ShapeDtypeStruct((P, OUT_CH), F32)]
    if emit_pe:
        out_specs.append(tile_spec)
        out_shapes.append(jax.ShapeDtypeStruct((P, LANES), cd))
    if emit_acts:
        for aw in _act_widths(w):
            out_specs.append(
                pl.BlockSpec((tile, aw), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
            out_shapes.append(jax.ShapeDtypeStruct((P, aw), cd))
    multi = emit_pe or emit_acts
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype,
                          emit_pe=emit_pe, emit_acts=emit_acts),
        grid=(grid,),
        in_specs=specs_in + w_specs,
        out_specs=out_specs if multi else out_specs[0],
        out_shape=out_shapes if multi else out_shapes[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_INTERPRET,
    )(xd, C, *w)
    return out


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_math(pe, xs, C, g, w, acts, compute_dtype):
    """Shared backward gradient math on one tile.

    acts: (a0..a7, feat, hv) — either recomputed (remat mode) or read from
    the forward's stash (stash mode; bit-identical, see _fwd_kernel).
    Returns (d_xd [T, XD_CH], grads tuple matching the padded params).
    """
    (W0, W1, W2, W3, W4, W5a, W5b, W6, W7, Wa, Wf, Wvf, Wvd, Wr, *_bs) = w
    a0, a1, a2, a3, a4, a5, a6, a7, feat, hv = acts

    cd = jnp.dtype(compute_dtype)
    cast = (lambda t: t) if cd == jnp.float32 else (lambda t: t.astype(cd))
    prec = jax.lax.Precision.HIGHEST if cd == jnp.float32 else None
    dotT = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((0,), (0,)), ((), ())),
        preferred_element_type=F32, precision=prec,
    )  # a^T @ b with a [T, m], b [T, n] -> [m, n]
    dBT = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((1,), (1,)), ((), ())),
        preferred_element_type=F32, precision=prec,
    )  # a @ b^T

    # g arrives OUT_CH=8 lanes wide (lanes 0:3 rgb cotangent, 3 alpha);
    # expand to the 128-lane registers the transposed matmuls consume
    T = g.shape[0]
    zpad = jnp.zeros((T, LANES - OUT_CH), F32)
    g_rgb = jnp.concatenate(
        [g[:, :3], jnp.zeros((T, OUT_CH - 3), F32), zpad], axis=-1
    )
    g_alpha = jnp.concatenate(
        [g[:, 3:4], jnp.zeros((T, OUT_CH - 1), F32), zpad], axis=-1
    )

    # compare in f32: stashed activations arrive in the compute dtype and
    # Mosaic has no native bf16 compare (the cast is free VPU work)
    relu_m = lambda a: (a.astype(F32) > 0.0).astype(F32)

    d_hv = dBT(g_rgb, Wr) * relu_m(hv)
    d_feat = dBT(d_hv, Wvf)
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
    # all three PE consumers feed ONE packed-lane gradient (the x-only /
    # d-only weights have zero rows on the other block's lanes)
    d_pe = dBT(d_z0, W0) + dBT(d_z5, W5a) + dBT(d_hv, Wvd)

    sum0 = lambda t: jnp.sum(t, axis=0, keepdims=True)
    grads = (
        dotT(pe, d_z0),  # dW0
        dotT(a0, d_z1),
        dotT(a1, d_z2),
        dotT(a2, d_z3),
        dotT(a3, d_z4),
        dotT(pe, d_z5),  # dW5a
        dotT(a4, d_z5),  # dW5b
        dotT(a5, d_z6),
        dotT(a6, d_z7),
        dotT(a7, g_alpha),  # dWa
        dotT(a7, d_feat),  # dWf
        dotT(feat, d_hv),  # dWvf
        dotT(pe, d_hv),  # dWvd
        dotT(hv, g_rgb),  # dWr
        sum0(d_z0), sum0(d_z1), sum0(d_z2), sum0(d_z3), sum0(d_z4),
        sum0(d_z5), sum0(d_z6), sum0(d_z7),
        sum0(g_alpha), sum0(d_feat), sum0(d_hv), sum0(g_rgb),
    )
    return _pe_backward(xs, C, d_pe), grads


def _acc_grads(out_refs, d_xd, grads):
    out_refs[0][...] = d_xd
    first = pl.program_id(0) == 0
    for gr, ref in zip(grads, out_refs[1:]):
        @pl.when(first)
        def _(ref=ref, gr=gr):
            ref[...] = gr

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, gr=gr):
            ref[...] += gr


def _bwd_kernel(xd_ref, c_ref, g_ref, pe_ref, *refs, compute_dtype=jnp.float32):
    w_refs = refs[: _N_W + _N_B]
    out_refs = refs[_N_W + _N_B :]
    w = tuple(r[...] for r in w_refs)

    C = c_ref[...]
    g = g_ref[...]
    # pe was persisted by the forward kernel (same compute dtype — reusing
    # it is bit-identical and saves one of the two transcendental passes);
    # xs (the trig argument, needed for the PE derivative) is recomputed
    # from the narrow xd input at trivial cost.
    xs = _pe_xs(xd_ref[...], C)
    pe = pe_ref[...]
    full = _fwd_activations(pe, w, compute_dtype)
    acts = tuple(full[k] for k in _ACT_IDX)
    d_xd, grads = _bwd_math(pe, xs, C, g, w, acts, compute_dtype)
    _acc_grads(out_refs, d_xd, grads)


def _bwd_stash_kernel(xd_ref, c_ref, g_ref, pe_ref, *refs,
                      compute_dtype=jnp.float32):
    """No-recompute backward: activations stream in from the forward's
    stash instead of being rematerialized (the '4th pass' PROFILE_r04
    blames for the 0.75 counted/executed MFU factor).  The stash reads
    ride the input pipeline and overlap with the MXU-bound dgrad/wgrad
    matmuls."""
    act_refs = refs[:N_ACTS]
    w_refs = refs[N_ACTS : N_ACTS + _N_W + _N_B]
    out_refs = refs[N_ACTS + _N_W + _N_B :]
    w = tuple(r[...] for r in w_refs)

    C = c_ref[...]
    xs = _pe_xs(xd_ref[...], C)
    acts = tuple(r[...] for r in act_refs)
    d_xd, grads = _bwd_math(pe_ref[...], xs, C, g_ref[...], w, acts,
                            compute_dtype)
    _acc_grads(out_refs, d_xd, grads)


def _bwd_call(w, xd, g, pe, tile: int, compute_dtype=jnp.float32,
              num_freqs_x: int = 10, num_freqs_d: int = 4, acts=None):
    P = xd.shape[0]
    grid = P // tile
    C = jnp.asarray(_pe_consts_np(num_freqs_x, num_freqs_d))
    xd_spec = pl.BlockSpec((tile, XD_CH), lambda i: (i, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((tile, OUT_CH), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    act_args, act_specs, kern = (), [], _bwd_kernel
    if acts is not None:
        act_args = tuple(acts)
        act_specs = [
            pl.BlockSpec((tile, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for a in acts
        ]
        kern = _bwd_stash_kernel
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w]
    acc_specs = [
        pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM)
        for a in w
    ]
    out_shapes = [jax.ShapeDtypeStruct((P, XD_CH), F32)] + [
        jax.ShapeDtypeStruct(a.shape, F32) for a in w
    ]
    out_specs = [xd_spec] + acc_specs
    outs = pl.pallas_call(
        functools.partial(kern, compute_dtype=compute_dtype),
        grid=(grid,),
        in_specs=[xd_spec, pl.BlockSpec(memory_space=pltpu.VMEM), g_spec,
                  tile_spec] + act_specs + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_INTERPRET,
    )(xd, C, g, pe, *act_args, *w)
    return outs[0], tuple(outs[1:])


# ---------------------------------------------------------------------------
# custom-VJP wrapper and public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_mlp_packed(w, xd, tile=DEFAULT_TILE, compute_dtype: str = "float32",
                     num_freqs_x: int = 10, num_freqs_d: int = 4,
                     bwd_mode: str = "remat"):
    """w: padded param tuple; xd: [P, 8] packed (xyz, dir) input
    (P divisible by both tiles).  `tile` is an int or a (fwd, bwd) pair.
    PE happens in-kernel.  Returns raw [P, 4] = [rgb_raw, alpha_raw].

    bwd_mode: 'remat' recomputes activations in the backward kernel (no
    activation HBM traffic, 4 compute passes); 'stash' streams the
    forward's activations through HBM in the compute dtype and skips the
    recompute (3 passes — the stash reads hide under the backward's
    MXU-bound matmuls).  Gradients are bit-identical between modes for
    bf16 compute (the backward casts activations to the compute dtype
    before every matmul anyway)."""
    tf, _ = _tile_pair(tile)
    out = _fwd_call(w, xd, tf, jnp.dtype(compute_dtype), num_freqs_x, num_freqs_d)
    return out[:, :4]


def _fused_fwd(w, xd, tile, compute_dtype, num_freqs_x, num_freqs_d, bwd_mode):
    tf, _ = _tile_pair(tile)
    stash = bwd_mode == "stash"
    outs = _fwd_call(w, xd, tf, jnp.dtype(compute_dtype), num_freqs_x,
                     num_freqs_d, emit_pe=True, emit_acts=stash)
    out, pe = outs[0], outs[1]
    acts = tuple(outs[2:]) if stash else None
    return out[:, :4], (w, xd, pe, acts)


def _fused_bwd(tile, compute_dtype, num_freqs_x, num_freqs_d, bwd_mode, res, g4):
    w, xd, pe, acts = res
    _, tb = _tile_pair(tile)
    g = jnp.pad(g4, ((0, 0), (0, OUT_CH - 4)))
    dxd, dw = _bwd_call(w, xd, g, pe, tb, jnp.dtype(compute_dtype),
                        num_freqs_x, num_freqs_d, acts=acts)
    return dw, dxd


fused_mlp_packed.defvjp(_fused_fwd, _fused_bwd)


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
        # both PEs share one 128-lane register (63 + 27 for the reference)
        and mlp_cfg.input_ch + mlp_cfg.input_ch_views <= LANES
    )


def eval_points_fused(params, mlp_cfg, render_cfg, pts, viewdirs, tile=DEFAULT_TILE):
    """Drop-in for renderer.eval_points with the fused kernel.

    pts: [R, S, 3]; viewdirs: [R, 3].  Returns raw [R, S, 4].

    Only the narrow packed [P, 8] (xyz, dir) array crosses HBM; the PE
    expansion to 63+27 channels happens inside the kernel.

    Multi-device: GSPMD cannot partition a Mosaic custom call, so under a
    registered >1-device mesh (parallel/mesh.set_kernel_mesh) the kernel
    is wrapped in shard_map over the point axis — each device runs the
    kernel on its local ray shard; shard_map's transpose psums the weight
    cotangents over 'data', which IS the data-parallel gradient
    all-reduce for the MLP parameters.
    """
    if not supports(mlp_cfg, render_cfg):
        raise NotImplementedError(
            "fused kernel supports the reference MLP family only "
            f"(depth={mlp_cfg.depth}, width={mlp_cfg.width}, skips={mlp_cfg.skips})"
        )
    from lushnerf_tpu.parallel.mesh import get_kernel_mesh

    R, S = pts.shape[0], pts.shape[1]
    P = R * S
    x = pts.reshape(P, 3)
    d = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(P, 3)

    mesh = get_kernel_mesh()
    n_dev = mesh.size if mesh is not None else 1

    tf, tb = _tile_pair(tile)
    tile_lcm = max(tf, tb)  # both are powers of two
    quantum = tile_lcm * n_dev  # every device's local slice tiles evenly
    P_pad = -(-P // quantum) * quantum
    xd = jnp.concatenate([x, d], axis=-1).astype(F32)
    xd = jnp.pad(xd, ((0, P_pad - P), (0, XD_CH - xd.shape[-1])))

    w = pad_params(params, mlp_cfg.width)
    run = functools.partial(
        fused_mlp_packed,
        tile=tile,
        compute_dtype=render_cfg.mlp_compute_dtype,
        num_freqs_x=render_cfg.multires,
        num_freqs_d=render_cfg.multires_views,
        bwd_mode=getattr(render_cfg, "mlp_bwd", "remat"),
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as PS

        axis = mesh.axis_names[0]
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(PS(), PS(axis)),  # weights replicated, points sharded
            out_specs=PS(axis),
            check_vma=False,
        )
    raw = run(w, xd)
    return raw[:P].reshape(R, S, 4)
