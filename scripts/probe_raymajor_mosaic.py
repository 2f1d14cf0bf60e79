#!/usr/bin/env python
"""Mosaic feasibility probe for the ray-major fused render kernel.

The fused kernel (SURVEY §7 stage 2) needs per-RAY math (compositing,
inverse-CDF sampling, sorted merge) to live in the same pallas body as
the per-POINT MLP.  The design that avoids sublane<->lane transposes
keeps every per-sample scalar in "sublane layout" ([T, S, c] views of
[T*S, c] arrays — a free leading-dim split) and expresses per-ray
reductions/scans as MXU contractions over the sample (sublane) axis:

  P1  [T*S, c] -> [T, S, c] reshape + batched dot_general
      (cumsum over S via a lower-triangular [S, S] matrix)
  P2  per-ray vector transpose [T, S, 1] -> [T, 1, S] via identity
      matmul (needed to compare two per-ray vectors pairwise)
  P3  broadcast compare [T, SI, 1] >= [T, 1, S] -> [T, SI, S] + lane
      reduction (the searchsorted of sample_pdf)
  P4  segment-boundary-masked sublane roll (the dists = z[1:] - z[:-1])

This probe compiles each primitive in a minimal pallas kernel on the
real chip, checks numerics vs XLA, and times a fused
"composite-from-raw" kernel against the XLA raw2outputs as the
end-to-end representative.  Outcome gates whether the full fused
renderer is buildable without layout-shuffle tax.

Run:  python scripts/probe_raymajor_mosaic.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _report(name, ok, extra=""):
    print(f"  [{'OK' if ok else 'FAIL'}] {name} {extra}")
    return ok


def probe_p1_batched_cumsum(T=16, S=64, c=8):
    """[T*S, c] -> [T, S, c]; exclusive cumsum over S via batched matmul."""
    L = jnp.asarray(np.tril(np.ones((S, S), np.float32), k=-1))

    def kern(x_ref, l_ref, o_ref):
        # batch-dim form: [T,S,S] @ [T,S,c] -> [T,S,c], reshaped straight
        # back to [T*S, c].  (The unbatched form [S,S]@[T,S,c] needs an
        # output transpose whose reshape Mosaic rejects: "unsupported
        # shape cast (64x16x8 -> 64x128)".)
        x = x_ref[...].reshape(T, S, c)
        Lb = jnp.broadcast_to(l_ref[...][None], (T, S, S))
        y = jax.lax.dot_general(
            Lb, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=F32
        )
        o_ref[...] = y.reshape(T * S, c)

    x = jnp.asarray(np.random.default_rng(0).random((T * S, c), np.float32))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * S, c), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, L)
        ref = jnp.cumsum(x.reshape(T, S, c), axis=1) - x.reshape(T, S, c)
        ok = bool(jnp.allclose(out.reshape(T, S, c), ref, atol=1e-5))
        return _report("P1 batched-matmul exclusive cumsum over samples", ok)
    except Exception as e:  # noqa: BLE001
        return _report("P1 batched-matmul cumsum", False, repr(e)[:200])


def probe_p1b_batched_dot(T=16, S=64, c=8):
    """True batched dot_general (batch dim T)."""
    L = jnp.asarray(np.tril(np.ones((S, S), np.float32), k=-1))

    def kern(x_ref, l_ref, o_ref):
        x = x_ref[...].reshape(T, S, c)
        Lb = jnp.broadcast_to(l_ref[...][None], (T, S, S))
        y = jax.lax.dot_general(
            Lb, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=F32
        )  # [T, S, c]
        o_ref[...] = y.reshape(T * S, c)

    x = jnp.asarray(np.random.default_rng(1).random((T * S, c), np.float32))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * S, c), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, L)
        ref = jnp.cumsum(x.reshape(T, S, c), axis=1) - x.reshape(T, S, c)
        ok = bool(jnp.allclose(out.reshape(T, S, c), ref, atol=1e-5))
        return _report("P1b batch-dim dot_general", ok)
    except Exception as e:  # noqa: BLE001
        return _report("P1b batch-dim dot_general", False, repr(e)[:200])


def probe_p2_vector_transpose(T=16, S=64):
    """[T, S, 1] -> [T, 1, S] via per-batch identity matmul.

    KNOWN FAILURE (2026-08-21, v5e, this jax/Mosaic version): every
    formulation tried (unit free dim on either side; free dim padded to
    8 with an in-kernel transpose) COMPILES but produces silently wrong
    values on the TPU while interpret mode is correct — e.g. row
    pattern [256, 256, 258, 260, 260, ...] instead of [256, 257, ...].
    This probe asserts the numerics so the miscompile is detected, not
    hidden.  It is the load-bearing blocker for the ray-major fused
    renderer: pairwise per-ray compares (sample_pdf's searchsorted, the
    sorted-merge ranking) need one operand moved to the lane axis.
    """
    I = jnp.eye(S, dtype=F32)

    def kern(x_ref, i_ref, o_ref):
        x = x_ref[...].reshape(T, S, 1)
        # y[t, 1, s] = sum_k I[k, s] * x[t, k, 1]
        y = jax.lax.dot_general(
            x, i_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=F32
        )  # [T, 1, S]
        o_ref[...] = y.reshape(T, S)

    x = jnp.asarray(np.random.default_rng(2).random((T * S, 1), np.float32))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, S), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, I)
        ok = bool(jnp.allclose(out, x.reshape(T, S), atol=1e-6))
        return _report(
            "P2 sublane->lane vector transpose via identity matmul", ok,
            "" if ok else "(compiles but SILENTLY WRONG on TPU — Mosaic miscompile)",
        )
    except Exception as e:  # noqa: BLE001
        return _report("P2 vector transpose", False, repr(e)[:200])


def probe_p3_searchsorted(T=16, S=64, SI=64):
    """count of cdf (lanes) <= u (sublanes): [T, SI, S] compare + lane sum."""

    def kern(cdf_ref, u_ref, o_ref):
        cdf = cdf_ref[...].reshape(T, 1, S)
        u = u_ref[...].reshape(T, SI, 1)
        cmp = (cdf <= u).astype(F32)  # [T, SI, S]
        o_ref[...] = jnp.sum(cmp, axis=2).reshape(T * SI, 1)

    rng = np.random.default_rng(3)
    cdf = jnp.asarray(np.sort(rng.random((T, S), np.float32), axis=1))
    u = jnp.asarray(rng.random((T * SI, 1), np.float32))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * SI, 1), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(cdf, u)
        ref = jnp.sum(
            (cdf[:, None, :] <= u.reshape(T, SI, 1)).astype(F32), axis=2
        ).reshape(T * SI, 1)
        ok = bool(jnp.allclose(out, ref))
        return _report("P3 broadcast-compare searchsorted", ok)
    except Exception as e:  # noqa: BLE001
        return _report("P3 searchsorted", False, repr(e)[:200])


def probe_p4_masked_roll(T=16, S=64):
    """dists via sublane roll + ray-boundary mask."""

    def kern(z_ref, o_ref):
        z = z_ref[...]  # [T*S, 1]
        znext = pltpu.roll(z, shift=T * S - 1, axis=0)
        d = znext - z
        row = jax.lax.broadcasted_iota(jnp.int32, (T * S, 1), 0)
        last = (row % S) == (S - 1)
        o_ref[...] = jnp.where(last, 0.0, d)

    z = jnp.asarray(
        np.sort(np.random.default_rng(4).random((T, S), np.float32), axis=1)
        .reshape(T * S, 1)
    )
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * S, 1), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z)
        zz = z.reshape(T, S)
        ref = jnp.concatenate(
            [zz[:, 1:] - zz[:, :-1], jnp.zeros((T, 1))], axis=1
        ).reshape(T * S, 1)
        ok = bool(jnp.allclose(out, ref, atol=1e-6))
        return _report("P4 boundary-masked sublane roll (dists)", ok)
    except Exception as e:  # noqa: BLE001
        return _report("P4 masked roll", False, repr(e)[:200])


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    results = [
        probe_p1_batched_cumsum(),
        probe_p1b_batched_dot(),
        probe_p2_vector_transpose(),
        probe_p3_searchsorted(),
        probe_p4_masked_roll(),
    ]
    print(f"{sum(results)}/{len(results)} primitives compile+verify on Mosaic")


if __name__ == "__main__":
    main()
