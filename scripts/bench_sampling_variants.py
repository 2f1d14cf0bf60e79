#!/usr/bin/env python
"""Measure sample_pdf / merge_z_vals formulation variants on the TPU.

The r2 profile left ~half the step time outside the fused MLP; the
[R, N, M] one-hot contractions in sample_pdf and the O(L^2) rank-matmul in
merge_z_vals are the prime suspects (VERDICT r2 weak #3).  This script
times the shipped formulations against candidates at step shapes
(R = 5120 folded rays) and checks each candidate bit-matches (or allclose)
the shipped output so a swap can't silently change semantics.

Run:  python scripts/bench_sampling_variants.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, n_short=5, n_long=25):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0

    run(2)
    t_s = run(n_short)
    t_l = run(n_long)
    return max(t_l - t_s, 1e-9) / (n_long - n_short)


# --- merge variants --------------------------------------------------------


def merge_sort(zc, zi):
    return jnp.sort(jnp.concatenate([zc, zi], axis=-1), axis=-1)


def merge_two_sorted(zc, zi_sorted):
    """Merge two per-ray SORTED arrays: each element's output position is
    its own index + the count of strictly-smaller (or tie-breaking) items
    in the other array; scatter via one-hot matmuls.  [R,Nc,Ni] compare
    instead of [R,L,L] (4x less for Nc=Ni=L/2); stable-concat tie order
    (coarse first)."""
    L = zc.shape[-1] + zi_sorted.shape[-1]
    # counts via broadcast compare
    c_lt = jnp.sum((zi_sorted[..., None, :] < zc[..., :, None]).astype(jnp.int32), -1)
    i_le = jnp.sum((zc[..., None, :] <= zi_sorted[..., :, None]).astype(jnp.int32), -1)
    pos_c = jnp.arange(zc.shape[-1], dtype=jnp.int32) + c_lt
    pos_i = jnp.arange(zi_sorted.shape[-1], dtype=jnp.int32) + i_le
    oh_c = (pos_c[..., :, None] == jnp.arange(L)).astype(zc.dtype)
    oh_i = (pos_i[..., :, None] == jnp.arange(L)).astype(zc.dtype)
    return jnp.einsum("...ij,...i->...j", oh_c, zc) + jnp.einsum(
        "...ij,...i->...j", oh_i, zi_sorted
    )


def main():
    from lushnerf_tpu.ops.sampling import merge_z_vals, sample_pdf

    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    rng = np.random.default_rng(0)
    R, S, SI = 5120, 64, 64
    zc = jnp.sort(jnp.asarray(rng.random((R, S), dtype=np.float32)), axis=-1)
    zi = jnp.asarray(rng.random((R, SI), dtype=np.float32))
    zi_sorted = jnp.sort(zi, axis=-1)

    z_mid = jnp.sort(jnp.asarray(rng.random((R, S - 1), dtype=np.float32)), axis=-1)
    wts = jnp.asarray(rng.random((R, S - 2), dtype=np.float32))
    u = jnp.asarray(rng.random((R, SI), dtype=np.float32))

    # correctness first (on-device)
    want = np.asarray(jax.jit(merge_z_vals)(zc, zi))
    np.testing.assert_allclose(np.asarray(jax.jit(merge_sort)(zc, zi)), want, atol=0)
    got2 = np.asarray(jax.jit(merge_two_sorted)(zc, zi_sorted))
    np.testing.assert_allclose(got2, want, atol=0)
    print("correctness: all merge variants identical")

    t0 = timed(jax.jit(merge_z_vals), zc, zi)
    t1 = timed(jax.jit(merge_sort), zc, zi)
    t2 = timed(jax.jit(merge_two_sorted), zc, zi_sorted)
    t2b = timed(jax.jit(lambda a, b: merge_two_sorted(a, jnp.sort(b, -1))), zc, zi)
    print(f"merge rank128 (shipped) : {t0*1e3:7.3f} ms")
    print(f"merge jnp.sort(128)     : {t1*1e3:7.3f} ms")
    print(f"merge two-sorted        : {t2*1e3:7.3f} ms (pre-sorted zi)")
    print(f"merge sort64+two-sorted : {t2b*1e3:7.3f} ms")

    t_samp = timed(jax.jit(sample_pdf), z_mid, wts, u)
    print(f"sample_pdf (shipped)    : {t_samp*1e3:7.3f} ms")

    # fused: sample_pdf + merge as used in render_rays_scene
    def pipeline_shipped(z_mid, wts, u, zc):
        zs = sample_pdf(z_mid, wts, u)
        return merge_z_vals(zc, zs)

    def pipeline_sort(z_mid, wts, u, zc):
        zs = sample_pdf(z_mid, wts, u)
        return merge_sort(zc, zs)

    tp0 = timed(jax.jit(pipeline_shipped), z_mid, wts, u, zc)
    tp1 = timed(jax.jit(pipeline_sort), z_mid, wts, u, zc)
    print(f"pipeline shipped        : {tp0*1e3:7.3f} ms")
    print(f"pipeline sample+sort    : {tp1*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
