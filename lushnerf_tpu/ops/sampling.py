"""Ray-marching sample placement: stratified + inverse-CDF importance.

Reference conventions:
  * linear z placement between near/far (models/lushnerf.py:389-394), with
    optional lindisp (inverse-depth) spacing.
  * stratified perturbation jitters within mid-point intervals
    (models/lushnerf.py:398-412).
  * sample_pdf (utils/run_lushnerf_helpers.py:566-609): weights+1e-5 ->
    pdf -> cdf (prepended 0) -> searchsorted(right) -> linear interp between
    bin edges, with denominators < 1e-5 snapped to 1.

All functions take explicit uniform samples `u` (or a PRNG key) so runs are
bit-reproducible and parity-testable against the reference's `pytest=True`
seeded-numpy mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_z_vals(near, far, n_samples: int, lindisp: bool = False, dtype=jnp.float32):
    """Evenly spaced z values between near and far.

    near, far: [...] or scalars (broadcast).  Returns [..., n_samples].
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    near = jnp.asarray(near, dtype=dtype)[..., None]
    far = jnp.asarray(far, dtype=dtype)[..., None]
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def stratify_z_vals(z_vals, t_rand):
    """Jitter z values uniformly within their midpoint intervals.

    z_vals: [..., N]; t_rand: [..., N] uniforms in [0,1).
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    return lower + (upper - lower) * t_rand


def _onehot_gather(values, idx):
    """values [..., M] gathered at idx [..., N] (int) -> [..., N].

    Dense one-hot contraction instead of `take_along_axis`: TPU lowers
    row-wise gathers to a scalar-core loop (~ms for [5k, 64] operands),
    while the [..., N, M] one-hot matvec is a single fast VPU/MXU op
    (measured: the gather formulation made `sample_pdf` cost more than
    the entire fused 983k-point MLP evaluation).
    """
    M = values.shape[-1]
    oh = (idx[..., :, None] == jnp.arange(M, dtype=idx.dtype)).astype(values.dtype)
    return jnp.einsum(
        "...nm,...m->...n", oh, values, preferred_element_type=values.dtype
    )


def sample_pdf(bins, weights, u):
    """Inverse-CDF sampling of `u` against a piecewise-constant pdf.

    bins: [..., M] bin-edge positions (the reference passes z midpoints).
    weights: [..., M-1] unnormalized weights per interval.
    u: [..., N] uniforms in [0,1] (deterministic linspace for eval).
    Returns samples [..., N].

    TPU-dense formulation: searchsorted(side='right') == count of cdf
    entries <= u (one broadcast compare + sum, no scan/binary search);
    bin-edge lookups are one-hot contractions (no gathers).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M]
    M = cdf.shape[-1]

    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )  # [..., N] in [0, M]
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, M - 1)

    cdf_below = _onehot_gather(cdf, below)
    cdf_above = _onehot_gather(cdf, above)
    bins_below = _onehot_gather(bins, jnp.minimum(below, bins.shape[-1] - 1))
    bins_above = _onehot_gather(bins, jnp.minimum(above, bins.shape[-1] - 1))

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def det_u(batch_shape, n_samples: int, dtype=jnp.float32):
    """Deterministic uniforms (linspace), reference eval mode (det=True)."""
    u = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    return jnp.broadcast_to(u, (*batch_shape, n_samples))


def merge_z_vals(z_coarse, z_importance):
    """Sorted union of coarse and importance samples (models/lushnerf.py:440).

    Rank-by-comparison instead of `jnp.sort`: a stable sort of the [..., L]
    concat (L = 128) costs log^2(L) bitonic passes on TPU; computing each
    element's stable rank with one [..., L, L] broadcast compare and
    scattering via a one-hot matmul is a single VPU+MXU step.  Identical
    output to a stable ascending sort.
    """
    v = jnp.concatenate([z_coarse, z_importance], axis=-1)
    L = v.shape[-1]
    lt = v[..., :, None] > v[..., None, :]  # v_j < v_i
    eq = v[..., :, None] == v[..., None, :]
    j_lt_i = jnp.arange(L)[:, None] > jnp.arange(L)[None, :]  # j < i
    rank = jnp.sum((lt | (eq & j_lt_i)).astype(jnp.int32), axis=-1)  # [..., L]
    oh = (rank[..., :, None] == jnp.arange(L)).astype(v.dtype)  # out[rank_i] = v_i
    return jnp.einsum("...ij,...i->...j", oh, v, preferred_element_type=v.dtype)
