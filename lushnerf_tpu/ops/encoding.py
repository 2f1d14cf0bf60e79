"""NeRF positional encoding.

Matches the reference embedder (utils/run_lushnerf_helpers.py:311-361):
output = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)]
i.e. the identity first, then for each frequency band (log-spaced,
2^0..2^(multires-1)) a sin block followed by a cos block, each of the input
dimensionality.  multires=10 on xyz gives 3 + 3*2*10 = 63 channels;
multires=4 on directions gives 27.

TPU note: this is pure VPU work and fuses into whatever consumes it; the
frequency axis is laid out so XLA vectorizes over the trailing channel dim.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PositionalEncoding:
    """Static config for a positional encoding (hashable, jit-friendly)."""

    num_freqs: int
    input_dims: int = 3
    include_input: bool = True
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    def freq_bands(self) -> jnp.ndarray:
        if self.num_freqs == 0:
            return jnp.zeros((0,), dtype=jnp.float32)
        max_freq = self.num_freqs - 1
        if self.log_sampling:
            return 2.0 ** jnp.linspace(0.0, max_freq, self.num_freqs)
        return jnp.linspace(2.0**0.0, 2.0**max_freq, self.num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return posenc(x, self)


def posenc(x: jnp.ndarray, enc: PositionalEncoding) -> jnp.ndarray:
    """Apply positional encoding along the last axis.

    x: [..., input_dims] -> [..., out_dim], channel order identical to the
    reference (identity, then per-freq [sin, cos] blocks).
    """
    if enc.num_freqs == 0:
        return x if enc.include_input else x[..., :0]
    freqs = enc.freq_bands().astype(x.dtype)  # [L]
    # [..., L, d] — scaled copies of x per frequency band.
    xb = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # Interleave per-frequency as [sin_f, cos_f] blocks, flattened.
    sc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * enc.num_freqs * enc.input_dims)
    if enc.include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc
