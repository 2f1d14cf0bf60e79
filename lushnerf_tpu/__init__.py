"""lushnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of LuSh-NeRF (NeurIPS 2024): training sharp, bright NeRFs from
low-light, motion-blurred, noisy handheld captures.

Designed from scratch for TPU:
  * functional core — pure render/loss functions over parameter pytrees
  * one jitted train step per schedule stage (no Python chunk loops)
  * rays sharded over a ``jax.sharding.Mesh``; params replicated; gradient
    all-reduce inserted by GSPMD
  * fused Pallas kernels for the hot MLP evaluation path

Reference behavior being matched: quzefan/LuSh-NeRF (see SURVEY.md).
"""

__version__ = "0.1.0"
