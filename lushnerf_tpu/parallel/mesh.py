"""Mesh construction and sharding rules.

Parallelism design (SURVEY.md §2.4): the reference's only parallelism is
single-process nn.DataParallel over GPUs (run_lushnerf.py:348) — scatter
rays, replicate the module, gather.  The TPU-native equivalent is SPMD over
a 1-D `('data',)` mesh:

  * the ray batch (and the sub-ray bundles folded into the ray axis — the
    sequence-parallel analog for this workload) is sharded over 'data'
  * parameters are replicated (the MLPs are 256-wide — tensor parallelism
    would waste ICI bandwidth on 128-lane matmuls)
  * gradient all-reduce (psum over 'data') is inserted by GSPMD and
    overlapped with the backward pass by XLA's scheduler
  * multi-host: the same program runs under jax.distributed.initialize;
    'data' spans all chips, collectives ride ICI within a slice and DCN
    across slices.

No pipeline/expert parallelism: the model has no layer pipeline or experts
(reference has none either).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Create a device mesh.  Default: all devices along a 1-D 'data' axis.

    If the default backend doesn't have enough devices for `shape` but the
    CPU backend does (the virtual-device testing path, e.g.
    ``jax_num_cpu_devices=8`` / ``--xla_force_host_platform_device_count``),
    fall back to CPU devices so multi-chip sharding can be validated
    without real chips.
    """
    devices = np.asarray(jax.devices())
    if shape is None or len(shape) == 0:
        shape = (devices.size,)
    need = int(np.prod(shape))
    if devices.size < need:
        try:
            cpu = np.asarray(jax.devices("cpu"))
        except RuntimeError:
            cpu = np.asarray([])
        if cpu.size >= need:
            devices = cpu
    if devices.size < need:
        raise ValueError(f"mesh shape {tuple(shape)} needs {need} devices, have {devices.size}")
    devices = devices[:need].reshape(tuple(shape))
    return Mesh(devices, tuple(axis_names[: devices.ndim]))


# ---------------------------------------------------------------------------
# kernel mesh registry
# ---------------------------------------------------------------------------
#
# GSPMD cannot partition a Mosaic custom call: under a >1-device mesh the
# fused pallas MLP would be implicitly all-gathered and run REPLICATED on
# every chip — silently destroying data-parallel scaling of the hot loop.
# The idiomatic fix is shard_map around the kernel (each device runs the
# kernel on its local ray shard; cotangents of the replicated weights are
# psum-ed by shard_map's transpose, which IS the gradient all-reduce).
# The renderer is mesh-agnostic, so the active mesh is registered here by
# the trainer / entry point and picked up by ops/fused/nerf_mlp.py.

_KERNEL_MESH: Optional[Mesh] = None


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh the fused kernels shard
    over.  A 1-device mesh is treated as no mesh."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh if (mesh is not None and mesh.size > 1) else None


def get_kernel_mesh() -> Optional[Mesh]:
    return _KERNEL_MESH


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray) axis of every leaf over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch pytree with the leading axis sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
