"""Multi-host (multi-process) execution support.

SURVEY.md §2.4: the reference's only scale-out is single-process
nn.DataParallel (run_lushnerf.py:348); its vendored gluefactory DDP
(gim/gluefactory/train.py:237-300) is unused.  The TPU-native replacement
is SPMD over a global mesh spanning all processes:

  * ``initialize()`` brings up the JAX distributed runtime
    (`jax.distributed.initialize`, DCN coordination) when configured —
    explicit coordinator flags, standard env vars, or cloud-TPU metadata
    autodetection.  Single-process runs skip it (no-op).
  * the ray dataset is sharded per process (`shard_dataset`) — each host
    touches only its stripe of the shuffled ray tensor; the global batch
    is assembled addressably with
    `jax.make_array_from_process_local_data` (`make_global_batch`).
  * gradients psum over the 'data' axis exactly as single-host — GSPMD
    inserts the all-reduce; it rides ICI within a slice and DCN across.
  * eval renders are striped across processes and reassembled with
    `multihost_utils.process_allgather` (`allgather_stack`).

Everything here degrades to a no-op / identity on one process, so the
trainer has a single code path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: str = "",
    num_processes: int = 0,
    process_id: int = -1,
    local_device_ids: Optional[str] = "",
) -> bool:
    """Bring up the JAX distributed runtime if configured.

    Priority:
      1. explicit flags (--coordinator_address host:port --num_processes N
         --process_id I), the manual cluster path;
      2. JAX_COORDINATOR_ADDRESS / auto cluster-environment detection
         (cloud TPU metadata, SLURM, ...) via argument-less initialize().

    Returns True if the distributed runtime was initialized.  Safe to call
    when unconfigured (returns False; single-process semantics).
    """
    if coordinator_address:
        ids = None
        if local_device_ids:
            ids = [int(x) for x in str(local_device_ids).split(",") if x != ""]
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes if num_processes > 0 else None,
            process_id=process_id if process_id >= 0 else None,
            local_device_ids=ids,
        )
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns logging/checkpoints/file writes."""
    return jax.process_index() == 0


def shard_dataset(dataset, pid: Optional[int] = None, pcount: Optional[int] = None):
    """Per-process stripe of a RayDataset (every pcount-th ray).

    The stripe is taken over the *unshuffled* ray tensor; each process
    then shuffles its own stripe with a per-process RNG stream.  Global
    optimization semantics are preserved: the global batch is still
    N_rand i.i.d. rays per step (union of per-host draws), grads are
    psum-averaged — the exact ray *sequence* differs from single-host,
    as with any data-parallel loader.
    """
    pid = jax.process_index() if pid is None else pid
    pcount = jax.process_count() if pcount is None else pcount
    if pcount == 1:
        return dataset
    import dataclasses

    sl = slice(pid, None, pcount)
    return dataclasses.replace(
        dataset,
        rays=dataset.rays[sl],
        rgbs=dataset.rgbs[sl],
        rays_x=dataset.rays_x[sl],
        rays_y=dataset.rays_y[sl],
        fq_mask=dataset.fq_mask[sl],
        images_idx=dataset.images_idx[sl],
        _order=None,
        _cursor=0,
    )


def make_global_batch(sharding, local_batch: dict) -> dict:
    """Host-local numpy batch pytree -> globally-sharded jax.Arrays.

    Single-process: a plain device_put with the sharding.  Multi-process:
    `jax.make_array_from_process_local_data` — each process contributes
    its addressable shards of the global [N_rand, ...] batch; no
    cross-host data movement happens (the data axis stripes align with
    the process-local devices).
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def stripe_indices(n: int, pid: Optional[int] = None, pcount: Optional[int] = None) -> np.ndarray:
    """Indices [pid::pcount] of range(n) — work division for eval renders."""
    pid = jax.process_index() if pid is None else pid
    pcount = jax.process_count() if pcount is None else pcount
    return np.arange(pid, n, pcount)


def allgather_stack(local: np.ndarray, n_total: int, pid: Optional[int] = None,
                    pcount: Optional[int] = None) -> np.ndarray:
    """Reassemble per-process striped results into original order.

    local: [ceil(n_total/pcount), ...] host array of this process's stripe
    (pad the stripe to equal length with zeros when n_total % pcount != 0).
    Returns [n_total, ...] identical on every process.
    """
    pcount = jax.process_count() if pcount is None else pcount
    if pcount == 1:
        return np.asarray(local)[:n_total]
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(np.asarray(local)))
    # gathered: [pcount, per, ...] -> interleave stripes back to index order
    per = gathered.shape[1]
    out = np.empty((pcount * per, *gathered.shape[2:]), gathered.dtype)
    for p in range(pcount):
        out[p::pcount] = gathered[p]
    return out[:n_total]


def broadcast_from_primary(tree: Any) -> Any:
    """One-to-all broadcast of a host pytree (e.g. rebuilt match tables) so
    every process trains with identical CTE tables."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.tree.map(np.asarray, multihost_utils.broadcast_one_to_all(tree))
