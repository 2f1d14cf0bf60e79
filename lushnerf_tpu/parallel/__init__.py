"""Device mesh + sharding rules (SPMD over rays; params replicated)."""

from lushnerf_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
