"""Standalone worker for the multi-process (multi-host) CPU test.

Launched twice by tests/test_multihost.py with a shared coordinator
address.  Each process gets 2 virtual CPU devices -> a global 4-device
('data',) mesh across 2 processes; runs a few sharded train steps on the
synthetic scene plus a striped eval, and dumps results as JSON for the
parent to cross-check.

Usage: python tests/mp_worker.py <coordinator> <num_procs> <pid> <outfile> <basedir>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, pid, outfile, basedir = sys.argv[1:6]
    num_procs, pid = int(num_procs), int(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives (gloo) back the virtual multi-host mesh
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # newer jax picks a cross-process CPU impl automatically

    from lushnerf_tpu.parallel import distributed as dist

    assert dist.initialize(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 2 * num_procs, jax.device_count()

    import numpy as np

    from lushnerf_tpu.config import Config
    from lushnerf_tpu.train.trainer import Trainer

    from test_train_e2e import synthetic_scene, tiny_config  # noqa: E402

    class _P:  # tmp_path stand-in
        def __truediv__(self, other):
            return os.path.join(basedir, f"p{pid}", other)

    cfg = tiny_config(_P(), N_rand=32, i_testset=6, i_print=2, llffhold=4,
                      tbdir="")
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()

    # dataset must be striped per process (train views only, llffhold split)
    assert len(trainer.dataset) == len(trainer.i_train) * 16 * 16 // num_procs
    assert trainer.local_n_rand == cfg.N_rand // num_procs

    # one global batch: every leaf must be globally shaped with only local
    # shards addressable
    from lushnerf_tpu.parallel.mesh import batch_sharding

    b_np = trainer.dataset.next_batch(trainer.local_n_rand, trainer.np_rng)
    gb = dist.make_global_batch(batch_sharding(trainer.mesh), {"rays": b_np["rays"]})
    assert gb["rays"].shape[0] == cfg.N_rand
    assert len(gb["rays"].addressable_shards) == 2  # local devices only

    # the jitted step must contain a cross-device all-reduce for the grads
    fn = trainer.step_fn("naive")
    out = trainer.train(num_iters=6)

    # params identical across processes after psum-averaged grads:
    # fingerprint them
    leaves = jax.tree_util.tree_leaves(trainer.params)
    fingerprint = float(sum(float(jax.numpy.sum(l)) for l in leaves))

    ev = trainer.eval_testset(7, save=False)

    json.dump(
        {
            "pid": pid,
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "loss": out["loss"],
            "fingerprint": fingerprint,
            "eval_psnr": float(ev["psnr"]),
            "eval_mse": float(ev["mse"]),
        },
        open(outfile, "w"),
    )
    print(f"worker {pid} done")


if __name__ == "__main__":
    main()
