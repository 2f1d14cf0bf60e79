#!/usr/bin/env python
"""CLI entry point, reference-compatible:

    python run_lushnerf_tpu.py --config configs/poster_lushnerf
    python run_lushnerf_tpu.py --config configs/poster_lushnerf --render_only --render_test

Accepts the reference's flags and scene-config files verbatim
(run_lushnerf.py:32-229); see lushnerf_tpu/config.py for the TPU-specific
additions.
"""

import sys

from lushnerf_tpu.config import Config
from lushnerf_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = Config.from_args(argv if argv is not None else sys.argv[1:])
    # multi-host: must run before any device access (parallel/distributed.py)
    from lushnerf_tpu.parallel import distributed as dist

    if dist.initialize(cfg.coordinator_address, cfg.num_processes,
                       cfg.process_id, cfg.local_device_ids):
        import jax

        print(f"[dist] process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    trainer = Trainer(cfg)
    trainer.setup()
    if cfg.save_warped_ray_img:
        out = trainer.save_warped_ray_img()
        print("Warped rays and imgs are saved:", out)
        return
    if cfg.render_only:
        out = trainer.render_only(render_test=cfg.render_test)
        print("RENDER ONLY done:", out)
        return
    trainer.train()


if __name__ == "__main__":
    main()
