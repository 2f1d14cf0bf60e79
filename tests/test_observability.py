"""Observability: native TB event writer (validated against TensorBoard's
own loader), rays/s logging, NaN guards, render_factor eval."""

import json

import numpy as np
import pytest

from lushnerf_tpu.train.trainer import Trainer
from lushnerf_tpu.utils.tb_writer import SummaryWriter, _crc32c

from tests.test_train_e2e import synthetic_scene, tiny_config


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tb_writer_roundtrip_with_tensorboard_loader(tmp_path):
    """Events written by the native writer parse with TensorBoard's own
    EventFileLoader bit-for-bit (framing, checksums, proto encoding)."""
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    with SummaryWriter(tmp_path) as w:
        w.add_scalar("Train/Loss", 0.125, 10)
        w.add_scalar("Train/PSNR", 31.5, 10)
        w.add_scalar("Train/Loss", 0.0625, 20)

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb.EventFileLoader(str(files[0])).Load())

    assert events[0].file_version == "brain.Event:2"
    # newer TB loaders migrate simple_value into a rank-0 tensor proto
    def value_of(v):
        return v.tensor.float_val[0] if v.tensor.float_val else v.simple_value

    scalars = [
        (e.step, v.tag, value_of(v))
        for e in events[1:]
        for v in e.summary.value
    ]
    assert scalars == [
        (10, "Train/Loss", 0.125),
        (10, "Train/PSNR", 31.5),
        (20, "Train/Loss", 0.0625),
    ]
    assert all(e.wall_time > 0 for e in events)


def test_trainer_writes_tb_events_and_rays_per_s(tmp_path):
    cfg = tiny_config(tmp_path, i_print=2, i_tensorboard=2)
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()
    trainer.train(num_iters=4)

    tb_files = list((tmp_path / "logs_tb" / "test_exp").glob("events.out.tfevents.*"))
    assert tb_files, "no TB event file written"
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    tags = {
        v.tag
        for e in tb.EventFileLoader(str(tb_files[0])).Load()
        for v in e.summary.value
    }
    assert {"Train/Loss", "Train/PSNR"} <= tags

    lines = [json.loads(l) for l in open(trainer.log_file)]
    assert all("rays_per_s" in l and l["rays_per_s"] > 0 for l in lines)


def test_nan_guard_raises(tmp_path):
    cfg = tiny_config(tmp_path, debug_nan_check=True)
    trainer = Trainer(cfg, data=synthetic_scene())
    trainer.setup()
    # poison one weight -> loss goes NaN on the first step
    import jax

    params = jax.device_get(trainer.params)
    params["coarse"]["pts"][0] = (
        np.full_like(params["coarse"]["pts"][0][0], np.nan),
        params["coarse"]["pts"][0][1],
    )
    trainer.params = jax.device_put(params)
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.train(num_iters=1)


def test_render_factor_downsamples_eval(tmp_path):
    cfg = tiny_config(tmp_path, render_factor=2, i_testset=10**9)
    trainer = Trainer(cfg, data=synthetic_scene(H=16, W=16))
    trainer.setup()
    assert (trainer.H_eval, trainer.W_eval) == (8, 8)
    rgb, noise_img, depth = trainer.render_pose(trainer.poses[0])
    assert rgb.shape == (8, 8, 3)
    assert depth.shape == (8, 8)
    metrics = trainer.eval_testset(1, save=False)
    assert np.isfinite(metrics["psnr"])
