"""Config parsing: reference scene-config files must load verbatim."""

from pathlib import Path

import pytest

from lushnerf_tpu.config import Config

REF_CONFIGS = Path("/root/reference/configs")


def test_parse_reference_poster_config():
    cfg = Config.from_file(REF_CONFIGS / "poster_lushnerf")
    assert cfg.expname == "poster_lushnerf"
    assert cfg.N_rand == 1024
    assert cfg.N_samples == 64
    assert cfg.N_importance == 64
    assert cfg.N_iters == 100000
    assert cfg.lrate == 5e-4
    assert cfg.lrate_decay == 250
    assert cfg.scaleup_gamma == 1.0
    assert cfg.scaleup_clahe == 10
    assert cfg.use_viewdirs is True
    assert cfg.raw_noise_std == 1.0
    assert cfg.blur_model_type == "dpnerf"
    assert cfg.allkernel_start_iter == 60000
    assert cfg.kernel_start_iter == 1200
    assert cfg.noisenerf_start_iter == 60000
    assert cfg.fq_threshold == 30
    assert cfg.tone_mapping_type == "gamma"
    assert cfg.render_rmnearplane == 80
    assert cfg.use_dpnerf is True
    assert cfg.rbk_use_origin is True
    assert cfg.rbk_num_motion == 4
    assert cfg.rbk_se_rv_window == 0.1
    assert cfg.rbk_view_embed_ch == 64
    assert cfg.factor == 1


def test_parse_all_reference_configs():
    for f in REF_CONFIGS.iterdir():
        cfg = Config.from_file(f)
        assert cfg.blur_model_type == "dpnerf"
        assert cfg.N_samples == 64


def test_cli_overrides_file():
    cfg = Config.from_args(
        ["--config", str(REF_CONFIGS / "poster_lushnerf"), "--N_rand", "512", "--no_reload"]
    )
    assert cfg.N_rand == 512
    assert cfg.no_reload is True
    assert cfg.N_samples == 64  # from file


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config.parse_kv_lines("not_a_real_key = 3")


def test_derived_model_configs():
    cfg = Config.from_file(REF_CONFIGS / "poster_lushnerf")
    cfg.num_images = 29
    lush = cfg.lush_config()
    assert lush.render.n_samples == 64
    assert lush.render.input_ch == 63
    assert lush.render.input_ch_views == 27
    assert lush.rbk.num_motion == 4
    assert lush.rbk.num_images == 29
    assert lush.noise_cfg.depth == 4
    assert lush.noise_cfg.width == 128
    assert lush.noise_cfg.rgb_only is True
