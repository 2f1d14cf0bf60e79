"""GroundTruthMatcher: geometry-exact CTE correspondences on the
synthetic scene (VERDICT r3 next #7) + the bundle-centering gauge fix
(VERDICT r3 weak #2) + the SND ablation switch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from scripts.make_synthetic_scene import make_scene

    out = tmp_path_factory.mktemp("gtscene")
    make_scene(out, n=6, H=64, W=64, seed=3, supersample=1, clean_test_every=0)
    return out


@pytest.fixture(scope="module")
def loaded(scene):
    from lushnerf_tpu.data.llff import load_llff_data

    data = load_llff_data(scene, factor=1, recenter=True, bd_factor=0.75)
    poses = data.poses[:, :3, :4]
    hwf = data.poses[0, :3, -1]
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    raw_bds = np.load(scene / "poses_bounds.npy")[:, -2:]
    sc = 1.0 / (raw_bds.min() * 0.75)
    depths = np.stack(
        [np.load(p) for p in sorted((scene / "depth").glob("*.npy"))]
    ).astype(np.float32) * sc
    return poses, H, W, focal, depths


def _matcher(loaded, n_points=64):
    from lushnerf_tpu.matcher.api import GroundTruthMatcher

    poses, H, W, focal, depths = loaded
    return GroundTruthMatcher(
        poses=poses, focal=focal, H=H, W=W, depths=depths, n_points=n_points
    )


def test_self_match_is_identity(loaded):
    m = _matcher(loaded)
    img = np.zeros((64, 64, 3), np.float32)
    k0, k1, c = m.match_idx(0, 0, img, img)
    assert c.max() > 0
    conf = c > 0
    np.testing.assert_allclose(k0[conf], k1[conf], atol=0.75)


def test_cross_view_matches_are_nonidentity_and_cycle_consistent(loaded):
    """k->v matches must show real parallax, and reprojecting the matched
    v-pixel back through v's depth must land on the source pixel."""
    m = _matcher(loaded, n_points=256)
    poses, H, W, focal, depths = loaded
    img = np.zeros((H, W, 3), np.float32)
    k, v = 0, 3
    k0, k1, c = m.match_idx(k, v, img, img)
    conf = c > 0
    assert conf.sum() > 30  # plenty of covisible, unoccluded points
    # real parallax: matched coordinates differ from identity for most pts
    disp = np.linalg.norm(k1[conf] - k0[conf], axis=-1)
    assert np.median(disp) > 0.5, f"matches look like the identity grid: {np.median(disp)}"

    # cycle: match v -> k on the same grid machinery
    b0, b1, cb = m.match_idx(v, k, img, img)
    # unproject k0 through view k depth, project into v == k1 (already
    # what match_idx did); now verify the *independent* v->k direction
    # agrees where both are confident: for each confident k->v match,
    # find the v->k grid point nearest to k1 and check its target is
    # near k0 (depth-map quantization allows ~1.5 px)
    src = b0[cb > 0]
    dst = b1[cb > 0]
    errs = []
    for a, b in zip(k1[conf][:50], k0[conf][:50]):
        d2 = np.sum((src - a) ** 2, axis=-1)
        j = int(np.argmin(d2))
        if d2[j] < 4.0**2:  # a grid point close to the matched pixel
            # linear approx: the cycle error = |dst_j + (a - src_j)*J - b|;
            # just require the coarse agreement within grid spacing
            errs.append(np.linalg.norm(dst[j] - b))
    assert len(errs) > 10
    assert np.median(errs) < 6.0  # grid spacing is 4 px at 64x64/16x16


def test_occlusion_gives_zero_certainty(loaded):
    """Points behind the big spheres in the target view are flagged."""
    m = _matcher(loaded, n_points=1024)
    poses, H, W, focal, depths = loaded
    img = np.zeros((H, W, 3), np.float32)
    total_conf = 0
    any_occluded = False
    for v in range(1, 6):
        k0, k1, c = m.match_idx(0, v, img, img)
        total_conf += int((c > 0).sum())
        # in-bounds but occluded points exist in this scene geometry
        if ((c == 0).sum()) > 0:
            any_occluded = True
    assert total_conf > 1000
    assert any_occluded


def test_table_build_and_sampling(loaded):
    from lushnerf_tpu.matcher.api import build_match_tables

    m = _matcher(loaded, n_points=64)
    poses, H, W, focal, depths = loaded
    imgs = np.zeros((6, H, W, 3), np.float32)
    tables = build_match_tables(m, imgs)
    assert tables.kpts.shape == (6, 6, 64, 4)
    rng = np.random.default_rng(0)
    anchor, pix, cert = tables.sample_anchor(rng, 8)
    assert pix.shape == (6, 8, 2) and cert.shape == (6, 8)


# ---------------------------------------------------------------------------
# bundle centering
# ---------------------------------------------------------------------------


def test_center_bundle_pins_weighted_mean():
    from lushnerf_tpu.models.rbk import RBKConfig, apply_rbk, init_rbk

    cfg = RBKConfig(num_images=4, num_motion=4, use_origin=True, center_bundle=True)
    # large rv_window + random params => visible warps
    cfg = cfg.__class__(**{**cfg.__dict__, "rv_window": 0.5})
    params = init_rbk(jax.random.PRNGKey(0), cfg)
    # blow up the head weights so warps are far from identity
    params["r_out"] = (params["r_out"][0] * 1e5, params["r_out"][1])
    params["v_out"] = (params["v_out"][0] * 1e5, params["v_out"][1])

    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.standard_normal((16, 3, 2)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 4, 16, dtype=np.int32))
    sub, ccw = apply_rbk(params, cfg, rays, idx)
    mean = jnp.einsum("nm,nmdc->ndc", ccw, sub)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(rays), atol=1e-5)
    # and the bundle is NOT degenerate (sub-rays differ from each other)
    spread = jnp.std(sub, axis=1).max()
    assert float(spread) > 1e-3


def test_center_bundle_zeroes_anchor_drift():
    """With centering on, forward_kernel's rbk_drift is ~0 by construction."""
    from lushnerf_tpu.config import Config

    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params

    cfg = Config(
        num_images=3, N_samples=10, N_importance=4, netdepth=2, netwidth=16,
        netdepth_fine=2, netwidth_fine=16, multires=4, multires_views=2,
        use_viewdirs=True, blur_model_type="dpnerf", rbk_use_origin=True,
        rbk_num_motion=2, rbk_view_embed_ch=8, rbk_enc_brc_width=8,
        rbk_se_r_width=8, rbk_se_v_width=8, rbk_ccw_width=8,
        rbk_center_bundle=True, tone_mapping_type="gamma", point_chunk=0,
    )
    lc = cfg.lush_config()
    params = init_lush_params(jax.random.PRNGKey(0), lc)
    rng = np.random.default_rng(1)
    rays_o = (0.1 * rng.standard_normal((8, 3))).astype(np.float32)
    rays_d = rng.standard_normal((8, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = jnp.asarray(np.stack([rays_o, rays_d], axis=-1))
    idx = jnp.asarray(rng.integers(0, 3, 8, dtype=np.int32))
    out = forward_kernel(params, lc, 16, 16, 12.0, rays, idx, jax.random.PRNGKey(2))
    assert float(out["rbk_drift"]) < 1e-9


def test_trainer_gt_matcher_end_to_end(scene, tmp_path):
    """Trainer with matcher=gt: depth maps load + bd-rescale, the CTE gate
    crosses, a live rematch builds non-identity tables (the round-4
    geometry-true CTE path, end to end on CPU)."""
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.train.trainer import Trainer

    cfg = Config(
        expname="gt_e2e", basedir=str(tmp_path), tbdir="",
        datadir=str(scene), factor=1, llffhold=8,
        N_rand=32, N_samples=18, N_importance=6, netdepth=2, netwidth=16,
        netdepth_fine=2, netwidth_fine=16, multires=4, multires_views=2,
        use_viewdirs=True, raw_noise_std=1.0, blur_model_type="dpnerf",
        use_dpnerf=True, rbk_use_origin=True, rbk_num_motion=2,
        rbk_view_embed_ch=8, rbk_enc_brc_width=8, rbk_se_r_width=8,
        rbk_se_v_width=8, rbk_ccw_width=8, rbk_center_bundle=True,
        tone_mapping_type="gamma", tonemap_eps=1e-4, point_chunk=0,
        ray_chunk_eval=256, kernel_start_iter=2, allkernel_start_iter=3,
        noisenerf_start_iter=3, rematch_interval=5, matcher="gt",
        consist_num_pixels=8, i_print=2, i_weights=10**9, i_testset=10**9,
        render_factor=2,
    )
    trainer = Trainer(cfg)
    trainer.setup()
    from lushnerf_tpu.matcher.api import GroundTruthMatcher

    assert isinstance(trainer._matcher, GroundTruthMatcher)
    out = trainer.train(num_iters=6)  # rematch fires at 5 (>= consist gate)
    assert np.isfinite(out["loss"])
    tb = trainer.match_tables
    assert float(tb.certainty.max()) > 0, "rematch left zero tables"
    # geometry-true matches are NON-identity for cross-view pairs
    k, v = 0, 2
    kp, c = tb.kpts[k, v], tb.certainty[k, v]
    disp = np.linalg.norm(kp[c > 0][:, :2] - kp[c > 0][:, 2:], axis=-1)
    assert len(disp) > 5 and float(np.median(disp)) > 0.3


def test_gamma_tonemap_pole_and_eps_guard():
    """d/dx x^(1/2.2) is a pole at x=0 (f32 sigmoid saturates to exactly
    0 for logits < ~-103, so training CAN reach it — it NaN'ed the
    heavy-blur SND run); tonemap_eps=1e-4 bounds the gradient while
    changing nothing above eps."""
    from lushnerf_tpu.models.tonemap import apply_tonemap

    g = jax.grad(lambda x: jnp.sum(apply_tonemap({}, "gamma", x)))
    x0 = jnp.array([0.0, 0.5])
    assert not bool(jnp.isfinite(g(x0)).all())  # the reference's pole

    g_eps = jax.grad(lambda x: jnp.sum(apply_tonemap({}, "gamma", x, eps=1e-4)))
    gv = g_eps(x0)
    assert bool(jnp.isfinite(gv).all())
    assert float(gv.max()) < 40.0
    # the floor is gradient-PRESERVING (ADVICE r4 #1): a saturated-dark
    # pixel (x=0) keeps a strictly positive recovery gradient
    assert float(gv[0]) > 0.0
    # ... at a bounded value shift: |(x+eps)^(1/2.2) - x^(1/2.2)| <=
    # eps^(1/2.2) ~= 0.015 at eps=1e-4, vanishing for bright pixels
    x1 = jnp.array([0.001, 0.5, 1.0])
    d = np.abs(
        np.asarray(apply_tonemap({}, "gamma", x1, eps=1e-4))
        - np.asarray(apply_tonemap({}, "gamma", x1))
    )
    assert d.max() <= 1e-4 ** (1 / 2.2) + 1e-7
    assert d[-1] < 1e-4  # bright pixels essentially untouched
    # f32 sigmoid really does saturate to exactly 0
    assert float(jax.nn.sigmoid(jnp.float32(-110.0))) == 0.0


def test_guard_dz_replaces_degenerate_subrays():
    """Root-caused round-4 NaN: a zero-weight RBK motion drifts until its
    warped direction crosses the image plane; ndc_rays divides by dz and
    the ~1e7-scale coordinates overflow the PE.  guard_dz swaps such
    sub-rays for the original ray BEFORE projection."""
    from lushnerf_tpu.models.rbk import RBKConfig, apply_rbk, init_rbk
    from lushnerf_tpu.models.renderer import RenderConfig, prepare_rays

    rng = np.random.default_rng(0)
    rays_o = (0.05 * rng.standard_normal((16, 3))).astype(np.float32)
    # straight-down-z rays: a 90-degree rotation about x sends dz to ~0
    rays_d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (16, 1))
    rays = jnp.asarray(np.stack([rays_o, rays_d], axis=-1))
    idx = jnp.zeros((16,), jnp.int32)

    outs = {}
    for guard in (False, True):
        cfg = RBKConfig(num_images=1, num_motion=2, use_origin=True,
                        rv_window=0.1, guard_dz=guard)
        params = init_rbk(jax.random.PRNGKey(0), cfg)
        # force motion 1 to a ~90-degree rotation about x: dz -> ~0
        r_w, r_b = params["r_out"]
        r_b = np.zeros_like(np.asarray(r_b))
        # reference layout: reshape(-1, 3, M); motion m, axis a -> a*M+m
        r_b[0 * cfg.num_motion + 1] = np.pi / 2 / cfg.rv_window
        params["r_out"] = (jnp.zeros_like(r_w), jnp.asarray(r_b))
        params["v_out"] = (jnp.zeros_like(params["v_out"][0]),
                           jnp.zeros_like(params["v_out"][1]))
        sub, ccw = apply_rbk(params, cfg, rays, idx)
        dz = np.asarray(sub[..., 2, 1])
        if not guard:
            assert (dz > -1e-3).any(), "setup must create a degenerate sub-ray"
        else:
            assert (dz < -1e-3).all(), "guard must remove all degenerate sub-rays"
        rc = RenderConfig()
        flat = sub.reshape(-1, 3, 2)
        prep = prepare_rays(rc, 64, 64, 48.0, flat[..., 0], flat[..., 1], 0.0, 1.0)
        outs[guard] = float(jnp.max(jnp.abs(prep["rays_o"])))
    assert outs[False] > 1e3, f"unguarded NDC origin should blow up, got {outs[False]}"
    assert outs[True] < 1e2, f"guarded NDC origin should stay sane, got {outs[True]}"


def test_snd_bias_init_sets_noise_floor():
    """snd_bias_init=-3 must start the noise head at 0.1*sigmoid(-3)
    (~0.0047) instead of the reference's ~0.05; 0.0 = reference init."""
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.models.lushnerf import init_lush_params

    base = dict(
        num_images=2, N_samples=18, N_importance=4, netdepth=2, netwidth=16,
        netdepth_fine=2, netwidth_fine=16, multires=4, multires_views=2,
        use_viewdirs=True, blur_model_type="dpnerf", rbk_use_origin=True,
        rbk_num_motion=2, rbk_view_embed_ch=8, rbk_enc_brc_width=8,
        rbk_se_r_width=8, rbk_se_v_width=8, rbk_ccw_width=8,
    )
    p_ref = init_lush_params(jax.random.PRNGKey(0), Config(**base).lush_config())
    p_dark = init_lush_params(
        jax.random.PRNGKey(0), Config(snd_bias_init=-3.0, **base).lush_config()
    )
    b_ref = np.asarray(p_ref["noise"]["rgb"][1])
    b_dark = np.asarray(p_dark["noise"]["rgb"][1])
    assert not np.allclose(b_ref, -3.0)  # torch-default uniform init
    np.testing.assert_allclose(b_dark, -3.0)
    # weights untouched
    np.testing.assert_array_equal(
        np.asarray(p_ref["noise"]["rgb"][0]), np.asarray(p_dark["noise"]["rgb"][0])
    )


def test_pallas_tile_config_plumbs_to_render_config():
    from lushnerf_tpu.config import Config

    assert Config(pallas_tile="").render_config().mlp_tile == (0, 0)
    assert Config(pallas_tile="4096").render_config().mlp_tile == (4096, 4096)
    assert Config(pallas_tile="2048,1024").render_config().mlp_tile == (2048, 1024)


def test_use_snd_false_removes_noise():
    from lushnerf_tpu.config import Config
    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params

    base = dict(
        num_images=3, N_samples=10, N_importance=4, netdepth=2, netwidth=16,
        netdepth_fine=2, netwidth_fine=16, multires=4, multires_views=2,
        use_viewdirs=True, blur_model_type="dpnerf", rbk_use_origin=True,
        rbk_num_motion=2, rbk_view_embed_ch=8, rbk_enc_brc_width=8,
        rbk_se_r_width=8, rbk_se_v_width=8, rbk_ccw_width=8,
        tone_mapping_type="gamma", point_chunk=0,
    )
    rng = np.random.default_rng(1)
    rays_o = (0.1 * rng.standard_normal((8, 3))).astype(np.float32)
    rays_d = rng.standard_normal((8, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = jnp.asarray(np.stack([rays_o, rays_d], axis=-1))
    idx = jnp.asarray(rng.integers(0, 3, 8, dtype=np.int32))

    outs = {}
    for use_snd in (True, False):
        cfg = Config(use_snd=use_snd, **base)
        lc = cfg.lush_config()
        params = init_lush_params(jax.random.PRNGKey(0), lc)
        outs[use_snd] = forward_kernel(
            params, lc, 16, 16, 12.0, rays, idx, jax.random.PRNGKey(2)
        )
    assert float(jnp.abs(outs[False]["rgb_noise"]).max()) == 0.0
    assert float(jnp.abs(outs[True]["rgb_noise"]).max()) > 0.0
    # pure (no-noise) branches agree between the two models
    np.testing.assert_allclose(
        np.asarray(outs[True]["rgb_pure"]), np.asarray(outs[False]["rgb_pure"]),
        atol=1e-6,
    )


def test_rbk_spread_l1_gate():
    """rbk_spread (the L1 blur-dispersion gate, VERDICT r4 #10) must be
    ~0 for an identity kernel, grow with real dispersion, and its
    gradient must SHRINK the motion magnitudes."""
    from lushnerf_tpu.config import Config

    cfg = Config(
        num_images=2, N_samples=18, N_importance=4, netdepth=2, netwidth=16,
        netdepth_fine=2, netwidth_fine=16, multires=4, multires_views=2,
        use_viewdirs=True, blur_model_type="dpnerf", rbk_use_origin=True,
        rbk_num_motion=2, rbk_view_embed_ch=8, rbk_enc_brc_width=8,
        rbk_se_r_width=8, rbk_se_v_width=8, rbk_ccw_width=8,
        tone_mapping_type="gamma", point_chunk=0, rbk_spread_l1=1e-2,
        rbk_zero_head_bias=True,
    )
    lush = cfg.lush_config()
    from lushnerf_tpu.models.lushnerf import forward_kernel, init_lush_params

    params = init_lush_params(jax.random.PRNGKey(0), lush)
    rng = np.random.default_rng(0)
    rays_o = (0.05 * rng.standard_normal((8, 3))).astype(np.float32)
    rays_d = rng.standard_normal((8, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = jnp.asarray(np.stack([rays_o, rays_d], axis=-1))
    idx = jnp.zeros((8,), jnp.int32)

    out = forward_kernel(params, lush, 16, 16, 12.0, rays, idx,
                         jax.random.PRNGKey(1))
    # near-identity init (1e-5 xavier gain): spread is tiny
    assert float(out["rbk_spread"]) < 1e-3

    # inject a real motion -> spread grows
    v_w, v_b = params["rbk"]["v_out"]
    v_b = np.zeros_like(np.asarray(v_b))
    v_b[0 * lush.rbk.num_motion + 0] = 1.0  # x-translation, motion 0
    params2 = dict(params, rbk=dict(params["rbk"], v_out=(v_w, jnp.asarray(v_b))))
    out2 = forward_kernel(params2, lush, 16, 16, 12.0, rays, idx,
                          jax.random.PRNGKey(1))
    assert float(out2["rbk_spread"]) > 10 * float(out["rbk_spread"])

    # L1 gradient shrinks the motion: d spread / d |v_bias| > 0
    def spread_of(b0):
        vb = jnp.asarray(v_b).at[0].set(b0)
        p = dict(params, rbk=dict(params["rbk"], v_out=(v_w, vb)))
        return forward_kernel(p, lush, 16, 16, 12.0, rays, idx,
                              jax.random.PRNGKey(1))["rbk_spread"]

    g = jax.grad(spread_of)(jnp.float32(1.0))
    assert float(g) > 0.0
