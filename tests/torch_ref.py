"""Helpers for golden-parity testing against the PyTorch reference.

The reference at /root/reference is imported read-only and executed on CPU;
its pure helper functions and (weight-copied) modules provide golden values
for our JAX implementations.  Nothing from the reference is vendored into
the framework — these imports exist only inside the test suite.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import numpy as np

REF_PATH = "/root/reference"

_loaded = {}


def ref_helpers():
    """Import utils.run_lushnerf_helpers from the reference (CPU torch)."""
    if "helpers" not in _loaded:
        if REF_PATH not in sys.path:
            sys.path.insert(0, REF_PATH)
        import torch  # noqa: PLC0415

        # The reference runs under torch.set_default_tensor_type(cuda
        # FloatTensor) (run_lushnerf.py:794), which makes its pytest-mode
        # float64 numpy draws cast to float32.  Reproduce that on CPU.
        torch.set_default_tensor_type("torch.FloatTensor")
        import utils.run_lushnerf_helpers as helpers  # noqa: PLC0415

        _loaded["helpers"] = helpers
    return _loaded["helpers"]


def ref_rigid():
    if "rigid" not in _loaded:
        ref_helpers()
        import utils.rigid_warping as rigid  # noqa: PLC0415

        _loaded["rigid"] = rigid
    return _loaded["rigid"]


def ref_models():
    if "models" not in _loaded:
        ref_helpers()
        import models.lushnerf as ref_lush  # noqa: PLC0415

        _loaded["models"] = ref_lush
    return _loaded["models"]


def make_ref_args(**overrides):
    """args namespace sufficient to build the reference NeRFAll on CPU."""
    base = dict(
        netdepth=8,
        netwidth=32,
        netdepth_fine=8,
        netwidth_fine=32,
        multires=10,
        multires_views=4,
        i_embed=0,
        use_viewdirs=True,
        N_importance=16,
        rgb_activate="sigmoid",
        sigma_activate="relu",
        tone_mapping_type="gamma",
        blur_model_type="none",
        render_rmnearplane=0,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


def t2n(t):
    return t.detach().cpu().numpy()


def _wb(torch_linear, grad: bool):
    """Pick (weight, bias) tensors or their grads (None grad -> zeros —
    torch leaves unused params at None where JAX produces zeros)."""
    import torch

    w, b = torch_linear.weight, torch_linear.bias
    if grad:
        w = w.grad if w.grad is not None else torch.zeros_like(w)
        b = b.grad if b.grad is not None else torch.zeros_like(b)
    return w, b


def copy_linear(torch_linear, grad: bool = False):
    """torch Linear -> (W [in,out], b [out]) numpy pair (our layout)."""
    w, b = _wb(torch_linear, grad)
    return t2n(w).T.copy(), t2n(b).copy()


def copy_nerf_mlp(torch_mlp, grad: bool = False):
    """Reference NeRF / NeRF_Noise module -> our params (or grads) pytree."""
    params = {"pts": [copy_linear(l, grad) for l in torch_mlp.pts_linears]}
    if torch_mlp.use_viewdirs:
        params["feature"] = copy_linear(torch_mlp.feature_linear, grad)
        params["alpha"] = copy_linear(torch_mlp.alpha_linear, grad)
        params["views"] = copy_linear(torch_mlp.views_linears[0], grad)
        params["rgb"] = copy_linear(torch_mlp.rgb_linear, grad)
    else:
        params["output"] = copy_linear(torch_mlp.output_linear, grad)
    return params


def copy_rbk(torch_rbk, embed_layer, grad: bool = False):
    """Reference Rigid_Blurring_Kernel + View_Embedding -> our params."""
    import torch

    emb = embed_layer.view_embed_layer.weight
    if grad:
        emb = emb.grad if emb.grad is not None else torch.zeros_like(emb)
    return {
        "embed": t2n(emb).copy(),
        "trunk": [copy_linear(l, grad) for l in torch_rbk.view_embed_linears],
        "r_branch": [copy_linear(l, grad) for l in torch_rbk.r_branch],
        "r_out": copy_linear(torch_rbk.r_linear, grad),
        "v_branch": [copy_linear(l, grad) for l in torch_rbk.v_branch],
        "v_out": copy_linear(torch_rbk.v_linear, grad),
        "w_branch": [copy_linear(l, grad) for l in torch_rbk.w_branch],
        "w_out": copy_linear(torch_rbk.w_linear, grad),
    }


def build_ref_lush(num_img=3, num_motion=4, netwidth=32, n_importance=16,
                   tone_mapping_type="gamma", seed=4):
    """Full reference NeRFAll + RBK (blur_model_type='dpnerf'), CPU.

    Returns (nerfall, rbk_wrapper, args).  Mirrors run_lushnerf.py:333-345.
    """
    import torch

    ref_lush = ref_models()
    torch.manual_seed(seed)
    rbk_wrap = ref_lush.RBK(
        num_img=num_img, view_embed_ch=64,
        D_rbk=4, W_rbk=64, D_rbk_r=1, W_rbk_r=32, D_rbk_v=1, W_rbk_v=32,
        D_rbk_w=1, W_rbk_w=32, output_ch_rbk_r=3, output_ch_rbk_v=3,
        skips_rbk=[4], rbk_use_origin=True, rbk_se_rv_window=0.1,
        num_motion_rbk=num_motion, use_dpnerf=True,
    )
    args = make_ref_args(
        N_importance=n_importance, netwidth=netwidth, netwidth_fine=netwidth,
        blur_model_type="dpnerf", tone_mapping_type=tone_mapping_type,
    )
    nerfall = ref_lush.NeRFAll(args, rbk_wrap)
    return nerfall, rbk_wrap, args


def copy_nerfall(nerfall, grad: bool = False):
    """Weight-copy (or grad-copy) a full reference NeRFAll -> params pytree."""
    params = {
        "coarse": copy_nerf_mlp(nerfall.mlp_coarse, grad),
        "noise": copy_nerf_mlp(nerfall.mlp_noise_coarse, grad),
        "tonemap": {},
    }
    if nerfall.mlp_fine is not None:
        params["fine"] = copy_nerf_mlp(nerfall.mlp_fine, grad)
    if getattr(nerfall, "blur_kernel_net", None) is not None:
        params["rbk"] = copy_rbk(nerfall.mlp_rbk, nerfall.dbk_view_embedding, grad)
    if nerfall.tonemapping.map_type == "learn":
        import torch

        layers = [m for m in nerfall.tonemapping.linear
                  if isinstance(m, torch.nn.Linear)]
        params["tonemap"] = {"layers": [copy_linear(l, grad) for l in layers]}
    return params


def seeded_rand(*shape):
    """The reference's pytest=True randomness: np.random.seed(0) + rand."""
    np.random.seed(0)
    return np.random.rand(*shape)


import contextlib


@contextlib.contextmanager
def float32_numpy_rand():
    """Make np.random.rand return float32 while active.

    The reference's pytest branches do torch.tensor(np.random.rand(...));
    under its CUDA default-tensor-type this yields float32, but on CPU
    torch 2.x it stays float64 and type-errors against float32 weights.
    Casting the numpy draw (values unchanged) restores the GPU behavior.
    """
    orig = np.random.rand
    np.random.rand = lambda *s: orig(*s).astype(np.float32)
    try:
        yield
    finally:
        np.random.rand = orig
