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


def copy_linear(torch_linear):
    """torch Linear -> (W [in,out], b [out]) numpy pair (our layout)."""
    return t2n(torch_linear.weight).T.copy(), t2n(torch_linear.bias).copy()


def copy_nerf_mlp(torch_mlp):
    """Reference NeRF / NeRF_Noise module -> our params pytree."""
    params = {"pts": [copy_linear(l) for l in torch_mlp.pts_linears]}
    if torch_mlp.use_viewdirs:
        params["feature"] = copy_linear(torch_mlp.feature_linear)
        params["alpha"] = copy_linear(torch_mlp.alpha_linear)
        params["views"] = copy_linear(torch_mlp.views_linears[0])
        params["rgb"] = copy_linear(torch_mlp.rgb_linear)
    else:
        params["output"] = copy_linear(torch_mlp.output_linear)
    return params


def copy_rbk(torch_rbk, embed_layer):
    """Reference Rigid_Blurring_Kernel + View_Embedding -> our params."""
    return {
        "embed": t2n(embed_layer.view_embed_layer.weight).copy(),
        "trunk": [copy_linear(l) for l in torch_rbk.view_embed_linears],
        "r_branch": [copy_linear(l) for l in torch_rbk.r_branch],
        "r_out": copy_linear(torch_rbk.r_linear),
        "v_branch": [copy_linear(l) for l in torch_rbk.v_branch],
        "v_out": copy_linear(torch_rbk.v_linear),
        "w_branch": [copy_linear(l) for l in torch_rbk.w_branch],
        "w_out": copy_linear(torch_rbk.w_linear),
    }


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
