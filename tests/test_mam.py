"""MAM golden parity: weight-copied Correlation_Module + full
Motion_Aggregation_Module vs the reference models/mam.py:13-85 at random
inputs (round-1 gap: MAM only had shape/finiteness coverage — the
softmax/einsum axes here are exactly what silently diverges)."""

import numpy as np
import torch

import jax.numpy as jnp

from lushnerf_tpu.models.mam import apply_mam, correlation_module, init_mam

from tests.torch_ref import copy_linear, ref_helpers


def _ref_mam(in_channels=32, num_motion=4, seed=5):
    ref_helpers()  # sets torch default tensor type / sys.path
    import models.mam as ref_mam

    torch.manual_seed(seed)
    return ref_mam.Motion_Aggregation_Module(in_channels, k=0, num_motion=num_motion)


def _conv1d_w(m):
    # torch Conv1d k=1 bias=False [out, in, 1] -> ours [in, out]
    return m.weight.detach().numpy()[:, :, 0].T.copy()


def _copy_mam(ref, in_channels, num_motion):
    corr = ref.Corr
    return {
        "conva": jnp.asarray(_conv1d_w(corr.conva)),
        "convb": jnp.asarray(_conv1d_w(corr.convb)),
        "convc": jnp.asarray(_conv1d_w(corr.convc)),
        "convn": jnp.asarray(_conv1d_w(corr.convn)),
        "convl": jnp.asarray(_conv1d_w(corr.convl)),
        "convd": jnp.asarray(_conv1d_w(corr.convd[0])),
        "convd_bn": (
            jnp.asarray(corr.convd[1].weight.detach().numpy()),
            jnp.asarray(corr.convd[1].bias.detach().numpy()),
        ),
        # Conv2d(C, 1, 1, bias=False): [1, C, 1, 1] -> [C, 1]
        "line_att": jnp.asarray(corr.line_conv_att.weight.detach().numpy()[:, :, 0, 0].T.copy()),
        "linear": copy_linear(ref.linear),
        "num_motion": num_motion,
    }


def test_correlation_module_matches_reference():
    C, M1 = 32, 5
    ref = _ref_mam(C, M1 - 1)
    ref.train()
    params = _copy_mam(ref, C, M1 - 1)

    rng = np.random.default_rng(6)
    B, N, L = 3, M1, 7
    x = rng.standard_normal((B, C, N)).astype(np.float32)
    curves = rng.standard_normal((B, C, N, L)).astype(np.float32)

    ref_out = ref.Corr(torch.from_numpy(x), torch.from_numpy(curves)).detach().numpy()
    ours = np.asarray(correlation_module(params, jnp.asarray(x), jnp.asarray(curves)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_mam_forward_matches_reference():
    C, M = 32, 4
    M1 = M + 1
    ref = _ref_mam(C, M)
    ref.train()
    params = _copy_mam(ref, C, M)

    rng = np.random.default_rng(7)
    n_ray, L = 6, 9
    x_global = rng.standard_normal((n_ray, M1, C)).astype(np.float32)
    x_local = rng.standard_normal((n_ray * M1, L, 64)).astype(np.float32)

    ref_out = (
        ref(torch.from_numpy(x_global), torch.from_numpy(x_local)).detach().numpy()
    )
    ours = np.asarray(apply_mam(params, jnp.asarray(x_global), jnp.asarray(x_local)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_mam_init_shapes_match_copy():
    """init_mam produces the same pytree structure the converter emits."""
    import jax

    C, M = 32, 4
    ref = _ref_mam(C, M)
    copied = _copy_mam(ref, C, M)
    inited = init_mam(jax.random.PRNGKey(0), C, M)
    assert set(copied) == set(inited)
    for k in copied:
        if k == "num_motion":
            assert copied[k] == inited[k]
            continue
        ca = jax.tree.leaves(copied[k])
        cb = jax.tree.leaves(inited[k])
        for a, b in zip(ca, cb):
            assert np.asarray(a).shape == np.asarray(b).shape, k
