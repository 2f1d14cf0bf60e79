"""Torch checkpoint -> JAX params conversion for the DKM port.

Parameters are keyed by their torch state-dict names, so conversion is a
filter + dtype cast.  Handles the LuSh checkpoint key cleanup
(run_lushnerf.py:352-356): strips a leading 'model.' and drops the unused
classifier head 'encoder.net.fc'.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_SKIP_SUBSTR = ("encoder.net.fc", "num_batches_tracked")


def from_torch_state_dict(state_dict) -> Dict[str, jnp.ndarray]:
    params: Dict[str, jnp.ndarray] = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model.") :]
        if any(s in k for s in _SKIP_SUBSTR):
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        params[k] = jnp.asarray(arr, jnp.float32)
    return params


def load_torch_checkpoint(path: str) -> Dict[str, jnp.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return from_torch_state_dict(sd)
