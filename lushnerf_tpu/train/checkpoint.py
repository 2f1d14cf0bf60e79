"""Checkpoint / resume.

Reference behavior (run_lushnerf.py:374-389, 687-694): save
{global_step, model state, optimizer state} every i_weights iters to
`<basedir>/<expname>/NNNNNN.tar`; on startup auto-resume from the
lexicographically-last checkpoint unless --no_reload; --ft_path overrides.

Here: msgpack serialization of the {step, params, opt_state} pytree via
flax.serialization to `NNNNNN.ckpt` files, same directory contract.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
from flax import serialization

CKPT_RE = re.compile(r"^(\d{6})\.ckpt$")


def save_checkpoint(exp_dir: str | Path, step: int, params: Any, opt_state: Any) -> Path:
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    state = {
        "global_step": step,
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    path = exp_dir / f"{step:06d}.ckpt"
    path.write_bytes(serialization.to_bytes(state))
    return path


def latest_checkpoint(exp_dir: str | Path) -> Optional[Path]:
    exp_dir = Path(exp_dir)
    if not exp_dir.exists():
        return None
    ckpts = sorted(f for f in os.listdir(exp_dir) if CKPT_RE.match(f))
    return exp_dir / ckpts[-1] if ckpts else None


def load_checkpoint(path: str | Path, params_template: Any, opt_state_template: Any) -> Tuple[int, Any, Any]:
    """Restore into the given pytree templates (shapes must match)."""
    target = {"global_step": 0, "params": params_template, "opt_state": opt_state_template}
    state = serialization.from_bytes(target, Path(path).read_bytes())
    return int(state["global_step"]), state["params"], state["opt_state"]
