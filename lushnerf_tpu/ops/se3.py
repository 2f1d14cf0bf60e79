"""SE(3) screw-axis exponential map (Rodrigues), batched.

Matches the reference warp field (utils/rigid_warping.py:20-134):
  warp(pts, rot, trans):
    theta = |rot| + 1e-10; unit axis w = rot/theta; v = trans/theta
    R = I + sin(theta) W + (1-cos(theta)) W^2          (exp_so3)
    p = (theta I + (1-cos(theta)) W + (theta-sin(theta)) W^2) v
    warped = R @ pts + p   (homogeneous form in the reference; w-component
                            is always exactly 1, so the division is identity)

TPU-first design: instead of materializing [N,4,4] matrices and doing
batched 4x4 matmuls (the reference's torch path), we apply the rotation
with cross products directly — pure VPU elementwise math, no tiny matmuls
that waste the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cross(a, b):
    return jnp.cross(a, b)


def exp_so3(w, theta, pts):
    """Rotate pts by angle theta about unit axis w (Rodrigues).

    w: [..., 3] unit axis; theta: [...]; pts: [..., 3].
    R @ p = p + sin(t) (w x p) + (1-cos(t)) (w x (w x p))
    """
    t = theta[..., None]
    wxp = _cross(w, pts)
    wxwxp = _cross(w, wxp)
    return pts + jnp.sin(t) * wxp + (1.0 - jnp.cos(t)) * wxwxp


def exp_se3(w, v, theta, pts):
    """Apply the SE(3) exponential of screw axis (w, v) with magnitude theta.

    Returns R @ pts + p with
      p = (theta I + (1-cos) W + (theta - sin) W^2) v
        = theta v + (1-cos)(w x v) + (theta - sin)(w x (w x v)).
    """
    t = theta[..., None]
    rotated = exp_so3(w, theta, pts)
    wxv = _cross(w, v)
    wxwxv = _cross(w, wxv)
    p = t * v + (1.0 - jnp.cos(t)) * wxv + (t - jnp.sin(t)) * wxwxv
    return rotated + p


def se3_warp(pts, rot, trans, eps: float = 1.0e-10):
    """Warp points by the SE(3) exp of (rot, trans), reference semantics.

    pts, rot, trans: [..., 3].  theta = |rot| + eps (reference adds eps
    before normalizing, utils/rigid_warping.py:31-34).
    """
    theta = jnp.linalg.norm(rot, axis=-1) + eps
    w = rot / theta[..., None]
    v = trans / theta[..., None]
    return exp_se3(w, v, theta, pts)
