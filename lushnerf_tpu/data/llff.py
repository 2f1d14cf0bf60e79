"""LLFF forward-facing dataset loader.

Covers the reference's data path (data_utils/load_llff.py):
  * poses_bounds.npy parsing ([N, 17] -> poses [3,5,N] + bds [2,N], :146-149)
  * factor-based image minification (:8-57) — done with cv2 INTER_AREA
    instead of shelling out to ImageMagick `mogrify`
  * low-light preprocessing cache (`images{sfx}_preprocess`, :164-171)
  * axis correction [-y x z], bd rescale by 1/(bds.min()*bd_factor),
    pose recentering (:262-273), optional spherify (:279-334)
  * spiral / epi render-path generation (:234-259)
  * holdout view selection (closest-to-average pose, :400-402)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import NamedTuple

import cv2
import imageio.v2 as imageio
import numpy as np

from lushnerf_tpu.data.preprocess import preprocessed_dir


def _normalize(x):
    return x / np.linalg.norm(x)


def _viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([_viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses):
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    p44 = np.concatenate([poses[:, :3, :4], bottom], -2)
    p44 = np.linalg.inv(c2w) @ p44
    poses_[:, :3, :4] = p44[:, :3, :4]
    return poses_


def render_path_spiral(c2w, up, rads, focal, zrate, rots, N):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(c2w[:3, :4], np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]) * rads)
        z = _normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([_viewmatrix(z, up, c), hwf], 1))
    return render_poses


def render_path_epi(c2w, up, rads, N):
    render_poses = []
    hwf = c2w[:, 4:5]
    for theta in np.linspace(-1, 1, N + 1)[:-1]:
        c = np.dot(c2w[:3, :4], np.array([theta, 0, 0, 1.0]) * rads)
        z = _normalize(np.dot(c2w[:3, :4], np.array([0, 0, 1, 0.0])))
        render_poses.append(np.concatenate([_viewmatrix(z, up, c), hwf], 1))
    return render_poses


def spherify_poses(poses, bds):
    p34_to_44 = lambda p: np.concatenate(
        [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])], 1
    )
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    def min_line_dist(rays_o, rays_d):
        A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
        b_i = -A_i @ rays_o
        return np.squeeze(-np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0)) @ b_i.mean(0))

    center = min_line_dist(rays_o, rays_d)
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = _normalize(up)
    vec1 = _normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = _normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up = np.array([0, 0, -1.0])
        vec2 = _normalize(camorigin)
        vec0 = _normalize(np.cross(vec2, up))
        vec1 = _normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)], -1
    )
    poses_reset = np.concatenate(
        [poses_reset[:, :3, :4], np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape)], -1
    )
    return poses_reset, new_poses, bds


def _minify(basedir: Path, factor: int) -> Path:
    """Downscale images/ by `factor` into images_{factor}/ (cached).

    The reference shells out to ImageMagick mogrify (:8-57); we use cv2
    INTER_AREA resampling, writing pngs.
    """
    out = basedir / f"images_{factor}"
    if out.exists():
        return out
    src = basedir / "images"
    files = [f for f in sorted(os.listdir(src)) if f.lower().endswith(("jpg", "jpeg", "png"))]
    out.mkdir(parents=True)
    for f in files:
        img = cv2.imread(str(src / f), cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        img = cv2.resize(img, (int(round(w / factor)), int(round(h / factor))), interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(out / (Path(f).stem + ".png")), img)
    return out


def _imread(path: str) -> np.ndarray:
    if path.endswith("png"):
        return imageio.imread(path, apply_gamma=False)
    return imageio.imread(path)


class LLFFData(NamedTuple):
    images: np.ndarray  # [N, H, W, 3] float32 in [0,1] (preprocessed)
    poses: np.ndarray  # [N, 3, 5] (with hwf column)
    bds: np.ndarray  # [N, 2]
    render_poses: np.ndarray  # [P, 3, 5]
    i_test: int


def load_llff_data(
    basedir: str | Path,
    factor: int | None = None,
    recenter: bool = True,
    bd_factor: float | None = 0.75,
    spherify: bool = False,
    path_epi: bool = False,
    gamma: float = 1.0,
    clahe: float = 15,
    render_focuspoint_scale: float = 1.0,
    render_radius_scale: float = 1.0,
    preprocess: bool = True,
) -> LLFFData:
    basedir = Path(basedir)
    poses_arr = np.load(basedir / "poses_bounds.npy")
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    if factor is not None and factor != 1:
        imgdir = _minify(basedir, factor)
        sc_factor = factor
    else:
        imgdir = basedir / "images"
        if not imgdir.exists() and (basedir / "images_1").exists():
            imgdir = basedir / "images_1"
        sc_factor = 1

    if preprocess:
        imgdir = preprocessed_dir(imgdir, gamma, clahe)

    imgfiles = [
        str(imgdir / f)
        for f in sorted(os.listdir(imgdir))
        if f.lower().endswith(("jpg", "jpeg", "png"))
    ]
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(f"Mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}")

    sh = _imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / sc_factor

    imgs = np.stack([_imread(f)[..., :3] / 255.0 for f in imgfiles], 0)

    # axis correction: [-y x z] -> [x -y z] ordering fix (:342)
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)
    images = imgs.astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = _normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
        focal = focal * render_focuspoint_scale
        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        rads[0] *= render_radius_scale
        rads[1] *= render_radius_scale
        N_views, N_rots = 120, 2
        render_poses = render_path_spiral(c2w, up, rads, focal, zrate=0.5, rots=N_rots, N=N_views)
        if path_epi:
            rads[0] = rads[0] / 2
            render_poses = render_path_epi(c2w, up, rads[0], N_views)

    render_poses = np.array(render_poses).astype(np.float32)

    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))

    return LLFFData(images, poses, bds, render_poses, i_test)
