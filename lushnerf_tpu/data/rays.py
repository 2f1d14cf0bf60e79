"""Train-time ray dataset: precompute all rays of the training views,
globally shuffle, and serve sequential N_rand slices with per-epoch
reshuffles.

Matches the inline dataset build of the reference trainer
(run_lushnerf.py:559-614):
  * rays from get_rays per train view -> [N*H*W, 3, 2] (o, d stacked last)
  * pixel coords (x+0.5, y+0.5 scaled to the intrinsics resolution)
  * target colors, frequency-mask bits, image indices
  * one global permutation; sequential slices; reshuffle when exhausted

All host-side numpy; the trainer uploads one slice per step (tiny) or the
whole tensor once (reference behavior) depending on memory.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from lushnerf_tpu.ops.rays import HALF_PIX, get_rays_np


@dataclasses.dataclass
class RayDataset:
    rays: np.ndarray  # [T, 3, 2] float32
    rgbs: np.ndarray  # [T, 3] float32
    rays_x: np.ndarray  # [T, 1] float32
    rays_y: np.ndarray  # [T, 1] float32
    fq_mask: np.ndarray  # [T] uint8/bool
    images_idx: np.ndarray  # [T, 1] int32
    _order: np.ndarray = None
    _cursor: int = 0

    def __len__(self):
        return self.rays.shape[0]

    def shuffle(self, rng: np.random.Generator):
        self._order = rng.permutation(len(self))
        self._cursor = 0

    def next_batch(self, n: int, rng: np.random.Generator):
        """Sequential slice of the current permutation; reshuffles on epoch
        end (reference reshuffles and restarts, run_lushnerf.py:610-614)."""
        if self._order is None or self._cursor + n > len(self):
            self.shuffle(rng)
        idx = self._order[self._cursor : self._cursor + n]
        self._cursor += n
        return {
            "rays": self.rays[idx],
            "rgbs": self.rgbs[idx],
            "rays_x": self.rays_x[idx],
            "rays_y": self.rays_y[idx],
            "fq_mask": self.fq_mask[idx],
            "images_idx": self.images_idx[idx],
        }


def build_ray_dataset(
    images: np.ndarray,  # [N, H, W, 3] float32 train images (already indexed)
    poses: np.ndarray,  # [N, 3, 4] train poses
    K: np.ndarray,  # [3, 3] intrinsics at the image resolution
    fq_masks: np.ndarray,  # [N, H, W]
    image_indices: np.ndarray,  # [N] global image ids (for the RBK embedding)
    full_hw: tuple[int, int] | None = None,  # (H, W) of the intrinsics frame
) -> RayDataset:
    num_img, hei, wid, _ = images.shape
    H, W = full_hw if full_hw is not None else (hei, wid)

    rays_list = []
    for p in poses[:, :3, :4]:
        ro, rd = get_rays_np(hei, wid, K, p)  # host numpy — no device trips
        rays_list.append(np.stack([ro, rd], axis=-1))  # [H, W, 3, 2]
    rays = np.stack(rays_list, 0).reshape(-1, 3, 2).astype(np.float32)

    xs, ys = np.meshgrid(np.arange(wid, dtype=np.float32), np.arange(hei, dtype=np.float32), indexing="xy")
    xs = np.tile((xs[None] + HALF_PIX) * W / wid, [num_img, 1, 1]).reshape(-1, 1)
    ys = np.tile((ys[None] + HALF_PIX) * H / hei, [num_img, 1, 1]).reshape(-1, 1)

    rgbs = images.reshape(-1, 3).astype(np.float32)
    fq = fq_masks.reshape(-1)
    idx = np.repeat(image_indices.astype(np.int32), hei * wid).reshape(-1, 1)

    return RayDataset(
        rays=rays, rgbs=rgbs, rays_x=xs.astype(np.float32), rays_y=ys.astype(np.float32),
        fq_mask=fq, images_idx=idx,
    )
