"""Per-image DFT low-pass frequency masks that gate blur-kernel gradients.

Matches frequency_mask / get_masks_for_images
(utils/run_lushnerf_helpers.py:630-662):
  grayscale -> centered DFT -> square low-pass window of +-radius around the
  center -> inverse DFT magnitude -> min-max normalize to [0,255] ->
  binarize at threshold 48.
"""

from __future__ import annotations

import cv2
import numpy as np


def frequency_mask(image: np.ndarray, radius: int = 50) -> np.ndarray:
    """image: uint8 RGB [H, W, 3] -> binary float mask [H, W]."""
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)

    dft = cv2.dft(np.float32(gray), flags=cv2.DFT_COMPLEX_OUTPUT)
    dft_shift = np.fft.fftshift(dft)

    rows, cols = gray.shape
    crow, ccol = rows // 2, cols // 2
    lp = np.zeros((rows, cols, 2), np.uint8)
    lp[crow - radius : crow + radius, ccol - radius : ccol + radius] = 1

    f_ishift = np.fft.ifftshift(dft_shift * lp)
    back = cv2.idft(f_ishift)
    mag = cv2.magnitude(back[:, :, 0], back[:, :, 1])

    mag = (mag - mag.min()) / (mag.max() - mag.min()) * 255
    _, thresh = cv2.threshold(mag, 48, 1, cv2.THRESH_BINARY)
    return thresh


def get_masks_for_images(images: np.ndarray, radius: int = 50) -> np.ndarray:
    """images: uint8 [N, H, W, 3] -> uint8 masks [N, H, W]."""
    masks = np.zeros(images.shape[:-1], dtype=np.uint8)
    for i, image in enumerate(images):
        masks[i] = frequency_mask(image, radius)
    return masks
