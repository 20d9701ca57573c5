"""Visualization helpers (reference: patch_attacks/utils.py:21-60).

``tensor2array`` renders 1-channel maps through a cv2 colormap and passes
3-channel images through (with the [-1,1] -> [0,1] shift); NHWC in/out
instead of the reference's CHW.
"""

from __future__ import annotations

import numpy as np


def tensor2array(array: np.ndarray, max_value: float = 255,
                 colormap: str = "rainbow") -> np.ndarray:
    """(H, W) / (H, W, 1) heatmap -> colormapped float RGB, or
    (H, W, 3) image -> float RGB (patch_attacks/utils.py:21-56)."""
    array = np.asarray(array)
    if max_value is None:
        # guard the auto-scale: an all-zero map would divide 0/0 -> NaN
        # (undefined uint8 cast), an all-negative one would invert sign
        max_value = float(array.max())
        if not np.isfinite(max_value) or max_value <= 0:
            max_value = 1.0
    if array.ndim == 2 or (array.ndim == 3 and array.shape[-1] == 1):
        try:
            import cv2

            cmap = (cv2.COLORMAP_RAINBOW if colormap == "rainbow"
                    else cv2.COLORMAP_BONE)
            u8 = (255 * np.squeeze(array) / max_value).clip(0, 255).astype(
                np.uint8
            )
            colored = cv2.applyColorMap(u8, cmap)
            return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB).astype(
                np.float32
            ) / 255
        except ImportError:
            g = np.clip(np.squeeze(array)[..., None] / max_value, 0, 1)
            return np.repeat(g, 3, axis=-1).astype(np.float32)
    if array.ndim == 3 and array.shape[-1] == 3:
        if array.min() >= 0 and array.max() <= 1:
            return array.astype(np.float32)
        return (0.5 + array * 0.5).astype(np.float32)
    return array.astype(np.float32)


def transpose_image(array: np.ndarray) -> np.ndarray:
    """HWC -> CHW for TensorBoard add_image (patch_attacks/utils.py:59-60)."""
    return np.transpose(array, (2, 0, 1))
