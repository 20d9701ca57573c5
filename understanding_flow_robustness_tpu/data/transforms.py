"""List-coherent transforms (reference: dataset_utils/custom_transforms.py).

These operate on lists of numpy HWC images so random parameters stay
coherent across the frames of a sample.  ``ArrayToTensor`` becomes
``to_float01`` returning NHWC float arrays in [0, 1] (our models are NHWC;
the reference transposed to CHW torch tensors).
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image


def imresize(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """PIL bilinear resize on uint8 (data_utils.py:26-31)."""
    h, w = size
    return np.array(
        Image.fromarray(arr.astype("uint8")).resize((w, h), Image.BILINEAR)
    )


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, images):
        for t in self.transforms:
            images = t(images)
        return images


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, images):
        return [(im - self.mean) / self.std for im in images]


class ToFloat01:
    """ArrayToTensor semantics: float / 255, NHWC layout kept."""

    def __call__(self, images):
        return [np.asarray(im, np.float32) / 255.0 for im in images]


class ToFloat:
    """ArrayToTensorWoNorm: float without normalization."""

    def __call__(self, images):
        return [np.asarray(im, np.float32) for im in images]


class RandomHorizontalFlip:
    def __call__(self, images):
        if random.random() < 0.5:
            return [np.copy(np.fliplr(im)) for im in images]
        return images


class RandomScaleCrop:
    """Zoom up to 15% then random-crop to (h, w)
    (custom_transforms.py:71-90)."""

    def __init__(self, h, w):
        self.h = h
        self.w = w

    def __call__(self, images):
        in_h, in_w = images[0].shape[:2]
        x_scaling, y_scaling = np.random.uniform(1, 1.15, 2)
        scaled_h, scaled_w = int(in_h * y_scaling), int(in_w * x_scaling)
        scaled = [imresize(im, (scaled_h, scaled_w)) for im in images]
        oy = np.random.randint(scaled_h - self.h + 1)
        ox = np.random.randint(scaled_w - self.w + 1)
        return [im[oy : oy + self.h, ox : ox + self.w] for im in scaled]


class RandomCrop:
    def __init__(self, h, w):
        self.h = h
        self.w = w

    def __call__(self, images):
        in_h, in_w = images[0].shape[:2]
        oy = np.random.randint(in_h - self.h + 1)
        ox = np.random.randint(in_w - self.w + 1)
        return [im[oy : oy + self.h, ox : ox + self.w] for im in images]


class Scale:
    def __init__(self, h, w):
        self.h = h
        self.w = w

    def __call__(self, images):
        return [imresize(im, (self.h, self.w)) for im in images]
