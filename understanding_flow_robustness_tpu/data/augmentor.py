"""Host-side data augmentation (reference: dataset_utils/augmentor.py).

Numpy/PIL implementations of FlowAugmentor (dense flow) and
SparseFlowAugmentor (KITTI sparse flow), including the optional
translation/rotation augmentations with flow-field correction
(augmentor.py:88-165).  ColorJitter reproduces torchvision's PIL-based
semantics (ImageEnhance for brightness/contrast/saturation, HSV roll for
hue, random factor ranges and random op order) since torchvision is not in
this environment.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance


class ColorJitter:
    """torchvision.transforms.ColorJitter-compatible (PIL backend)."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = self._range(brightness)
        self.contrast = self._range(contrast)
        self.saturation = self._range(saturation)
        self.hue = (-hue, hue) if hue else None

    @staticmethod
    def _range(v):
        return (max(0.0, 1.0 - v), 1.0 + v) if v else None

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        if self.brightness:
            f = random.uniform(*self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = random.uniform(*self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = random.uniform(*self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            f = random.uniform(*self.hue)
            ops.append(lambda im, f=f: self._adjust_hue(im, f))
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img

    @staticmethod
    def _adjust_hue(img: Image.Image, factor: float) -> Image.Image:
        h, s, v = img.convert("HSV").split()
        h = np.array(h, np.uint8)
        h = (h.astype(np.int16) + int(factor * 255)) % 256
        return Image.merge(
            "HSV", (Image.fromarray(h.astype(np.uint8), "L"), s, v)
        ).convert("RGB")


def _cv2_resize(img: np.ndarray, fx: float, fy: float) -> np.ndarray:
    import cv2

    return cv2.resize(img, None, fx=fx, fy=fy, interpolation=cv2.INTER_LINEAR)


class FlowAugmentor:
    """augmentor.py:13-249: photometric (asymmetric p=0.2) + eraser (p=0.5,
    bounds [50,100]) + optional translation/rotation + random scale/stretch
    + flips + crop."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=True,
                 do_trans_rot=False, translate=10, rot_angle=17, diff_angle=5):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_trans_rot = do_trans_rot
        self.translate = (int(translate), int(translate))
        self.trans_prob = 0.7
        self.angle = rot_angle
        self.diff_angle = diff_angle
        self.rot_prob = 0.7
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.photo_aug = ColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5

    def color_transform(self, img1, img2):
        if np.random.rand() < self.asymmetric_color_aug_prob:
            img1 = np.array(self.photo_aug(Image.fromarray(img1)), np.uint8)
            img2 = np.array(self.photo_aug(Image.fromarray(img2)), np.uint8)
        else:
            stack = np.concatenate([img1, img2], axis=0)
            stack = np.array(self.photo_aug(Image.fromarray(stack)), np.uint8)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if np.random.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            img2 = img2.copy()
            for _ in range(np.random.randint(1, 3)):
                x0 = np.random.randint(0, wd)
                y0 = np.random.randint(0, ht)
                dx = np.random.randint(bounds[0], bounds[1])
                dy = np.random.randint(bounds[0], bounds[1])
                img2[y0 : y0 + dy, x0 : x0 + dx, :] = mean_color
        return img1, img2

    def rotation(self, img1, img2, flow):
        """Differential-rotation aug with flow-field correction
        (augmentor.py:88-132)."""
        import scipy.ndimage as ndimage

        applied_angle = random.uniform(-self.angle, self.angle)
        diff = random.uniform(-self.diff_angle, self.diff_angle)
        angle1 = applied_angle - diff / 2
        angle2 = applied_angle + diff / 2
        angle1_rad = angle1 * np.pi / 180
        diff_rad = diff * np.pi / 180

        h, w, _ = flow.shape
        warped = np.mgrid[:w, :h].T + flow
        warped = warped - np.array([w / 2, h / 2])
        rot = np.zeros_like(flow)
        rot[..., 0] = (np.cos(diff_rad) - 1) * warped[..., 0] + np.sin(
            diff_rad
        ) * warped[..., 1]
        rot[..., 1] = -np.sin(diff_rad) * warped[..., 0] + (
            np.cos(diff_rad) - 1
        ) * warped[..., 1]
        flow = flow + rot

        img1 = ndimage.rotate(img1, angle1, reshape=False, order=2)
        img2 = ndimage.rotate(img2, angle2, reshape=False, order=2)
        flow = ndimage.rotate(flow, angle1, reshape=False, order=2)
        flow_ = np.copy(flow)
        flow[:, :, 0] = (
            np.cos(angle1_rad) * flow_[:, :, 0]
            + np.sin(angle1_rad) * flow_[:, :, 1]
        )
        flow[:, :, 1] = (
            -np.sin(angle1_rad) * flow_[:, :, 0]
            + np.cos(angle1_rad) * flow_[:, :, 1]
        )
        return img1, img2, flow

    def translation(self, img1, img2, flow):
        """augmentor.py:134-149 (incl. the reference's tw-on-both-axes
        flow-offset quirk at :148)."""
        h, w = img1.shape[:2]
        th, tw = self.translate
        tw = np.random.randint(-tw, tw)
        th = np.random.randint(-th, th)
        if tw == 0 and th == 0:
            return img1, img2, flow
        x1, x2, x3, x4 = max(0, tw), min(w + tw, w), max(0, -tw), min(w - tw, w)
        y1, y2, y3, y4 = max(0, th), min(h + th, h), max(0, -th), min(h - th, h)
        img1 = img1[y1:y2, x1:x2]
        img2 = img2[y3:y4, x3:x4]
        flow = flow[y1:y2, x1:x2].copy()
        flow[..., 0] += tw
        flow[..., 1] += tw
        return img1, img2, flow

    def spatial_transform(self, img1, img2, flow):
        if self.do_trans_rot:
            if np.random.rand() < self.trans_prob:
                img1, img2, flow = self.translation(img1, img2, flow)
            nan_exist = (
                np.any(np.isnan(img1)) or np.any(np.isnan(img2))
                or np.any(np.isnan(flow))
            )
            if np.random.rand() < self.rot_prob and not nan_exist:
                img1, img2, flow = self.rotation(img1, img2, flow)

        ht, wd = img1.shape[:2]
        min_scale = np.maximum(
            (self.crop_size[0] + 8) / float(ht),
            (self.crop_size[1] + 8) / float(wd),
        )
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if np.random.rand() < self.stretch_prob:
            scale_x *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
        scale_x = np.clip(scale_x, min_scale, None)
        scale_y = np.clip(scale_y, min_scale, None)

        if np.random.rand() < self.spatial_aug_prob:
            img1 = _cv2_resize(img1, scale_x, scale_y)
            img2 = _cv2_resize(img2, scale_x, scale_y)
            flow = _cv2_resize(flow, scale_x, scale_y) * [scale_x, scale_y]

        if self.do_flip:
            if np.random.rand() < self.h_flip_prob:
                img1 = img1[:, ::-1]
                img2 = img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if np.random.rand() < self.v_flip_prob:
                img1 = img1[::-1, :]
                img2 = img2[::-1, :]
                flow = flow[::-1, :] * [1.0, -1.0]

        if (img1.shape[0] <= self.crop_size[0]
                or img1.shape[1] <= self.crop_size[1]):
            scale_x = self.crop_size[1] / img1.shape[1]
            scale_y = self.crop_size[0] / img1.shape[0]
            img1 = _cv2_resize(img1, scale_x, scale_y)
            img2 = _cv2_resize(img2, scale_x, scale_y)
            flow = _cv2_resize(flow, scale_x, scale_y) * [scale_x, scale_y]
        else:
            y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0])
            x0 = np.random.randint(0, img1.shape[1] - self.crop_size[1])
            img1 = img1[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
            img2 = img2[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
            flow = flow[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return img1, img2, flow

    def __call__(self, img1, img2, flow):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow = self.spatial_transform(img1, img2, flow)
        return (
            np.ascontiguousarray(img1),
            np.ascontiguousarray(img2),
            np.ascontiguousarray(flow.astype(np.float32)),
        )


class SparseFlowAugmentor:
    """augmentor.py:251-382 (KITTI sparse flow, scatter-based resize)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.photo_aug = ColorJitter(0.3, 0.3, 0.3, 0.3 / 3.14)
        self.eraser_aug_prob = 0.5

    def color_transform(self, img1, img2):
        stack = np.concatenate([img1, img2], axis=0)
        stack = np.array(self.photo_aug(Image.fromarray(stack)), np.uint8)
        img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2):
        ht, wd = img1.shape[:2]
        if np.random.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            img2 = img2.copy()
            for _ in range(np.random.randint(1, 3)):
                x0 = np.random.randint(0, wd)
                y0 = np.random.randint(0, ht)
                dx = np.random.randint(50, 100)
                dy = np.random.randint(50, 100)
                img2[y0 : y0 + dy, x0 : x0 + dx, :] = mean_color
        return img1, img2

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        """Scatter valid flow samples into the resized grid
        (augmentor.py:294-327)."""
        ht, wd = flow.shape[:2]
        coords = np.meshgrid(np.arange(wd), np.arange(ht))
        coords = np.stack(coords, axis=-1).reshape(-1, 2).astype(np.float32)
        flow = flow.reshape(-1, 2).astype(np.float32)
        valid = valid.reshape(-1).astype(np.float32)

        coords0 = coords[valid >= 1]
        flow0 = flow[valid >= 1]
        ht1 = int(round(ht * fy))
        wd1 = int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]
        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        xx, yy, flow1 = xx[v], yy[v], flow1[v]
        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yy, xx] = flow1
        valid_img[yy, xx] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum(
            (self.crop_size[0] + 1) / float(ht),
            (self.crop_size[1] + 1) / float(wd),
        )
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = np.clip(scale, min_scale, None)
        scale_y = np.clip(scale, min_scale, None)

        if np.random.rand() < self.spatial_aug_prob:
            img1 = _cv2_resize(img1, scale_x, scale_y)
            img2 = _cv2_resize(img2, scale_x, scale_y)
            # native scatter kernel (exact same rounding/order semantics;
            # falls back to resize_sparse_flow_map without the toolchain)
            from ..native import resize_sparse_flow

            flow, valid = resize_sparse_flow(
                flow, valid, fx=scale_x, fy=scale_y
            )

        if self.do_flip and np.random.rand() < 0.5:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            valid = valid[:, ::-1]

        margin_y, margin_x = 20, 50
        y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0] + margin_y)
        x0 = np.random.randint(
            -margin_x, img1.shape[1] - self.crop_size[1] + margin_x
        )
        y0 = np.clip(y0, 0, img1.shape[0] - self.crop_size[0])
        x0 = np.clip(x0, 0, img1.shape[1] - self.crop_size[1])
        img1 = img1[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        img2 = img2[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        flow = flow[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        valid = valid[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return img1, img2, flow, valid

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow, valid)
        return (
            np.ascontiguousarray(img1),
            np.ascontiguousarray(img2),
            np.ascontiguousarray(flow.astype(np.float32)),
            np.ascontiguousarray(valid),
        )
