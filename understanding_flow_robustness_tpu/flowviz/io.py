"""Flow / image file I/O (reference: dataset_utils/data_utils.py:22-278,
flowutils/flow_io.py, flowutils/pfm.py).

Formats:
  * Middlebury .flo            — f32 little-endian, magic 202021.25
  * KITTI 16-bit flow PNG      — (value - 2^15) / 64, third channel = valid
  * PFM                        — FlyingThings3D disparity/flow
  * KITTI disparity PNG        — uint16 / 256
"""

from __future__ import annotations

import os
import re

import numpy as np

TAG_FLOAT = 202021.25


def _native_decode(path: str):
    """Bit-exact native fast path (native/src/ufr_loader.cpp via ctypes);
    None when the library is unavailable or the format unsupported —
    callers fall through to the pure-Python readers.  Disable with
    UFR_NATIVE_DECODE=0."""
    if os.environ.get("UFR_NATIVE_DECODE", "1") == "0":
        return None
    try:
        from ..native import loader as _native
    except Exception:
        return None
    try:
        return _native.decode_file(path)
    except Exception:
        return None


def read_flo(path: str) -> np.ndarray:
    # no native fast path: np.fromfile on raw little-endian f32 already
    # beats the ctypes round-trip (measured 0.9 vs 2.5 ms at KITTI size)
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(TAG_FLOAT):
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flow_png(path: str) -> tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit flow PNG -> (flow (H, W, 2), valid (H, W)).

    dataset_utils/data_utils.py:259-264 (readFlowKITTI): BGR read, channels
    reversed, (v - 2^15) / 64 with the last channel as the valid mask.
    The native decoder returns PNG channels in file order, which IS the
    reversed-BGR (u, v, valid) order — no flip needed.
    """
    native = _native_decode(path)
    if (native is not None and native.dtype == np.uint16
            and native.ndim == 3 and native.shape[-1] == 3):
        # native u16 -> (flow, valid) conversion; (v - 2^15)/64 is exact
        # in f32 for every u16 input (integer sub, power-of-two divide),
        # so this equals the reference's f64-then-cast result bit-for-bit
        from .. import native as native_pkg

        return native_pkg.decode_kitti_flow_u16(native)
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    if raw is None:
        raise FileNotFoundError(path)
    raw = raw[:, :, ::-1].astype(np.float64)  # BGR -> (u, v, valid)
    flow = (raw[:, :, :2] - 2 ** 15) / 64.0
    valid = raw[:, :, 2].astype(np.float32)
    return flow.astype(np.float32), valid


def write_flow_png(path: str, flow: np.ndarray,
                   valid: np.ndarray | None = None) -> None:
    """dataset_utils/data_utils.py:274-278 (writeFlowKITTI)."""
    import cv2

    h, w = flow.shape[:2]
    uv = 64.0 * np.asarray(flow, np.float64) + 2 ** 15
    if valid is None:
        valid = np.ones((h, w), np.float64)
    out = np.concatenate([uv, np.asarray(valid, np.float64)[..., None]],
                         axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_disparity_png(path: str) -> np.ndarray:
    native = _native_decode(path)
    if native is not None and native.dtype == np.uint16 and native.ndim == 2:
        return (native / 256.0).astype(np.float32)
    import cv2

    disp = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if disp is None:
        raise FileNotFoundError(path)
    return (disp / 256.0).astype(np.float32)


def read_pfm(path: str) -> np.ndarray:
    """flowutils/pfm.py:7-41 / data_utils.py:78-113."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        m = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not m:
            raise ValueError("malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy()


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    """flowutils/pfm.py:44-71."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError("image must be HxWx3, HxWx1 or HxW")
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)


def read_image(path: str) -> np.ndarray:
    """uint8 RGB image as float32 (data_utils.py:22-23 load_as_float)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".png", ".ppm", ".pgm"):  # lossless: native is bit-exact
        native = _native_decode(path)
        if native is not None and native.dtype == np.uint8:
            return native.astype(np.float32)
    from PIL import Image

    return np.array(Image.open(path)).astype(np.float32)


def read_gen(path: str):
    """Extension-dispatched reader (data_utils.py:116-130)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        from PIL import Image

        return Image.open(path)
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(path).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    return []


def read_paths(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip() for line in f if line.rstrip()]


def write_paths(path: str, paths: list[str]) -> None:
    with open(path, "w") as f:
        for p in paths:
            f.write(p + "\n")
