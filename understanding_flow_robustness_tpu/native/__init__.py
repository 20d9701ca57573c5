"""ctypes bindings for the native host-side data-pipeline kernels
(native/src/ufr_native.cpp, shipped inside the package).  Auto-builds with
g++ on first use; every entry point has a numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "src", "ufr_native.cpp",
)


def _so_path() -> str:
    """Cache path keyed by a hash of the source, so edits to ufr_native.cpp
    trigger a rebuild and binaries from other hosts/CPUs are never reused
    under a changed source."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "UFR_NATIVE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ufr_native",
        ),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"_ufr_native_{digest}.so")


def _build(so: str) -> bool:
    # Portable codegen (no -march=native): the cached .so may outlive the
    # host it was built on.
    tmp = None   # mkstemp itself may raise; the handler must not NameError
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so))
        os.close(fd)
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)
        return True
    except Exception:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return False


def load():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SRC):
        return None
    so = _so_path()
    if not os.path.exists(so):
        _build(so)
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        # stale/foreign cached binary: fall back to numpy, don't crash
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.batch_u8_to_float01_pad.argtypes = [u8p, f32p] + [i64] * 8
    lib.batch_f32_pad.argtypes = [f32p, f32p] + [i64] * 8 + [ctypes.c_int]
    lib.resize_sparse_flow.argtypes = [
        f32p, f32p, i64, i64, i64, i64, ctypes.c_double, ctypes.c_double,
        f32p, i32p,
    ]
    lib.resize_bilinear_u8.argtypes = [u8p, u8p] + [i64] * 5
    lib.decode_kitti_flow_u16.argtypes = [u16p, i64, i64, f32p, f32p]
    lib.ufr_native_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def batch_u8_to_float01_pad(imgs: np.ndarray, out_h: int, out_w: int,
                            top: int, left: int) -> np.ndarray:
    """(n, h, w, c) uint8 -> (n, out_h, out_w, c) float32/255 with
    replicate padding."""
    n, h, w, c = imgs.shape
    lib = load()
    if lib is None:
        x = imgs.astype(np.float32) / 255.0
        return np.pad(
            x, ((0, 0), (top, out_h - h - top), (left, out_w - w - left),
                (0, 0)), mode="edge",
        )
    out = np.empty((n, out_h, out_w, c), np.float32)
    lib.batch_u8_to_float01_pad(
        np.ascontiguousarray(imgs), out, n, h, w, c, out_h, out_w, top, left
    )
    return out


def batch_f32_pad(x: np.ndarray, out_h: int, out_w: int, top: int,
                  left: int, zero: bool = False) -> np.ndarray:
    """(n, h, w, c) float32 -> (n, out_h, out_w, c) with replicate
    (zero=False) or zero (zero=True) padding."""
    n, h, w, c = x.shape
    lib = load()
    if lib is None:
        mode = "constant" if zero else "edge"
        return np.pad(
            x, ((0, 0), (top, out_h - h - top), (left, out_w - w - left),
                (0, 0)), mode=mode,
        )
    out = np.empty((n, out_h, out_w, c), np.float32)
    lib.batch_f32_pad(
        np.ascontiguousarray(x, np.float32), out, n, h, w, c, out_h, out_w,
        top, left, 1 if zero else 0,
    )
    return out


def resize_sparse_flow(flow: np.ndarray, valid: np.ndarray,
                       fx: float, fy: float):
    h, w = flow.shape[:2]
    h1, w1 = int(round(h * fy)), int(round(w * fx))
    lib = load()
    if lib is None:
        from ..data.augmentor import SparseFlowAugmentor

        return SparseFlowAugmentor.resize_sparse_flow_map(flow, valid, fx, fy)
    fo = np.empty((h1, w1, 2), np.float32)
    vo = np.empty((h1, w1), np.int32)
    lib.resize_sparse_flow(
        np.ascontiguousarray(flow, np.float32),
        np.ascontiguousarray(valid, np.float32), h, w, h1, w1, fx, fy, fo, vo,
    )
    return fo, vo


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bilinear u8 resize.  Accepts (H, W) or (H, W, C); the output keeps
    the input's rank on BOTH the native and cv2 paths (cv2 drops a
    singleton channel axis, the native kernel keeps it — normalize so
    downstream shapes never depend on toolchain availability)."""
    was_2d = img.ndim == 2
    if was_2d:
        img = img[..., None]
    h, w, c = img.shape
    lib = load()
    if lib is None:
        import cv2

        out = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        if out.ndim == 2:
            out = out[..., None]
    else:
        out = np.empty((oh, ow, c), np.uint8)
        lib.resize_bilinear_u8(np.ascontiguousarray(img), out, h, w, c,
                               oh, ow)
    return out[..., 0] if was_2d else out


def decode_kitti_flow_u16(rgb16: np.ndarray):
    h, w = rgb16.shape[:2]
    lib = load()
    if lib is None:
        raw = rgb16.astype(np.float64)
        return (
            ((raw[:, :, :2] - 2 ** 15) / 64.0).astype(np.float32),
            raw[:, :, 2].astype(np.float32),
        )
    flow = np.empty((h, w, 2), np.float32)
    valid = np.empty((h, w), np.float32)
    lib.decode_kitti_flow_u16(np.ascontiguousarray(rgb16), h, w, flow, valid)
    return flow, valid
