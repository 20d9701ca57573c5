"""Native prefetching file-decode pipeline (native/src/ufr_loader.cpp).

The reference hides IO/decode latency behind DataLoader worker processes
(dataset_utils/datasets.py ``num_workers``).  Here a C++ thread pool
decodes samples ahead of the consumer into a bounded in-order queue; the
hot work (zlib inflate, JPEG IDCT) runs with the GIL released, so no
worker processes or tensor IPC are needed.

Two surfaces:

* :func:`decode_file` — one-shot native decode of a png/jpg/flo/pnm file
  (bit-exact for the lossless formats; used as the fast path by
  ``flowviz.io``).
* :class:`PrefetchLoader` — iterate samples (tuples of paths) decoded
  ahead by N threads, in order.

Everything falls back to PIL/cv2 when the toolchain or the shared
library is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Sequence

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "src", "ufr_loader.cpp",
)

_DTYPES = {0: np.uint8, 1: np.float32, 2: np.uint16}


def _so_path() -> str:
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
    return os.path.join(cache, f"_ufr_loader_{digest}.so")


def _build(so: str) -> bool:
    tmp = None
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so))
        os.close(fd)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp,
             "-lpng", "-ljpeg", "-lz", "-pthread"],
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
        # stale/foreign cached binary (e.g. shared NFS cache, removed
        # libpng): the numpy fallbacks must take over, not crash
        return None
    i64 = ctypes.c_int64
    i64p = ctypes.POINTER(i64)
    ip = ctypes.POINTER(ctypes.c_int)
    vp = ctypes.c_void_p

    lib.ufr_loader_create.restype = vp
    lib.ufr_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), i64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ufr_loader_wait.restype = i64
    lib.ufr_loader_wait.argtypes = [vp]
    lib.ufr_loader_file_info.argtypes = [vp, ctypes.c_int, i64p, i64p, i64p, ip]
    lib.ufr_loader_file_copy.argtypes = [vp, ctypes.c_int, ctypes.c_void_p]
    lib.ufr_loader_release.argtypes = [vp]
    lib.ufr_loader_destroy.argtypes = [vp]
    lib.ufr_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(vp), i64p, i64p, i64p, ip,
    ]
    lib.ufr_free.argtypes = [vp]
    lib.ufr_loader_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def decode_file(path: str) -> np.ndarray | None:
    """Native one-shot decode; None when the library or format is
    unavailable (caller falls back).  PNG (8/16-bit, channels in file
    order), JPEG (u8 RGB), .flo ((H, W, 2) f32), binary PPM/PGM."""
    lib = load()
    if lib is None:
        return None
    data = ctypes.c_void_p()
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    c = ctypes.c_int64()
    dt = ctypes.c_int()
    rc = lib.ufr_decode_file(
        path.encode(), ctypes.byref(data), ctypes.byref(h), ctypes.byref(w),
        ctypes.byref(c), ctypes.byref(dt),
    )
    if rc != 0:
        return None
    try:
        dtype = _DTYPES[dt.value]
        shape = (h.value, w.value) if c.value == 1 else (
            h.value, w.value, c.value)
        n = int(np.prod(shape))
        out = np.empty(shape, dtype)
        ctypes.memmove(out.ctypes.data, data.value,
                       n * np.dtype(dtype).itemsize)
        return out
    finally:
        lib.ufr_free(data)


class PrefetchLoader:
    """Iterate samples — tuples of decoded arrays — in path-list order,
    decoded ahead by a native thread pool.

    ``samples``: sequence of path tuples (every tuple the same length).
    ``queue_cap`` bounds finished-but-unconsumed samples (memory bound).
    Falls back to synchronous decode when the native library is missing.
    A file the native decoders can't handle (e.g. PFM) comes back as
    ``None`` in the tuple and the caller may decode it itself; with
    ``strict=True`` that raises instead.
    """

    def __init__(self, samples: Sequence[Sequence[str]], n_threads: int = 4,
                 queue_cap: int = 8, strict: bool = True):
        self.samples = [tuple(s) for s in samples]
        if not self.samples:
            self.files_per_sample = 0
            return
        self.files_per_sample = len(self.samples[0])
        if any(len(s) != self.files_per_sample for s in self.samples):
            raise ValueError("all samples must have the same arity")
        self.n_threads = n_threads
        self.queue_cap = queue_cap
        self.strict = strict

    def __len__(self):
        return len(self.samples)

    def _fallback_iter(self):
        for s in self.samples:
            yield tuple(_sync_decode(p) for p in s)

    def __iter__(self):
        lib = load()
        if self.files_per_sample == 0:
            return
        if lib is None:
            yield from self._fallback_iter()
            return
        flat = [p for s in self.samples for p in s]
        arr = (ctypes.c_char_p * len(flat))(*[p.encode() for p in flat])
        handle = lib.ufr_loader_create(
            arr, len(flat), self.files_per_sample, self.n_threads,
            self.queue_cap,
        )
        if not handle:
            yield from self._fallback_iter()
            return
        try:
            while True:
                idx = lib.ufr_loader_wait(handle)
                if idx < 0:
                    break
                out = []
                for fi in range(self.files_per_sample):
                    h = ctypes.c_int64()
                    w = ctypes.c_int64()
                    c = ctypes.c_int64()
                    dt = ctypes.c_int()
                    lib.ufr_loader_file_info(
                        handle, fi, ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c), ctypes.byref(dt),
                    )
                    if dt.value < 0:
                        # per-file fallback: the native decoder declines
                        # formats PIL renders differently (palette/alpha
                        # PNGs) and rejects corrupt files; only when the
                        # pure-Python reader ALSO fails is the file bad
                        try:
                            out.append(_sync_decode(self.samples[idx][fi]))
                        except Exception as e:
                            if self.strict:
                                raise IOError(
                                    f"decode failed: "
                                    f"{self.samples[idx][fi]}") from e
                            out.append(None)
                        continue
                    dtype = _DTYPES[dt.value]
                    shape = (h.value, w.value) if c.value == 1 else (
                        h.value, w.value, c.value)
                    buf = np.empty(shape, dtype)
                    lib.ufr_loader_file_copy(
                        handle, fi, ctypes.c_void_p(buf.ctypes.data))
                    out.append(buf)
                lib.ufr_loader_release(handle)
                yield tuple(out)
        finally:
            lib.ufr_loader_destroy(handle)


def _sync_decode(path: str) -> np.ndarray:
    """Fallback decode via the pure-Python readers."""
    low = path.lower()
    if low.endswith(".flo"):
        from ..flowviz.io import read_flo

        return read_flo(path)
    from PIL import Image

    return np.asarray(Image.open(path))
