"""Native prefetching decode pipeline (native/src/ufr_loader.cpp).

The reference hides IO/decode latency behind torch DataLoader worker
processes (dataset_utils/datasets.py); here a C++ thread pool decodes
ahead with the GIL released.  These tests pin bit-exactness of every
lossless decoder against the pure-Python readers and the in-order
prefetch semantics.
"""

import os

import numpy as np
import pytest
from PIL import Image

from understanding_flow_robustness_tpu.flowviz import io as fio
from understanding_flow_robustness_tpu.native import loader

NATIVE = loader.available()


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("decode")
    rng = np.random.RandomState(7)
    out = {}

    img8 = rng.randint(0, 256, (37, 53, 3), np.uint8)
    out["png8"] = (str(d / "a.png"), img8)
    Image.fromarray(img8).save(out["png8"][0])

    gray = rng.randint(0, 256, (21, 33), np.uint8)
    out["png_gray"] = (str(d / "g.png"), gray)
    Image.fromarray(gray).save(out["png_gray"][0])

    rgba = rng.randint(0, 256, (19, 23, 4), np.uint8)
    out["png_rgba"] = (str(d / "r.png"), rgba)  # PIL keeps alpha
    Image.fromarray(rgba).save(out["png_rgba"][0])

    pal = Image.fromarray(
        rng.randint(0, 256, (15, 17, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE)
    out["png_palette"] = (str(d / "p.png"), np.asarray(pal))  # index map
    pal.save(out["png_palette"][0])

    import cv2

    u16 = rng.randint(0, 65536, (20, 31, 3)).astype(np.uint16)
    out["png16"] = (str(d / "b.png"), u16)
    cv2.imwrite(out["png16"][0], u16[..., ::-1])  # cv2 writes BGR

    disp16 = rng.randint(0, 65536, (18, 27)).astype(np.uint16)
    out["disp16"] = (str(d / "disp.png"), disp16)
    cv2.imwrite(out["disp16"][0], disp16)

    flo = rng.rand(11, 13, 2).astype(np.float32)
    out["flo"] = (str(d / "c.flo"), flo)
    fio.write_flo(out["flo"][0], flo)

    out["ppm"] = (str(d / "e.ppm"), img8)
    Image.fromarray(img8).save(out["ppm"][0])

    out["pgm"] = (str(d / "f.pgm"), gray)
    Image.fromarray(gray).save(out["pgm"][0])

    out["jpg"] = (str(d / "h.jpg"), img8)
    Image.fromarray(img8).save(out["jpg"][0], quality=95)
    return out


@pytest.mark.skipif(not NATIVE, reason="native loader unavailable")
class TestDecodeFile:
    def test_png8(self, files):
        path, ref = files["png8"]
        assert np.array_equal(loader.decode_file(path), ref)

    def test_png_gray(self, files):
        path, ref = files["png_gray"]
        assert np.array_equal(loader.decode_file(path), ref)

    def test_png_rgba_declined(self, files):
        """np.array(Image.open(...)) — the reference read convention,
        data_utils.py:22-23 — KEEPS the alpha channel, so the native
        decoder must decline RGBA rather than silently strip it; the
        caller's PIL fallback then matches the reference exactly."""
        path, ref = files["png_rgba"]
        assert loader.decode_file(path) is None
        assert np.array_equal(fio.read_image(path), ref.astype(np.float32))

    def test_png_palette_declined(self, files):
        """Palette PNGs: PIL returns the index map, not expanded RGB."""
        path, ref = files["png_palette"]
        assert loader.decode_file(path) is None
        assert np.array_equal(fio.read_image(path), ref.astype(np.float32))

    def test_truncated_payload_returns_none(self, files, tmp_path):
        """A PNG with a valid header but truncated payload must fail the
        decode, not come back as a valid array with a zero tail."""
        path, ref = files["png8"]
        with open(path, "rb") as f:
            data = f.read()
        p = tmp_path / "trunc.png"
        p.write_bytes(data[: len(data) // 2])
        assert loader.decode_file(str(p)) is None

    def test_huge_header_dims_rejected(self, tmp_path):
        """Corrupt .flo claiming 2^30-sized dims must be rejected by the
        size cap, not terminate the process via bad_alloc."""
        p = tmp_path / "huge.flo"
        with open(p, "wb") as f:
            f.write(np.float32(202021.25).tobytes())
            f.write(np.int32(1 << 30).tobytes())
            f.write(np.int32(1 << 30).tobytes())
        assert loader.decode_file(str(p)) is None

    def test_pnm_comment_after_digits(self, tmp_path):
        """'#' directly terminating a digit run starts a comment; digits
        inside the comment must not be parsed as header fields."""
        img = np.arange(50 * 100 * 3, dtype=np.uint8).reshape(50, 100, 3)
        p = tmp_path / "c.ppm"
        with open(p, "wb") as f:
            f.write(b"P6\n100# made with tool99\n50 255\n")
            f.write(img.tobytes())
        got = loader.decode_file(str(p))
        assert got is not None and got.shape == (50, 100, 3)
        assert np.array_equal(got, img)

    def test_png16_file_channel_order(self, files):
        """16-bit PNG comes back in file order (u, v, valid for KITTI) —
        identical to the reference's reversed-BGR cv2 read
        (dataset_utils/data_utils.py:259-264)."""
        path, ref = files["png16"]
        got = loader.decode_file(path)
        assert got.dtype == np.uint16
        assert np.array_equal(got, ref)

    def test_flo(self, files):
        path, ref = files["flo"]
        assert np.array_equal(loader.decode_file(path), ref)

    def test_ppm_pgm(self, files):
        for key in ("ppm", "pgm"):
            path, ref = files[key]
            assert np.array_equal(loader.decode_file(path), ref)

    def test_jpeg_matches_pil(self, files):
        # same libjpeg: the decode should match PIL's exactly
        path, ref = files["jpg"]
        got = loader.decode_file(path)
        assert got.shape == ref.shape and got.dtype == np.uint8
        pil = np.asarray(Image.open(path))
        assert np.array_equal(got, pil)

    def test_unknown_format_returns_none(self, tmp_path):
        p = tmp_path / "x.pfm"
        p.write_bytes(b"Pf\n1 1\n-1.0\n" + np.float32(0.5).tobytes())
        assert loader.decode_file(str(p)) is None

    def test_corrupt_file_returns_none(self, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
        assert loader.decode_file(str(p)) is None


class TestPrefetchLoader:
    def test_in_order_iteration(self, files):
        samples = [(files["png8"][0], files["flo"][0]),
                   (files["ppm"][0], files["flo"][0])] * 5
        got = list(loader.PrefetchLoader(samples, n_threads=3, queue_cap=2))
        assert len(got) == len(samples)
        for img, flo in got:
            assert np.array_equal(img, files["png8"][1])
            assert np.array_equal(flo, files["flo"][1])

    def test_arity_mismatch_raises(self, files):
        with pytest.raises(ValueError):
            loader.PrefetchLoader([(files["png8"][0],),
                                   (files["png8"][0], files["flo"][0])])

    def test_empty(self):
        assert list(loader.PrefetchLoader([])) == []

    @pytest.mark.skipif(not NATIVE, reason="native loader unavailable")
    def test_strict_decode_failure(self, tmp_path, files):
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"nope")
        with pytest.raises(IOError):
            list(loader.PrefetchLoader([(files["png8"][0],), (str(bad),)]))

    @pytest.mark.skipif(not NATIVE, reason="native loader unavailable")
    def test_non_strict_yields_none(self, tmp_path, files):
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"nope")
        got = list(loader.PrefetchLoader(
            [(files["png8"][0],), (str(bad),)], strict=False))
        assert np.array_equal(got[0][0], files["png8"][1])
        assert got[1][0] is None


class TestFlowvizFastPath:
    """flowviz.io readers must return identical values with the native
    fast path on and off (UFR_NATIVE_DECODE toggle)."""

    def _both(self, fn, *args):
        old = os.environ.get("UFR_NATIVE_DECODE")
        try:
            os.environ["UFR_NATIVE_DECODE"] = "0"
            slow = fn(*args)
            os.environ["UFR_NATIVE_DECODE"] = "1"
            fast = fn(*args)
        finally:
            if old is None:
                os.environ.pop("UFR_NATIVE_DECODE", None)
            else:
                os.environ["UFR_NATIVE_DECODE"] = old
        return slow, fast

    def test_read_flo(self, files):
        slow, fast = self._both(fio.read_flo, files["flo"][0])
        assert np.array_equal(slow, fast)

    def test_read_flow_png(self, files):
        (fs, vs), (ff, vf) = self._both(fio.read_flow_png, files["png16"][0])
        assert np.array_equal(fs, ff) and np.array_equal(vs, vf)

    def test_read_disparity_png(self, files):
        slow, fast = self._both(fio.read_disparity_png, files["disp16"][0])
        assert np.array_equal(slow, fast)

    def test_read_image(self, files):
        slow, fast = self._both(fio.read_image, files["png8"][0])
        assert np.array_equal(slow, fast)


class TestPrefetchFallback:
    @pytest.mark.skipif(not NATIVE, reason="native loader unavailable")
    def test_rgba_falls_back_per_file(self, files):
        """Formats the native decoder declines (RGBA) come back through the
        pure-Python per-file fallback with reference semantics, in-stream."""
        samples = [(files["png8"][0],), (files["png_rgba"][0],)]
        got = list(loader.PrefetchLoader(samples, n_threads=2))
        assert np.array_equal(got[0][0], files["png8"][1])
        assert np.array_equal(got[1][0], files["png_rgba"][1])


class TestNativeKernels:
    """ufr_native.cpp wrappers: native path == numpy fallback exactly."""

    def _both(self, fn, *args, **kw):
        from understanding_flow_robustness_tpu import native as N

        fast = fn(*args, **kw)
        lib, N._LIB, N._TRIED = N._LIB, None, True   # force fallback
        try:
            slow = fn(*args, **kw)
        finally:
            N._LIB = lib
        return fast, slow

    def test_resize_bilinear_shapes(self):
        from understanding_flow_robustness_tpu.native import resize_bilinear_u8

        rng = np.random.RandomState(0)
        img3 = rng.randint(0, 256, (20, 30, 3), np.uint8)
        img1 = rng.randint(0, 256, (20, 30, 1), np.uint8)
        img2d = rng.randint(0, 256, (20, 30), np.uint8)
        for img, want_shape in ((img3, (10, 15, 3)), (img1, (10, 15, 1)),
                                (img2d, (10, 15))):
            fast, slow = self._both(resize_bilinear_u8, img, 10, 15)
            assert fast.shape == want_shape, (fast.shape, want_shape)
            assert slow.shape == want_shape, (slow.shape, want_shape)

    def test_batch_f32_pad_matches_numpy(self):
        from understanding_flow_robustness_tpu.native import batch_f32_pad

        rng = np.random.RandomState(1)
        x = rng.randn(2, 5, 7, 3).astype(np.float32)
        for zero in (False, True):
            fast, slow = self._both(batch_f32_pad, x, 9, 12, 2, 3, zero=zero)
            assert np.array_equal(fast, slow)
            mode = "constant" if zero else "edge"
            ref = np.pad(x, ((0, 0), (2, 2), (3, 2), (0, 0)), mode=mode)
            assert np.array_equal(slow, ref)

    def test_batch_u8_pad_matches_numpy(self):
        from understanding_flow_robustness_tpu.native import (
            batch_u8_to_float01_pad,
        )

        rng = np.random.RandomState(2)
        x = rng.randint(0, 256, (2, 5, 7, 3), np.uint8)
        fast, slow = self._both(batch_u8_to_float01_pad, x, 8, 8, 1, 0)
        assert np.allclose(fast, slow, atol=1e-7)

    def test_resize_sparse_flow_matches_numpy(self):
        from understanding_flow_robustness_tpu.native import resize_sparse_flow

        rng = np.random.RandomState(3)
        flow = rng.randn(17, 23, 2).astype(np.float32) * 10
        valid = (rng.rand(17, 23) > 0.5).astype(np.float32)
        fast, slow = self._both(resize_sparse_flow, flow, valid, 1.37, 0.81)
        assert np.array_equal(fast[0], slow[0])
        assert np.array_equal(fast[1], slow[1])
