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
    out["png_rgba"] = (str(d / "r.png"), rgba[..., :3])  # alpha stripped
    Image.fromarray(rgba).save(out["png_rgba"][0])

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

    def test_png_rgba_strips_alpha(self, files):
        path, ref = files["png_rgba"]
        assert np.array_equal(loader.decode_file(path), ref)

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
